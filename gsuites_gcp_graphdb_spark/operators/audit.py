"""Declarative data-quality audit (the Deequ idea): a pipeline
asserts completeness / uniqueness / invariants / referential
integrity as METRICS first, gates on them second — at 100 TB you
cannot eyeball a bad partition, you detect it as a metric shift.

Scale shape: every per-table check compiles into ONE aggregation pass
over the table (all checks share the scan — the Deequ trick), each
map-side combinable; referential integrity is an anti-join count with
the parent side broadcast when it is a dimension. Output is a narrow
long-format (check, value) relation however wide the audited tables
are, so audits of petabyte tables produce kilobyte results.

Null semantics are explicit: an invariant that evaluates to NULL on a
row (e.g. the column itself is null) counts as a VIOLATION — silence
is not compliance. Mirrored in the oracle SQL as
``count(*) - count(*) FILTER (WHERE <invariant>)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit_metrics(
    df: DataFrame,
    table: str,
    nulls: tuple[str, ...] = (),
    unique: tuple[str, ...] = (),
    invariants: tuple[tuple[str, Column], ...] = (),
) -> DataFrame:
    """One-pass audit of a single table. Emits long-format rows
    ``(check, value)``:

    - ``{table}.rows`` — row count;
    - ``{table}.{col}_nulls`` — null count per completeness column;
    - ``{table}.{col}_dups`` — non-null duplicates per uniqueness
      column (count minus distinct count);
    - ``{table}.{name}`` — violation count per named invariant
      (rows where the invariant is false OR null).
    """
    # Every sum-backed metric is coalesced to 0: on an EMPTY table
    # sum() over zero rows is NULL and `count - NULL` is NULL, and a
    # NULL violation count silently passes a `value > 0` gate — the
    # exact scenario (empty snapshot) an audit exists to flag. The
    # oracle's count(*) FILTER form yields 0 there; so do we.
    aggs = [F.count(F.lit(1)).alias(f"{table}.rows")]
    for c in nulls:
        aggs.append(
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"{table}.{c}_nulls")
        )
    for c in unique:
        aggs.append(
            (F.count(F.col(c)) - F.countDistinct(F.col(c))).alias(
                f"{table}.{c}_dups"
            )
        )
    for name, inv in invariants:
        aggs.append(
            (
                F.count(F.lit(1))
                - F.coalesce(
                    F.sum(F.coalesce(inv.cast("long"), F.lit(0))),
                    F.lit(0),
                )
            ).alias(f"{table}.{name}")
        )
    wide = df.agg(*aggs)
    pairs = [
        x
        for f in wide.schema.fieldNames()
        for x in (F.lit(f), F.col(f"`{f}`").cast("long"))
    ]
    return wide.select(
        F.explode(F.create_map(*pairs)).alias("check", "value")
    )


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential-integrity check: count of child rows whose key has
    no match in the parent (NULL keys are orphans too — they reference
    nothing). Anti-join keyed on the parent key; Catalyst broadcasts
    the parent when it is dimension-sized, which is the common case
    (facts reference dimensions)."""
    parent_keys = parent.select(F.col(parent_key).alias(child_key)).dropDuplicates()
    orphans = child.select(child_key).join(parent_keys, [child_key], "left_anti")
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("value")).select(
        F.lit(name).alias("check"), "value"
    )
