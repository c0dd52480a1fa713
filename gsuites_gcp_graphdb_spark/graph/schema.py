"""Property-graph schema (SURVEY.md §1.4).

The reference's data model (main.go, init.groovy) is a labeled
property graph: 7 vertex labels keyed by a *natural key* (``email``,
``name``, ``projectid`` — e.g. existence checks like
``g.V().hasLabel('user').has('email', v)``, main.go:206), and a single
edge label ``in`` (member → container) with one property ``weight=1``
(main.go:305 et al.).

Spark representation: two explicit-schema DataFrames.

- ``vertices(id, label, email, name, projectid, is_external)`` —
  wide, null-padded per label. ``id = xxhash64(label, natural_key)``
  so ids are **deterministic**: re-loading the same data produces the
  same ids (JanusGraph ids are not stable; ours are, which is what
  makes idempotent merge and restartable loads cheap — no global
  id-assignment shuffle, SURVEY.md §4.4).
- ``edges(src, dst, label, weight)``.

Normalized divergences from the reference (SURVEY.md §1.5): one
``projectid`` column (the reference splits ``projectid``/``projectId``,
main.go:549 vs main.go:699); serviceAccount and permission are keyed on
the property actually written (``email``/``name``), fixing the
never-matching existence checks at main.go:587-588 and main.go:678-679.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

VERTEX_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("label", StringType(), False),
        StructField("email", StringType(), True),
        StructField("name", StringType(), True),
        StructField("projectid", StringType(), True),
        StructField("is_external", BooleanType(), True),
    ]
)

EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("label", StringType(), False),
        StructField("weight", IntegerType(), False),
    ]
)

# label -> the property that is its natural key (SURVEY.md §1.1 table).
NATURAL_KEY = {
    "user": "email",
    "group": "email",
    "serviceAccount": "email",
    "project": "projectid",
    "role": "name",
    "permission": "name",
    "bucket": "name",  # composite with projectid; see bucket_id()
}

VERTEX_LABELS = tuple(NATURAL_KEY)

EDGE_LABEL_IN = "in"

# Pseudo-principals modeled as group vertices (main.go:463-483).
PSEUDO_GROUPS = ("allUsers", "allAuthenticatedUsers")


def vertex_id(label: str | Column, key: Column) -> Column:
    """Deterministic 64-bit vertex id from (label, natural key).

    xxhash64 runs JVM-side inside whole-stage codegen — no UDF, no
    shuffle — and is stable across loads, which is what makes the
    upsert kernel (graph/upsert.py) a pure set-merge.
    """
    lbl = F.lit(label) if isinstance(label, str) else label
    return F.xxhash64(lbl, key.cast(StringType()))


def bucket_id(name: Column, projectid: Column) -> Column:
    """Buckets are keyed by (name, projectid) — the one composite key
    in the reference (its existence check probes both, main.go:415-418).
    """
    return F.xxhash64(F.lit("bucket"), name, projectid)


def natural_key_col() -> Column:
    """The natural key of any vertex row, label-independent.

    For non-bucket labels exactly one of email/name/projectid is set,
    so coalesce is total and unambiguous. Buckets carry the one
    composite key (name, projectid) — both columns are set — rendered
    as ``name/projectid`` (matching the reference's probe on both
    properties, main.go:415-418)."""
    return F.when(
        F.col("label") == "bucket",
        F.concat_ws("/", F.col("name"), F.col("projectid")),
    ).otherwise(
        F.coalesce(F.col("email"), F.col("name"), F.col("projectid"))
    )
