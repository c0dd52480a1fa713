"""Z-order (Morton) data layout: multi-dimensional clustering so that
min/max statistics prune on EVERY interleaved dimension, not just the
leading sort key.

A single-column sort makes parquet row-group/partition stats selective
on that column only; a 100 TB events table queried by (user, value)
boxes needs both. Interleaving the bits of the two keys gives a 1-D
order in which points close in BOTH dimensions are close in the order
— range-partitioning/sorting by the z-value therefore yields files
whose min/max footprint is a small box in each dimension, and a box
query touches only the files whose z-prefix cells intersect it
(Morton 1966; the technique Delta Lake's OPTIMIZE ZORDER BY applies).

Everything is built-in bit arithmetic (shift/and/or) — the z-value is
one codegen'd expression, no UDF; the box→prefix decomposition
enumerates at most 2^prefix_bits coarse cells driver-side (a few
integers, not data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: a's bit i lands at 2i, b's at 2i+1. One flat codegen
    expression (2*bits shift/mask terms OR-folded)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(
                F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i,
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
        )
    return z


def zvalue_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The identical interleave as DuckDB SQL text — the oracle twin
    of :func:`zvalue` (same shifts, same OR-fold)."""
    # NB: DuckDB follows Postgres operator precedence — |, &, <<, >>
    # are ALL equal-precedence left-associative, so every term must be
    # fully parenthesized or `x << 1 | y << 3` parses as
    # `((x << 1) | y) << 3` (observed as a shift-overflow error).
    terms = []
    for i in range(bits):
        terms.append(f"(((({a_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    bits: int = 16,
    prefix_bits: int = 4,
) -> None:
    """Write ``df`` partitioned by the top ``prefix_bits`` bits of the
    z-value (directory key ``zp``) and sorted by full z within each
    partition: directory pruning handles coarse boxes, row-group
    min/max handles the rest. Partition count is 2^prefix_bits —
    pick it for O(file-count) listing, not per-row granularity."""
    z = zvalue(F.col(a_col), F.col(b_col), bits)
    (
        df.withColumn("__z", z)
        .withColumn(
            "zp", F.shiftright(F.col("__z"), 2 * bits - prefix_bits)
        )
        .repartition("zp")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.partitionBy("zp")
        .parquet(path, mode="overwrite")
    )


def zbox_prefixes(
    a_lo: int,
    a_hi: int,
    b_lo: int,
    b_hi: int,
    bits: int = 16,
    prefix_bits: int = 4,
) -> list[int]:
    """The z-prefix cells a box query can touch: enumerate all
    2^prefix_bits coarse cells and keep those whose (a, b) rectangle
    intersects the box — the standard z-range decomposition at
    directory granularity. Driver-side over a few integers."""
    cells = []
    for zp in range(1 << prefix_bits):
        # un-interleave the prefix: prefix bit j of z corresponds to
        # a's top bits (even global positions) / b's (odd positions)
        a_pref = b_pref = 0
        a_n = b_n = 0
        for j in range(prefix_bits):
            # global bit position from the top: j=0 is the MSB of z,
            # which is bit 2*bits-1 -> b's top bit
            gpos = 2 * bits - 1 - j
            bitv = (zp >> (prefix_bits - 1 - j)) & 1
            if gpos % 2 == 1:
                b_pref = (b_pref << 1) | bitv
                b_n += 1
            else:
                a_pref = (a_pref << 1) | bitv
                a_n += 1
        a_cell_lo = a_pref << (bits - a_n)
        a_cell_hi = a_cell_lo + (1 << (bits - a_n)) - 1
        b_cell_lo = b_pref << (bits - b_n)
        b_cell_hi = b_cell_lo + (1 << (bits - b_n)) - 1
        if (
            a_cell_lo <= a_hi
            and a_cell_hi >= a_lo
            and b_cell_lo <= b_hi
            and b_cell_hi >= b_lo
        ):
            cells.append(zp)
    return cells


def read_zbox(
    spark,
    path: str,
    a_col: str,
    b_col: str,
    a_lo: int,
    a_hi: int,
    b_lo: int,
    b_hi: int,
    bits: int = 16,
    prefix_bits: int = 4,
) -> DataFrame:
    """Box query over a :func:`write_zordered` layout: the zp IN
    (<intersecting cells>) predicate prunes partitions (visible as
    PartitionFilters in the scan), the residual a/b range predicates
    prune row groups via min/max and finish exactly."""
    cells = zbox_prefixes(a_lo, a_hi, b_lo, b_hi, bits, prefix_bits)
    df = spark.read.parquet(path)
    return df.filter(
        F.col("zp").isin(cells)
        & F.col(a_col).between(a_lo, a_hi)
        & F.col(b_col).between(b_lo, b_hi)
    )
