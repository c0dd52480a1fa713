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


# ---- Hilbert curve (round 10) --------------------------------------
#
# The locality-superior sibling of the Morton order above (Hilbert
# 1891; the other clustering Delta/Iceberg OPTIMIZE offers): unlike
# z-order, CONSECUTIVE Hilbert points are always Manhattan-distance 1
# (no quadrant-boundary jumps — z's worst consecutive jump on a 2^b
# grid is 2^b), so range-partitioning by h gives files whose min/max
# boxes are tighter for the same file count. The price is that the
# code is stateful per bit level; the classic xy2d rotation loop is
# equivalent to a 4-state machine consuming one (x-bit, y-bit) pair
# per level MSB-first. _H_D / _H_S are that machine's output and
# transition tables, flat-indexed by state*4 + 2*bx + by, derived
# from the reference algorithm and validated EXHAUSTIVELY against it
# for grids up to 64x64 (test_hilbert_matches_reference re-runs the
# bits<=4 check in CI). All arithmetic is integer bit ops — the
# oracle replays every level exactly (unrolled CTE chain, one per
# level, list_extract over the same literal tables).
_H_D = (0, 1, 3, 2, 2, 3, 1, 0, 0, 3, 1, 2, 2, 1, 3, 0)
_H_S = (2, 0, 3, 0, 1, 2, 1, 3, 0, 1, 2, 2, 3, 3, 0, 1)

# Two-level composition of the same machine (index = state*16 +
# q_hi*4 + q_lo): halves the staged-projection count — DataFrame
# ANALYSIS of the chained projections, not row work, dominates the
# key's cost (measured ~1s build vs ~0.15s execution at sf0.1), so
# fewer/wider stages are the win. Derived mechanically from
# _H_D/_H_S; test_hilbert_matches_reference exercises both paths
# (bits=4 uses pairs, bits=5 in the adjacency test takes one single
# level first).
_H_D2 = tuple(
    (_H_D[s * 4 + q1] << 2) | _H_D[_H_S[s * 4 + q1] * 4 + q2]
    for s in range(4)
    for q1 in range(4)
    for q2 in range(4)
)
_H_S2 = tuple(
    _H_S[_H_S[s * 4 + q1] * 4 + q2]
    for s in range(4)
    for q1 in range(4)
    for q2 in range(4)
)


def with_hilbert_value(
    df: DataFrame,
    a_col: str,
    b_col: str,
    out_col: str = "h",
    bits: int = 16,
) -> DataFrame:
    """Attach the Hilbert distance of (a, b) (low ``bits`` bits each)
    as ``out_col``. Built entirely from element_at over the literal
    state tables — no UDF — but staged as one projection per machine
    step (the running state column is referenced twice per step; one
    flat expression would double in size per level and blow past
    codegen limits at 2^bits nodes, while staged projections keep it
    O(bits) — Catalyst's CollapseProject leaves multiply-referenced
    non-trivial aliases alone, so the stages survive optimization).
    Steps consume TWO bit levels at a time via the composed 64-entry
    tables (one single-level step first when ``bits`` is odd)."""
    dlut2 = F.array(*[F.lit(v) for v in _H_D2])
    slut2 = F.array(*[F.lit(v) for v in _H_S2])
    st, acc = "__h_st", "__h_d"
    out = df.withColumn(st, F.lit(0)).withColumn(
        acc, F.lit(0).cast("long")
    )
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")

    def bit(c, k):
        return F.shiftright(c, k).bitwiseAND(F.lit(1))

    k = bits
    if k % 2 == 1:
        k -= 1
        dlut = F.array(*[F.lit(v) for v in _H_D])
        slut = F.array(*[F.lit(v) for v in _H_S])
        idx = (
            F.col(st) * F.lit(4)
            + bit(a, k) * F.lit(2)
            + bit(b, k)
            + F.lit(1)
        ).cast("int")
        out = out.withColumn("__h_i", idx).withColumns(
            {
                acc: F.col(acc).bitwiseOR(
                    F.shiftleft(
                        F.element_at(dlut, F.col("__h_i")).cast(
                            "long"
                        ),
                        2 * k,
                    )
                ),
                st: F.element_at(slut, F.col("__h_i")),
            }
        )
    while k > 0:
        k -= 2
        q = (
            bit(a, k + 1) * F.lit(8)
            + bit(b, k + 1) * F.lit(4)
            + bit(a, k) * F.lit(2)
            + bit(b, k)
        )
        idx = (F.col(st) * F.lit(16) + q + F.lit(1)).cast("int")
        out = out.withColumn("__h_i", idx).withColumns(
            {
                acc: F.col(acc).bitwiseOR(
                    F.shiftleft(
                        F.element_at(dlut2, F.col("__h_i")).cast(
                            "long"
                        ),
                        2 * k,
                    )
                ),
                st: F.element_at(slut2, F.col("__h_i")),
            }
        )
    return out.withColumn(out_col, F.col(acc)).drop(st, acc, "__h_i")


def hilbert_ctes(
    a_expr: str, b_expr: str, bits: int = 16, src: str = "events"
) -> str:
    """DuckDB oracle twin of :func:`with_hilbert_value`: an unrolled
    MATERIALIZED CTE chain, one per bit level, replaying the same
    state machine over the same literal tables (list_extract is
    1-based, like element_at). Returns text ending in a CTE named
    ``h_final`` exposing the source columns plus ``h``."""
    dl = "[" + ", ".join(str(v) for v in _H_D) + "]"
    sl = "[" + ", ".join(str(v) for v in _H_S) + "]"
    parts = [
        f"h_0 AS MATERIALIZED (\n"
        f"  SELECT *, 0 AS st, CAST(0 AS BIGINT) AS hd,\n"
        f"         CAST(({a_expr}) AS BIGINT) AS ha,\n"
        f"         CAST(({b_expr}) AS BIGINT) AS hb\n"
        f"  FROM {src})"
    ]
    lvl = 0
    for k in reversed(range(bits)):
        lvl += 1
        idx = (
            f"(st * 4 + ((ha >> {k}) & 1) * 2 + ((hb >> {k}) & 1)"
            f" + 1)"
        )
        parts.append(
            f"h_{lvl} AS MATERIALIZED (\n"
            f"  SELECT * REPLACE (\n"
            f"    (hd | (CAST(list_extract({dl}, {idx}) AS BIGINT)"
            f" << {2 * k})) AS hd,\n"
            f"    list_extract({sl}, {idx}) AS st)\n"
            f"  FROM h_{lvl - 1})"
        )
    parts.append(
        f"h_final AS (SELECT *, hd AS h FROM h_{lvl})"
    )
    return ",\n".join(parts)


def write_hilbert(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    bits: int = 16,
    prefix_bits: int = 4,
) -> None:
    """Hilbert twin of :func:`write_zordered`: partition by the top
    ``prefix_bits`` of h (directory key ``hp``), sort by full h
    within partitions. ``prefix_bits`` must be even so each prefix
    cell is one whole quadrant square of the recursion (2 bits per
    level)."""
    assert prefix_bits % 2 == 0, "hilbert prefix must be whole levels"
    out = with_hilbert_value(df, a_col, b_col, "__h", bits)
    (
        out.withColumn(
            "hp", F.shiftright(F.col("__h"), 2 * bits - prefix_bits)
        )
        .repartition("hp")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.partitionBy("hp")
        .parquet(path, mode="overwrite")
    )


def _hilbert_d2xy(bits: int, d: int) -> tuple[int, int]:
    """Classic inverse (d -> (x, y)) — driver-side only, used to turn
    a prefix cell id into its bounding square for pruning."""
    n = 1 << bits
    t = d
    x = y = 0
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def hbox_prefixes(
    a_lo: int,
    a_hi: int,
    b_lo: int,
    b_hi: int,
    bits: int = 16,
    prefix_bits: int = 4,
) -> list[int]:
    """Prefix cells a box query can touch. With even ``prefix_bits``
    every cell is an axis-aligned square of side 2^(bits -
    prefix_bits/2) (one node of the quadrant recursion), so the
    intersection test is exact: decode one point of the cell
    (driver-side d2xy of the cell's lowest d) and mask to the cell
    grid. Odd prefix_bits would make prefix_bits//2 silently
    over-approximate each cell to its parent square — reads would
    stay correct through the residual filter but pruning would
    quietly degrade — so this end enforces the same whole-level
    contract as write_hilbert (r10 ADVICE)."""
    assert prefix_bits % 2 == 0, "hilbert prefix must be whole levels"
    side = 1 << (bits - prefix_bits // 2)
    cells = []
    for hp in range(1 << prefix_bits):
        x, y = _hilbert_d2xy(bits, hp << (2 * bits - prefix_bits))
        cx, cy = x & ~(side - 1), y & ~(side - 1)
        if (
            cx <= a_hi
            and cx + side - 1 >= a_lo
            and cy <= b_hi
            and cy + side - 1 >= b_lo
        ):
            cells.append(hp)
    return cells


def read_hbox(
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
    """Box query over a :func:`write_hilbert` layout — hp partition
    pruning plus exact residual range predicates, the read twin of
    read_zbox."""
    cells = hbox_prefixes(a_lo, a_hi, b_lo, b_hi, bits, prefix_bits)
    df = spark.read.parquet(path)
    return df.filter(
        F.col("hp").isin(cells)
        & F.col(a_col).between(a_lo, a_hi)
        & F.col(b_col).between(b_lo, b_hi)
    )


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
