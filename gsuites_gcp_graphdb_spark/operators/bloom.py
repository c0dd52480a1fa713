"""Bloom-filter join pruning — the classic 100 TB shuffle cutter.

When a selective dimension predicate drives a fact-side join, the
fact table's non-matching rows still pay the full shuffle before the
join drops them. A Bloom filter built from the dimension keys and
broadcast to the fact scan rejects almost all of them MAP-SIDE, so
only ~|match| + epsilon*|fact| rows enter the exchange. (Catalyst's
own runtime bloom injection — spark.sql.optimizer.runtime.bloomFilter
— does this automatically for some shapes; this operator is the
explicit, reusable form: build once, prune many queries, or prune
ahead of an aggregation the optimizer won't inject into. The SQL
functions bloom_filter_agg/might_contain are not exposed in this
build, so the filter is DataFrame-native.)

Representation: an m-bit bitmap packed into 63-bit BIGINT words,
held as a TABLE of (word_idx, word) rows — at the default m = 2^18
bits that is at most 4162 rows (~65 KB), always broadcastable. The
build is one explode(h hash positions) + groupBy(word_idx) with a
bit_or aggregate — map-side combinable, one tiny shuffle of word
ids. The probe is h broadcast hash joins (one per hash function),
each adding a bit-test column; no shuffle of the fact side at all
and everything stays in whole-stage codegen (xxhash64 + shifts).

Guarantee: NO FALSE NEGATIVES — every true match survives the prune
(pinned by test) — so an exact join downstream returns exactly the
un-pruned result; false positives only cost shuffle bytes. The
theoretical FP rate at m bits / n keys / h hashes is
(1 - e^{-hn/m})^h; the default (2^18, h=3) holds ~1e-3 up to ~10k
keys. There is no reference twin — the reference has no distributed
join layer at all (JanusGraph executes its Gremlin; main.go only
emits scripts) — this belongs to the training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 63  # 1 << 63 would overflow the signed BIGINT literal
DEFAULT_M_BITS = 1 << 18
DEFAULT_HASHES = 3


def _positions(key: Column, m_bits: int, h: int) -> list[Column]:
    """h deterministic bit positions for a key: xxhash64 seeded per
    hash function, folded into [0, m_bits)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(h)
    ]


def bloom_build(
    dim: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    h: int = DEFAULT_HASHES,
) -> DataFrame:
    """Aggregate the dimension keys into the packed bitmap table
    (word_idx int, word long). Empty dim -> empty table (probe then
    rejects everything, matching the empty join result)."""
    pos = F.explode(
        F.array(*_positions(F.col(key_col), m_bits, h))
    ).alias("__pos")
    return (
        dim.select(pos)
        .select(
            (F.col("__pos") / WORD_BITS).cast("int").alias("word_idx"),
            # SQL expr: the Python shiftleft() wrapper only accepts a
            # literal int for numBits
            F.expr(
                f"shiftleft(1L, CAST(pmod(__pos, {WORD_BITS}) AS INT))"
            ).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    h: int = DEFAULT_HASHES,
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the bloom (no false
    negatives; FP rate per the m/n/h formula). h broadcast joins
    against the word table, no fact-side shuffle; output columns ==
    fact columns."""
    out = fact
    keep = F.lit(True)
    for i, p in enumerate(_positions(F.col(key_col), m_bits, h)):
        wt = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"__wi{i}"),
                F.col("word").alias(f"__w{i}"),
            )
        )
        out = out.withColumn(
            f"__p{i}", p
        ).join(
            wt,
            (F.col(f"__p{i}") / WORD_BITS).cast("int")
            == F.col(f"__wi{i}"),
            "left_outer",
        )
        keep = keep & F.coalesce(
            F.expr(
                f"(shiftright(__w{i},"
                f" CAST(pmod(__p{i}, {WORD_BITS}) AS INT)) & 1) = 1"
            ),
            F.lit(False),
        )
    return out.filter(keep).select(*fact.columns)


def bloom_prejoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = DEFAULT_M_BITS,
    h: int = DEFAULT_HASHES,
) -> DataFrame:
    """Bloom-pruned inner join: build the filter from dim keys, prune
    fact map-side, then the EXACT equi-join (which removes bloom
    false positives) — result identical to fact JOIN dim, shuffle
    input cut to the survivors."""
    bf = bloom_build(dim, dim_key, m_bits, h)
    pruned = bloom_prune(fact, bf, fact_key, m_bits, h)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
