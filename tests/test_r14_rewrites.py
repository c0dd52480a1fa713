"""r14 optimization-round equivalence pins: each rewritten operator
internal is compared against its ORIGINAL spelling, inlined here, on a
corpus that includes the edge cases the rewrite had to preserve
(empty text, single-token text, duplicated text, NULL text).

- _minhash_sig (explode + codegen'd min-aggs) vs the HOF
  array_min(transform(...)) column expressions it replaced, md5 AND
  xxhash64 families;
- simhash64 (explode + 64 codegen'd SUM votes) vs the single-row
  aggregate/zip_with fold it replaced;
- substring_dup_stats (unique-count arithmetic) vs the count-table
  join-back it replaced.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gsuites_gcp_graphdb_spark.functions.textfns import (
    minhash_signature_md5,
    minhash_signature_xxhash,
    shingles,
)
from gsuites_gcp_graphdb_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "a b c a b c d"),
        (2, "a b c a b c d"),          # exact dup of 1
        (3, "x y z w v u t s r q"),
        (4, "a"),                      # single token
        (5, ""),                       # empty text -> [''] token
        (6, None),                     # NULL text -> null token array
        (7, "a b c q r s t u v w"),
        (8, "pad pad pad a b c pad"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.mark.parametrize("use_md5", [True, False])
def test_minhash_sig_matches_hof_spelling(corpus, use_md5):
    sh = corpus.select(
        F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("sh")
    )
    sig_fn = minhash_signature_md5 if use_md5 else minhash_signature_xxhash
    old = {
        r["id"]: tuple(r[f"mh_{j}"] for j in range(12))
        for r in sh.select("id", *sig_fn(F.col("sh"), 12)).collect()
    }
    new = {
        r["id"]: tuple(r[f"mh_{j}"] for j in range(12))
        for r in dd._minhash_sig(sh, 12, use_md5).collect()
    }
    assert new == old
    # the NULL-text doc must be present with an all-null signature in
    # both spellings (explode_outer + min-over-nulls == array_min(null))
    assert new[6] == tuple([None] * 12)


def test_simhash64_matches_fold_spelling(corpus):
    votes_expr = """
      aggregate(
        split(text, ' '),
        array_repeat(0L, 64),
        (acc, t) -> zip_with(
          acc,
          transform(sequence(0, 63),
            i -> CASE WHEN ((xxhash64(t) >> i) & 1) = 1
                 THEN 1L ELSE -1L END),
          (a, b) -> a + b))"""
    pack_expr = """
      aggregate(transform(sequence(0, 62),
          i -> CASE WHEN votes[i] > 0 THEN shiftleft(1L, i) ELSE 0L END),
        0L, (a, b) -> a + b)
      + CASE WHEN votes[63] > 0 THEN -9223372036854775808 ELSE 0L END"""
    old = {
        r["id"]: r["simhash"]
        for r in corpus.select(
            F.col("doc_id").alias("id"), F.expr(votes_expr).alias("votes")
        )
        .select("id", F.expr(pack_expr).alias("simhash"))
        .collect()
    }
    new = {
        r["id"]: r["simhash"]
        for r in dd.simhash64(corpus, "doc_id", "text").collect()
    }
    assert new == old
    assert new[6] == 0  # NULL text packs to 0 in both spellings
    assert new[1] == new[2]  # exact dups agree


@pytest.mark.parametrize("fast", [True, False])
def test_substring_dup_stats_matches_joinback_spelling(corpus, fast):
    docs = corpus.where(F.col("text").isNotNull())
    win = shingles(F.col("text"), 3, distinct=False)
    wins = docs.select(F.col("doc_id"), F.explode(win).alias("w"))
    hcol = F.xxhash64("w") if fast else F.md5("w")
    wins = wins.select("doc_id", hcol.alias("h"))
    cnt = wins.groupBy("h").agg(F.count("*").alias("__cnt"))
    old = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in wins.join(cnt, ["h"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_windows"),
            F.sum((F.col("__cnt") > 1).cast("int"))
            .cast("bigint")
            .alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.col("n_dup_windows")
                / F.greatest(F.col("n_windows"), F.lit(1)),
                6,
            ),
        )
        .collect()
    }
    new = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in dd.substring_dup_stats(
            docs, "doc_id", "text", k=3, fast=fast
        ).collect()
    }
    assert new == old
    # the two exact-dup docs are 100% duplicated text
    assert new[1][2] == 1.0 and new[2][2] == 1.0
