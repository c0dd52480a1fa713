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
  join-back it replaced (its `old` reference also spells the window
  hash as the md5 HEX STRING the operator used before the r14
  narrow-key change — so it pins that too);
- the narrowed internal hash keys (unhex(md5) binary / native bigint
  instead of hex/stringified keys) in minhash_lsh_candidates,
  minhash_incremental_candidates, dedup_exact and the winnowing
  family vs the string-keyed spellings they replaced.
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


def _lsh_candidates_string_keyed(df, n, num_hashes, bands, use_md5):
    """The pre-r14 band self-join spelling: h cast to string."""
    rows = num_hashes // bands
    from gsuites_gcp_graphdb_spark.functions.textfns import band_hashes

    sh = df.select(
        F.col("doc_id").alias("id"), shingles(F.col("text"), n).alias("sh")
    )
    sig = dd._minhash_sig(sh, num_hashes, use_md5)
    banded = sig.select(
        "id",
        *band_hashes(
            [f"mh_{j}" for j in range(num_hashes)], bands, rows, use_md5
        ),
    )
    long = banded.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"band_{b}").cast("string").alias("h"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    a = long.alias("a")
    b = long.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates()
    )


@pytest.mark.parametrize("use_md5", [True, False])
def test_lsh_candidates_match_string_keyed_spelling(corpus, use_md5):
    """The narrowed band key (unhex(md5) binary / native bigint) is a
    bijection of the string key, so the candidate SET is identical."""
    old = {
        (r["id_a"], r["id_b"])
        for r in _lsh_candidates_string_keyed(
            corpus, 3, 12, 6, use_md5
        ).collect()
    }
    new = {
        (r["id_a"], r["id_b"])
        for r in dd.minhash_lsh_candidates(
            corpus, use_md5=use_md5
        ).collect()
    }
    assert new == old
    assert (1, 2) in new  # the exact-dup pair must be a candidate


@pytest.mark.parametrize("use_md5", [True, False])
def test_incremental_candidates_narrow_key(corpus, use_md5):
    """Incremental (corpus x batch) matches the full-LSH pair set
    restricted to pairs with exactly one batch member — both sides now
    use the narrowed band key, so this also guards the corpus/batch
    key types agreeing (a corpus-vs-batch type mismatch would silently
    empty the join)."""
    batch = corpus.where(F.col("doc_id") % 2 == 0)
    old_corpus = corpus.where(F.col("doc_id") % 2 == 1)
    got = {
        (r["new_id"], r["match_id"])
        for r in dd.minhash_incremental_candidates(
            old_corpus, batch, use_md5=use_md5
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in dd.minhash_lsh_candidates(
            corpus, use_md5=use_md5
        ).collect()
    }
    # a full-LSH pair (a<b) surfaces incrementally as:
    #   b in batch            -> (new_id=b, match_id=a)  (a earlier)
    #   a in batch, b corpus  -> (new_id=a, match_id=b)  (corpus side
    #                            matches regardless of id order)
    want = {(b, a) for (a, b) in full if b % 2 == 0} | {
        (a, b) for (a, b) in full if a % 2 == 0 and b % 2 == 1
    }
    assert all(n % 2 == 0 for n, _ in got)
    assert got == want


def test_dedup_exact_matches_string_keyed_spelling(corpus):
    w = corpus.select(
        F.col("doc_id"), F.md5(F.col("text")).alias("__k")
    )
    keep = w.groupBy("__k").agg(F.min("doc_id").alias("doc_id"))
    old = {
        r["doc_id"]
        for r in corpus.join(keep, ["doc_id"], "left_semi").collect()
    }
    new = {r["doc_id"] for r in dd.dedup_exact(corpus).collect()}
    assert new == old
    assert 2 not in new and 1 in new  # min-id rep of the exact-dup pair


def test_winnow_fingerprints_match_hex_spelling(corpus):
    """unhex(md5) is order-isomorphic to the hex string (fixed-length
    lowercase hex: string order == unsigned byte order), so the
    winnowing running-MIN selects the same fingerprints."""
    from pyspark.sql import Window

    from gsuites_gcp_graphdb_spark.operators import text as tx

    docs = corpus.where(F.col("text").isNotNull())
    k, w = 5, 4
    grams = docs.select(
        F.col("doc_id"),
        F.posexplode(
            shingles(F.col("text"), k, distinct=False)
        ).alias("pos", "g"),
    ).select("doc_id", "pos", F.md5("g").alias("h"))
    dw = Window.partitionBy("doc_id")
    run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    fps_hex = (
        grams.withColumn("__n", F.count("*").over(dw))
        .withColumn("fp", F.min("h").over(run))
        .filter(F.col("pos") <= F.col("__n") - w)
        .select("doc_id", "fp")
        .dropDuplicates()
    )
    share = fps_hex.groupBy("fp").agg(
        F.count_distinct("doc_id").alias("__nd")
    )
    per_doc = (
        fps_hex.join(share, ["fp"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_fingerprints"),
            F.sum((F.col("__nd") > 1).cast("int"))
            .cast("bigint")
            .alias("n_shared_fp"),
        )
    )
    kg = grams.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kgrams")
    )
    old = {
        r["doc_id"]: (r["n_kgrams"], r["n_fingerprints"], r["n_shared_fp"])
        for r in kg.join(per_doc, ["doc_id"], "left")
        .select(
            "doc_id",
            "n_kgrams",
            F.coalesce("n_fingerprints", F.lit(0)).alias("n_fingerprints"),
            F.coalesce("n_shared_fp", F.lit(0)).alias("n_shared_fp"),
        )
        .collect()
    }
    new = {
        r["doc_id"]: (r["n_kgrams"], r["n_fingerprints"], r["n_shared_fp"])
        for r in tx.winnow_fingerprints(docs).collect()
    }
    assert new == old
    assert new[1] == new[2]  # exact dups fingerprint identically


def test_minhash_calibration_matches_joinback_spelling(corpus):
    """Wave-7: minhash_calibration carries est_matches THROUGH the
    posting join (one consumer of the band self-join) instead of
    joining est back onto its own derivative. est_matches is
    functionally determined by (id_a, id_b), so grouping on it is a
    no-op and the output must be row-identical to the old join-back
    spelling, inlined here."""
    n, k, bands = 3, 12, 6
    est = dd.minhash_lsh_candidates(
        corpus, n=n, num_hashes=k, bands=bands, use_md5=True,
        with_agreement=True,
    )
    from gsuites_gcp_graphdb_spark.operators.dedup import shingle_sets

    cand = est.select("id_a", "id_b")
    posts = shingle_sets(corpus, "doc_id", "text", n)
    a = posts.alias("a")
    b = posts.alias("b")
    inter = (
        cand.join(a, cand.id_a == F.col("a.id"))
        .join(
            b,
            (cand.id_b == F.col("b.id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy(
            "id_a",
            "id_b",
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    old_out = (
        est.join(inter, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "est_matches",
            F.round(F.col("est_matches") / F.lit(float(k)), 6).alias(
                "est_jaccard"
            ),
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .withColumn(
            "cal_err",
            F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 6),
        )
    )
    old = {tuple(r) for r in old_out.collect()}
    new = {
        tuple(r)
        for r in dd.minhash_calibration(
            corpus, n=n, num_hashes=k, bands=bands, use_md5=True
        ).collect()
    }
    assert new == old
    assert new  # the exact-dup pair (1,2) guarantees a candidate
    assert any(r[0] == 1 and r[1] == 2 and r[2] == 12 for r in new)
