"""Dedup / similarity / text / multimodal operator semantics on tiny
literal data (oracle parity is covered by tools/selfcheck.py; these
pin the operator-level contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gsuites_gcp_graphdb_spark.operators import dedup as dd
from gsuites_gcp_graphdb_spark.operators import multimodal as mm
from gsuites_gcp_graphdb_spark.operators import similarity as sim
from gsuites_gcp_graphdb_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content with no overlap here at all"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "one two"),  # shorter than shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    groups = dd.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].n_dups == 2 and groups[0].doc_ids == [1, 4]
    kept = dd.dedup_exact(docs)
    assert kept.count() == 4
    assert {r.doc_id for r in kept.collect()} == {1, 2, 3, 5}


def test_ngram_jaccard(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    assert pairs[(1, 4)] == 1.0  # exact dup
    assert 0.5 < pairs[(1, 2)] < 1.0  # near dup (one word differs)
    assert (1, 3) not in pairs
    # short doc produces one partial shingle, doesn't crash (totality)
    assert all(k[0] != 5 and k[1] != 5 for k in pairs)


def test_ngram_jaccard_df_cut(docs, spark):
    """max_df removes ubiquitous shingles from the universe: candidate
    volume drops, exact dups still match, and a shingle shared by every
    doc can no longer pair everything with everything."""
    # Every doc shares the token-trigram universe sparsely here, so
    # build a corpus where one shingle is in ALL docs.
    rows = [(i, f"common tri gram unique{i} word{i} tail{i}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    no_cut = dd.ngram_jaccard_pairs(df, threshold=0.0)
    cut = dd.ngram_jaccard_pairs(df, threshold=0.0, max_df=5)
    # 'common tri gram' has df=6 > 5: without it no pair shares a
    # shingle, so the cut kills the quadratic candidate set entirely.
    assert no_cut.count() == 15  # all C(6,2) pairs share the stop-shingle
    assert cut.count() == 0
    # exact dups survive any cut (they agree on every kept shingle)
    dup = dd.ngram_jaccard_pairs(docs, threshold=0.99, max_df=3)
    assert (1, 4) in {(r.id_a, r.id_b) for r in dup.collect()}
    dd.release_scratch()


def test_scratch_release(docs, spark):
    """Dedup scratch caches are registered and released — a long
    session sweeping many queries must not accrete storage memory.

    r10: asserts on the TRACKED relations' own storage levels. The
    old global getPersistentRDDs() equality was racy two ways: the
    module fixture's cache materializes lazily (inside the window in
    an isolated run), and ContextCleaner's weak-ref sweeps reclaim
    unrelated localCheckpoint RDDs from earlier tests at their own
    cadence — both move the global count without any scratch leak."""
    dd.release_scratch()
    dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    dd.minhash_dedup_pairs(docs, threshold=0.5).collect()
    dd.simhash_candidates(docs).collect()
    tracked = list(dd._SCRATCH)
    assert tracked  # the operators registered their scratch caches
    assert any(df.storageLevel.useMemory for df in tracked)
    dd.release_scratch()
    assert not dd._SCRATCH
    assert all(not df.storageLevel.useMemory for df in tracked)


def test_minhash_lsh_finds_near_dups(docs):
    cand = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(docs, use_md5=True).collect()
    }
    assert (1, 4) in cand  # identical docs always collide
    verified = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.minhash_dedup_pairs(docs, threshold=0.2).collect()
    }
    assert verified.get((1, 4)) == 1.0
    # xxhash64 fast path agrees on the sure thing
    cand_fast = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(docs, use_md5=False).collect()
    }
    assert (1, 4) in cand_fast


def test_simhash(docs):
    sh = {r.id: r.simhash for r in dd.simhash64(docs, "doc_id", "text").collect()}
    assert sh[1] == sh[4]  # identical text -> identical sketch
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dd.simhash_candidates(docs, max_hamming=16).collect()
    }
    assert pairs.get((1, 4)) == 0
    near = pairs.get((1, 2))
    assert near is not None and near <= 16


def test_similarity_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = sim.topk_for_vector(emb, [1.0, 0.0, 0.0], k=2, exclude_id=0).collect()
    assert [r.vec_id for r in top] == [1, 2]
    assert top[0].cos_sim > 0.99
    knn = sim.knn_join(
        emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("q_id"), "embedding"
        ),
        emb,
        k=2,
    ).collect()
    assert [r.vec_id for r in knn] == [0, 1]  # self first, then nearest
    dups = sim.embedding_near_duplicates(emb, threshold=0.99, dim=3).collect()
    assert {(r.id_a, r.id_b) for r in dups} == set() or all(
        r.cos_sim >= 0.99 for r in dups
    )


def test_ivf_topk(spark, sf_dir):
    """IVF correctness anchor: probing EVERY centroid equals brute
    force exactly; probing fewer returns a subset-quality result."""
    # deterministic subset: limit-without-sort re-evaluates per job and
    # can pick different rows across actions (round-4 advice)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = {
        (r.q_id, r.rank): r.vec_id
        for r in sim.knn_join(queries, emb, k=3).collect()
    }
    full_probe = {
        (r.q_id, r.rank): r.vec_id
        for r in sim.ivf_topk(
            queries, emb, k=3, num_centroids=4, nprobe=4, iterations=2
        ).collect()
    }
    assert full_probe == exact
    # approximate probe: every query still answers, self always found
    # (the query's own vector shares its centroid by definition)
    approx = sim.ivf_topk(
        queries, emb, k=3, num_centroids=4, nprobe=1, iterations=2
    ).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {r[0] for r in queries.select("q_id").collect()}
    for q, rows in by_q.items():
        assert rows[0].vec_id == q or any(r.vec_id == q for r in rows)


def test_ivf_train_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    c1 = sim.ivf_train(emb, num_centroids=4, iterations=2).collect()
    c2 = sim.ivf_train(emb, num_centroids=4, iterations=2).collect()
    assert sorted((r.cid, tuple(r.cvec)) for r in c1) == sorted(
        (r.cid, tuple(r.cvec)) for r in c2
    )
    assert len(c1) == 4


def test_text_ops(spark):
    rows = [
        (1, "the cat sat on the mat and the dog sat too", "x", "s", 43),
        (2, "el perro y el gato en la casa de la abuela", "x", "s", 42),
        (3, "zz yy xx ww vv", "x", "s", 14),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    langs = {r.doc_id: r.lang_pred for r in tx.language_id(docs).collect()}
    assert langs[1] == "en" and langs[2] == "es" and langs[3] == "und"
    stats = {r.doc_id: r for r in tx.token_stats(docs).collect()}
    assert stats[1].n_ws_tokens == 11
    assert stats[3].uniq_ratio == 1.0
    q = {r.doc_id: r for r in tx.quality_score(docs).collect()}
    assert 0.0 <= q[3].quality <= q[1].quality <= 1.0
    fp = {r.doc_id: r for r in tx.fingerprints(docs).collect()}
    assert fp[1].fp_md5 != fp[2].fp_md5
    assert len(fp[1].fp_min_shingle) == 32


def test_multimodal_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = mm.documents_as_media(docs)
    assert media.schema["content"].dataType.typeName() == "binary"
    feats = mm.extract_features(media, dim=8).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.features) == 8
        # histogram counts first min(256, n_bytes) bytes
        assert sum(r.features) == min(r.n_bytes, 256)
    frames = mm.frame_sample(media, stride=64, frame=16).collect()
    assert all(len(r.frames) >= 1 for r in frames)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")


def test_repetition_stats(spark):
    rows = [
        # "a b a b a b": 6 tokens, 2 distinct -> dup_tok_frac 2/3;
        # bigrams: "a b" x3, "b a" x2 -> top "a b" count 3;
        # chars 11, coverage 3*3/11
        (1, "a b a b a b"),
        # all-unique tokens -> dup 0; every bigram unique -> tie broken
        # lexicographically ("one two" < "two three" ...)
        (2, "one two three"),
        # single token: partial shingle = the token itself
        (3, "solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in tx.repetition_stats(docs).collect()}
    assert out[1].n_tokens == 6
    assert abs(out[1].dup_tok_frac - round(1 - 2 / 6, 6)) < 1e-9
    assert out[1].top2_gram == "a b" and out[1].top2_count == 3
    assert abs(out[1].top2_char_frac - round(9 / 11, 6)) < 1e-9
    assert out[2].dup_tok_frac == 0.0
    assert out[2].top2_gram == "one two" and out[2].top2_count == 1
    assert out[3].top2_gram == "solo" and out[3].n_tokens == 1


def test_ivf_saved_index_probe(spark, sf_dir, tmp_path):
    """The write-time IVF layout: ivf_save partitions the corpus by
    centroid; ivf_probe must (a) return exactly what in-query ivf_topk
    returns for the same parameters, and (b) plan the list scan with a
    partition filter on cid — the I/O-pruning receipt."""
    # deterministic subset: limit-without-sort re-evaluates per job and
    # can pick different rows across actions (round-4 advice)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    path = str(tmp_path / "ivf_index")
    sim.ivf_save(emb, path, num_centroids=4, iterations=2)
    probed = sim.ivf_probe(spark, path, queries, k=3, nprobe=2)
    in_query = sim.ivf_topk(
        queries, emb, k=3, num_centroids=4, nprobe=2, iterations=2
    )
    assert sorted(map(tuple, probed.collect())) == sorted(
        map(tuple, in_query.collect())
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan


def test_ivf_refresh_appends_without_retrain(spark, sf_dir, tmp_path):
    """ivf_refresh must (a) leave the centroid table byte-identical
    (no retrain), (b) append each new vector exactly once into the
    cid partition its own probe ranks first (same frozen-centroid
    argmax), and (c) leave existing list rows untouched, so a probe
    equals ivf_topk trained on the base corpus but run over the
    grown one is NOT required — instead the refreshed probe must
    return the new vector itself at rank 1 when queried."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    base = emb.filter(F.col("vec_id") < 150)
    batch = emb.filter(F.col("vec_id") >= 150)
    path = str(tmp_path / "ivf_index")
    sim.ivf_save(base, path, num_centroids=4, iterations=2)
    cent_before = sorted(
        map(tuple, spark.read.parquet(f"{path}/centroids").collect())
    )
    before = {
        r.vec_id: r.cid
        for r in spark.read.parquet(f"{path}/lists").collect()
    }
    sim.ivf_refresh(spark, path, batch)
    cent_after = sorted(
        map(tuple, spark.read.parquet(f"{path}/centroids").collect())
    )
    assert cent_after == cent_before  # frozen quantizer
    after = {
        r.vec_id: r.cid
        for r in spark.read.parquet(f"{path}/lists").collect()
    }
    n_base, n_new = base.count(), batch.count()
    assert n_new > 0 and len(after) == n_base + n_new
    # base rows untouched (same assignment), new ids present once
    assert {k: v for k, v in after.items() if k in before} == before
    new_ids = {r.vec_id for r in batch.collect()}
    assert new_ids == set(after) - set(before)
    # a refreshed entry is probe-visible: querying with a new vector
    # finds itself at rank 1 (it lives in its own first-probed list)
    q = batch.select(F.col("vec_id").alias("q_id"), "embedding")
    probe = sim.ivf_probe(spark, path, q, k=1, nprobe=1)
    hits = {(r.q_id, r.vec_id) for r in probe.collect()}
    assert hits == {(i, i) for i in new_ids}


def test_ivfpq_saved_index_probe(spark, sf_dir, tmp_path):
    """The write-time IVF-PQ layout: ivfpq_save stores CODES ONLY
    partitioned by coarse centroid; ivfpq_probe must (a) return
    exactly what in-query ivf_pq_topk returns for the same
    parameters (shared probe/rank helpers make this an identity, but
    pin it against refactors), (b) plan the codes scan with a cid
    partition filter, and (c) store no raw vector column at all."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    path = str(tmp_path / "ivfpq_index")
    sim.ivfpq_save(
        emb, path, num_centroids=4, m=4, pq_centroids=8, iterations=2
    )
    probed = sim.ivfpq_probe(spark, path, queries, k=3, nprobe=2)
    in_query = sim.ivf_pq_topk(
        queries, emb, k=3, num_centroids=4, nprobe=2, m=4,
        pq_centroids=8, iterations=2,
    )
    assert sorted(map(tuple, probed.collect())) == sorted(
        map(tuple, in_query.collect())
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan
    stored = spark.read.parquet(f"{path}/codes")
    assert set(stored.columns) == {"vec_id", "codes", "cid"}


def test_ivfpq_refresh_appends_codes_frozen(spark, sf_dir, tmp_path):
    """ivfpq_refresh must (a) leave centroids AND codebook
    byte-identical (both frozen), (b) append each new id's code
    exactly once, (c) no-op on a retried batch, and (d) make the
    refreshed entries probe-visible."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    base = emb.filter(F.col("vec_id") < 150)
    batch = emb.filter(F.col("vec_id") >= 150)
    path = str(tmp_path / "ivfpq_index")
    sim.ivfpq_save(
        base, path, num_centroids=4, m=4, pq_centroids=8, iterations=2
    )
    cent_before = sorted(
        map(tuple, spark.read.parquet(f"{path}/centroids").collect())
    )
    book_before = sorted(
        map(tuple, spark.read.parquet(f"{path}/codebook").collect())
    )
    sim.ivfpq_refresh(spark, path, batch)
    assert cent_before == sorted(
        map(tuple, spark.read.parquet(f"{path}/centroids").collect())
    )
    assert book_before == sorted(
        map(tuple, spark.read.parquet(f"{path}/codebook").collect())
    )
    codes = spark.read.parquet(f"{path}/codes")
    n_total = codes.count()
    assert n_total == emb.count()
    assert codes.select("vec_id").distinct().count() == n_total
    sim.ivfpq_refresh(spark, path, batch)  # retry: guarded, no-op
    assert spark.read.parquet(f"{path}/codes").count() == n_total
    # refreshed entries are probe-visible in their own first list
    q = batch.select(F.col("vec_id").alias("q_id"), "embedding")
    pr = sim.ivfpq_probe(spark, path, q, k=5, nprobe=4)
    found = {
        r.q_id
        for r in pr.filter(F.col("q_id") == F.col("vec_id")).collect()
    }
    new_ids = {r.vec_id for r in batch.collect()}
    # ADC self-hit is approximate by design; with an exhaustive
    # probe budget (nprobe=4 of 4) the only misses possible are
    # reconstruction ties — require near-total visibility
    assert len(found) >= 0.9 * len(new_ids)


def test_ivf_refresh_retry_is_noop(spark, sf_dir, tmp_path):
    """A RETRIED refresh batch (same ids) must not double-insert
    (r10 ADVICE): the default anti-join guard drops already-present
    ids, reading only the touched cid partitions. assume_new=True
    opts back into the raw append for exactly-once upstreams."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    base = emb.filter(F.col("vec_id") < 150)
    batch = emb.filter(F.col("vec_id") >= 150)
    path = str(tmp_path / "ivf_index")
    sim.ivf_save(base, path, num_centroids=4, iterations=2)
    sim.ivf_refresh(spark, path, batch)
    n1 = spark.read.parquet(f"{path}/lists").count()
    sim.ivf_refresh(spark, path, batch)  # retry: guarded, no-op
    assert spark.read.parquet(f"{path}/lists").count() == n1
    sim.ivf_refresh(spark, path, batch, assume_new=True)  # raw append
    n_new = batch.count()
    assert (
        spark.read.parquet(f"{path}/lists").count() == n1 + n_new
    )


def test_ivf_rebalance_splits_hot_list(spark, sf_dir, tmp_path):
    """ivf_rebalance must split exactly the oversized lists, keep
    every row (ids preserved, none forked), never grow the max list,
    leave cold lists' assignments untouched, and leave a balanced
    index alone (no-op)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    base = emb.filter(F.col("vec_id") < 150)
    # drifted batch: a tight new mode near the smallest-id vector so
    # every batch row crowds into ONE list (the census scenario)
    anchor = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(F.col("embedding").alias("__anchor"))
    )
    batch = (
        emb.filter(F.col("vec_id") >= 150)
        .crossJoin(F.broadcast(anchor))
        .select(
            "vec_id",
            F.zip_with(
                "__anchor",
                "embedding",
                lambda a, b: a.cast("double")
                + F.lit(0.1) * b.cast("double"),
            ).alias("embedding"),
        )
    )
    path = str(tmp_path / "ivf_index")
    sim.ivf_save(base, path, num_centroids=8, iterations=2)
    # a balanced index is a no-op (and left byte-identical)
    assert sim.ivf_rebalance(spark, path, max_skew=2.5) == []
    sim.ivf_refresh(spark, path, batch)
    before = {
        r.vec_id: r.cid
        for r in spark.read.parquet(f"{path}/lists").collect()
    }
    counts_before = {}
    for cid in before.values():
        counts_before[cid] = counts_before.get(cid, 0) + 1
    split = sim.ivf_rebalance(spark, path, max_skew=2.0, iterations=2)
    assert split, "constructed hot list must trigger a split"
    after = {
        r.vec_id: r.cid
        for r in spark.read.parquet(f"{path}/lists").collect()
    }
    assert set(after) == set(before)  # every id kept exactly once
    counts_after = {}
    for cid in after.values():
        counts_after[cid] = counts_after.get(cid, 0) + 1
    assert max(counts_after.values()) <= max(counts_before.values())
    # cold lists byte-untouched: same membership for unsplit cids
    for vid, cid in before.items():
        if cid not in split:
            assert after[vid] == cid
    # split members land on the original cid or its new sibling only
    cent_ids = {
        r.cid for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    assert set(counts_after) <= cent_ids
    for vid, cid in before.items():
        if cid in split:
            assert after[vid] == cid or after[vid] not in counts_before


def test_ivfpq_rebalance_splits_score_preserving(spark, sf_dir, tmp_path):
    """ivfpq_rebalance (r13 VERDICT item 3) must split the hot list
    exactly like the raw rebalance while leaving EVERY code array
    byte-unchanged (score-preserving refinement: only the probe
    quantizer refines; the residual origin is frozen per row in the
    ecent relation, split children inheriting their parent's entry).
    Pins: codebook frozen; every id kept exactly once with its exact
    codes; cold rows keep their placement; moved rows move only
    between a split cid and its sibling; raw co-store and codes agree
    row-for-row on placement; ecent maps split children to the
    parent's pre-split centroid and unsplit lists to their own; and
    the ADC score of every (query, candidate) pair served both before
    and after the rebalance is IDENTICAL — the invariant that makes
    rebalance affect probe routing only, never scoring."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    base = emb.filter(F.col("vec_id") < 150)
    anchor = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(F.col("embedding").alias("__anchor"))
    )
    batch = (
        emb.filter(F.col("vec_id") >= 150)
        .crossJoin(F.broadcast(anchor))
        .select(
            "vec_id",
            F.zip_with(
                "__anchor",
                "embedding",
                lambda a, b: a.cast("double")
                + F.lit(0.1) * b.cast("double"),
            ).alias("embedding"),
        )
    )
    path = str(tmp_path / "ivfpq_index")
    sim.ivfpq_save(
        base, path, num_centroids=8, m=4, pq_centroids=8,
        iterations=2, store_raw=True,
    )
    sim.ivfpq_refresh(spark, path, batch)
    sim.ivfpq_refresh(spark, path, batch)  # retry: no-op both relations
    n_all = emb.count()
    assert spark.read.parquet(f"{path}/codes").count() == n_all
    assert spark.read.parquet(f"{path}/lists").count() == n_all
    book_before = sorted(
        map(tuple, spark.read.parquet(f"{path}/codebook").collect())
    )
    cent_before = {
        r.cid: tuple(r.cvec)
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    before = {
        r.vec_id: (r.cid, tuple(r.codes))
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    queries = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    pre = sim.ivfpq_probe(
        spark, path, queries, k=5, nprobe=2
    ).localCheckpoint(eager=True)
    split = sim.ivfpq_rebalance(spark, path, max_skew=2.0, iterations=2)
    assert split, "constructed hot list must trigger a split"
    assert book_before == sorted(
        map(tuple, spark.read.parquet(f"{path}/codebook").collect())
    )  # frozen codebook
    codes_after = spark.read.parquet(f"{path}/codes")
    after = {
        r.vec_id: (r.cid, tuple(r.codes)) for r in codes_after.collect()
    }
    assert set(after) == set(before)  # every id kept exactly once
    for vid, (_, codes) in before.items():
        assert after[vid][1] == codes  # EVERY code array byte-equal
    new_cids = {c for c, _ in after.values()} - {
        c for c, _ in before.values()
    }
    for vid, (cid, _) in before.items():
        if cid not in split:
            assert after[vid][0] == cid  # cold placement untouched
        else:
            assert after[vid][0] == cid or after[vid][0] in new_cids
    # raw co-store tracks the codes through the rebalance
    lists_after = spark.read.parquet(f"{path}/lists")
    assert (
        lists_after.select("vec_id", "cid")
        .exceptAll(codes_after.select("vec_id", "cid"))
        .count()
        == 0
    )
    # ecent: split children carry the parent's PRE-SPLIT centroid;
    # unsplit lists carry their own (unchanged) centroid
    ecent = {
        r.cid: tuple(r.ecvec)
        for r in spark.read.parquet(f"{path}/ecent").collect()
    }
    assert set(ecent) == set(
        r.cid
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    moved_parent = {}
    for vid, (cid, _) in before.items():
        if cid in split and after[vid][0] in new_cids:
            moved_parent[after[vid][0]] = cid
    for c, e in ecent.items():
        if c in new_cids:
            assert e == cent_before[moved_parent[c]]
        elif c in split:
            assert e == cent_before[c]
        else:
            assert e == cent_before[c]
    # score preservation: every (q, candidate) pair served both
    # before and after carries the IDENTICAL adc_score
    post = sim.ivfpq_probe(spark, path, queries, k=5, nprobe=2)
    both = pre.select(
        "q_id", "vec_id", F.col("adc_score").alias("pre_score")
    ).join(post.select("q_id", "vec_id", "adc_score"), ["q_id", "vec_id"])
    rows = both.collect()
    assert rows, "probe overlap expected on a one-split index"
    for r in rows:
        assert r.pre_score == r.adc_score


def test_ivfpq_rebalance_requires_raw_costore(spark, sf_dir, tmp_path):
    """A codes-only index (store_raw=False) cannot re-encode residuals
    exactly — rebalance must refuse with the retrain-as-rebalance
    guidance, never silently decode-and-re-encode."""
    import pytest

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    path = str(tmp_path / "ivfpq_codes_only")
    sim.ivfpq_save(
        emb, path, num_centroids=4, m=4, pq_centroids=8, iterations=1
    )
    with pytest.raises(ValueError, match="store_raw"):
        sim.ivfpq_rebalance(spark, path)


def test_minhash_incremental(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox jumps over the lazy dog"),  # corpus dup
            (5, "completely different content with no overlap here"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # dup of 1,3
            (12, "unrelated brand new text that matches nothing else"),
            (14, "unrelated brand new text that matches nothing else"),  # dup of 12
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.new_id, r.match_id)
        for r in dd.minhash_incremental_candidates(corpus, batch).collect()
    }
    # batch doc matched against BOTH corpus copies
    assert (10, 1) in pairs and (10, 3) in pairs
    # within-batch dup reported once, earlier id as the match
    assert (14, 12) in pairs and (12, 14) not in pairs
    # corpus x corpus never reported
    assert not any(m in (1, 3, 5) and n in (1, 3, 5) for n, m in pairs)
    assert all(n in (10, 12, 14) for n, _ in pairs)


def test_unigram_logprob(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in tx.unigram_logprob(docs).collect()}
    # corpus: a=2, b=2, c=1, total=5
    exp1 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert out[1].n_tokens == 3 and out[2].n_tokens == 2
    assert abs(out[1].mean_logprob - round(exp1, 6)) < 1e-6
    assert abs(out[2].mean_logprob - round(exp2, 6)) < 1e-6
    # rare-token doc scores lower than common-token doc
    assert out[2].mean_logprob < out[1].mean_logprob


def test_toy_ppm_codec_roundtrip():
    """encode_ppm/decode_ppm invert each other; padding fills the last
    pixel row with zero bytes."""
    payload = bytes(range(100))
    enc = mm.encode_ppm(payload, width=16)
    assert enc.startswith(b"P6\n16 3\n255\n")  # ceil(100/48) = 3 rows
    img = mm.decode_ppm(enc)
    assert (img.width, img.height) == (16, 3)
    assert len(img.pixels) == 3 * 48
    assert img.pixels[:100] == payload
    assert img.pixels[100:] == b"\x00" * 44
    # decode_image routes P6 through the toy codec without PIL
    img2 = mm.decode_image(enc)
    assert img2.pixels == img.pixels
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P5\n1 1\n255\n\x00")


def test_decoded_features_from_real_pixels(spark):
    """extract_decoded_features parses the header (width/height) and
    histograms the DECODED pixels — hand-checked on a tiny doc."""
    docs = spark.createDataFrame(
        [(1, "abc", "t")], "doc_id long, text string, source string"
    )
    media = mm.documents_as_ppm_media(docs, width=16)
    row = mm.extract_decoded_features(media, dim=8).collect()[0]
    assert (row.width, row.height) == (16, 1)
    # pixels = 'a','b','c' + 45 zero pad bytes
    # ascii a=97 (%8=1), b=98 (%8=2), c=99 (%8=3)
    expect = [45.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0]
    assert [float(x) for x in row.features] == expect


def test_semantic_dedup_members(spark):
    """SemDeDup decisions: transitive chain A~B~C forms ONE cluster,
    exactly the min id is kept, singletons never appear; the LSH-
    bucketed pair source feeds the same closure."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    out = {r.id: r for r in dd.semantic_dedup_members(pairs).collect()}
    assert set(out) == {1, 2, 3, 7, 9}  # 5 is absent: singleton
    assert all(r.cluster_rep == 1 for r in map(out.get, (1, 2, 3)))
    assert all(r.cluster_rep == 7 for r in map(out.get, (7, 9)))
    assert {i for i, r in out.items() if r.keep} == {1, 7}
    # identical vectors collide in any LSH bucketing -> same decisions
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    lsh_pairs = sim.embedding_near_duplicates(
        emb, threshold=0.99, num_planes=4, dim=2
    )
    out2 = {r.id: r for r in dd.semantic_dedup_members(lsh_pairs).collect()}
    assert set(out2) == {1, 2}
    assert out2[1].keep and not out2[2].keep


def test_semantic_dedup_lsh_vs_exact(spark, sf_dir):
    """Exact-anchor for the ns_semantic_dedup LSH catalog path: on the
    fixture embeddings, the banded-LSH pair set is (a) SOUND — a
    subset of the exact all-pairs cosine>=tau relation — and (b) high
    recall (>=50% of exact pairs; measured 0.9+ at 16 bands x 4 bits),
    and the member decisions from LSH pairs agree with the exact
    member decisions on every id the LSH path clusters."""
    from gsuites_gcp_graphdb_spark.functions.vectors import cosine_similarity
    from gsuites_gcp_graphdb_spark.sources.fixtures import load_table

    tau = 0.4
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(cosine_similarity(F.col("va"), F.col("vb")) >= tau)
        .select("id_a", "id_b")
    )
    exact_set = {(r.id_a, r.id_b) for r in exact.collect()}
    lsh = sim.embedding_near_duplicates(emb, threshold=tau)
    lsh_set = {(r.id_a, r.id_b) for r in lsh.select("id_a", "id_b").collect()}
    assert lsh_set <= exact_set  # sound: LSH never invents a pair
    assert len(lsh_set) >= 0.5 * len(exact_set)  # banded recall holds
    exact_m = {
        r.id: (r.cluster_rep, r.keep)
        for r in dd.semantic_dedup_members(exact).collect()
    }
    lsh_m = dd.semantic_dedup_members(lsh).collect()
    # every LSH-clustered id is exact-clustered too (subset pairs ->
    # subset membership); reps can differ only by cluster splits, and
    # a kept exact rep is never dropped by the coarser LSH view
    assert all(r.id in exact_m for r in lsh_m)
    assert all(
        r.keep for r in lsh_m if r.id == exact_m[r.id][0]
    )


def test_pii_scrub(spark):
    rows = [
        (1, "reach me at bob.smith+x@corp.example.org or 192.168.1.200"),
        (2, "call +14155550123 twice: +4915112345678"),
        (3, "no pii here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in tx.pii_scrub(docs).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (1, 1, 0)
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 0, 2)
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 0)
    # redaction hash is md5 of the placeholder-substituted text
    import hashlib

    exp1 = "reach me at <EMAIL> or <IPV4>"
    assert out[1].clean_hash == hashlib.md5(exp1.encode()).hexdigest()
    assert out[1].n_chars_clean == len(exp1)
    # clean docs hash to their own text unchanged
    assert out[3].clean_hash == hashlib.md5(rows[2][1].encode()).hexdigest()


def test_normalize_text(spark):
    rows = [
        (1, "  Hello,   WORLD!! 42 "),
        (2, "already normal text"),
        (3, "!!!"),  # collapses to empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in tx.normalize_text(docs).collect()}
    import hashlib

    assert out[1].norm_hash == hashlib.md5(b"hello world 42").hexdigest()
    assert out[1].n_tokens_norm == 3 and out[1].changed
    assert out[2].norm_hash == hashlib.md5(b"already normal text").hexdigest()
    assert out[2].n_tokens_norm == 3 and not out[2].changed
    assert out[3].n_tokens_norm == 0 and out[3].changed
    assert out[3].norm_hash == hashlib.md5(b"").hexdigest()


def test_count_min_sketch(spark):
    from gsuites_gcp_graphdb_spark.operators import sketches as sk

    rows = [(t,) for t in ["a"] * 50 + ["b"] * 10 + ["c"] * 3 + ["d"]]
    df = spark.createDataFrame(rows, "k string")
    # roomy sketch: no collisions expected, estimates exact
    sketch = sk.cms_build(df, "k", depth=4, width=256)
    cand = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "k string")
    est = {
        r.k: r.cms_est
        for r in sk.cms_estimate(sketch, cand, "k", depth=4, width=256).collect()
    }
    assert est == {"a": 50, "b": 10, "c": 3, "d": 1}
    # cramped sketch (width=2): collisions force over-counts, but the
    # CMS lower bound est >= true must still hold for every key
    tight = sk.cms_build(df, "k", depth=2, width=2)
    est2 = {
        r.k: r.cms_est
        for r in sk.cms_estimate(tight, cand, "k", depth=2, width=2).collect()
    }
    truth = {"a": 50, "b": 10, "c": 3, "d": 1}
    assert all(est2[k] >= truth[k] for k in truth)
    # sketch state is bounded by depth*width regardless of input size
    assert tight.count() <= 4


def test_zorder_layout_prunes_partitions(spark, tmp_path):
    from gsuites_gcp_graphdb_spark.operators import layout as lo

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    path = str(tmp_path / "zordered")
    lo.write_zordered(df, path, "a", "b", bits=16, prefix_bits=4)
    # box query equals the brute-force filter exactly
    got = lo.read_zbox(spark, path, "a", "b", 10, 20, 30, 40)
    want = df.filter(F.col("a").between(10, 20) & F.col("b").between(30, 40))
    assert got.count() == want.count()
    assert {(r.a, r.b) for r in got.collect()} == {
        (r.a, r.b) for r in want.collect()
    }
    # and it PRUNES: the zp IN (...) predicate reaches the scan as a
    # partition filter covering a strict subset of the 16 cells
    cells = lo.zbox_prefixes(10, 20, 30, 40, bits=16, prefix_bits=4)
    assert 0 < len(cells) < 16
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zp" in plan


def test_zvalue_matches_python_morton(spark):
    from gsuites_gcp_graphdb_spark.operators import layout as lo

    def pyz(a, b, bits=16):
        v = 0
        for i in range(bits):
            v |= ((a >> i) & 1) << (2 * i)
            v |= ((b >> i) & 1) << (2 * i + 1)
        return v

    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1024)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", lo.zvalue(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    assert got == {(a, b): pyz(a, b) for a, b in rows}


def test_hilbert_matches_reference(spark):
    """with_hilbert_value must equal the classic xy2d rotation loop
    EXHAUSTIVELY on a 16x16 grid (bits=4) — the state-machine tables
    were derived from it, this re-proves the derivation in CI."""
    from gsuites_gcp_graphdb_spark.operators import layout as lo

    def classic_xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = n - 1 - x
                    y = n - 1 - y
                x, y = y, x
            s //= 2
        return d

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.h
        for r in lo.with_hilbert_value(df, "a", "b", bits=4).collect()
    }
    assert got == {(x, y): classic_xy2d(16, x, y) for x, y in rows}


def test_hilbert_adjacency_beats_zorder(spark):
    """The locality theorem the layout exists for: consecutive
    Hilbert points are ALWAYS Manhattan-distance 1, while z-order's
    worst consecutive jump on the same 32x32 grid is the full side
    length — the quadrant-boundary artifact Hilbert removes."""
    from gsuites_gcp_graphdb_spark.operators import layout as lo

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    h = {
        r.h: (r.a, r.b)
        for r in lo.with_hilbert_value(df, "a", "b", bits=5).collect()
    }
    assert len(h) == 1024  # bijection onto 0..1023
    assert all(
        abs(h[d][0] - h[d + 1][0]) + abs(h[d][1] - h[d + 1][1]) == 1
        for d in range(1023)
    )
    z = {
        r.z: (r.a, r.b)
        for r in df.select(
            "a", "b", lo.zvalue(F.col("a"), F.col("b"), bits=5).alias("z")
        ).collect()
    }
    zmax = max(
        abs(z[d][0] - z[d + 1][0]) + abs(z[d][1] - z[d + 1][1])
        for d in range(1023)
    )
    assert zmax == 32


def test_hilbert_layout_prunes_partitions(spark, tmp_path):
    """write_hilbert/read_hbox round-trip: exact box results + hp
    partition pruning in-plan (the zorder test's twin)."""
    from gsuites_gcp_graphdb_spark.operators import layout as lo

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
    )
    path = str(tmp_path / "hilberted")
    lo.write_hilbert(df, path, "a", "b", bits=16, prefix_bits=4)
    got = lo.read_hbox(spark, path, "a", "b", 10, 20, 30, 40)
    want = df.filter(
        F.col("a").between(10, 20) & F.col("b").between(30, 40)
    )
    assert got.count() == want.count()
    assert {(r.a, r.b) for r in got.collect()} == {
        (r.a, r.b) for r in want.collect()
    }
    cells = lo.hbox_prefixes(10, 20, 30, 40, bits=16, prefix_bits=4)
    assert 0 < len(cells) < 16
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "hp" in plan


def test_tfidf_top_term(spark):
    import math

    rows = [
        (1, "apple apple banana"),   # apple tf=2/3, banana 1/3
        (2, "banana cherry cherry"),
        (3, "apple banana cherry"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in tx.tfidf_top_term(docs).collect()}
    # df: apple 2, banana 3, cherry 2; N=3 -> idf(banana)=ln(1)=0, so
    # banana can never win; doc1 -> apple, doc2 -> cherry
    assert out[1].top_term == "apple"
    assert out[2].top_term == "cherry"
    assert abs(out[1].top_tfidf - round((2 / 3) * math.log(3 / 2), 6)) < 1e-9
    # doc3: apple and cherry tie exactly (1/3 * ln(1.5) each) -> the
    # struct-argmax breaks toward the lexicographically smaller term
    assert out[3].top_term == "apple"


def test_keyness_hand_computed(spark):
    # s1: x x y   s2: y y z  -> N=6, n_s=3 each; k_x=2, k_y=3, k_z=1
    docs = spark.createDataFrame(
        [(1, "x x y", "s1"), (2, "y y z", "s2")],
        "doc_id long, text string, source string",
    )
    out = tx.keyness(docs, min_count=1, topk=2).collect()
    got = {(r.source, r.term): r for r in out}
    # (s1, x): delta = 2*6 - 3*2 = 6 > 0
    #   chi2 = 6*36 / (3*3*2*4) = 3.0
    assert got[("s1", "x")].chi2 == 3.0
    assert got[("s1", "x")].term_count == 2
    assert got[("s1", "x")].corpus_count == 2
    # (s1, y): delta = 1*6 - 3*3 = -3 -> under-represented, excluded
    assert ("s1", "y") not in got
    # (s2, z): chi2 = 6*9 / (3*3*1*5) = 1.2
    assert got[("s2", "z")].chi2 == 1.2
    # (s2, y): chi2 = 6*9 / (3*3*3*3) = 0.666667
    assert got[("s2", "y")].chi2 == 0.666667
    assert len(out) == 3


def test_community_quality_invariants(spark, sf_dir):
    from gsuites_gcp_graphdb_spark.plans.graph_queries import (
        community_quality,
    )

    rows = community_quality(spark, sf_dir).collect()
    assert rows
    vol2 = sum(r.volume for r in rows)
    assert vol2 % 2 == 0  # every vertex counted once -> sum deg = 2m
    m = vol2 // 2
    assert sum(r.intra_edges for r in rows) <= m
    # Q = sum of shares is bounded for any partition
    assert -0.5 <= sum(r.modularity_share for r in rows) <= 1.0
    for r in rows:
        assert r.cut_edges == r.volume - 2 * r.intra_edges
        assert r.cut_edges >= 0
        if r.conductance is not None:
            assert 0.0 <= r.conductance <= 1.0


def test_events_funnel_stages(spark):
    from datetime import datetime as dt

    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import events_funnel

    def t(h, m=0):
        return dt(2024, 1, 1, h, m)

    rows = [
        # u1: full funnel
        (1, t(1), 1, "signup", 0.0, "{}"),
        (2, t(1, 30), 1, "click", 0.0, "{}"),
        (3, t(2), 1, "purchase", 0.0, "{}"),
        # u2: click too late (>1h after signup) -> stage 1
        (4, t(1), 2, "signup", 0.0, "{}"),
        (5, t(3), 2, "click", 0.0, "{}"),
        # u3: signup+click, purchase missing -> stage 2
        (6, t(1), 3, "signup", 0.0, "{}"),
        (7, t(1, 10), 3, "click", 0.0, "{}"),
        # u4: click BEFORE signup doesn't count -> stage 1
        (8, t(2), 4, "signup", 0.0, "{}"),
        (9, t(1), 4, "click", 0.0, "{}"),
        # u5: no signup -> excluded entirely
        (10, t(1), 5, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="funnel_test_")
    ev.write.parquet(os.path.join(d, "events.parquet"), mode="overwrite")
    try:
        out = {r.user_id: r.stage for r in events_funnel(spark, d).collect()}
        assert out == {1: 3, 2: 1, 3: 2, 4: 1}
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_pq_adc_exact_on_clustered_data(spark):
    """Vectors that sit exactly ON their subspace centroids quantize
    losslessly, so ADC scores equal exact dot products and the PQ
    top-k equals brute force."""
    import itertools

    # 8-dim vectors built from 2 subspaces x 2 prototype halves ->
    # every vector is exactly representable by the trained codebook
    halves = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 2.0]]
    rows = [
        (i, a + b)
        for i, (a, b) in enumerate(itertools.product(halves, halves))
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    book = sim.pq_train(emb, m=2, num_centroids=2, iterations=3)
    codes = sim.pq_encode(emb, book, m=2)
    q = emb.select(F.col("vec_id").alias("q_id"), "embedding").limit(1)
    adc = sim.pq_adc_topk(q, codes, book, k=4, m=2).collect()
    qvec = {r.q_id: r for r in q.collect()}
    [qrow] = qvec.values()
    import numpy as np

    truth = {
        i: float(np.dot(qrow.embedding, v)) for i, v in rows
    }
    for r in adc:
        assert abs(r.adc_score - round(truth[r.vec_id], 6)) < 1e-9
    # rank-1 is the query itself (max self dot on this geometry)
    assert adc[0].rank == 1


def test_ivf_pq_topk_invariants(spark, sf_dir):
    """Composed IVF-PQ (r10): per-query result shape (contiguous
    ranks, non-increasing scores), self at rank 1 (cosine probing
    visits the query's own list; its residual code reconstructs
    closest to itself), and candidate coverage monotone in nprobe —
    probing every list can only grow the candidate set."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    n_q = q.count()
    out = sim.ivf_pq_topk(
        q, emb, k=5, num_centroids=4, nprobe=2, m=4, pq_centroids=8
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r.q_id, []).append(r)
    assert len(per) == n_q
    for rows in per.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
        assert rows[0].q_id == rows[0].vec_id  # self at rank 1
        scores = [r.adc_score for r in rows]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
    full = sim.ivf_pq_topk(
        q, emb, k=5, num_centroids=4, nprobe=4, m=4, pq_centroids=8
    )
    # same scoring, more lists probed: the narrow run's hit set can
    # only be a subset per query of the full run's CANDIDATES, so
    # total hits vs any fixed reference are monotone; cheap proxy:
    # row counts never shrink when nprobe grows
    assert full.count() >= len(out)


def test_pq_codes_shape(spark):
    rows = [(i, [float(i + j) for j in range(8)]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    book = sim.pq_train(emb, m=4, num_centroids=4, iterations=1)
    # codebook bounded: m * k rows max
    assert book.count() <= 16
    codes = sim.pq_encode(emb, book, m=4)
    got = codes.collect()
    assert len(got) == 10
    assert all(len(r.codes) == 4 for r in got)
    assert all(0 <= c < 4 for r in got for c in r.codes)


def test_pq_encode_fast_matches_reference(spark, sf_dir):
    """pq_encode_fast (map-only Arrow kernel) must produce EXACTLY
    the codes of the HOF/shuffle reference spelling — same argmin,
    same lowest-cid tie-break — on real fixture vectors (the r11 x64
    A/B matched 2000/2000; this pins it per-commit at sf0.001)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 300
    )
    book = sim.pq_train(emb, m=4, num_centroids=8, iterations=2)
    ref = {r.id: tuple(r.codes) for r in sim.pq_encode(emb, book, m=4).collect()}
    fast = {
        r.id: tuple(r.codes)
        for r in sim.pq_encode_fast(emb, book, m=4).collect()
    }
    assert fast == ref


def test_pq_train_sampled(spark, sf_dir):
    """sample_mod=1 is the identity (trains on everything); a real
    sample trains on exactly the md5-hash16 subset and still yields
    a full (sub, cid) codebook usable to encode the whole corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 300
    )
    full = sorted(map(tuple, sim.pq_train(emb, m=4, num_centroids=8).collect()))
    mod1 = sorted(
        map(tuple, sim.pq_train(emb, m=4, num_centroids=8, sample_mod=1).collect())
    )
    assert mod1 == full
    book = sim.pq_train(emb, m=4, num_centroids=8, sample_mod=4)
    assert book.count() <= 4 * 8
    codes = sim.pq_encode_fast(emb, book, m=4)
    assert codes.count() == emb.count()


def test_substring_dup_stats(docs):
    """Window-level exact dedup: docs 1 and 4 are verbatim-identical
    (every window duplicated); doc 3 shares no window with anything;
    short docs degrade to one partial window, never zero-divide."""
    out = {r.doc_id: r for r in dd.substring_dup_stats(docs, k=4).collect()}
    # 9-token docs at k=4 -> 6 windows
    assert out[1].n_windows == 6 and out[4].n_windows == 6
    assert out[1].n_dup_windows == 6 and out[1].dup_frac == 1.0
    assert out[3].n_dup_windows == 0 and out[3].dup_frac == 0.0
    # docs 1/2 share the first 5 windows ("...lazy"), differ on the last
    assert out[2].n_dup_windows == 5
    assert out[5].n_windows == 1  # partial window, still counted
    # fast path ranks identically (hash family swap only)
    fast = {
        r.doc_id: r for r in dd.substring_dup_stats(docs, k=4, fast=True).collect()
    }
    assert all(fast[i].n_dup_windows == out[i].n_dup_windows for i in out)


def test_dsir_importance(spark):
    """Target-slice tokens score positive, off-target negative, mixed
    in between — and the hashed-feature path preserves the ordering
    when buckets don't collide semantics away."""
    rows = [
        (1, "alpha alpha beta", "en"),
        (2, "gamma delta gamma", "xx"),
        (3, "alpha gamma", "xx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.doc_id: r.dsir_logratio
        for r in tx.dsir_importance(df, F.col("lang") == "en").collect()
    }
    assert out[1] > 0 > out[2]
    assert out[2] < out[3] < out[1]
    hashed = {
        r.doc_id: r.dsir_logratio
        for r in tx.dsir_importance(
            df, F.col("lang") == "en", n_buckets=1 << 20
        ).collect()
    }
    assert hashed[1] > hashed[2]


def test_audit_metrics_dirty_data(spark):
    """Every check fires on deliberately dirty rows; a NULL invariant
    input counts as a violation (silence is not compliance)."""
    from gsuites_gcp_graphdb_spark.operators import audit as au

    rows = [
        (1, "abc", 3),
        (1, None, 5),      # dup id, null text, mismatched len (null-eval)
        (2, "xy", 9),      # mismatched len
        (None, "ok", 2),   # null id: not a dup (count skips nulls)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = {
        r.check: r.value
        for r in au.audit_metrics(
            df,
            "t",
            nulls=("text",),
            unique=("doc_id",),
            invariants=(("len_ok", F.col("n_chars") == F.length("text")),),
        ).collect()
    }
    assert out == {
        "t.rows": 4,
        "t.text_nulls": 1,
        "t.doc_id_dups": 1,
        "t.len_ok": 2,  # len-mismatch row false + null-text row null-evals
    }
    child = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    parent = spark.createDataFrame([(1,)], "p long")
    fk = au.fk_violations(child, parent, "k", "p", "t.k_orphans").collect()
    assert fk[0].check == "t.k_orphans" and fk[0].value == 2
    # EMPTY table: every metric must be 0, never NULL — a NULL
    # violation count silently passes a `value > 0` gate, which is
    # exactly what an audit of an empty snapshot must not do.
    empty = df.limit(0)
    out0 = {
        r.check: r.value
        for r in au.audit_metrics(
            empty,
            "t",
            nulls=("text",),
            unique=("doc_id",),
            invariants=(("len_ok", F.col("n_chars") == F.length("text")),),
        ).collect()
    }
    assert out0 == {
        "t.rows": 0,
        "t.text_nulls": 0,
        "t.doc_id_dups": 0,
        "t.len_ok": 0,
    }


def test_incremental_merge_equals_recompute(spark):
    """IVM invariant: any split of the input into batches, merged in
    any grouping/order, equals the single-pass aggregate exactly
    (integer micro-unit sums make this bit-exact, not approximate)."""
    import datetime as dt

    from gsuites_gcp_graphdb_spark.operators import incremental as inc

    rows = [
        ("a", dt.date(2026, 1, 1 + i % 3), 0.1 * i + 0.05) for i in range(30)
    ] + [("b", dt.date(2026, 1, 2), -1.75)]
    df = spark.createDataFrame(rows, "event_type string, day date, value double")
    keys = ["event_type", "day"]
    full = {
        tuple(r[k] for k in keys): (
            r.n_events, r.sum_value_micro, r.min_value_micro, r.max_value_micro
        )
        for r in inc.partial_value_aggs(df, keys).collect()
    }
    # three uneven batches, merged pairwise in a skewed order
    b1 = inc.partial_value_aggs(df.filter("value < 0.5"), keys)
    b2 = inc.partial_value_aggs(
        df.filter("value >= 0.5 and value < 2.0"), keys
    )
    b3 = inc.partial_value_aggs(df.filter("value >= 2.0"), keys)
    merged = inc.merge_partials(inc.merge_partials(b3, b1, keys), b2, keys)
    got = {
        tuple(r[k] for k in keys): (
            r.n_events, r.sum_value_micro, r.min_value_micro, r.max_value_micro
        )
        for r in merged.collect()
    }
    assert got == full


def test_trend_slope_matches_numpy(spark):
    """The exact-integer closed form equals a float OLS fit to ~1e-9:
    the decimal sums change the arithmetic path, not the estimator."""
    import datetime as dt

    import numpy as np

    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import (
        events_trend_slope,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i * 60), 100, "a", 2.5 + 0.125 * i, "{}")
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile, os
    d = tempfile.mkdtemp(prefix="trend_fixture_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = events_trend_slope(spark, d).collect()[0]
    x = np.array([i * 60.0 for i in range(50)])       # whole seconds
    y = np.floor((2.5 + 0.125 * np.arange(50)) * 1e6) # micro-units
    expect = np.polyfit(x, y, 1)[0]
    assert out.n_events == 50
    assert abs(out.slope - round(expect, 6)) <= 1e-6
    import shutil
    shutil.rmtree(d, ignore_errors=True)


def test_chunk_documents_coverage(spark):
    """Chunk invariants: every token covered, overlap = chunk-stride,
    short docs yield exactly one chunk, boundary (n == chunk) yields
    one chunk and (n == chunk+1) two."""
    from gsuites_gcp_graphdb_spark.operators.text import chunk_documents

    def doc(i, n):
        return (i, " ".join(f"t{j}" for j in range(n)))

    df = spark.createDataFrame(
        [doc(1, 10), doc(2, 64), doc(3, 65), doc(4, 200)],
        "doc_id long, text string",
    )
    out = {}
    for r in chunk_documents(df, chunk_tokens=64, stride=48).collect():
        out.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens))
    for v in out.values():
        v.sort()
    assert out[1] == [(0, 10)]
    assert out[2] == [(0, 64)]
    assert out[3] == [(0, 64), (1, 17)]
    # n=200: starts 0,48,96,144 -> last chunk 200-144=56 tokens
    assert out[4] == [(0, 64), (1, 64), (2, 64), (3, 56)]
    # coverage: stride < chunk means consecutive starts overlap by 16
    starts = [idx * 48 for idx, _ in out[4]]
    assert all(s + 64 > starts[i + 1] for i, s in enumerate(starts[:-1]))


def test_scalar_quantize_bounds(spark):
    """SQ invariants: constant vectors quantize losslessly to code 0;
    reconstruction error is bounded by one quantization step per
    dimension; identical vectors share a code hash."""
    rows = [
        (1, [0.5, 0.5, 0.5, 0.5]),
        (2, [0.0, 1.0, 2.0, 3.0]),
        (3, [0.0, 1.0, 2.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in sim.scalar_quantize(df).collect()}
    assert out[1].sum_abs_err_nano == 0
    assert out[2].code_hash == out[3].code_hash
    # step = (3-0)/255; per-dim error < step -> sum < 4*step (nano)
    step_nano = (3.0 / 255) * 1e9
    assert out[2].sum_abs_err_nano < 4 * step_nano
    assert out[2].n_dims == 4


def test_winnow_fingerprints(spark):
    """The winnowing guarantee (Schleimer et al. 2003): two documents
    sharing a run of >= w+k-1 tokens share at least one fingerprint;
    disjoint docs share none; a doc with fewer than w k-grams yields
    no fingerprint at all."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "intro one two " + shared + " tail xx yy"),
        (2, shared + " completely other ending words here now"),
        (3, "totally disjoint text with unique content everywhere"),
        (4, "tiny doc"),  # 2 tokens -> 1 partial k-gram < w windows
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in tx.winnow_fingerprints(docs).collect()}
    assert out[1].n_shared_fp >= 1 and out[2].n_shared_fp >= 1
    assert out[3].n_shared_fp == 0
    assert out[4].n_fingerprints == 0 and out[4].n_shared_fp == 0
    # density: winnowing keeps far fewer than all k-grams
    assert 0 < out[1].n_fingerprints < out[1].n_kgrams


def test_ngram_containment(spark):
    """A doc fully inside a bigger one scores containment 1.0 in the
    small->big direction and < 1 the other way — the asymmetric
    subsumption case symmetric Jaccard misses."""
    small = "alpha beta gamma delta epsilon"
    big = small + " zeta eta theta iota kappa lambda mu nu xi"
    rows = [(1, small), (2, big), (3, "unrelated words only here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id, r.container_id): r.containment
        for r in dd.ngram_containment_pairs(
            docs, threshold=0.1
        ).collect()
    }
    assert out[(1, 2)] == 1.0  # small entirely inside big
    assert 0 < out[(2, 1)] < 0.5  # big only partially covered
    assert all(3 not in k for k in out)
    # jaccard at the same pair is well below the containment signal
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert jac[(1, 2)] < out[(1, 2)]
    dd.release_scratch()


def test_dimension_stats(spark):
    """Exact per-dimension stats on literal vectors: mean/std match
    hand computation; a constant dimension reports std 0 (dead-dim
    audit case)."""
    rows = [(1, [1.0, 2.0, 5.0]), (2, [3.0, 2.0, 1.0]), (3, [5.0, 2.0, 3.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.dim: r for r in sim.dimension_stats(emb).collect()}
    assert out[1].mean == 3.0 and out[2].mean == 2.0 and out[3].mean == 3.0
    assert out[2].std == 0.0  # constant dimension
    # population std of (1,3,5) = sqrt(8/3)
    import math

    assert abs(out[1].std - round(math.sqrt(8.0 / 3.0), 6)) < 1e-9
    assert all(r.n == 3 for r in out.values())


def test_hamming_topk(spark):
    """Binary-sketch k-NN: identical vectors agree on every bit (self
    at agreement m), opposite vectors at ~0; ordering is agreement
    desc with id tie-break, cos_sim column is the EXACT cosine."""
    from gsuites_gcp_graphdb_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [-1.0, 0.0]),
         (4, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter("vec_id = 1").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = sim.hamming_topk(q, emb, k=4, sketch_planes=63, dim=2).collect()
    assert [r.vec_id for r in out][:2] == [1, 2]  # self, then near-dup
    byid = {r.vec_id: r for r in out}
    assert byid[1].agreement == 63 and byid[1].cos_sim == 1.0
    assert byid[3].agreement <= 5  # antipode disagrees on ~all bits
    assert abs(byid[3].cos_sim - (-1.0)) < 1e-9


def test_near_dup_sparse_partitions(spark):
    """The Arrow sign-sketch kernel must survive empty partition
    batches (64 shuffle partitions, 2 rows) and still find the
    identical pair — pins the empty-Series branch of
    _packed_sketch_udf/_pair_cosine_udf."""
    from gsuites_gcp_graphdb_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 8), (3, [-1.0] * 8)],
        "vec_id long, embedding array<float>",
    ).repartition(64)
    got = sim.embedding_near_duplicates(
        emb, threshold=0.9, dim=8
    ).collect()
    assert [(r.id_a, r.id_b, r.cos_sim) for r in got] == [(1, 2, 1.0)]


def test_bpe_pairs_hand_computed(spark):
    """Adjacent char-pair counts on a tiny corpus match the by-hand
    answer; single-char tokens contribute nothing."""
    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import (
        text_bpe_pairs,
    )
    import os
    import tempfile

    docs = spark.createDataFrame(
        [(1, "abab x", "en", "s", 6), (2, "bab", "en", "s", 3)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    d = tempfile.mkdtemp(prefix="bpe_test_")
    docs.coalesce(1).write.parquet(
        os.path.join(d, "documents.parquet"), mode="overwrite"
    )
    out = {(r.pair): (r.rank, r.n) for r in text_bpe_pairs(spark, d).collect()}
    # 'abab' -> ab, ba, ab ; 'bab' -> ba, ab ; 'x' -> nothing
    assert out["ab"] == (1, 3)
    assert out["ba"] == (2, 2)
    assert len(out) == 2


def test_source_overlap_matrix(spark):
    """Two sources sharing a >= w+k-1 token run must share at least
    one winnowed fingerprint (the winnowing guarantee); a disjoint
    source appears in no pair row; coef is containment-normalized."""
    shared = "a b c d e f g h i j k l"  # 12 tokens >> w+k-1 = 8
    docs = spark.createDataFrame(
        [
            (1, shared + " tail one more words here", "s1"),
            (2, "lead tokens first " + shared, "s2"),
            (3, "nothing common here at all with anyone else ever", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    rows = tx.source_overlap_matrix(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b) == ("s1", "s2")
    assert r.n_shared_fp >= 1
    assert 0 < r.overlap_coef <= 1.0


def test_bpe_train_greedy_merges(spark):
    """Hand-computed merge sequence, including the equal-token run
    case: 'aaaa' merges greedily left-to-right ([aa, aa], pair count
    counts overlapping occurrences like real BPE trainers), and the
    loop stops early when no adjacent pairs remain."""
    docs = spark.createDataFrame(
        [(1, "aa aa b ab")], "doc_id long, text string"
    )
    rows = [tuple(r) for r in tx.bpe_train(docs, rounds=8).collect()]
    assert rows == [(1, "a", "a", "aa", 2), (2, "a", "b", "ab", 1)]

    docs2 = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    rows2 = [tuple(r) for r in tx.bpe_train(docs2, rounds=2).collect()]
    # round 1: (a,a) appears 3x (overlapping census), merges to
    # [aa, aa]; round 2: (aa,aa) once.
    assert rows2 == [(1, "a", "a", "aa", 3), (2, "aa", "aa", "aaaa", 1)]


def test_bpe_token_census_applies_merges(spark):
    """After training on 'aa aa b ab' (merges: a+a, a+b), the applied
    census weights final tokens by word frequency: 'aa' appears in 2
    words of freq (2,1)... hand-check the full table."""
    docs = spark.createDataFrame(
        [(1, "aa aa b ab")], "doc_id long, text string"
    )
    rows = [
        (r.rank, r.tok, r.n)
        for r in tx.bpe_token_census(docs, rounds=8, k=20).collect()
    ]
    # words: aa(freq 2) -> [aa]; b(1) -> [b]; ab(1) -> [ab]
    assert rows == [(1, "aa", 2), (2, "ab", 1), (3, "b", 1)]


def test_ngram_prefix_join_lossless(spark):
    """The AllPairs prefix filter must produce EXACTLY the baseline
    inverted-index pair set (prefix lemma: lossless at t=1/2),
    including asymmetric-size pairs where the per-set prefix bound
    is the subtle case."""
    from gsuites_gcp_graphdb_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = sorted(
        tuple(r)
        for r in dd.ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, max_df=5
        ).collect()
    )
    pref = sorted(
        tuple(r)
        for r in dd.ngram_jaccard_pairs_prefix(
            docs, n=3, threshold_num=1, threshold_den=2, max_df=5
        ).collect()
    )
    assert len(base) > 0
    assert pref == base


def test_average_hash_perceptual_property(spark):
    """aHash must be identical for identical pixels, STABLE under a
    small perturbation (one byte nudged within a block), and differ
    for structurally different images."""
    from gsuites_gcp_graphdb_spark.operators.multimodal import (
        DecodedImage,
        average_hash,
        encode_ppm,
        decode_ppm,
    )

    base = bytes(range(256)) * 6
    img1 = decode_ppm(encode_ppm(base, width=16))
    img2 = decode_ppm(encode_ppm(base, width=16))
    assert average_hash(img1) == average_hash(img2)

    # nudge one byte by 1: block means barely move, hash stable
    near = bytearray(base)
    near[40] = (near[40] + 1) % 256
    img3 = decode_ppm(encode_ppm(bytes(near), width=16))
    assert average_hash(img3) == average_hash(img1)

    # structurally different content: different hash
    other = bytes(reversed(base))
    img4 = decode_ppm(encode_ppm(other, width=16))
    assert average_hash(img4) != average_hash(img1)

    # degenerate empty image is total
    assert average_hash(DecodedImage(0, 0, b"")) == "0" * 16


def test_census_queries(spark, sf_dir):
    """r9: the catalog-registered census forms of the bench demos
    (ns_ivf_ann / ns_dedup_simhash) — every invariant boolean must
    hold on the real fixture, and the exact-dup pair count must
    equal the direct computation."""
    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import (
        dedup_simhash_census,
        ivf_ann_census,
    )

    ivf = ivf_ann_census(spark, sf_dir).collect()
    assert ivf, "query census must be non-empty on the fixture"
    for r in ivf:
        assert r.self_rank1 and r.ranks_contiguous_le_k and r.scores_desc

    (row,) = dedup_simhash_census(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_direct = sum(
        r.n_dups * (r.n_dups - 1) // 2
        for r in dd.exact_duplicates(docs).collect()
    )
    assert row.n_exact_dup_pairs == n_direct
    assert (
        row.exact_dups_covered
        and row.all_within_hamming
        and row.pairs_canonical
    )


def test_minhash_calibration(docs):
    """Estimator calibration: est_matches/k is within the k=12
    binomial envelope of exact jaccard for the fixture's candidate
    pairs, and the exact-duplicate pair estimates J=1 exactly (all
    signature components agree on identical shingle sets)."""
    out = {
        (r.id_a, r.id_b): r
        for r in dd.minhash_calibration(docs).collect()
    }
    assert (1, 4) in out  # the fixture's exact-dup pair
    r = out[(1, 4)]
    assert r.est_matches == 12 and r.jaccard == 1.0 and r.cal_err == 0.0
    for r in out.values():
        assert 0 <= r.est_matches <= 12
        # cal_err is round(abs(diff), 6) engine-side; the unrounded
        # Python subtraction can differ by an ulp, so compare with a
        # tolerance instead of exact float equality (r9 ADVICE).
        assert abs(abs(r.est_jaccard - r.jaccard) - r.cal_err) < 1e-9


def test_bigram_logprob_hand_computed(spark):
    """Add-one-smoothed bigram LM on a 2-doc corpus: unigrams a:3
    b:2 (V=2), bigrams a|b:1 b|a:2. doc1 'a b a' = mean(ln(2/5),
    ln(3/4)); doc2 'b a' = ln(3/4); a 1-token doc drops out."""
    import math

    from gsuites_gcp_graphdb_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "x")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.mean_bigram_logprob)
        for r in tx.bigram_logprob(docs).collect()
    }
    # doc 3 contributes the unigram 'x' (V=3), no bigrams
    v = 3
    d1 = round((math.log(2 / (3 + v)) + math.log(3 / (2 + v))) / 2, 6)
    d2 = round(math.log(3 / (2 + v)), 6)
    assert got == {1: (2, d1), 2: (1, d2)}


def test_ivf_delete_prunes_and_handles_emptied_list(spark, sf_dir, tmp_path):
    """ivf_delete must (a) remove exactly the requested ids by
    rewriting ONLY the hit cid partitions, (b) leave the centroid
    table and untouched list files alone, (c) be a retry no-op, and
    (d) clear a list whose EVERY member was deleted — the dynamic-
    overwrite blind spot (partitions absent from the written data
    keep their old files) handled via the explicit directory drop."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    path = str(tmp_path / "ivf_index")
    sim.ivf_save(emb, path, num_centroids=4, iterations=2)
    lists = spark.read.parquet(f"{path}/lists")
    n0 = lists.count()
    cent_before = sorted(
        map(tuple, spark.read.parquet(f"{path}/centroids").collect())
    )
    dele = emb.filter(F.col("vec_id") % 5 == 1).select(
        F.col("vec_id").alias("id")
    )
    n_del = dele.count()
    out = sim.ivf_delete(spark, path, dele)
    assert out["deleted"] == n_del
    after = spark.read.parquet(f"{path}/lists")
    assert after.count() == n0 - n_del
    assert (
        after.join(
            dele.select(F.col("id").alias("vec_id")), ["vec_id"],
            "left_semi",
        ).count()
        == 0
    )
    assert (
        sorted(
            map(tuple, spark.read.parquet(f"{path}/centroids").collect())
        )
        == cent_before
    )
    # retry: naturally idempotent
    out2 = sim.ivf_delete(spark, path, dele)
    assert out2 == {"deleted": 0, "lists_touched": 0}
    assert spark.read.parquet(f"{path}/lists").count() == n0 - n_del
    # probe still serves survivors, none deleted
    q = emb.filter(F.col("vec_id") % 50 == 0).join(
        dele.select(F.col("id").alias("vec_id")), ["vec_id"],
        "left_anti",
    ).select(F.col("vec_id").alias("q_id"), "embedding")
    probed = sim.ivf_probe(spark, path, q, k=3, nprobe=4)
    assert probed.count() > 0
    assert (
        probed.join(
            dele.select(F.col("id").alias("vec_id")), ["vec_id"],
            "left_semi",
        ).count()
        == 0
    )
    # emptied-list case: delete EVERYTHING in one cid
    victim = spark.read.parquet(f"{path}/lists").limit(1).collect()[0].cid
    members = (
        spark.read.parquet(f"{path}/lists")
        .where(F.col("cid") == victim)
        .select(F.col("vec_id").alias("id"))
    )
    n_members = members.count()
    out3 = sim.ivf_delete(spark, path, members)
    assert out3["deleted"] == n_members and out3["lists_touched"] == 1
    final = spark.read.parquet(f"{path}/lists")
    assert final.where(F.col("cid") == victim).count() == 0
    assert final.count() == n0 - n_del - n_members


def test_ivf_delete_on_pq_codes_layout(spark, sf_dir, tmp_path):
    """The same delete serves the IVF-PQ codes layout
    (relation="codes"): dead ids leave the cid partitions, the
    codebook/centroids stay byte-identical, and the probe over the
    compacted codes returns only survivors."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    path = str(tmp_path / "ivfpq_index")
    sim.ivfpq_save(emb, path, num_centroids=4, m=4, iterations=2)
    n0 = spark.read.parquet(f"{path}/codes").count()
    book_before = sorted(
        map(
            lambda r: (r[0], r[1], tuple(r[2])),
            spark.read.parquet(f"{path}/codebook").collect(),
        )
    )
    dele = emb.filter(F.col("vec_id") % 4 == 1).select(
        F.col("vec_id").alias("id")
    )
    out = sim.ivf_delete(spark, path, dele, relation="codes")
    assert out["deleted"] == dele.count()
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == n0 - dele.count()
    assert (
        codes.join(
            dele.select(F.col("id").alias("vec_id")), ["vec_id"],
            "left_semi",
        ).count()
        == 0
    )
    assert (
        sorted(
            map(
                lambda r: (r[0], r[1], tuple(r[2])),
                spark.read.parquet(f"{path}/codebook").collect(),
            )
        )
        == book_before
    )
    q = emb.filter(F.col("vec_id") % 40 == 0).join(
        dele.select(F.col("id").alias("vec_id")), ["vec_id"],
        "left_anti",
    ).select(F.col("vec_id").alias("q_id"), "embedding")
    probed = sim.ivfpq_probe(spark, path, q, k=3, nprobe=2)
    assert probed.count() > 0
    assert (
        probed.join(
            dele.select(F.col("id").alias("vec_id")), ["vec_id"],
            "left_semi",
        ).count()
        == 0
    )
