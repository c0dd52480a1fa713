"""Corpus-management operators (operators/corpus.py): deterministic
splits, mixture sampling, decontamination, sequence packing."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from gsuites_gcp_graphdb_spark.operators import corpus as cp
from gsuites_gcp_graphdb_spark.sources.fixtures import load_table

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_bounds_cover_space():
    b = cp.split_bounds(FR)
    assert [n for n, _ in b] == ["train", "val", "test"]
    assert b[-1][1] == cp.HASH_SPACE
    assert all(b[i][1] < b[i + 1][1] for i in range(len(b) - 1))


def test_hash_split_deterministic_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = cp.hash_split(docs, FR).select("doc_id", "split")
    b = cp.hash_split(docs, FR).select("doc_id", "split")
    # Deterministic: two independent runs agree row-for-row.
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # Exhaustive: every doc gets exactly one label.
    counts = dict(
        a.groupBy("split").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert sum(counts.values()) == docs.count()
    # Approximately proportional (500 docs, 16-bit hash: loose bounds).
    assert counts["train"] / sum(counts.values()) == pytest.approx(
        0.8, abs=0.08
    )


def test_hash_split_stable_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = cp.hash_split(docs, FR).select("doc_id", "split")
    b = cp.hash_split(docs.repartition(7), FR).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0


def test_mixture_sample_weight_one_keeps_all(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = cp.mixture_sample(docs, {"src0": 1.0}, default_weight=0.25)
    src0 = out.filter(F.col("source") == "src0")
    assert src0.count() == src0.filter("keep").count()
    rest = out.filter(F.col("source") != "src0")
    kept = rest.filter("keep").count()
    assert 0 < kept < rest.count()  # default 0.25 thins but not to zero


def test_decontaminate_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # 3 shared shingles
            (2, "alpha beta gamma zeta eta"),  # 1 shared shingle
            (3, "one two three four five"),  # 0 shared
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    out = cp.decontaminate(corpus, bench, n=3, min_overlap=2)
    rows = {r.doc_id: r.n_hit_shingles for r in out.collect()}
    assert rows == {1: 3}


def test_stratified_sample_exact_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = cp.stratified_sample(docs, 7, "lang")
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    strata = {r.lang for r in docs.select("lang").distinct().collect()}
    # Every stratum contributes exactly min(7, |stratum|) rows.
    assert set(counts) == strata
    assert all(n == 7 for n in counts.values())  # fixture strata > 7
    # Deterministic: same rows on a second run.
    again = cp.stratified_sample(docs, 7, "lang")
    assert out.exceptAll(again).count() == 0


def test_split_bounds_validation():
    with pytest.raises(ValueError):
        cp.split_bounds({"train": 0.9, "val": 0.3})  # sums to 1.2
    with pytest.raises(ValueError):
        cp.split_bounds({"train": 1.2, "val": -0.2})  # out of range
    with pytest.raises(ValueError):
        cp.split_bounds({})


def test_mixture_sample_weight_validation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        cp.mixture_sample(docs, {"src0": 1.3}, default_weight=0.5)
    with pytest.raises(ValueError):
        cp.mixture_sample(docs, {"src0": 0.5}, default_weight=-0.1)


def test_pack_sequences_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cap = 256
    out = cp.pack_sequences(docs, capacity=cap, n_groups=4).collect()
    assert len(out) == docs.count()  # every doc assigned exactly once
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r.pack_group, []).append(r)
    assert set(by_group) <= set(range(4))
    for rows in by_group.values():
        rows.sort(key=lambda r: r.doc_id)
        running = 0
        seen_bins = []
        for r in rows:
            assert r.bin == running // cap  # fill-and-spill definition
            running += r.n_tokens
            seen_bins.append(r.bin)
        # Bins are contiguous from 0 and non-decreasing in id order.
        assert seen_bins[0] == 0
        assert all(
            b2 - b1 >= 0 for b1, b2 in zip(seen_bins, seen_bins[1:])
        )


def test_pack_sequences_n_groups_scaling(spark, sf_dir):
    """Per-group fill-and-spill invariants hold at different group
    counts, and the default (no n_groups) uses defaultParallelism."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    for ng in (2, 9):
        out = cp.pack_sequences(docs, capacity=128, n_groups=ng)
        rows = out.collect()
        assert len(rows) == n_docs
        groups = {r.pack_group for r in rows}
        assert groups <= set(range(ng))
        assert len(groups) > 1  # fan-out actually happened
    default_out = cp.pack_sequences(docs, capacity=128)
    dp = spark.sparkContext.defaultParallelism
    assert {r.pack_group for r in default_out.collect()} <= set(range(dp))
    with pytest.raises(ValueError):
        cp.pack_sequences(docs, capacity=128, n_groups=0)


def test_weighted_sample_bias_and_determinism(spark):
    """A-Res weighted sampling: reproducible across runs/partitions,
    and heavier rows are selected more often (here: weight 1000 vs 1
    with k=half — the heavy stratum dominates the sample)."""
    from gsuites_gcp_graphdb_spark.operators.corpus import weighted_sample

    rows = [(i, 1000 if i < 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    s1 = {r.doc_id for r in weighted_sample(df, 50, "w").collect()}
    s2 = {
        r.doc_id
        for r in weighted_sample(df.repartition(7), 50, "w").collect()
    }
    assert s1 == s2  # partitioning-independent
    heavy = sum(1 for d in s1 if d < 50)
    assert heavy >= 45  # weight-1000 stratum dominates


def test_class_balance(spark):
    """Minority class keeps everything exactly; majority classes thin
    toward the minority count; decisions are deterministic (same
    result twice)."""
    from gsuites_gcp_graphdb_spark.operators import corpus as cp

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "small") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = cp.class_balance(df, class_col="lang")
    kept = (
        out.groupBy("lang")
        .agg(F.sum(F.col("keep").cast("long")).alias("k"))
        .collect()
    )
    k = {r.lang: r.k for r in kept}
    assert k["small"] == 40  # minority never thinned
    assert 10 <= k["big"] <= 100  # ~40 expected, hash-thinned
    again = cp.class_balance(df, class_col="lang")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_temperature_sample(spark):
    """sqrt-temperature thinning: the minority class keeps every row
    (threshold = full hash space); keep RATES order inversely with
    class size; decisions are deterministic across invocations."""
    from gsuites_gcp_graphdb_spark.operators.corpus import (
        temperature_sample,
    )

    rows = (
        [(i, "big") for i in range(400)]
        + [(i + 1000, "mid") for i in range(100)]
        + [(i + 2000, "small") for i in range(25)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df).collect()
    kept = {}
    for r in out:
        kept.setdefault(r.source, [0, 0])
        kept[r.source][0] += 1
        kept[r.source][1] += int(r.keep)
    assert kept["small"] == [25, 25]  # minority keeps all
    # expected kept ~= geometric mean sqrt(nmin * n): 100 for big,
    # 50 for mid — allow generous hash noise
    assert 60 <= kept["big"][1] <= 140
    assert 30 <= kept["mid"][1] <= 70
    # rate monotonicity: bigger class -> smaller keep rate
    assert kept["big"][1] / 400 < kept["mid"][1] / 100 < 1.0
    again = temperature_sample(df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_split_leakage_safe_cluster_atomic(spark):
    """Two near-identical docs (Jaccard >= tau on 3-shingles) must
    land in the SAME split — the cluster, not the doc, is the
    assignment unit — and the earned leak audit must report 0."""
    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import (
        split_leakage_safe,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", len(base)),
            (2, base + " extra", "en", "s", len(base) + 6),
            (3, "totally different words nothing shared here at all",
             "en", "s", 50),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    d = tempfile.mkdtemp(prefix="leak_split_")
    docs.coalesce(1).write.parquet(
        os.path.join(d, "documents.parquet"), mode="overwrite"
    )
    rows = split_leakage_safe(spark, d).collect()
    assert sum(r.n_docs for r in rows) == 3
    assert all(r.n_leaked_pairs == 0 for r in rows)
    # docs 1+2 share a cluster: total clusters across splits is 2
    assert sum(r.n_clusters for r in rows) == 2


def test_greedy_budget_select_prefix_exact(spark):
    """The selected set is exactly the greedy prefix in (score DESC,
    id ASC) order, across bands (band_width=2 forces multi-band), and
    costs are never partially taken."""
    rows = [
        # (doc_id, cost, score): greedy order by score desc, id asc
        (1, 40, 9),
        (2, 40, 7),
        (3, 40, 5),
        (4, 40, 5),  # tie with 3 -> id order
        (5, 40, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, cost long, score long")
    out = cp.greedy_budget_select(
        df, budget=120, cost_col="cost", order_col="score", band_width=2
    )
    sel = {r.doc_id for r in out.collect() if r.selected}
    assert sel == {1, 2, 3}  # 3x40 fits, the 4th overflows
    # budget exactly at a boundary includes the boundary row
    out2 = cp.greedy_budget_select(
        df, budget=160, cost_col="cost", order_col="score", band_width=2
    )
    assert {r.doc_id for r in out2.collect() if r.selected} == {1, 2, 3, 4}


def test_pps_systematic_sample(spark):
    """Madow PPS invariants: total emitted copies == k exactly; a row
    with weight > W/k is forced into the sample (possibly multiple
    copies); zero/neg-weight rows never appear; k >= W/min_w picks
    everything at least once is NOT claimed (systematic, not
    Bernoulli) — but copies are proportional within +-1 of k*w/W."""
    from gsuites_gcp_graphdb_spark.operators.corpus import (
        pps_systematic_sample,
    )

    rows = [(i, "x" * w) for i, w in enumerate([5, 1, 1, 50, 1, 10, 0])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k = 8
    out = pps_systematic_sample(
        df, k=k, weight_col=F.octet_length(F.col("text"))
    ).collect()
    total = sum(r.n_copies for r in out)
    assert total == k
    got = {r.id: r.n_copies for r in out}
    W = 68.0
    # proportionality within one gridpoint: |copies - k*w/W| < 1 + 1
    for i, w in enumerate([5, 1, 1, 50, 1, 10, 0]):
        exp = k * w / W
        assert abs(got.get(i, 0) - exp) <= 1.0, (i, got.get(i, 0), exp)
    assert 6 not in got  # zero-weight row excluded
    assert got[3] >= 5  # heavy row oversampled (50/68*8 ~ 5.9)


def test_pps_sample_empty(spark):
    from gsuites_gcp_graphdb_spark.operators.corpus import (
        pps_systematic_sample,
    )

    df = spark.createDataFrame([], "doc_id long, text string")
    assert (
        pps_systematic_sample(
            df, k=5, weight_col=F.octet_length(F.col("text"))
        ).count()
        == 0
    )
