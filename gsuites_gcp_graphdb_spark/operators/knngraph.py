"""Distributed kNN-graph construction via NN-Descent.

The graph-based member of the ANN family (IVF / PQ / LSH live in
operators/similarity.py): instead of answering one query's top-k,
NN-Descent materializes the WHOLE k-nearest-neighbour graph — the
artifact semantic-dedup clustering, graph-ANN serving (HNSW-style
neighborhood graphs), and manifold diagnostics consume. Algorithm
structure follows Dong, Moses & Li, "Efficient k-nearest neighbor
graph construction for generic similarity measures" (WWW'11),
implemented from the paper's idea as pure dataflow:

  init   : k independent pseudo-random neighbours per node — node
           v's neighbour in permutation o is its SUCCESSOR in the
           md5-shuffled order of its hash bucket (fresh salts per
           o), so the seed graph is DIVERSE (a single-ring seed was
           measured 10x worse here: neighbour-of-neighbour along
           one ring yields ~2k distinct candidates instead of k²).
           Successor-in-a-permutation makes the init a pure
           function of the id SET — no density assumption (an
           earlier draw-into-[0,max_id) init silently produced a
           near-empty seed graph on the x4 replica fixture, whose
           ids are offset by 1e9 per replica).
  round r: U = N ∪ Nᵀ (undirected current graph), candidates =
           {(a,c) : (a,b) ∈ U, (b,c) ∈ U, a≠c} — "my neighbour's
           neighbours" — unioned with the current edges, re-scored,
           cut back to the per-node top-k.

Scale shape (the reason this is THE distributed kNN-graph
algorithm): each round is two self-joins shuffled on vertex id plus
two id-joins to re-attach vectors; candidate volume is O(N·(2k)²)
rows — linear in N for fixed k — and the per-node cut is a window
PARTITIONED by node. No global window (init windows are partitioned
by (permutation, hash bucket)), no cross join, no broadcast of the
corpus, no collect. Rounds are localCheckpointed (the HITS idiom) so
round r+1 starts from materialized edges instead of re-running the
whole lineage — and the census's per-stage recall probes don't
re-execute earlier rounds.

Determinism contract (what makes the DuckDB oracle exact): the init
bucket keys are corpus.hash16(f"{id}_{o}", salt), order keys the
60-bit corpus.hash_order (collision-free past 65k/bucket); scores
divide the strict
left-fold dot (functions/vectors.py) by per-node precomputed
left-fold norms — bit-identical to the oracle's list_reduce twins;
every top-k cut breaks ties (score DESC, neighbour id ASC). Given
the same input set, every round's edge SET is identical
cross-engine.

Monotonicity invariant (pinned by tests + the catalog census): each
round's candidate set includes the previous round's edges and the
kept-k ordering is a total order, so recall@k against brute-force
truth is non-decreasing round over round — if a true top-k member
were evicted, k strictly-better nodes would exist, contradicting
its top-k membership.

Scoring-kernel note: the left-fold dot is an interpreted HOF
(CodegenFallback) kept for cross-engine exactness in the census; at
production scale swap _score_pairs for the Arrow matmul mapInPandas
kernel (similarity._pair_cosine_udf shape, measured ~300x on that
exact shape) — the algorithm is scorer-agnostic.

Reference parity: the reference (main.go, 934-line Gremlin ETL) has
no ANN surface; this extends the LLM-pipeline operator inventory the
same way similarity.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import logging
import os

from ..functions.vectors import dot, l2_norm
from .corpus import hash16, hash_order

_log = logging.getLogger(__name__)


def _resolve_arrow(arrow: bool | None) -> bool:
    """Scorer choice for the whole module: explicit True/False wins;
    None defers to SPARK_GRAFT_KNN_SCORER ('arrow' | 'fold',
    default 'arrow'). The Arrow einsum kernel is the PRODUCTION
    default — vectorized numpy over Arrow batches, ~the only sane
    shape for 100 TB pair scoring; the interpreted left-fold HOF is
    the census/oracle mode (bit-identical to the DuckDB list_reduce
    twins), kept for every catalog query so the correctness gate
    stays exact. test_nn_descent_scorer_edge_set_equivalence pins
    the two scorers to identical edge SETS on the driver fixture."""
    if arrow is not None:
        return arrow
    mode = os.environ.get("SPARK_GRAFT_KNN_SCORER", "arrow").strip().lower()
    if mode not in ("arrow", "fold"):
        raise ValueError(
            "SPARK_GRAFT_KNN_SCORER must be 'arrow' or 'fold', got "
            f"{mode!r}"
        )
    return mode != "fold"


def _normalize(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, nrm): norms precomputed once per node — the cosine
    then divides the pair dot by the two attached norms, the same
    doubles as folding norms inline (identical operand order)."""
    return emb.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(vec_col).alias("vec"),
    ).withColumn("nrm", l2_norm(F.col("vec")))


def _score_pairs(
    pairs: DataFrame,
    emb: DataFrame,
    emb_b: DataFrame | None = None,
    arrow: bool | None = None,
) -> DataFrame:
    """Exact cosine for a bounded pair set: two shuffle joins on id
    to re-attach endpoint vectors+norms (corpus is never broadcast),
    then left-fold dot / (nrm_a * nrm_b). `emb_b` lets side `b`
    resolve against a different vector source (insert_batch scores
    new-vector queries against the base corpus); operand order is
    always (vec_a, vec_b).

    Scorer choice (`arrow`, default None → _resolve_arrow): the
    Arrow einsum kernel (similarity._pair_cosine_udf) is the
    PRODUCTION DEFAULT — the interpreted HOF fold survives as the
    census/oracle mode (catalog queries pin arrow=False so scores
    stay bit-identical to the DuckDB twins). The two differ only in
    final ulps (numpy pairwise summation vs strict left fold);
    test_nn_descent_scorer_edge_set_equivalence pins identical edge
    sets on the driver fixture and
    test_nn_descent_arrow_scorer_parity bounds recall drift on
    adversarial near-tie geometry."""
    if emb_b is None:
        emb_b = emb
    va = emb.select(
        F.col("id").alias("a"),
        F.col("vec").alias("__va"),
        F.col("nrm").alias("__na"),
    )
    vb = emb_b.select(
        F.col("id").alias("b"),
        F.col("vec").alias("__vb"),
        F.col("nrm").alias("__nb"),
    )
    joined = pairs.join(va, ["a"]).join(vb, ["b"])
    if _resolve_arrow(arrow):
        from .similarity import _pair_cosine_udf

        return joined.select(
            "a",
            "b",
            # no JVM-side cast to array<double> (r15, guide §4.1):
            # the kernel upcasts to float64 internally (exact
            # widening), so the cast only doubled the Arrow transfer
            # bytes for float32 corpora
            _pair_cosine_udf()(
                F.col("__va"), F.col("__vb")
            ).alias("s"),
        )
    return joined.select(
        "a",
        "b",
        (
            dot(F.col("__va"), F.col("__vb"))
            / (F.col("__na") * F.col("__nb"))
        ).alias("s"),
    )


def _topk(
    scored: DataFrame, k: int, extra: tuple = ()
) -> DataFrame:
    """Per-query (s DESC, b ASC) cut; `extra` names bookkeeping
    columns to carry through (the beam loops' frontier bit)."""
    w = Window.partitionBy("a").orderBy(F.col("s").desc(), F.col("b").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= F.lit(k))
        .select("a", "b", "s", *extra, "rk")
    )


def permutation_init(
    emb: DataFrame, k: int, nbuckets: int = 32
) -> DataFrame:
    """Seed graph: node v's neighbour in permutation o (o = 1..k) is
    its successor in the md5-shuffled order of its hash bucket
    (wrapping to the bucket's first element). Each permutation uses
    fresh salts for bucket AND order, so the k successors are
    independent uniform-ish picks — a pure function of the id set,
    valid for ANY id distribution. Windows are partitioned by
    (o, bucket): scale-safe. Singleton buckets self-wrap and drop;
    collisions across permutations dedupe (degree <= k)."""
    s = (
        emb.select("id")
        .select(
            "id", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("o")
        )
        .withColumn("__k", F.concat_ws("_", F.col("id"), F.col("o")))
        .select(
            "id",
            "o",
            (hash16(F.col("__k"), "nndb") % F.lit(nbuckets)).alias(
                "bkt"
            ),
            # 60-bit order key: a 16-bit hk collides heavily past
            # ~65k nodes per bucket, degrading successors toward
            # id-adjacent picks — the opposite of the seed diversity
            # this init exists for. SQL twin: _sql_nnd_prefix's ho.
            hash_order(F.col("__k"), "nndo").alias("hk"),
        )
    )
    w = Window.partitionBy("o", "bkt").orderBy("hk", "id")
    wf = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    nb = F.coalesce(F.lead("id").over(w), F.first("id").over(wf))
    return (
        s.select(F.col("id").alias("a"), nb.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def descent_round(
    graph: DataFrame, emb: DataFrame, k: int, arrow: bool | None = None
) -> DataFrame:
    """One NN-Descent refinement: undirected neighbour-of-neighbour
    candidates unioned with the current edges, re-scored, cut to
    top-k per node. `graph` needs columns (a, b); returns scored
    (a, b, s, rk)."""
    e = graph.select("a", "b")
    u = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    x = u.alias("x")
    y = u.alias("y")
    cand = (
        x.join(y, F.col("x.b") == F.col("y.a"))
        .select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    pairs = cand.union(e).distinct()
    return _topk(_score_pairs(pairs, emb, arrow=arrow), k)


def nn_descent(
    emb: DataFrame,
    k: int = 10,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = True,
    arrow: bool | None = None,
) -> list[DataFrame]:
    """Build the kNN graph; returns the scored graph per stage:
    [init, round1, ..., round<rounds>] — each (a, b, s, rk). Callers
    wanting only the final graph take [-1]; the census consumes the
    whole ladder to pin monotone recall. Each stage is
    localCheckpointed (eager) so later stages and repeated probes
    start from materialized edges. `arrow` picks the scorer (None →
    the configured default, Arrow einsum in production; catalog
    census pins arrow=False for oracle exactness — _score_pairs)."""
    e = _normalize(emb, id_col, vec_col)
    g = _topk(_score_pairs(permutation_init(e, k), e, arrow=arrow), k)
    if checkpoint:
        g = g.localCheckpoint()
    out = [g]
    for _ in range(rounds):
        g = descent_round(g, e, k, arrow=arrow)
        if checkpoint:
            g = g.localCheckpoint()
        out.append(g)
    return out


def beam_search(
    graph: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    beam: int = 16,
    hops: int = 6,
    n_entries: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = True,
    query_emb: DataFrame | None = None,
    arrow: bool | None = None,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """Serving-side graph ANN: greedy beam search over a materialized
    kNN graph (the search half of the build/search lifecycle —
    nn_descent builds the navigable graph, this answers queries over
    it, the same split as the IVF family's train/probe). From
    n_entries md5-chosen entry points, each hop expands the current
    beam's out-neighbours, re-scores every candidate against the
    query vector, and keeps the best `beam` per query; `queries`
    holds one column `a` of query ids (corpus members; the query
    itself is excluded from its results).

    Scale shape: per hop, candidates are bounded by |q|·beam·(k+1) —
    independent of N; scoring is the same two id-joins as
    _score_pairs; the per-query cut is a window partitioned by
    query. The only global operation is picking the entry set (a
    TakeOrdered of n_entries rows). Each hop is localCheckpointed:
    the beam feeds the next hop twice (carry + expand), so lineage
    would otherwise double per hop. `query_emb` lets queries carry
    their OWN vectors (ids need not exist in the corpus — the
    insert_batch path); side b always scores against the corpus.

    `tombstones` (one column `id`) makes the search LAZY-DELETE
    aware, the FreshDiskANN serving pattern between consolidations
    (delete_batch is the compaction): tombstoned ids never enter the
    beam, the entry set, or the results, but the graph stays
    navigable THROUGH them — their adjacency is folded into a
    one-level bridged view (v → d → b becomes v → b for dead d)
    before the hops, so a dead hub doesn't sever its neighbourhood.
    One level of bridging only: a chain of ≥2 adjacent deletions can
    still cut a path — that's the signal to run delete_batch."""
    e = _normalize(emb, id_col, vec_col)
    if tombstones is not None:
        t = tombstones.select(F.col("id").cast("bigint").alias("id"))
        ge = graph.select("a", "b")
        t_a = t.select(F.col("id").alias("a"))
        t_b = t.select(F.col("id").alias("b"))
        into_dead = ge.join(t_b, ["b"], "left_semi")
        out_of_dead = ge.join(t_a, ["a"], "left_semi")
        bridged = (
            into_dead.select("a", F.col("b").alias("__d"))
            .join(
                out_of_dead.select(
                    F.col("a").alias("__d"), F.col("b").alias("nb")
                ),
                ["__d"],
            )
            .select("a", F.col("nb").alias("b"))
            .where(F.col("a") != F.col("b"))
        )
        # every branch re-selects (a, b) explicitly: join-on-key
        # reorders columns and union matches by position
        graph = (
            ge.join(t_a, ["a"], "left_anti")
            .join(t_b, ["b"], "left_anti")
            .select("a", "b")
            .union(
                bridged.join(t_a, ["a"], "left_anti")
                .join(t_b, ["b"], "left_anti")
                .select("a", "b")
            )
            .distinct()
        )
        # results/entries draw only from survivors
        e = e.join(t.select(F.col("id")), ["id"], "left_anti")
    # qe binds AFTER the tombstone filter: with query_emb=None a
    # tombstoned id passed as a query must not resolve — its rows
    # vanish from the a side too, honoring the docstring guarantee
    # on both sides. Explicit query_emb keeps its own (unfiltered)
    # vectors: the insert path queries ids that are not corpus
    # members at all.
    qe = (
        e
        if query_emb is None
        else _normalize(query_emb, id_col, vec_col)
    )
    ent = (
        e.select("id", hash16(F.col("id"), "entry").alias("__h"))
        .orderBy("__h", "id")
        .limit(n_entries)
        .select(F.col("id").alias("b"))
    )
    f0 = queries.select("a").crossJoin(ent).where(
        F.col("a") != F.col("b")
    )
    g = _topk(_score_pairs(f0, qe, e, arrow=arrow), beam)
    if checkpoint:
        g = g.localCheckpoint()
    nbrs = graph.select(
        F.col("a").alias("v"), F.col("b").alias("nb")
    )
    # r14 (guide §2.3): frontier (delta) expansion — the same exact
    # properties knn_probe's loop documents (scores are pure in
    # (a, b) so beam scores are reusable; the (s DESC, b ASC) cutoff
    # is monotone so a candidate cut once can never re-enter —
    # which also makes beam exits permanent, so the not-yet-expanded
    # members are exactly the rows that ENTERED the beam last hop:
    # a provenance bit carried through _topk, no anti-join, no
    # accumulator). Per hop: expand only the frontier, score only
    # pairs not already in the beam. No early-exit probe here
    # (unlike knn_probe there is no per-hop collect to piggyback on,
    # and an extra driver action per hop costs more than it saves —
    # the empty-frontier hop is already near-free).
    # Result identical (oracle-pinned census queries +
    # test_beam_search_* / probe-equality tests).
    g = g.withColumn("__new", F.lit(True))
    for _ in range(hops):
        newv = g.where(F.col("__new")).select(
            "a", F.col("b").alias("v")
        )
        new_pairs = (
            newv.join(nbrs, ["v"])
            .select("a", F.col("nb").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
            .join(g.select("a", "b"), ["a", "b"], "left_anti")
        )
        g = _topk(
            g.select(
                "a", "b", "s", F.lit(False).alias("__new")
            ).unionByName(
                _score_pairs(new_pairs, qe, e, arrow=arrow)
                .withColumn("__new", F.lit(True))
            ),
            beam,
            extra=("__new",),
        )
        if checkpoint:
            g = g.localCheckpoint()
    return g.select("a", "b", "s", "rk")


def insert_batch(
    graph: DataFrame,
    base_emb: DataFrame,
    batch_emb: DataFrame,
    k: int = 10,
    beam: int = 16,
    hops: int = 6,
    n_entries: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    search_graph: DataFrame | None = None,
    arrow: bool | None = None,
) -> dict[str, DataFrame]:
    """Search-based incremental insertion — the third leg of the
    graph-ANN lifecycle (build=nn_descent, search=beam_search,
    insert=this; the analogue of the IVF family's refresh, and the
    insert primitive HNSW uses): each new vector beam-searches the
    EXISTING graph (long links included by the caller) for its
    neighbourhood, links to its top-k, and back-links are offered to
    the touched base nodes, whose lists re-cut to top-k (score DESC,
    id ASC — cosine is exactly symmetric under the left-fold, so the
    reverse edge reuses the forward score).

    Cost is O(|batch|·beam·(k+1)·hops) scoring — independent of
    index size, like ivf_refresh — and the rewrite surface is the
    new rows plus AT MOST |batch|·k touched base lists; every other
    base list is byte-identical (returned untouched, never
    re-scored). Returns {"new_edges", "updated", "touched"}:
    new-node adjacency, the full updated edge set (a, b, s, rk),
    and the ids of base nodes whose list actually changed.
    `search_graph` (default: the kNN edges themselves) lets the
    caller add the permutation-init long links for navigability —
    the census does."""
    sg = graph if search_graph is None else search_graph
    found = beam_search(
        sg.select("a", "b"),
        base_emb,
        _normalize(batch_emb, id_col, vec_col).select(
            F.col("id").alias("a")
        ),
        beam=beam,
        hops=hops,
        n_entries=n_entries,
        id_col=id_col,
        vec_col=vec_col,
        query_emb=batch_emb,
        arrow=arrow,
    )
    new_edges = _topk(found.select("a", "b", "s"), k)
    rev = new_edges.select(
        F.col("b").alias("a"), F.col("a").alias("b"), "s"
    )
    touched_ids = rev.select("a").distinct()
    old_touched = graph.join(touched_ids, ["a"], "left_semi")
    recut = _topk(
        old_touched.select("a", "b", "s").union(rev), k
    )
    changed = (
        recut.join(
            rev.select("a", "b"), ["a", "b"], "left_semi"
        )
        .select("a")
        .distinct()
    )
    untouched = graph.join(touched_ids, ["a"], "left_anti")
    updated = untouched.select("a", "b", "s", "rk").union(
        recut
    ).union(new_edges)
    return {
        "new_edges": new_edges,
        "updated": updated,
        "touched": changed,
    }


def delete_batch(
    graph: DataFrame,
    base_emb: DataFrame,
    delete_ids: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool | None = None,
) -> dict[str, DataFrame]:
    """Tombstone deletion + bounded re-knit — the fourth leg of the
    graph-ANN lifecycle (build=nn_descent, search=beam_search,
    insert=insert_batch, delete=this). A production vector store
    compacts deletions instead of letting dead ids rot in adjacency
    lists; this is the consolidation rule the DiskANN family uses
    (FreshDiskANN, arXiv 2105.09613): drop the deleted nodes' own
    lists, and for every SURVIVOR that pointed at a deleted node,
    re-knit its list from (its kept neighbours) ∪ (the deleted
    neighbour's own out-neighbours) — the dead node's neighbourhood
    is exactly where its in-neighbours' replacement edges live.

    Bounded by construction: the rewrite surface is the deleted
    nodes' in-neighbours (≤ |D|·k lists); candidates per affected
    node ≤ k (kept) + k·k (bridged); every other survivor's list is
    returned byte-identical, never re-scored. `delete_ids` is one
    column `id`. Returns {"updated", "affected", "tombstones"}:
    the compacted graph (a, b, s, rk — no edge touches a deleted
    id), the survivor ids whose lists were re-knit, and the deleted
    id set as passed.

    Scale shape: three anti/semi joins on id (broadcast when |D| is
    small — Catalyst's call), one bounded bridge join through the
    old adjacency, one _score_pairs over the candidate set. Nothing
    scans the corpus; cost is O(|D|·k²) like insert_batch's
    O(|batch|·beam·k) — index-size-independent. Oracle twin:
    pipeline_queries._sql_knn_delete (ns_knn_delete)."""
    tomb = delete_ids.select(F.col("id").cast("bigint").alias("id"))
    t_a = tomb.select(F.col("id").alias("a"))
    t_b = tomb.select(F.col("id").alias("b"))
    g = graph.select("a", "b", "s", "rk")
    # survivors' rows only, then split on whether the edge died
    alive = g.join(t_a, ["a"], "left_anti")
    lost = alive.join(t_b, ["b"], "left_semi").select("a", "b")
    kept = alive.join(t_b, ["b"], "left_anti")
    affected = lost.select("a").distinct()
    # DiskANN consolidation: v -> d (dead) bridges to d's old
    # out-neighbours that survive and aren't v itself
    bridge = (
        lost.select("a", F.col("b").alias("__d"))
        .join(
            g.select(F.col("a").alias("__d"), F.col("b").alias("nb")),
            ["__d"],
        )
        .select("a", F.col("nb").alias("b"))
        .join(t_b, ["b"], "left_anti")
        .where(F.col("a") != F.col("b"))
        # join-on-["b"] moved the key to column 0 — re-fix the order
        # explicitly, because the union below matches by POSITION and
        # would silently flip every bridged edge otherwise
        .select("a", "b")
    )
    cand = (
        kept.join(affected, ["a"], "left_semi")
        .select("a", "b")
        .union(bridge)
        .distinct()
    )
    e = _normalize(base_emb, id_col, vec_col)
    recut = _topk(_score_pairs(cand, e, arrow=arrow), k)
    untouched = kept.join(affected, ["a"], "left_anti")
    updated = untouched.select("a", "b", "s", "rk").union(recut)
    return {
        "updated": updated,
        "affected": affected,
        "tombstones": tomb,
    }


def mutual_edges(graph: DataFrame, tau: float) -> DataFrame:
    """Mutual-kNN thresholding: keep (a, b) with a < b where BOTH
    directions survived the top-k cut and the score clears tau. The
    mutuality semi-join is the standard symmetrization that turns a
    kNN digraph into the sparse similarity graph semantic clustering
    consumes (SemDeDup-style): one-sided edges are mostly hubness
    noise; mutual edges at a high tau are near-duplicate/same-topic
    evidence. Output is candidate-bounded (≤ N·k/2 rows)."""
    e = graph.select("a", "b", "s")
    rev = graph.select(F.col("b").alias("a"), F.col("a").alias("b"))
    return (
        e.join(rev, ["a", "b"], "left_semi")
        .where((F.col("s") >= F.lit(tau)) & (F.col("a") < F.col("b")))
        .select("a", "b")
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_emb: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k ground truth for a SAMPLED query set (census use
    only — the O(|q|·N) scan is the measuring stick, not the scale
    path). `queries` holds one column `a` of query ids; `query_emb`
    resolves their vectors when they are not corpus members.

    The scorer is PINNED to the left-fold twin (arrow=False): this
    function defines ground TRUTH for the recall censuses, and truth
    must stay bit-identical to the DuckDB list_reduce oracle —
    ulp-level near-ties at the rank-k cut would otherwise flip the
    truth edge set under the Arrow einsum kernel and make census
    results depend on SPARK_GRAFT_KNN_SCORER."""
    e = _normalize(emb, id_col, vec_col)
    qe = (
        e
        if query_emb is None
        else _normalize(query_emb, id_col, vec_col)
    )
    pairs = (
        queries.select("a")
        .join(e.select(F.col("id").alias("b")), F.col("a") != F.col("b"))
        .select("a", "b")
    )
    return _topk(_score_pairs(pairs, qe, e, arrow=False), k)


def knn_save(
    graph: DataFrame,
    emb: DataFrame,
    path: str,
    n_parts: int = 16,
    max_entries: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    long_links: DataFrame | None = None,
) -> None:
    """Persist the kNN graph as a WRITE-TIME LAYOUT — the graph-ANN
    twin of similarity.ivf_save, closing the lifecycle asymmetry
    (r12 VERDICT item: the IVF family had save/probe, this family
    served only in-query). Three relations:

    - ``adjacency/``: the (a, b) edge lists partitioned by
      ``pa = pmod(xxhash64(a), n_parts)`` — a probe's hop expands a
      bounded frontier, so it reads ONLY the frontier's partitions
      via partition pruning, never the full graph;
    - ``vectors/``: normalized (id, vec, nrm) partitioned by
      ``pv = pmod(xxhash64(id), n_parts)`` — candidate re-scoring
      reads only the candidate ids' partitions;
    - ``entries/``: the top-``max_entries`` ids in the md5 entry
      order beam_search uses (hash16(id,'entry'), id) — a probe
      with n_entries <= max_entries picks the IDENTICAL entry set
      without scanning any corpus-sized relation.

    Size ``n_parts`` so each partition holds ~128MB-1GB at the
    target scale (the export.save_bucketed rule); a serving batch
    then touches |frontier-partitions|/n_parts of the index per hop
    — the DiskANN disk-resident serving story expressed as parquet
    partition pruning. The reference analog is the restartable
    partitioned sink (main.go:124-187).

    ``long_links`` (optional, (a, b)): the NSW navigability links
    (permutation_init) saved as their OWN relation — knn_probe
    searches over adjacency ∪ links, while knn_refresh re-cuts only
    the SCORED adjacency lists (links carry no scores and are never
    re-cut, the FreshDiskANN split). Scores/ranks are persisted with
    the adjacency when the graph carries them (nn_descent output) —
    required by knn_refresh; a bare (a, b) graph saves null s/rk
    and still serves probes."""
    e = _normalize(emb, id_col, vec_col)
    g = graph
    if "s" not in g.columns:
        g = g.withColumn("s", F.lit(None).cast("double"))
    if "rk" not in g.columns:
        g = g.withColumn("rk", F.lit(None).cast("int"))
    # a/b are pinned to bigint AT WRITE (r15): probes hash the keys
    # with type-sensitive xxhash64 assuming bigint (the documented
    # index contract), so an int-keyed caller graph would otherwise
    # prune to wrong partitions; the pin also makes the saved layout
    # a fixed schema the readers can declare instead of re-inferring
    # from footers on every serve (guide §6 — per-serve metadata I/O).
    (
        g.select(
            F.col("a").cast("bigint").alias("a"),
            F.col("b").cast("bigint").alias("b"),
            F.col("s").cast("double").alias("s"),
            F.col("rk").cast("int").alias("rk"),
        )
        .withColumn(
            "pa", F.pmod(F.xxhash64(F.col("a")), F.lit(n_parts))
        )
        .write.partitionBy("pa")
        .parquet(f"{path}/adjacency", mode="overwrite")
    )
    links = (
        long_links.select("a", "b")
        if long_links is not None
        else graph.select("a", "b").limit(0)
    )
    (
        links.select(
            F.col("a").cast("bigint").alias("a"),
            F.col("b").cast("bigint").alias("b"),
        )
        .withColumn(
            "pa", F.pmod(F.xxhash64(F.col("a")), F.lit(n_parts))
        )
        .write.partitionBy("pa")
        .parquet(f"{path}/links", mode="overwrite")
    )
    (
        e.withColumn(
            "pv", F.pmod(F.xxhash64(F.col("id")), F.lit(n_parts))
        )
        .write.partitionBy("pv")
        .parquet(f"{path}/vectors", mode="overwrite")
    )
    (
        e.select("id", hash16(F.col("id"), "entry").alias("__h"))
        .orderBy("__h", "id")
        .limit(max_entries)
        .write.parquet(f"{path}/entries", mode="overwrite")
    )
    spark = graph.sparkSession
    spark.createDataFrame(
        [(int(n_parts), int(max_entries))],
        "n_parts int, max_entries int",
    ).write.parquet(f"{path}/meta", mode="overwrite")


def knn_load(spark, path: str) -> dict[str, DataFrame]:
    """Load a knn_save index for IN-QUERY serving: returns
    {"graph": scored adjacency (a, b, s, rk), "links": long links
    (a, b), "vectors": normalized (id, vec, nrm), "entries":
    (id, __h), "meta": (n_parts, max_entries)}. graph∪links +
    vectors feed beam_search directly (vectors are already
    _normalize-shaped); use knn_probe instead when the index should
    stay disk-resident and reads partition-pruned."""
    return {
        "graph": spark.read.parquet(f"{path}/adjacency").select(
            "a", "b", "s", "rk"
        ),
        "links": spark.read.parquet(f"{path}/links").select("a", "b"),
        "vectors": spark.read.parquet(f"{path}/vectors").select(
            "id", "vec", "nrm"
        ),
        "entries": spark.read.parquet(f"{path}/entries"),
        "meta": spark.read.parquet(f"{path}/meta"),
    }


def _pruned_vectors(
    spark,
    path: str,
    n_parts: int,
    ids: DataFrame,
    col: str,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Partition-pruned vector fetch: collect the DISTINCT partition
    values the id set hashes into (bounded by n_parts — the IVF
    probe's bounded-collect discipline, never corpus-bounded), push
    them as a partition filter, then left-semi to the exact ids.

    The id column is cast to bigint BEFORE hashing: xxhash64 is
    type-sensitive in Spark (hash of int 5 != hash of bigint 5) and
    the index is written with bigint keys, so an int-typed caller id
    would compute wrong partition values and silently fetch nothing.

    ``vectors`` (r15, guide §6): a pre-built read of ``path/vectors``.
    Loop callers (knn_probe's hop loop) pass it so the file listing +
    footer schema inference happen ONCE per serve instead of once per
    hop — per-hop metadata RPCs against an object store are pure
    fixed cost. The per-hop partition filter is still applied here and
    still prunes the scan (pushdown happens at action time)."""
    ids = ids.select(F.col(col).cast("bigint").alias(col))
    parts = sorted(
        r.p
        for r in ids.select(
            F.pmod(F.xxhash64(F.col(col)), F.lit(n_parts)).alias("p")
        )
        .distinct()
        .collect()
    )
    if vectors is None:
        vectors = spark.read.parquet(f"{path}/vectors")
    return (
        vectors.where(F.col("pv").isin(parts))
        .join(
            ids.select(F.col(col).alias("id")).distinct(),
            ["id"],
            "left_semi",
        )
        .select("id", "vec", "nrm")
    )


def _drop_emptied_partitions(
    spark, base: str, part_col: str, candidates, written: DataFrame
) -> int:
    """Dynamic partition overwrite replaces only partitions PRESENT
    in the written data — a partition whose every row was deleted
    produces no output rows, so its old files would survive the
    rewrite and deleted rows could resurface. Drop those directories
    explicitly via the Hadoop FS (the ivf_delete emptied-list rule,
    similarity.py:829). `candidates` is the partition-value set the
    rewrite read (bounded by n_parts / num_centroids); `written` is
    the frame that was written. Returns how many dirs were dropped."""
    emptied = set(candidates) - {
        getattr(r, part_col)
        for r in written.select(part_col).distinct().collect()
    }
    if emptied:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for c in sorted(emptied):
            p = jvm.org.apache.hadoop.fs.Path(f"{base}/{part_col}={c}")
            p.getFileSystem(conf).delete(p, True)
    return len(emptied)


# The knn_save on-disk layout (fixed by the writer above — a/b pinned
# to bigint at write). Declaring these schemas at read skips a file
# listing + footer schema inference PER READ — knn_probe builds these
# reads once per serve, and at production scale each inference is a
# round of object-store metadata RPCs (guide §6). vectors/ is NOT
# here: its vec element type follows the caller's embedding type, so
# that one read keeps inference (once per serve).
_ADJ_SCHEMA = "a bigint, b bigint, s double, rk int, pa int"
_LINKS_SCHEMA = "a bigint, b bigint, pa int"
_ENTRIES_SCHEMA = "id bigint, __h bigint"
_META_SCHEMA = "n_parts int, max_entries int"


def _read_links(spark, path: str) -> DataFrame | None:
    """Read a saved index's ``links/`` relation, tolerating ONLY the
    two legitimate absent-links layouts — a pre-links index (the
    directory does not exist) or a links directory holding no data
    files (schema inference fails with AnalysisException). Any other
    read failure (corrupt footers, permission errors, transient FS
    faults) PROPAGATES: silently serving probes without long links
    would be a result-changing divergence from beam_search with no
    signal to the caller (r13 ADVICE item on the bare except)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hp = jvm.org.apache.hadoop.fs.Path(f"{path}/links")
    if not hp.getFileSystem(conf).exists(hp):
        _log.info("knn index at %s has no links/ relation; serving "
                  "from adjacency only (pre-links layout)", path)
        return None
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(_LINKS_SCHEMA).parquet(f"{path}/links")
    except AnalysisException:
        _log.info("knn index links/ at %s holds no data files; "
                  "serving from adjacency only", path)
        return None


def knn_probe(
    spark,
    path: str,
    queries: DataFrame,
    beam: int = 16,
    hops: int = 6,
    n_entries: int = 4,
    checkpoint: bool = True,
    query_emb: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool | None = None,
) -> DataFrame:
    """Beam search served from a knn_save index with PARTITION-PRUNED
    reads — result-identical to beam_search on the loaded graph
    (pinned by test_knn_probe_equals_beam_search and the
    ns_knn_probe census): same entry pick (top-n_entries of the
    saved md5 order; requires n_entries <= max_entries), same hop
    expansion, same (s DESC, b ASC) cuts. Per hop it reads only

    - the adjacency partitions the current beam's nodes hash into
      (``pa IN (...)`` pushed into the scan), and
    - the vector partitions of the candidate ids (via
      _pruned_vectors),

    so I/O per hop ~ |touched partitions| / n_parts of the index —
    never a full scan. The per-hop collects fetch DISTINCT partition
    VALUES only (each bounded by n_parts); candidate frames stay
    distributed. `queries` holds one column `a` of corpus-member
    ids; `query_emb` supplies external query vectors (then `a` need
    not exist in the index)."""
    meta = (
        spark.read.schema(_META_SCHEMA)
        .parquet(f"{path}/meta")
        .collect()[0]
    )
    n_parts = meta.n_parts
    if n_entries > meta.max_entries:
        raise ValueError(
            f"n_entries={n_entries} exceeds the saved index's "
            f"max_entries={meta.max_entries}"
        )
    # bigint pin BEFORE any hashing: the index keys are bigint and
    # xxhash64 is type-sensitive, so an int-typed caller id would
    # prune to the wrong partitions and silently return empty
    queries = queries.select(F.col("a").cast("bigint").alias("a"))
    ent = (
        spark.read.schema(_ENTRIES_SCHEMA)
        .parquet(f"{path}/entries")
        .orderBy("__h", "id")
        .limit(n_entries)
        .select(F.col("id").alias("b"))
    )
    # one vectors read per serve, shared by every per-hop pruned
    # fetch (r15, guide §6 — see _pruned_vectors)
    vec_base = spark.read.parquet(f"{path}/vectors")
    qe = (
        _pruned_vectors(spark, path, n_parts, queries, "a", vec_base)
        if query_emb is None
        else _normalize(query_emb, id_col, vec_col)
    )
    # r14 (guide §5): qe feeds _score_pairs on EVERY hop; as a lazy
    # plan its vectors-scan + semi-join re-executed hops+1 times (7x
    # at the bench's hops=6). One localCheckpoint bounds it to a
    # single read — qe is |queries| rows, never corpus-sized.
    # r15 (guide §5/§6, VERDICT r14 item 1): every checkpoint in this
    # function is LAZY (eager=False). An eager localCheckpoint is a
    # full driver barrier (one extra Spark job per call); lazy marking
    # truncates the plan identically but defers materialization to the
    # NEXT action — and in this loop the next action is always the
    # partition-value collect that needs the data anyway, so the
    # checkpoint job fuses into it. Per hop: 4 driver jobs -> 2
    # (frontier-parts collect materializes last hop's g; candidate-
    # parts collect materializes new_pairs). Results are identical —
    # a checkpoint is semantically transparent either way.
    if checkpoint:
        qe = qe.localCheckpoint(eager=False)
    f0 = queries.select("a").crossJoin(ent).where(
        F.col("a") != F.col("b")
    )
    cand = _pruned_vectors(
        spark, path, n_parts, f0.select("b"), "b", vec_base
    )
    g = _topk(_score_pairs(f0, qe, cand, arrow=arrow), beam)
    if checkpoint:
        g = g.localCheckpoint(eager=False)
    adj = (
        spark.read.schema(_ADJ_SCHEMA)
        .parquet(f"{path}/adjacency")
        .select("a", "b", "pa")
    )
    links = _read_links(spark, path)
    if links is not None:
        adj = adj.unionByName(links.select("a", "b", "pa"))
    # r14 (guide §2.3): frontier (delta) expansion with fixpoint
    # early-exit. Three exact properties of the beam update
    # g' = topk(g ∪ score(expand(g))) under the deterministic
    # (s DESC, b ASC) cut:
    #   1. scores are a pure function of (a, b), so a beam member's
    #      stored `s` can be reused — only NEVER-SEEN pairs need the
    #      vector fetch + scoring join;
    #   2. the beam's k-th key never worsens round over round, so a
    #      candidate once cut can never re-enter — which also means
    #      beam exits are permanent, so the set of beam members not
    #      yet expanded is exactly the rows that ENTERED the beam on
    #      the previous hop. The frontier is therefore a provenance
    #      BIT carried through _topk (rows from scored_new are new,
    #      carried rows are not) — no anti-join, no accumulator;
    #   3. if the frontier is empty, g' = g exactly, for this and
    #      every later hop.
    # Per hop this cuts the adjacency read to the NEW beam members'
    # partitions, the vector fetch + scoring to NEW candidate pairs,
    # and ends the loop at beam fixpoint instead of running all
    # `hops` rounds. Result identical (probe == beam_search pinned by
    # test_knn_probe_equals_beam_search and the ns_knn_probe census).
    g = g.withColumn("__new", F.lit(True))
    for _ in range(hops):
        newv = g.where(F.col("__new")).select(
            "a", F.col("b").alias("v")
        )
        # the per-hop partition-value collect (bounded by n_parts)
        # doubles as the FREE fixpoint probe: an empty frontier
        # hashes into no partitions — no extra driver action needed
        parts = sorted(
            r.p
            for r in newv.select(
                F.pmod(F.xxhash64(F.col("v")), F.lit(n_parts)).alias(
                    "p"
                )
            )
            .distinct()
            .collect()
        )
        if not parts:
            break
        nbrs = adj.where(F.col("pa").isin(parts)).select(
            F.col("a").alias("v"), F.col("b").alias("nb")
        )
        # new candidate pairs only: expansion of the frontier, minus
        # pairs already in the beam (their scores are reused below)
        new_pairs = (
            newv.join(nbrs, ["v"])
            .select("a", F.col("nb").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
            .join(g.select("a", "b"), ["a", "b"], "left_anti")
        )
        # new_pairs feeds BOTH the candidate partition-value collect
        # inside _pruned_vectors and the scoring join (guide §5, §1
        # measured in wave 1: without the checkpoint the hop
        # expansion executes twice); bounded by
        # frontier x max_entries rows of (bigint, bigint). Lazy: the
        # candidate-parts collect inside _pruned_vectors materializes
        # it (r15 — no separate checkpoint job).
        if checkpoint:
            new_pairs = new_pairs.localCheckpoint(eager=False)
        cand = _pruned_vectors(
            spark, path, n_parts, new_pairs.select("b"), "b", vec_base
        )
        g = _topk(
            g.select(
                "a", "b", "s", F.lit(False).alias("__new")
            ).unionByName(
                _score_pairs(new_pairs, qe, cand, arrow=arrow)
                .withColumn("__new", F.lit(True))
            ),
            beam,
            extra=("__new",),
        )
        # lazy: next hop's frontier-parts collect materializes it; on
        # the final hop the caller's own action does (r15 — the eager
        # final-hop checkpoint job had no consumer of its eagerness)
        if checkpoint:
            g = g.localCheckpoint(eager=False)
    return g.select("a", "b", "s", "rk")


def knn_refresh(
    spark,
    path: str,
    batch_emb: DataFrame,
    k: int = 10,
    beam: int = 16,
    hops: int = 6,
    n_entries: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_new: bool = False,
    arrow: bool | None = None,
) -> dict[str, int]:
    """Incremental refresh of a saved kNN-graph index — the
    disk-resident twin of insert_batch, completing the graph-ANN
    family's save/probe/refresh symmetry with the IVF family
    (similarity.ivf_refresh). Each new vector beam-searches the
    SAVED index (knn_probe — partition-pruned reads) for its
    neighbourhood, links to its top-k, and back-links re-cut the
    touched base lists (score DESC, id ASC — cosine is symmetric
    under the fold, so the reverse edge reuses the forward score).
    The refreshed adjacency is EXACTLY insert_batch's "updated" edge
    set (pinned by test_knn_refresh_matches_insert_batch and the
    ns_knn_refresh census).

    Write surface (the scale property): dynamic partition overwrite
    rewrites ONLY the adjacency partitions holding a touched or new
    list — I/O ~ |touched partitions|/n_parts of the index, never a
    full rewrite; vectors are APPENDED to the batch's pv partitions
    (existing files untouched); the entry table (max_entries rows)
    is re-cut against the batch's hashes so future probes keep the
    exact global md5 entry order. Long links are NOT refreshed (new
    nodes are reachable via their back-links; regenerate links at
    the next full rebuild — the FreshDiskANN split).

    Idempotency (the ivf_refresh discipline): unless ``assume_new``,
    the batch is anti-joined against ids already present in its own
    vector partitions (partition-pruned read), so a RETRIED batch
    inserts nothing and rewrites nothing. Returns
    {"inserted": n_new_ids, "touched": n_recut_lists}."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_parts = meta.n_parts
    nb = _normalize(batch_emb, id_col, vec_col)
    if not assume_new:
        existing = _pruned_vectors(
            spark, path, n_parts, nb.select(F.col("id").alias("a")),
            "a",
        ).select("id")
        nb = nb.join(existing, ["id"], "left_anti")
    nb = nb.localCheckpoint()
    n_new = nb.count()
    if n_new == 0:
        return {"inserted": 0, "touched": 0}
    found = knn_probe(
        spark,
        path,
        nb.select(F.col("id").alias("a")),
        beam=beam,
        hops=hops,
        n_entries=n_entries,
        query_emb=nb.select(
            F.col("id").alias(id_col), F.col("vec").alias(vec_col)
        ),
        id_col=id_col,
        vec_col=vec_col,
        arrow=arrow,
    )
    new_edges = _topk(found.select("a", "b", "s"), k).localCheckpoint()
    rev = new_edges.select(
        F.col("b").alias("a"), F.col("a").alias("b"), "s"
    )
    touched_ids = rev.select("a").distinct()
    # adjacency partitions to rewrite: touched lists' + new lists'
    parts = sorted(
        r.p
        for r in touched_ids.select(F.col("a").alias("i"))
        .union(nb.select(F.col("id").alias("i")))
        .select(
            F.pmod(F.xxhash64(F.col("i")), F.lit(n_parts)).alias("p")
        )
        .distinct()
        .collect()
    )
    old = spark.read.parquet(f"{path}/adjacency").where(
        F.col("pa").isin(parts)
    )
    old_touched = old.join(touched_ids, ["a"], "left_semi")
    recut = _topk(
        old_touched.select("a", "b", "s").union(rev), k
    )
    n_touched = (
        recut.join(rev.select("a", "b"), ["a", "b"], "left_semi")
        .select("a")
        .distinct()
        .count()
    )
    keep = old.join(touched_ids, ["a"], "left_anti").select(
        "a", "b", "s", "rk"
    )
    merged = (
        keep.union(recut.select("a", "b", "s", "rk"))
        .union(new_edges.select("a", "b", "s", "rk"))
        .withColumn(
            "pa", F.pmod(F.xxhash64(F.col("a")), F.lit(n_parts))
        )
        # materialize BEFORE the overwrite: the plan reads the very
        # partition files the write replaces
        .localCheckpoint()
    )
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "dynamic"
    )
    try:
        merged.write.partitionBy("pa").parquet(
            f"{path}/adjacency", mode="overwrite"
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    # vectors: pure append into the batch's pv partitions
    (
        nb.select("id", "vec", "nrm")
        .withColumn(
            "pv", F.pmod(F.xxhash64(F.col("id")), F.lit(n_parts))
        )
        .write.partitionBy("pv")
        .parquet(f"{path}/vectors", mode="append")
    )
    # entries: re-cut the global md5 order against the batch (tiny —
    # max_entries + |batch| rows), materialized before overwrite
    ents = (
        spark.read.parquet(f"{path}/entries")
        .unionByName(
            nb.select("id", hash16(F.col("id"), "entry").alias("__h"))
        )
        .orderBy("__h", "id")
        .limit(int(meta.max_entries))
        .localCheckpoint()
    )
    ents.write.parquet(f"{path}/entries", mode="overwrite")
    return {"inserted": n_new, "touched": n_touched}


def knn_compact(
    spark,
    path: str,
    delete_ids: DataFrame,
    k: int = 10,
    arrow: bool | None = None,
) -> dict[str, int]:
    """Tombstone consolidation of a saved kNN-graph index — the
    delete leg completing the DISK lifecycle (save / probe /
    refresh / compact), the disk-resident twin of delete_batch
    (FreshDiskANN consolidation): drop the deleted nodes' own lists
    and vectors, re-knit every surviving in-neighbour's list from
    (its kept neighbours) ∪ (the dead neighbour's out-neighbours),
    and rewrite ONLY the adjacency partitions that hold a deleted or
    re-knit list (dynamic partition overwrite — I/O bounded by the
    touched partition set, never a full rewrite). Long links
    touching a deleted id are dropped from the links relation the
    same partition-pruned way; the entry table is re-cut from the
    survivors of its own saved superset (top-max_entries of the
    saved order excluding deleted ids — identical to what a fresh
    knn_save over the survivors would pick as long as fewer than
    (saved_entries - max_entries)… the guard below re-derives from
    vectors when the surviving superset runs short).

    The compacted adjacency equals delete_batch's "updated" edge set
    exactly (pinned by test_knn_compact_matches_delete_batch and the
    ns_knn_compact census). Returns {"deleted": n, "affected": n};
    "deleted" counts tombstone ids actually PRESENT in the index
    (partition-pruned semi-join against vectors — the ivf_delete
    semantics), so deleting an absent id is a no-op for that id and
    is not counted. A partition whose every row died is dropped
    explicitly after each dynamic overwrite (dynamic mode only
    replaces partitions present in the written data — without the
    drop, dead adjacency/vector/link files would resurface)."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_parts = meta.n_parts
    tomb = delete_ids.select(
        F.col("id").cast("bigint").alias("id")
    ).localCheckpoint()
    # honest delete count: tombstone ids actually present in the
    # index (pruned read of the tombstones' own vector partitions)
    n_deleted = _pruned_vectors(
        spark, path, n_parts, tomb.select(F.col("id").alias("a")), "a"
    ).count()
    t_a = tomb.select(F.col("id").alias("a"))
    t_b = tomb.select(F.col("id").alias("b"))
    adj = spark.read.parquet(f"{path}/adjacency")
    # in-neighbours of the dead: only their partitions + the dead
    # ids' own partitions need rewriting. Finding in-neighbours needs
    # the edges INTO dead ids — those live scattered across all
    # partitions, so this one discovery pass scans the adjacency's
    # (a, b) columns (column-pruned; at scale a dst-keyed secondary
    # index would prune it too — the dual-adjacency trade
    # export.save_bucketed makes for the property graph).
    lost = adj.join(t_b, ["b"], "left_semi").join(
        t_a, ["a"], "left_anti"
    )
    affected = lost.select("a").distinct().localCheckpoint()
    n_affected = affected.count()
    parts = sorted(
        r.p
        for r in affected.select(F.col("a").alias("i"))
        .union(tomb.select(F.col("id").alias("i")))
        .select(
            F.pmod(F.xxhash64(F.col("i")), F.lit(n_parts)).alias("p")
        )
        .distinct()
        .collect()
    )
    old = adj.where(F.col("pa").isin(parts))
    # the bridge needs the DEAD nodes' out-lists: dead ids' rows all
    # live in the pruned partition set (pa = hash(dead id))
    dead_out = old.join(t_a, ["a"], "left_semi").select(
        F.col("a").alias("__d"), F.col("b").alias("nb")
    )
    bridge = (
        lost.select("a", F.col("b").alias("__d"))
        .join(dead_out, ["__d"])
        .select("a", F.col("nb").alias("b"))
        .join(t_b, ["b"], "left_anti")
        .where(F.col("a") != F.col("b"))
        .select("a", "b")
    )
    kept_touched = (
        old.join(affected, ["a"], "left_semi")
        .join(t_b, ["b"], "left_anti")
        .select("a", "b")
    )
    cand = kept_touched.union(bridge).distinct()
    vecs = _pruned_vectors(
        spark,
        path,
        n_parts,
        cand.select("a").union(cand.select(F.col("b").alias("a"))),
        "a",
    )
    recut = _topk(_score_pairs(cand, vecs, arrow=arrow), k)
    keep = (
        old.join(t_a, ["a"], "left_anti")
        .join(affected, ["a"], "left_anti")
        .join(t_b, ["b"], "left_anti")
        .select("a", "b", "s", "rk")
    )
    merged = (
        keep.union(recut.select("a", "b", "s", "rk"))
        .withColumn(
            "pa", F.pmod(F.xxhash64(F.col("a")), F.lit(n_parts))
        )
        .localCheckpoint()
    )
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "dynamic"
    )
    try:
        merged.write.partitionBy("pa").parquet(
            f"{path}/adjacency", mode="overwrite"
        )
        _drop_emptied_partitions(
            spark, f"{path}/adjacency", "pa", parts, merged
        )
        # vectors: drop the dead rows from THEIR partitions only
        vparts = sorted(
            r.p
            for r in tomb.select(
                F.pmod(F.xxhash64(F.col("id")), F.lit(n_parts)).alias(
                    "p"
                )
            )
            .distinct()
            .collect()
        )
        vkeep = (
            spark.read.parquet(f"{path}/vectors")
            .where(F.col("pv").isin(vparts))
            .join(tomb, ["id"], "left_anti")
            .select("id", "vec", "nrm", "pv")
            .localCheckpoint()
        )
        vkeep.write.partitionBy("pv").parquet(
            f"{path}/vectors", mode="overwrite"
        )
        _drop_emptied_partitions(
            spark, f"{path}/vectors", "pv", vparts, vkeep
        )
        # links: drop any long link touching a dead endpoint —
        # endpoint partitions both pruned. The source partition set
        # is collected BEFORE the overwrite replaces its files.
        lk = spark.read.parquet(f"{path}/links")
        lparts = sorted(
            r.pa for r in lk.select("pa").distinct().collect()
        )
        lkeep = (
            lk.join(t_a, ["a"], "left_anti")
            .join(t_b, ["b"], "left_anti")
            .select("a", "b", "pa")
            .localCheckpoint()
        )
        lkeep.write.partitionBy("pa").parquet(
            f"{path}/links", mode="overwrite"
        )
        _drop_emptied_partitions(
            spark, f"{path}/links", "pa", lparts, lkeep
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    # entries: survivors of the saved superset, re-derived from the
    # full survivor set when deletions ate into the cushion
    ents = spark.read.parquet(f"{path}/entries").join(
        tomb, ["id"], "left_anti"
    )
    if ents.count() < meta.max_entries:
        ents = (
            spark.read.parquet(f"{path}/vectors")
            .select("id", hash16(F.col("id"), "entry").alias("__h"))
            .orderBy("__h", "id")
            .limit(int(meta.max_entries))
        )
    ents = ents.localCheckpoint()
    ents.write.parquet(f"{path}/entries", mode="overwrite")
    return {"deleted": n_deleted, "affected": n_affected}


def knn_repartition(
    spark, path: str, n_parts: int
) -> dict[str, int]:
    """Resize a knn_save index's partition layout — the maintenance
    step a GROWING index needs after many knn_refresh batches (the
    128MB-1GB-per-partition sizing rule stops holding once the
    corpus has multiplied; ivf_rebalance is the IVF family's
    analogue of this health step). Rehashes every relation keyed by
    the partition hash (adjacency, links, vectors) under the new
    modulus and rewrites them; entries and the trained order are
    untouched except meta's n_parts. A modulus change moves ~every
    row by construction, so this IS a full rewrite — the one
    lifecycle step that costs O(index); run it at the cadence of
    full rebuilds, not refreshes. Probe results are identical
    before/after (pinned by test_knn_repartition_preserves_probe):
    the layout changes which FILES hold a row, never which rows
    exist. The rewrites PIN partitionOverwriteMode=static (restored
    after): a session-global dynamic mode would, on a shrink (e.g.
    8→4), leave the old >=n_parts directories in place and duplicate
    every surviving row (r13 ADVICE item)."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_moved = 0
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    try:
        for rel, key, cols in (
            ("adjacency", "a", ["a", "b", "s", "rk"]),
            ("links", "a", ["a", "b"]),
            ("vectors", "id", ["id", "vec", "nrm"]),
        ):
            try:
                src = spark.read.parquet(f"{path}/{rel}")
            except Exception:
                continue  # no-links index: empty relation, no files
            df = (
                src.select(*cols)
                .withColumn(
                    "__p",
                    F.pmod(F.xxhash64(F.col(key)), F.lit(n_parts)),
                )
                .localCheckpoint()
            )
            n_moved += df.count()
            part_col = "pa" if key == "a" else "pv"
            df.withColumnRenamed("__p", part_col).write.partitionBy(
                part_col
            ).parquet(f"{path}/{rel}", mode="overwrite")
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    spark.createDataFrame(
        [(int(n_parts), int(meta.max_entries))],
        "n_parts int, max_entries int",
    ).write.parquet(f"{path}/meta", mode="overwrite")
    return {"n_parts": n_parts, "rows_rewritten": n_moved}
