"""Similarity search over embedding columns (north-star surface).

Baseline: brute-force cosine top-k — a broadcast of the (tiny) query
set against the (huge) corpus, no shuffle of the corpus at all, then
a per-query top-k. Scale path: LSH-bucketed search — corpus grouped
by a hyperplane sketch; queries probe only their bucket, turning the
O(|corpus|) scan per query into O(bucket).

Everything is built-in higher-order functions (functions/vectors.py);
no UDF in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_similarity, dot, hyperplane_sketch


def topk_for_vector(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbours of one literal query vector.

    Plan shape: project cos_sim (codegen'd fold over the array) →
    TakeOrderedAndProject (no full sort, no shuffle of vectors).
    Ties broken by id so LIMIT is deterministic.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos_sim"),
        cosine_similarity(F.col(vec_col), q).alias("__exact"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return (
        scored.orderBy(F.col("__exact").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "cos_sim")
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force k-NN join: for every query vector, its k nearest
    corpus vectors. Queries are broadcast (they're the small side by
    construction); the corpus never shuffles. Per-query top-k via
    window rank — AQE handles the skew-free partition-by-query."""
    q = queries.select(
        F.col(q_id).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.join(F.broadcast(q)).select(
        F.col("__qid").alias(q_id),
        F.col(c_id),
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("__exact"),
    )
    w = Window.partitionBy(q_id).orderBy(
        F.col("__exact").desc(), F.col(c_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("__exact", 6).alias("cos_sim"), "rank")
    )


def _deterministic_planes(num_planes: int, dim: int) -> list[list[float]]:
    """Pseudo-random hyperplanes from a fixed LCG — deterministic
    across runs/engines without Date/random dependencies."""
    planes = []
    state = 88172645463325252
    for _ in range(num_planes):
        p = []
        for _ in range(dim):
            # xorshift64
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            p.append(((state % 2001) - 1000) / 1000.0)
        planes.append(p)
    return planes


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN: both sides sketched with the same
    deterministic hyperplanes; candidates = same-bucket pairs; exact
    cosine only on candidates. The equi-join on `bucket` is an
    ordinary shuffle/broadcast join Catalyst can optimize — this is
    the 100 TB ANN path (cost ~ bucket size, not corpus size)."""
    planes = _deterministic_planes(num_planes, dim)
    qs = queries.select(
        F.col(q_id).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        hyperplane_sketch(F.col(vec_col), planes).alias("bucket"),
    )
    cs = corpus.select(
        F.col(c_id),
        F.col(vec_col),
        hyperplane_sketch(F.col(vec_col), planes).alias("bucket"),
    )
    scored = cs.join(F.broadcast(qs), ["bucket"]).select(
        F.col("__qid").alias(q_id),
        F.col(c_id),
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("__exact"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("__exact").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("__exact", 6).alias("cos_sim"), "rank")
    )


def hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    sketch_planes: int = 256,
    dim: int = 64,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-sketch approximate k-NN: both sides sketched to
    ``sketch_planes`` sign bits (Charikar 2002 random hyperplanes,
    the round-7 Arrow kernel) packed into 63-bit BIGINT words;
    neighbour order is sketch AGREEMENT descending (Hamming distance
    ascending), ties broken on id. Each candidate compare is
    ceil(m/63) xor+bit_count ops on ~40 bytes instead of a dim-float
    dot — the binary-embedding ANN spelling, an order of magnitude
    cheaper per candidate and shuffle-free here (query sketches
    broadcast; the corpus never moves). Still O(|corpus|) per query:
    at 100 TB compose with the banded-LSH candidate generation or the
    IVF partition-pruned layout in this module — this operator is the
    cheap RERANK those candidate generators feed. Output cos_sim is
    the EXACT cosine of the returned neighbours (Arrow pair kernel),
    so downstream thresholds behave identically to brute force."""
    planes = _deterministic_planes(sketch_planes, dim)
    sk = _packed_sketch_udf(planes, 0, 1, sketch_planes)
    n_words = (sketch_planes + 62) // 63
    qs = queries.select(
        F.col(q_id).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        sk(F.col(vec_col)).alias("__qsk"),
    )
    cs = corpus.select(
        F.col(c_id),
        F.col(vec_col),
        sk(F.col(vec_col)).alias("__csk"),
    )
    hamming = sum(
        F.bit_count(
            F.col("__qsk").getItem(j).bitwiseXOR(
                F.col("__csk").getItem(j)
            )
        )
        for j in range(n_words)
    )
    scored = cs.join(F.broadcast(qs)).select(
        F.col("__qid").alias(q_id),
        F.col(c_id),
        F.col(vec_col),
        F.col("__qvec"),
        hamming.alias("__ham"),
    )
    w = Window.partitionBy(q_id).orderBy(
        F.col("__ham").asc(), F.col(c_id)
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
    return top.select(
        q_id,
        c_id,
        F.round(
            # no boundary cast (r15 §4.1): kernel upcasts internally
            _pair_cosine_udf()(F.col(vec_col), F.col("__qvec")),
            6,
        ).alias("cos_sim"),
        (F.lit(sketch_planes) - F.col("__ham"))
        .cast("bigint")
        .alias("agreement"),
        "rank",
    )


def ivf_train(
    corpus: DataFrame,
    num_centroids: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train an IVF coarse quantizer: (cid, cvec) centroid table.

    Deterministic end to end — init is the ``num_centroids`` vectors
    with the smallest ids (TakeOrdered, no full sort), then a FIXED
    number of Lloyd rounds, each: assign every vector to its most
    cosine-similar centroid (broadcast of the tiny centroid table —
    the corpus never shuffles for assignment) and recompute centroids
    as per-dimension means (posexplode + one map-combinable groupBy).
    Ties break on cid so re-runs agree. A centroid that loses every
    member keeps its previous position."""
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    from ..functions.ranking import ranked_limit

    cent = ranked_limit(
        c, ["id"], num_centroids, rank_col="cid", zero_based=True
    ).select(
        F.col("cid").cast("int").alias("cid"),
        F.transform("v", lambda x: x.cast("double")).alias("cvec"),
    )
    for _ in range(iterations):
        assigned = _ivf_assign(c, cent)
        sums = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
        )
        new_cent = sums.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
        cent = (
            cent.select("cid", F.col("cvec").alias("__old"))
            .join(new_cent, ["cid"], "left_outer")
            .select("cid", F.coalesce("cvec", "__old").alias("cvec"))
        )
        cent = cent.localCheckpoint(eager=True)
    return cent


def _ivf_assign(c: DataFrame, cent: DataFrame) -> DataFrame:
    """(id, v) x centroids -> (id, v, cid) nearest-centroid assignment
    (max cosine, cid tiebreak). Broadcast cross-join + per-id window:
    the corpus stays put; only the k-row centroid table moves."""
    scored = c.crossJoin(F.broadcast(cent)).select(
        "id",
        "v",
        "cid",
        cosine_similarity(F.col("v"), F.col("cvec")).alias("__sim"),
    )
    w = Window.partitionBy("id").orderBy(F.col("__sim").desc(), F.col("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", "v", "cid")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    iterations: int = 2,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate k-NN join: train the coarse quantizer, build
    inverted lists (corpus partitioned by nearest centroid), then each
    query probes only its ``nprobe`` closest centroids' lists — cost
    ~ nprobe/num_centroids of the corpus per query instead of all of
    it. With nprobe == num_centroids the result equals brute force
    EXACTLY (tested), which is the correctness anchor for the
    approximate path.

    At 100 TB the inverted lists are the write-time layout (partition
    the corpus by cid, the IVF analog of export.save_bucketed) so a
    probe reads only its partitions; here the assignment is computed
    in-query because fixtures are rebuilt per run."""
    cent = ivf_train(corpus, num_centroids, iterations, c_id, vec_col)
    inv = _ivf_assign(
        corpus.select(F.col(c_id).alias("id"), F.col(vec_col).alias("v")),
        cent,
    )
    qs = queries.select(
        F.col(q_id).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    qscore = qs.crossJoin(F.broadcast(cent)).select(
        "__qid",
        "__qvec",
        "cid",
        cosine_similarity(F.col("__qvec"), F.col("cvec")).alias("__sim"),
    )
    wq = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col("cid")
    )
    probes = (
        qscore.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("__qid", "__qvec", "cid")
    )
    cands = inv.join(F.broadcast(probes), ["cid"]).select(
        F.col("__qid").alias(q_id),
        F.col("id").alias(c_id),
        cosine_similarity(F.col("v"), F.col("__qvec")).alias("__exact"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("__exact").desc(), F.col(c_id))
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("__exact", 6).alias("cos_sim"), "rank")
    )


def _packed_sketch_udf(
    planes: list[list[float]], bands: int, r: int, verify_planes: int
):
    """Arrow-vectorized sign-sketch kernel: one float64 matmul per
    batch (n x dim @ dim x m), then bit-packing in numpy. Output per
    row is array<long> of length bands + ceil(verify_planes/63):
    element i < bands is band i's r-bit hash; the tail elements are
    the verify planes packed 63 bits/word. Deterministic: the plane
    matrix is a broadcast closure constant from
    _deterministic_planes, float64 everywhere."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    P = np.array(planes, dtype=np.float64)  # m x dim
    num_band = bands * r
    n_words = (verify_planes + 62) // 63

    # No type annotations: `from __future__ import annotations` turns
    # them into strings pandas_udf can't resolve for locally-imported
    # pd — pass the return type positionally instead.
    def _sketch(v):
        n = len(v)
        if n == 0:
            return pd.Series([], dtype=object)
        M = np.array(v.tolist(), dtype=np.float64)  # n x dim
        bits = (M @ P.T) > 0  # n x m
        out = np.zeros((n, bands + n_words), dtype=np.int64)
        for i in range(bands):
            seg = bits[:, i * r : (i + 1) * r].astype(np.int64)
            out[:, i] = seg.dot(
                np.int64(1) << np.arange(seg.shape[1], dtype=np.int64)
            )
        vb = bits[:, num_band:]
        for j in range(n_words):
            seg = vb[:, j * 63 : (j + 1) * 63].astype(np.int64)
            out[:, bands + j] = seg.dot(
                # shift in int64 from the start: 1 << k evaluates in
                # numpy's platform-default int BEFORE the astype, so
                # k >= 31 would overflow where that default is int32
                np.int64(1) << np.arange(seg.shape[1], dtype=np.int64)
            )
        return pd.Series(list(out))

    return F.pandas_udf(_sketch, ArrayType(LongType()))


def _pair_cosine_udf():
    """Arrow-vectorized exact cosine for candidate PAIRS (va, vb
    already joined side by side): one einsum per batch instead of an
    interpreted array-HOF fold per row — the candidate-verify hot
    loop of embedding_near_duplicates. float64 throughout."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    def _cos(va, vb):
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.array(va.tolist(), dtype=np.float64)
        B = np.array(vb.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return F.pandas_udf(_cos, DoubleType())


def _band_geometry(
    threshold: float, max_planes: int = 192, target_miss: float = 0.05
) -> tuple[int, int]:
    """Derive the banded-LSH geometry (r bits/band, b bands) from the
    target cosine threshold.

    Per-plane sign-agreement prob for a pair at cosine tau is
    p = 1 - arccos(tau)/pi (Goemans-Williamson / Charikar 2002), so a
    pair at the threshold survives banding with prob 1-(1-p^r)^b.
    Policy: hold the modeled miss rate at tau to ``target_miss``
    (b = ceil(ln(1/miss)/p^r)) and pick the LARGEST r whose band
    count still fits the r*b <= max_planes sketch budget — maximal
    per-band selectivity (random-pair admit 1-(1-2^-r)^b) at fixed
    recall and sketch cost. Examples: tau=0.9 -> (11, 17) bands,
    random admit ~0.8%; tau=0.95 -> (13, 13), ~0.2%; tau=0.4 ->
    (5, 29), ~50% — at low tau the per-plane gap (p=0.64 vs 0.5)
    carries too little information for banding alone, which is what
    the Hamming-agreement verify stage in embedding_near_duplicates
    is for."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    need = math.log(1.0 / target_miss)
    best = (1, max(1, math.ceil(need / p)))
    r = 1
    while r < 63:
        r += 1
        b = math.ceil(need / (p**r))
        if r * b > max_planes:
            break
        best = (r, b)
    return best


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int | None = None,
    dim: int = 64,
    bands: int | None = None,
    verify_planes: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos >= threshold)
    via a two-stage sketch pipeline: (1) BANDED random-hyperplane LSH
    candidate generation with geometry DERIVED FROM the threshold
    (_band_geometry), (2) a packed-bitwise Hamming-agreement verify on
    ``verify_planes`` independent sign bits evaluated INSIDE the band
    join, so only pairs whose full-sketch agreement clears a Binomial
    midpoint test ever reach the exact-cosine vector join.

    Stage 2 is the scale insurance the banding stage can't provide at
    low thresholds: per-plane agreement is p = 1 - arccos(tau)/pi, so
    with m=256 independent planes the agreement count of a pair at
    tau concentrates at m*p vs m/2 for an uncorrelated pair, sigma ~
    8 bits — at tau=0.4 (p=0.638) the midpoint cut keeps ~99% of
    threshold pairs and ~1.5% of uncorrelated ones; at tau>=0.9 the
    separation exceeds 5 sigma both ways. The agreement test is
    bit_count(xor) on ceil(m/64) packed BIGINTs — whole-stage-codegen
    JVM bit ops on 32 bytes/row, no vectors in the band shuffle — and
    it runs as the band join's post-condition, so the ~50%-of-pairs
    band matches a low-tau geometry admits are discarded before the
    candidate dedup shuffle and before any vector is fetched.
    (Round-6 geometry was a fixed 16 bands x 4 bits: ~64% of
    UNCORRELATED pairs became full candidates and every one of them
    shuffled twice through the 2x64-float vector join — the 7.3x
    bench regression this parameterization removes.)

    Explicit num_planes/bands override the derived geometry (the
    tiny-fixture unit tests pin num_planes=4, dim=2);
    verify_planes=0 disables stage 2. verify_planes=None derives the
    sketch width from tau: at low tau the per-plane information gap
    (p - 0.5) is small, so the midpoint cut needs more bits to
    separate — 256 bits is ~2.3 sigma at tau=0.4 and admitted ~8% of
    uncorrelated pairs on the sf0.1 fixture (162k candidates for 886
    true pairs, r9 profile); 512 bits is ~3.1 sigma, admits ~8x
    fewer, and costs only 4 extra packed words in the band join
    (sketching is one numpy matmul either way) — measured 2.9s ->
    2.0s on the production path with recall unchanged (borderline
    true pairs concentrate better, so 512 actually emits a few MORE
    real pairs). Above tau~0.7 the 256-bit separation already
    exceeds 5 sigma both ways; wider words would only fatten the
    shuffle."""
    if verify_planes is None:
        verify_planes = 512 if threshold < 0.7 else 256
    if num_planes is None and bands is None:
        r, bands = _band_geometry(threshold)
        num_planes = r * bands
    elif bands is None:
        r = 4 if num_planes % 4 == 0 else 1
        bands = num_planes // r
    assert num_planes % bands == 0, (num_planes, bands)
    r = num_planes // bands
    planes = _deterministic_planes(num_planes + verify_planes, dim)
    # 63 sign bits per packed word (bit 63 would overflow the signed
    # BIGINT).
    n_words = (verify_planes + 62) // 63
    sketch_udf = _packed_sketch_udf(planes, bands, r, verify_planes)
    # The per-vector sketch (bands*r + verify_planes plane dots) is
    # the hot loop. Spark's array HOFs (aggregate/zip_with, what
    # functions.vectors.dot builds on) are CodegenFallback —
    # interpreted per element — so a few hundred plane dots per row
    # cost ~10ms/row on the JVM. This is the one place built-ins
    # genuinely can't express the kernel efficiently, so it runs as
    # an Arrow-vectorized pandas_udf: one BLAS matmul per batch
    # (n x dim @ dim x m), sign bits packed to BIGINT words in
    # numpy (measured ~300x vs the HOF projection at sf0.1). Same
    # policy as operators/multimodal.py: Arrow batches only, never
    # row-at-a-time Python.
    target = int(
        embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    src = embeddings
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target, F.col(id_col))
    # Materialize the FLAT per-vector sketch row before the band
    # explode: GenerateExec re-evaluates its child projection per
    # OUTPUT row (bands x sketch cost without the barrier), and the
    # checkpoint lets the self-join read the sketch once instead of
    # recomputing it on both sides.
    flat = src.select(
        F.col(id_col).alias("id"),
        # no boundary cast (r15 §4.1): kernel upcasts internally
        sketch_udf(F.col(vec_col)).alias("__sk"),
    ).localCheckpoint(eager=False)
    s = flat.select(
        "id",
        *[
            F.col("__sk").getItem(bands + j).alias(f"__v{j}")
            for j in range(n_words)
        ],
        F.posexplode(
            F.array(*[F.col("__sk").getItem(i) for i in range(bands)])
        ).alias("band", "h"),
    )
    a = s.alias("a")
    b = s.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.h") == F.col("b.h"))
        & (F.col("a.id") < F.col("b.id"))
    )
    if verify_planes > 0:
        import math

        p_tau = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
        # Binomial-midpoint agreement cut between the tau and
        # uncorrelated means; with m >= 256 both error rates are
        # ~2 sigma or better for any tau >= 0.4.
        min_agree = math.ceil(verify_planes * (p_tau + 0.5) / 2.0)
        hamming = sum(
            F.bit_count(
                F.col(f"a.__v{j}").bitwiseXOR(F.col(f"b.__v{j}"))
            )
            for j in range(n_words)
        )
        cond = cond & (hamming <= F.lit(verify_planes - min_agree))
    cand = (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates()
    )
    va = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    # r14 (guide §4.4): the threshold filter references the
    # UDF-computed column, and Catalyst pushes a COPY of the filter
    # (with its own ArrowEvalPython) below the projection — the plan
    # carried TWO ArrowEvalPython nodes evaluating the same einsum,
    # so every candidate pair paid the exact-cosine kernel twice.
    # asNondeterministic forbids the duplication (values unchanged —
    # the kernel is deterministic; only the plan shape moves:
    # ArrowEvalPython 2 -> 1).
    exact_cos = _pair_cosine_udf().asNondeterministic()
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            # no boundary cast (r15 §4.1): kernel upcasts internally
            exact_cos(F.col("__va"), F.col("__vb")).alias("__exact"),
        )
        .filter(F.col("__exact") >= threshold)
        .select("id_a", "id_b", F.round("__exact", 6).alias("cos_sim"))
    )


def ivf_save(
    corpus: DataFrame,
    path: str,
    num_centroids: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as a WRITE-TIME LAYOUT — the 100 TB
    path ivf_topk's docstring promises: the corpus is written
    partitioned by nearest-centroid id (``cid=NN/`` directories, the
    IVF analog of export.save_bucketed), with the tiny trained
    centroid table alongside. A probe then reads ONLY its nprobe
    partitions via partition pruning — I/O ~ nprobe/num_centroids of
    the corpus — instead of scanning everything and filtering.
    """
    cent = ivf_train(corpus, num_centroids, iterations, id_col, vec_col)
    inv = _ivf_assign(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        cent,
    )
    inv.select(
        F.col("id").alias(id_col), F.col("v").alias(vec_col), "cid"
    ).write.partitionBy("cid").parquet(f"{path}/lists", mode="overwrite")
    cent.write.parquet(f"{path}/centroids", mode="overwrite")


def ivf_probe(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a saved IVF index (ivf_save) reading only the probed
    inverted-list partitions. The probed cid set (nprobe ids per
    query, deduplicated across the batch) is computed from the
    centroid table and pushed into the scan as a partition filter —
    the collect is bounded by num_centroids, never by corpus size.
    Results for the probed lists are EXACT (same scoring as
    ivf_topk); with nprobe == num_centroids this equals brute force.
    """
    cent = spark.read.parquet(f"{path}/centroids")
    qs = queries.select(
        F.col(q_id).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    qscore = qs.crossJoin(F.broadcast(cent)).select(
        "__qid",
        "__qvec",
        "cid",
        cosine_similarity(F.col("__qvec"), F.col("cvec")).alias("__sim"),
    )
    wq = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col("cid")
    )
    probes = (
        qscore.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("__qid", "__qvec", "cid")
    )
    probed_cids = sorted(
        r.cid for r in probes.select("cid").distinct().collect()
    )
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("cid").isin(probed_cids)
    )
    cands = lists.join(F.broadcast(probes), ["cid"]).select(
        F.col("__qid").alias(q_id),
        c_id,
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("__exact"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("__exact").desc(), F.col(c_id))
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("__exact", 6).alias("cos_sim"), "rank")
    )


def ivf_refresh(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_new: bool = False,
) -> None:
    """Incremental refresh of a saved IVF index (r9 VERDICT item 4) —
    the missing step of the ANN lifecycle a growing corpus needs:
    train once (ivf_save), then refresh per batch WITHOUT retraining.
    Only the NEW vectors are assigned, against the FROZEN centroid
    table (broadcast of the k-row centroids — the batch never
    shuffles for assignment), and appended to the partitioned
    inverted lists (``cid=NN/`` append-only file adds; existing list
    files are never rewritten or even read). Per-refresh cost is
    O(|batch| * num_centroids) compute + O(|batch|) write, fully
    independent of index size — the property that makes a daily
    refresh on a 100 TB corpus viable. Because the quantizer is
    frozen, (a) existing entries' probe behavior is bit-identical
    after a refresh, and (b) a new vector lands in exactly the list
    its probes will look in first (same assignment rule as the
    probe's centroid ranking). Drift in the vector distribution
    degrades recall gradually — ns_vec_drift is the monitor that
    schedules the retrain.

    Idempotence (r10 ADVICE): a RETRIED batch must not double-insert,
    so by default the batch is anti-joined against the ids already
    present in the lists it would touch — partition-pruned to the
    batch's own cid set (collected, bounded by num_centroids), so the
    guard reads only the touched lists, never the whole index. A
    deduplicated upstream (e.g. an exactly-once queue) can pass
    ``assume_new=True`` to keep the pure O(|batch|) append with zero
    index reads."""
    cent = spark.read.parquet(f"{path}/centroids")
    # Coerce the batch's vector column to the dtype the lists already
    # store (footer-only schema read): appending array<double> rows
    # into an array<float> layout would corrupt the index for every
    # later vectorized scan.
    stored = spark.read.parquet(f"{path}/lists").schema[vec_col].dataType
    inv = _ivf_assign(
        new_vectors.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast(stored).alias("v"),
        ),
        cent,
    )
    if not assume_new:
        inv = inv.localCheckpoint(eager=True)
        touched = sorted(
            r.cid for r in inv.select("cid").distinct().collect()
        )
        existing = (
            spark.read.parquet(f"{path}/lists")
            .filter(F.col("cid").isin(touched))
            .select(F.col(id_col).alias("id"))
        )
        inv = inv.join(existing, ["id"], "left_anti")
    inv.select(
        F.col("id").alias(id_col), F.col("v").alias(vec_col), "cid"
    ).write.partitionBy("cid").parquet(f"{path}/lists", mode="append")


def _sub_assign(rows: DataFrame, sub_cent: DataFrame) -> DataFrame:
    """(id, v, cid) x per-cid sub-centroids -> (id, v, cid, sub):
    within each hot list, assign every member to its most
    cosine-similar sub-centroid (ties to the lower sub). The
    sub-centroid table is 2 rows per hot list — broadcast; the
    members never shuffle for assignment."""
    scored = rows.join(F.broadcast(sub_cent), ["cid"]).select(
        "id",
        "v",
        "cid",
        "sub",
        cosine_similarity(F.col("v"), F.col("svec")).alias("__sim"),
    )
    w = Window.partitionBy("id").orderBy(F.col("__sim").desc(), F.col("sub"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", "v", "cid", "sub")
    )


def ivf_delete(
    spark,
    path: str,
    delete_ids: DataFrame,
    id_col: str = "vec_id",
    relation: str = "lists",
) -> dict[str, int]:
    """Delete vectors from a saved IVF index — the delete leg
    completing the IVF disk lifecycle (save / probe / refresh /
    rebalance / delete), the list-layout twin of
    knngraph.knn_compact. ``delete_ids`` is one column ``id``.

    Locate-by-scan, not locate-by-assignment: a vector's stored cid
    is found with ONE column-pruned pass over the lists' (id, cid)
    columns rather than replaying the centroid argmax — robust to
    any lifecycle history (ivf_rebalance moves vectors between
    lists, so the CURRENT assignment rule need not match the stored
    placement). The hit cid set is collected (bounded by the
    centroid count), and dynamic partition overwrite rewrites ONLY
    those ``cid=NN/`` partitions with the dead rows anti-joined out
    — I/O ~ |hit lists|/num_centroids of the index, never a full
    rewrite. The centroid table is untouched (quantizer unchanged;
    probe behavior for survivors is bit-identical). Deleting an id
    absent from the index is a no-op, so a retried batch is
    naturally idempotent. Returns {"deleted": n, "lists_touched":
    n}.

    ``relation`` selects the stored relation: "lists" (ivf_save's
    raw vectors) or "codes" (ivfpq_save's PQ codes) — both are
    cid-partitioned with the same id column, so one delete serves
    the whole IVF family; the PQ codebook/centroid tables are
    untouched either way."""
    ids = delete_ids.select(
        F.col("id").cast("bigint").alias("__del")
    ).localCheckpoint()
    lists = spark.read.parquet(f"{path}/{relation}")
    hit = lists.join(
        ids.select(F.col("__del").alias(id_col)), [id_col], "left_semi"
    )
    cids = sorted(
        r.cid for r in hit.select("cid").distinct().collect()
    )
    n_hit = hit.count()
    if not cids:
        return {"deleted": 0, "lists_touched": 0}
    keep = (
        lists.where(F.col("cid").isin(cids))
        .join(
            ids.select(F.col("__del").alias(id_col)),
            [id_col],
            "left_anti",
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
        keep.write.partitionBy("cid").parquet(
            f"{path}/{relation}", mode="overwrite"
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    # dynamic overwrite replaces only partitions PRESENT in the
    # written data — a list whose every member was deleted has no
    # surviving rows, so its directory must be dropped explicitly or
    # the dead files would survive the rewrite
    emptied = set(cids) - {
        r.cid for r in keep.select("cid").distinct().collect()
    }
    if emptied:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for c in sorted(emptied):
            p = jvm.org.apache.hadoop.fs.Path(
                f"{path}/{relation}/cid={c}"
            )
            p.getFileSystem(conf).delete(p, True)
    return {"deleted": n_hit, "lists_touched": len(cids)}


def ivf_rebalance(
    spark,
    path: str,
    max_skew: float = 2.0,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Bounded list maintenance for a saved IVF index (r10 VERDICT
    item 5) — the step a long-lived vector store needs between
    append-only refreshes (ivf_refresh) and a full retrain: repeated
    frozen-centroid refreshes under distribution drift pile new
    vectors into a few hot lists, which stretches probe latency (a
    probe scans whole lists) and widens the recall gap vs retrain.

    Policy: SPLIT only the oversized lists (size > max_skew * mean),
    leaving everything else byte-untouched. Each hot list gets a
    deterministic local 2-means (init = its two smallest-id members,
    ``iterations`` Lloyd rounds, cosine assignment with ties to the
    lower sub — the exact ivf_train recipe restricted to one cell;
    all hot lists train in ONE plan with cid as just another
    grouping key). Sub 0 keeps the original cid, sub 1 becomes a
    fresh cid past the current max; a degenerate list whose members
    all land on one sub (e.g. identical vectors) is left unsplit.
    The rewrite uses dynamic partition overwrite, so exactly the hot
    ``cid=`` directories are replaced and the new ones created —
    cost is O(sum of hot list sizes) compute + write, never a full
    index pass, and cold lists keep their files verbatim.

    Probe semantics after a rebalance: the centroid table carries
    the two sub-means in place of the hot centroid, so a probe ranks
    finer cells exactly where the data crowded — nprobe stays fixed
    while the probed FRACTION of the corpus shrinks toward
    nprobe/num_centroids of a balanced index. Recall is census-bound
    (ns_ivf_rebalance), matching FAISS's operational guidance that
    list splitting preserves ANN quality while restoring probe-cost
    balance (Jégou et al. 2011 run IVF on balanced lists for exactly
    this reason).

    Returns the cids that actually split (empty = no-op)."""
    lists = spark.read.parquet(f"{path}/lists")
    counts = {
        r["cid"]: r["n"]
        for r in lists.groupBy("cid")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    total = sum(counts.values())
    if not cent_rows or total == 0:
        return []
    mean_sz = total / len(cent_rows)
    hot = sorted(
        c for c, n in counts.items() if n > max_skew * mean_sz and n >= 2
    )
    if not hot:
        return []
    max_cid = max(r["cid"] for r in cent_rows)
    new_cid_map = {c: max_cid + 1 + i for i, c in enumerate(hot)}

    hot_rows = (
        lists.filter(F.col("cid").isin(hot))
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.col("cid").cast("int").alias("cid"),
        )
        .localCheckpoint(eager=True)
    )
    w_init = Window.partitionBy("cid").orderBy("id")
    sub_cent = (
        hot_rows.withColumn("__rn", F.row_number().over(w_init))
        .filter(F.col("__rn") <= 2)
        .select(
            "cid",
            (F.col("__rn") - 1).cast("int").alias("sub"),
            F.transform("v", lambda x: x.cast("double")).alias("svec"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        assigned = _sub_assign(hot_rows, sub_cent)
        sums = (
            assigned.select(
                "cid", "sub", F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cid", "sub", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
        )
        new_sc = sums.groupBy("cid", "sub").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("svec")
        )
        sub_cent = (
            sub_cent.select("cid", "sub", F.col("svec").alias("__old"))
            .join(new_sc, ["cid", "sub"], "left_outer")
            .select(
                "cid", "sub", F.coalesce("svec", "__old").alias("svec")
            )
            .localCheckpoint(eager=True)
        )
    assigned = _sub_assign(hot_rows, sub_cent).localCheckpoint(eager=True)
    present = {
        (r["cid"], r["sub"])
        for r in assigned.select("cid", "sub").distinct().collect()
    }
    split = sorted(
        c for c in hot if (c, 0) in present and (c, 1) in present
    )
    split_map = {c: new_cid_map[c] for c in split}
    if split_map:
        remap = F.create_map(
            *[
                F.lit(x)
                for pair in split_map.items()
                for x in pair
            ]
        )
        out_cid = F.when(
            (F.col("sub") == 1) & F.col("cid").isin(split),
            remap[F.col("cid")],
        ).otherwise(F.col("cid"))
    else:
        out_cid = F.col("cid")
    out = assigned.select(
        F.col("id").alias(id_col),
        F.col("v").alias(vec_col),
        out_cid.cast("int").alias("cid"),
    )
    # `assigned` is checkpointed, so the overwrite below never reads
    # the files it replaces; dynamic mode touches only the hot
    # partitions present in `out`.
    (
        out.write.partitionBy("cid")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(f"{path}/lists")
    )
    sub_means = {
        (r["cid"], r["sub"]): list(r["svec"]) for r in sub_cent.collect()
    }
    new_cent = []
    for r in cent_rows:
        c = r["cid"]
        if c in split_map:
            new_cent.append((c, sub_means[(c, 0)]))
            new_cent.append((split_map[c], sub_means[(c, 1)]))
        else:
            new_cent.append((c, list(r["cvec"])))
    spark.createDataFrame(
        new_cent, "cid int, cvec array<double>"
    ).write.parquet(f"{path}/centroids", mode="overwrite")
    return split


def _sq_l2(a, b):
    """Squared L2 distance between two equal-length arrays — the PQ
    assignment metric, one codegen'd fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _pq_subvectors(c: DataFrame, m: int) -> DataFrame:
    """(id, v) -> (id, sub, sv): split each vector into m contiguous
    subvectors (dim must divide evenly; the slice bounds are computed
    from size(v) so one plan serves any dimension)."""
    dsub = (F.size("v") / m).cast("int")
    return c.select(
        "id",
        F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("sub"),
        "v",
    ).select(
        "id",
        "sub",
        F.transform(
            F.slice(F.col("v"), F.col("sub") * dsub + 1, dsub),
            lambda x: x.cast("double"),
        ).alias("sv"),
    )


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    num_centroids: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> DataFrame:
    """Train a product-quantization codebook (Jégou et al. 2011):
    split each D-dim vector into ``m`` contiguous D/m-dim subspaces
    and run an independent deterministic Lloyd per subspace. PQ codes
    compress the corpus ~(32*D)/(m*log2(k))-fold — at 100 TB the
    codes table fits where the raw vectors cannot, which is the whole
    reason ADC search exists.

    Deterministic like ivf_train: init = subvectors of the
    ``num_centroids`` smallest-id vectors, fixed Lloyd rounds, argmin
    ties break on cid, empty cells keep their previous centroid. All
    m subspaces train in ONE plan (the subspace index is just another
    grouping key — no per-subspace driver loop).

    ``sample_mod`` is the 100 TB training path (FAISS practice:
    codebooks train on a sample, the full corpus only ENCODES): keep
    the rows whose md5-derived hash16 (the corpus-ops sampling
    convention, so DuckDB can replay the exact training census) is
    0 mod sample_mod — Lloyd's per-round cost drops by that factor
    while pq_encode_fast still walks everything. ns_pq_sampled_train
    pins the quality cost of the 1/4 sample against the full-corpus
    book at every fixture SF.

    Returns (sub, cid, cvec)."""
    from ..functions.ranking import ranked_limit
    from .corpus import hash16

    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if sample_mod is not None and sample_mod > 1:
        c = c.filter(
            F.pmod(hash16(F.col("id"), "pqtrain"), F.lit(sample_mod)) == 0
        )
    seeds = ranked_limit(
        c, ["id"], num_centroids, rank_col="cid", zero_based=True
    ).select(F.col("cid").cast("int").alias("cid"), "id", "v")
    book = _pq_subvectors(
        seeds.select(F.col("cid").alias("id"), "v"), m
    ).select(F.col("id").alias("cid"), "sub", F.col("sv").alias("cvec"))
    subs = _pq_subvectors(c, m).localCheckpoint(eager=True)
    for _ in range(iterations):
        assigned = (
            subs.join(F.broadcast(book), ["sub"])
            .select(
                "id",
                "sub",
                "sv",
                "cid",
                _sq_l2(F.col("sv"), F.col("cvec")).alias("__d"),
            )
            .groupBy("id", "sub")
            .agg(
                F.min(F.struct("__d", "cid", "sv")).alias("__best")
            )
            .select(
                "sub",
                F.col("__best.cid").alias("cid"),
                F.col("__best.sv").alias("sv"),
            )
        )
        means = (
            assigned.select(
                "sub", "cid", F.posexplode("sv").alias("pos", "val")
            )
            .groupBy("sub", "cid", "pos")
            .agg(F.avg("val").alias("mv"))
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                    lambda s: s["mv"],
                ).alias("cvec")
            )
        )
        book = (
            book.select("sub", "cid", F.col("cvec").alias("__old"))
            .join(means, ["sub", "cid"], "left_outer")
            .select(
                "sub", "cid", F.coalesce("cvec", "__old").alias("cvec")
            )
            .localCheckpoint(eager=True)
        )
    return book


def pq_encode(
    corpus: DataFrame,
    book: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector's per-subspace nearest
    codebook entry (squared-L2 argmin, cid tiebreak). Broadcast
    codebook; one (id, sub) hash-agg then one (id) re-agg — the
    corpus never shuffles its vectors, only its (small) codes."""
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (
        _pq_subvectors(c, m)
        .join(F.broadcast(book), ["sub"])
        .select(
            "id",
            "sub",
            "cid",
            _sq_l2(F.col("sv"), F.col("cvec")).alias("__d"),
        )
        .groupBy("id", "sub")
        .agg(F.min(F.struct("__d", "cid")).alias("__best"))
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sub", "__best.cid"))
                ),
                lambda s: s["cid"],
            ).alias("codes")
        )
    )


def pq_encode_fast(
    corpus: DataFrame,
    book: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pq_encode's scale path (r10 VERDICT item 4, re-aimed by
    measurement): same (id, codes array<int>) output, computed as ONE
    Arrow-vectorized kernel — the collected codebook (m*k*dsub
    doubles, e.g. 4*16*16 = 1 KiB) becomes a broadcast closure and
    each batch runs a single numpy broadcast-distance + argmin per
    subspace. The encode pass is the dominant full-corpus scan of an
    IVF-PQ build: the HOF spelling costs ~m*k interpreted _sq_l2
    folds per row PLUS an (id, sub)-explode and two hash-agg
    shuffles, while this kernel is map-only (no shuffle at all).
    Measured on the x64 replica (128k rows): 1.79s -> 0.46s
    steady-state, codes EXACTLY equal (2000/2000 — numpy argmin's
    first-min matches the min(struct(d, cid)) tie-break, and the
    r10 A/B showed no float-order flips on this data). Contrast
    with the residual subtract itself, where the same A/B showed the
    plain zip_with HOF WINNING (0.29s vs 0.64s): one O(d) subtract
    is too little compute to amortize the Arrow round-trip, so that
    stage stays a built-in on purpose (SCALING.md round-11)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    rows = book.collect()
    if not rows:
        # empty codebook (0-row corpus): emit the schema, no rows
        return corpus.select(
            F.col(id_col).alias("id"),
            F.array().cast("array<int>").alias("codes"),
        )
    k = max(r["cid"] for r in rows) + 1
    dsub = len(rows[0]["cvec"])
    B = np.zeros((m, k, dsub), dtype=np.float64)
    for r in rows:
        B[r["sub"], r["cid"]] = r["cvec"]

    def _enc(vcol):
        if len(vcol) == 0:
            return pd.Series([], dtype=object)
        V = np.array(vcol.tolist(), dtype=np.float64)
        n = V.shape[0]
        codes = np.zeros((n, m), dtype=np.int32)
        for s in range(m):
            sub = V[:, s * dsub : (s + 1) * dsub]
            d2 = ((sub[:, None, :] - B[s][None, :, :]) ** 2).sum(2)
            codes[:, s] = d2.argmin(1)
        return pd.Series(list(codes))

    enc_udf = F.pandas_udf(_enc, ArrayType(IntegerType()))
    # No cast column: np.array(..., float64) widens float32 exactly,
    # so a pre-cast would only add an interpreted transform pass.
    return corpus.select(
        F.col(id_col).alias("id"),
        enc_udf(F.col(vec_col)).alias("codes"),
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    book: DataFrame,
    k: int = 5,
    m: int = 4,
    q_id: str = "q_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: approximate dot(query, x) as the
    sum over subspaces of dot(query_sub, codebook[sub, code]). The
    per-query distance TABLE (m x k partial dots) is a broadcast-
    joined aggregate — the corpus side touches only its codes, never
    raw vectors: the operating mode of PQ at scale.

    Returns (q_id, rank, vec_id, adc_score)."""
    q = queries.select(
        F.col(q_id).alias("q_id"), F.col(vec_col).alias("v")
    )
    qtab = (
        _pq_subvectors(q.select(F.col("q_id").alias("id"), "v"), m)
        .select(F.col("id").alias("q_id"), "sub", "sv")
        .join(F.broadcast(book), ["sub"])
        .select(
            "q_id",
            "sub",
            "cid",
            F.aggregate(
                F.zip_with("sv", "cvec", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ).alias("__pdot"),
        )
    )
    code_rows = codes.select(
        "id", F.posexplode("codes").alias("sub", "cid")
    )
    scored = (
        code_rows.join(F.broadcast(qtab), ["sub", "cid"])
        .groupBy("q_id", "id")
        .agg(F.round(F.sum("__pdot"), 6).alias("adc_score"))
    )
    # same per-query window rank as knn_join: sort-based and
    # spillable, with the id tiebreak making k-boundary ties
    # deterministic on the rounded scores
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_score").desc(), F.col("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col("id").alias(id_col), "adc_score")
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    pq_centroids: int = 16,
    iterations: int = 2,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al. 2011's IndexIVFPQ —
    the composition the standalone ivf_topk and pq_adc_topk each do
    half of): the coarse quantizer partitions the corpus into
    inverted lists, and each vector is stored as the PQ code of its
    RESIDUAL r = v - c(v) (residuals concentrate near 0, so the same
    codebook budget quantizes them far more finely than raw
    vectors — the reason FAISS encodes residuals). A query probes
    its ``nprobe`` closest lists and scores candidates WITHOUT
    touching raw vectors:

        score(q, x) ~ dot(q, c_x) + sum_sub dot(q_sub, book[sub,
        code_sub(r_x)])

    — the first term is exact per probed centroid (nprobe values per
    query), the second is the ADC table lookup. At 100 TB the scan
    side is codes + list ids only (~(32*D)/(m*log2(k*)) smaller than
    raw), I/O is cut again by nprobe/num_centroids, and both factors
    compound — the operating point real vector stores run at.

    Probe selection uses the same cosine ranking as _ivf_assign, so
    a query vector PRESENT in the corpus always probes its own list
    (the invariant ns_ivfpq_recall's census leans on); scoring is
    dot-based like pq_adc_topk. Deterministic end to end (trained
    parts inherit ivf_train/pq_train's determinism; ties break on
    cid / id). Returns (q_id, rank, <c_id>, adc_score). Probe
    selection and ADC ranking are shared verbatim with the saved-
    index path (_ivfpq_probes/_ivfpq_adc_rank), so ivfpq_probe over
    an ivfpq_save layout returns EXACTLY this function's result."""
    c = corpus.select(F.col(c_id).alias("id"), F.col(vec_col).alias("v"))
    cent = ivf_train(corpus, num_centroids, iterations, c_id, vec_col)
    inv = _ivf_assign(c, cent)
    # The residual subtract stays a built-in zip_with ON PURPOSE:
    # the r11 x64 A/B measured the HOF at 0.29s vs 0.64s for an
    # Arrow kernel of the same subtract — one O(d) elementwise op is
    # too little compute to amortize the Arrow round-trip (the ~300x
    # Arrow wins live where each row does hundreds of dots). The
    # heavy stage is the ENCODE below, which is Arrow (SCALING.md
    # round-11 A/B: 1.79s -> 0.46s, codes exactly equal).
    resid = (
        inv.join(F.broadcast(cent), ["cid"])
        .select(
            "id",
            "cid",
            F.zip_with(
                "v", "cvec", lambda x, y: x.cast("double") - y
            ).alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    book = pq_train(
        resid, m=m, num_centroids=pq_centroids,
        iterations=iterations, id_col="id", vec_col="r",
    )
    codes = pq_encode_fast(
        resid, book, m=m, id_col="id", vec_col="r"
    ).join(resid.select("id", "cid"), ["id"])
    qs = queries.select(
        F.col(q_id).alias("__qid"), F.col(vec_col).alias("__qv")
    )
    probes = _ivfpq_probes(qs, cent, nprobe)
    return _ivfpq_adc_rank(qs, probes, book, codes, k, m, q_id, c_id)


def _ivfpq_probes(
    qs: DataFrame, cent: DataFrame, nprobe: int, ecent: DataFrame | None = None
) -> DataFrame:
    """(__qid, __qv) x centroids -> the nprobe most cosine-similar
    lists per query, carrying the EXACT dot(q, centroid) term:
    (__qid, __qv, cid, __qc_dot). Shared by the in-query and
    saved-index IVF-PQ paths so their probe sets are identical.

    ``ecent`` (cid, ecvec) separates the two roles a centroid plays
    after an ivfpq_rebalance: PROBE SELECTION ranks against the
    refined ``cent`` (sub-means — finer cells where the data
    crowded), while the ADC coarse term dot(q, c) must use the
    centroid each list's residuals were ENCODED against — frozen at
    encode time, so stored codes stay valid verbatim. Absent (every
    un-rebalanced index), the two roles coincide."""
    qcent = qs.crossJoin(F.broadcast(cent)).select(
        "__qid",
        "__qv",
        "cid",
        cosine_similarity(F.col("__qv"), F.col("cvec")).alias("__sim"),
        F.aggregate(
            F.zip_with(
                "__qv", "cvec", lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ).alias("__qc_dot"),
    )
    wq = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col("cid")
    )
    probes = (
        qcent.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("__qid", "__qv", "cid", "__qc_dot")
    )
    if ecent is None:
        return probes
    return probes.drop("__qc_dot").join(F.broadcast(ecent), ["cid"]).select(
        "__qid",
        "__qv",
        "cid",
        F.aggregate(
            F.zip_with(
                "__qv", "ecvec", lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ).alias("__qc_dot"),
    )


def _ivfpq_adc_rank(
    qs: DataFrame,
    probes: DataFrame,
    book: DataFrame,
    codes: DataFrame,
    k: int,
    m: int,
    q_id: str,
    c_id: str,
) -> DataFrame:
    """ADC scoring + top-k over (id, codes, cid) candidate lists —
    the scan side never touches raw vectors. Shared by ivf_pq_topk
    (in-query codes) and ivfpq_probe (partition-pruned parquet scan),
    which is what makes probe == in-query an identity, not a
    property to re-verify per release."""
    # ADC table: per (query, sub, codeword) partial dot with the
    # RESIDUAL codebook — broadcast-sized (n_q * m * pq_centroids).
    qtab = (
        _pq_subvectors(
            qs.select(F.col("__qid").alias("id"), F.col("__qv").alias("v")),
            m,
        )
        .select(F.col("id").alias("__qid"), "sub", "sv")
        .join(F.broadcast(book), ["sub"])
        .select(
            "__qid",
            "sub",
            "cid",
            F.aggregate(
                F.zip_with("sv", "cvec", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ).alias("__pdot"),
        )
    )
    cands = (
        codes.join(
            F.broadcast(probes.select("__qid", "cid", "__qc_dot")),
            ["cid"],
        )
        .select("__qid", "id", "__qc_dot", F.posexplode("codes").alias("sub", "__code"))
        .join(
            F.broadcast(qtab.withColumnRenamed("cid", "__code")),
            ["__qid", "sub", "__code"],
        )
        .groupBy("__qid", "id", "__qc_dot")
        .agg(F.sum("__pdot").alias("__rdot"))
        .select(
            "__qid",
            "id",
            F.round(F.col("__qc_dot") + F.col("__rdot"), 6).alias(
                "adc_score"
            ),
        )
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("adc_score").desc(), F.col("id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(q_id),
            "rank",
            F.col("id").alias(c_id),
            "adc_score",
        )
    )


def ivfpq_save(
    corpus: DataFrame,
    path: str,
    num_centroids: int = 8,
    m: int = 4,
    pq_centroids: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    store_raw: bool = False,
) -> None:
    """Materialize the IVF-PQ index as a WRITE-TIME LAYOUT — the
    100 TB operating point ivf_pq_topk's docstring promises, made
    durable: the corpus is stored as PQ CODES ONLY (id + m small
    ints per row, ~(32*D)/(m*log2(k*)) smaller than raw vectors),
    partitioned by coarse-centroid id (``cid=NN/`` directories),
    with the two tiny trained tables (coarse centroids, residual
    codebook) alongside. A probe then reads nprobe/num_centroids of
    an already ~32x-compressed relation — both I/O factors compound,
    and the raw vectors never need to exist at query time at all.
    Training follows ivf_pq_topk exactly (frozen recipe: cosine
    coarse assignment, residual encode via the fused Arrow kernel).

    ``store_raw=True`` co-saves the raw vectors as a ``lists/``
    relation in ivf_save's exact layout (cid-partitioned (id, vec,
    cid)) alongside the codes. Queries never touch it — ivfpq_probe
    reads codes only — but it is what makes ivfpq_rebalance EXACT:
    splitting a hot list changes its members' coarse centroid, which
    changes their residuals, and residuals can only be re-encoded
    from raw vectors (decode-then-re-encode would compound two
    quantization errors). The storage trade is deliberate: raw lists
    cost what the corpus costs anywhere else, and an operator that
    cannot afford them runs ``store_raw=False`` and treats retrain
    (ivfpq_save again) as the rebalance, scheduled by ns_vec_drift's
    threshold — the two documented maintenance modes."""
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cent = ivf_train(corpus, num_centroids, iterations, id_col, vec_col)
    inv = _ivf_assign(c, cent).localCheckpoint(eager=True)
    if store_raw:
        inv.select(
            F.col("id").alias(id_col), F.col("v").alias(vec_col), "cid"
        ).write.partitionBy("cid").parquet(
            f"{path}/lists", mode="overwrite"
        )
    resid = (
        inv
        .join(F.broadcast(cent), ["cid"])
        .select(
            "id",
            "cid",
            F.zip_with(
                "v", "cvec", lambda x, y: x.cast("double") - y
            ).alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    book = pq_train(
        resid, m=m, num_centroids=pq_centroids,
        iterations=iterations, id_col="id", vec_col="r",
    )
    codes = pq_encode_fast(
        resid, book, m=m, id_col="id", vec_col="r"
    ).join(resid.select("id", "cid"), ["id"])
    codes.select(
        F.col("id").alias(id_col), "codes", "cid"
    ).write.partitionBy("cid").parquet(f"{path}/codes", mode="overwrite")
    cent.write.parquet(f"{path}/centroids", mode="overwrite")
    book.write.parquet(f"{path}/codebook", mode="overwrite")


def ivfpq_refresh(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_new: bool = False,
) -> None:
    """Incremental refresh of a saved IVF-PQ index — the compressed
    twin of ivf_refresh, completing the PQ lifecycle (save / probe /
    refresh): only the NEW vectors are assigned against the FROZEN
    coarse centroids, residual-encoded with the FROZEN codebook (the
    fused Arrow kernel), and appended into the ``cid=`` code
    partitions. Per-refresh cost is O(|batch| * num_centroids)
    assignment + O(|batch|) encode/write, independent of index size;
    existing code files are never rewritten. Because both trained
    parts are frozen, existing entries' probe behavior is
    bit-identical after a refresh; codebook drift under a shifting
    vector distribution degrades ADC quality gradually —
    ns_vec_drift schedules the retrain, ivf_rebalance's split policy
    applies to the raw-index layout when lists go hot.

    Idempotence matches ivf_refresh (r10 ADVICE): retried batches
    are anti-joined against ids already present in the touched cid
    partitions — and here the guard is even cheaper, because the
    scanned relation is codes-only (~32x smaller than vectors).
    ``assume_new=True`` keeps the pure append for exactly-once
    upstreams.

    If the index was saved with ``store_raw=True`` (a ``lists/``
    relation exists), the surviving batch rows are ALSO appended
    there — the raw co-store must track the codes exactly or a later
    ivfpq_rebalance would split from a stale corpus. After a
    rebalance, ASSIGNMENT uses the refined centroids (placement =
    probe routing) while the residual subtracts the list's ``ecent``
    entry (the origin its stored codes use) — mixing the two would
    interleave incompatible residual spaces inside one list."""
    cent = spark.read.parquet(f"{path}/centroids")
    book = spark.read.parquet(f"{path}/codebook")
    m_max = book.agg(F.max("sub")).collect()[0][0]
    m = int(m_max) + 1 if m_max is not None else 0
    inv = _ivf_assign(
        new_vectors.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ),
        cent,
    ).localCheckpoint(eager=True)
    origin = (
        spark.read.parquet(f"{path}/ecent").select(
            "cid", F.col("ecvec").alias("cvec")
        )
        if _parquet_relation_exists(spark, f"{path}/ecent")
        else cent
    )
    resid = inv.join(F.broadcast(origin), ["cid"]).select(
        "id",
        "cid",
        F.zip_with("v", "cvec", lambda x, y: x.cast("double") - y).alias(
            "r"
        ),
    )
    codes = (
        pq_encode_fast(resid, book, m=m, id_col="id", vec_col="r")
        .join(resid.select("id", "cid"), ["id"])
        .localCheckpoint(eager=True)
    )
    if not assume_new:
        touched = sorted(
            r.cid for r in codes.select("cid").distinct().collect()
        )
        existing = (
            spark.read.parquet(f"{path}/codes")
            .filter(F.col("cid").isin(touched))
            .select(F.col(id_col).alias("id"))
        )
        codes = codes.join(existing, ["id"], "left_anti")
        codes = codes.localCheckpoint(eager=True)
    codes.select(
        F.col("id").alias(id_col), "codes", "cid"
    ).write.partitionBy("cid").parquet(f"{path}/codes", mode="append")
    if _parquet_relation_exists(spark, f"{path}/lists"):
        # raw co-store (ivfpq_save store_raw=True): append the SAME
        # surviving rows — semi-join the assigned batch against the
        # ids that made it past the idempotency guard
        inv.join(
            codes.select("id"), ["id"], "left_semi"
        ).select(
            F.col("id").alias(id_col),
            F.col("v").cast(
                spark.read.parquet(f"{path}/lists")
                .schema[vec_col]
                .dataType
            ).alias(vec_col),
            "cid",
        ).write.partitionBy("cid").parquet(f"{path}/lists", mode="append")


def _parquet_relation_exists(spark, path: str) -> bool:
    """True iff ``path`` exists on the session's Hadoop filesystem —
    the saved-index relations are optional (e.g. ivfpq_save's raw
    ``lists/`` co-store), and probing with spark.read would turn
    'absent by design' into an AnalysisException."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hp = jvm.org.apache.hadoop.fs.Path(path)
    return hp.getFileSystem(conf).exists(hp)


def ivfpq_rebalance(
    spark,
    path: str,
    max_skew: float = 2.0,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Bounded list maintenance for a saved IVF-PQ index (r13 VERDICT
    item 3) — the compressed twin of ivf_rebalance, closing the PQ
    lifecycle (save / probe / refresh / rebalance / delete). Requires
    the raw ``lists/`` co-store (``ivfpq_save(store_raw=True)``): the
    split's local 2-means needs raw vectors (reconstructions collapse
    onto the codebook lattice). Without the co-store the documented
    maintenance mode is retrain-as-rebalance — run ivfpq_save again
    when ns_vec_drift's monitor trips — and this function raises with
    that guidance rather than guessing.

    Design: SCORE-PRESERVING REFINEMENT. A centroid plays two roles
    in IVF-PQ and a rebalance must split them apart: (1) probe
    selection (which lists a query reads) and (2) the residual origin
    codes were encoded against (r = v - c). The first implementation
    re-encoded hot rows against the new sub-means and recall COLLAPSED
    (drift-cohort recall@5 went 3/15 -> 0/15 at sf0.01): the frozen
    codebook was trained on save-time residuals, and the post-split
    residuals (tiny — each row now sits next to its own sub-mean) are
    outside its lattice, so re-encoded ADC scores were noise. The fix
    is to freeze role (2) per row forever: the split refines ONLY the
    probe quantizer (``centroids`` gets the sub-means, via
    ivf_rebalance on the co-saved lists), rows MOVE between ``cid=``
    code partitions with their code arrays byte-unchanged, and a tiny
    ``ecent`` relation (cid -> encode-centroid) records the residual
    origin for each list — split children inherit their parent's
    ecvec. ivfpq_probe ranks probes against the refined centroids but
    computes the ADC coarse term dot(q, c) against ecent, so EVERY
    (query, candidate) ADC score is bit-identical before and after a
    rebalance — recall changes only through probe selection, which is
    exactly the dial a rebalance is supposed to turn (finer cells
    where data crowded), never through code corruption. ivfpq_refresh
    likewise encodes new rows against their list's ecent.

    I/O: raw hot ``cid=`` partitions rewritten by the inner
    ivf_rebalance; code partitions rewritten only for {split cids}
    ∪ {their new siblings} (moved rows, codes verbatim); cold lists
    keep raw and code files byte-verbatim; centroids/ecent are
    centroid-count-bounded. Cost is O(sum of hot list sizes), never a
    full index pass. Returns the cids that split (empty = no-op,
    index untouched)."""
    if not _parquet_relation_exists(spark, f"{path}/lists"):
        raise ValueError(
            "ivfpq_rebalance needs the raw lists/ co-store "
            "(ivfpq_save(store_raw=True)): the split's 2-means needs "
            "raw vectors. For a codes-only index, rebalance by "
            "retraining (ivfpq_save) when ns_vec_drift's threshold "
            "trips."
        )
    cent_before = spark.read.parquet(f"{path}/centroids").collect()
    before_ids = {r["cid"] for r in cent_before}
    split = ivf_rebalance(
        spark, path, max_skew=max_skew, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    if not split:
        return []
    cent = spark.read.parquet(f"{path}/centroids")
    new_cids = sorted(
        {r["cid"] for r in cent.select("cid").collect()} - before_ids
    )
    touched = sorted(set(split) | set(new_cids))
    # Move the affected code rows to their post-split lists, codes
    # verbatim: new placement comes from the rewritten raw lists (the
    # split's output), old codes from the still-unwritten codes
    # relation — an equi-join on id over only the touched partitions
    # of each side ({split} on the codes side, {split}∪{new} on the
    # lists side; a row can move only between a split cid and its
    # sibling).
    placed = (
        spark.read.parquet(f"{path}/lists")
        .filter(F.col("cid").isin(touched))
        .select(F.col(id_col).alias("id"), "cid")
    )
    old_codes = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("cid").isin(sorted(split)))
        .select(
            F.col(id_col).alias("id"), "codes",
            F.col("cid").alias("old_cid"),
        )
    )
    moved = (
        placed.join(old_codes, ["id"])
        # materialize BEFORE the overwrite: the plan reads the very
        # code partition files the write replaces (and old_cid is
        # unreadable after it)
        .localCheckpoint(eager=True)
    )
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        moved.select(
            F.col("id").alias(id_col), "codes", "cid"
        ).write.partitionBy("cid").parquet(f"{path}/codes", mode="overwrite")
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    # ecent: the residual origin per list. Unsplit lists keep their
    # prior ecvec (or their save-time centroid for a first rebalance);
    # split children — BOTH halves — inherit the parent's, because
    # their rows' codes still encode residuals against it. Parentage
    # of each sibling cid comes from its members' pre-split placement
    # (old_cid, captured in `moved` before the overwrite); a sibling
    # drains exactly one split cid, so the distinct set is one pair
    # per sibling.
    if _parquet_relation_exists(spark, f"{path}/ecent"):
        prior = {
            r["cid"]: list(r["ecvec"])
            for r in spark.read.parquet(f"{path}/ecent").collect()
        }
    else:
        prior = {r["cid"]: list(r["cvec"]) for r in cent_before}
    parent = {
        r["cid"]: r["old_cid"]
        for r in moved.filter(F.col("cid").isin(new_cids))
        .select("cid", "old_cid")
        .distinct()
        .collect()
    }
    ecent_rows = []
    for r in cent.select("cid").collect():
        c = r["cid"]
        src = c if c in prior else parent.get(c)
        ecent_rows.append((c, prior[src]))
    spark.createDataFrame(
        ecent_rows, "cid int, ecvec array<double>"
    ).write.parquet(f"{path}/ecent", mode="overwrite")
    return split


def ivfpq_probe(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a saved IVF-PQ index (ivfpq_save) reading ONLY the
    probed code partitions: the probed cid set (nprobe per query,
    deduplicated across the batch) is computed from the centroid
    table and pushed into the codes scan as a partition filter — the
    collect is bounded by num_centroids, never by corpus size, and
    the scan touches codes, never vectors. Probe selection and ADC
    ranking are the SAME helpers ivf_pq_topk uses, so this returns
    exactly what the in-query operator returns for equal trained
    state — the identity test_ivfpq_saved_index_probe pins. After an
    ivfpq_rebalance, probe SELECTION ranks against the refined
    centroids while the ADC coarse term uses the ``ecent`` relation
    (the residual origin each list's codes were encoded against), so
    every candidate's score is unchanged by the rebalance."""
    cent = spark.read.parquet(f"{path}/centroids")
    book = spark.read.parquet(f"{path}/codebook")
    ecent = (
        spark.read.parquet(f"{path}/ecent")
        if _parquet_relation_exists(spark, f"{path}/ecent")
        else None
    )
    m = book.agg(F.max("sub")).collect()[0][0]
    m = int(m) + 1 if m is not None else 0
    qs = queries.select(
        F.col(q_id).alias("__qid"), F.col(vec_col).alias("__qv")
    )
    probes = _ivfpq_probes(qs, cent, nprobe, ecent=ecent)
    probed_cids = sorted(
        r.cid for r in probes.select("cid").distinct().collect()
    )
    codes = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("cid").isin(probed_cids))
        .select(F.col(c_id).alias("id"), "codes", "cid")
    )
    return _ivfpq_adc_rank(qs, probes, book, codes, k, m, q_id, c_id)


def scalar_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 scalar quantization — the third leg of the
    index-compression triad (IVF partitions the corpus, PQ compresses
    to subspace codes, SQ compresses each dimension to a byte):
    float32 -> uint8 is 4x smaller with per-vector (min, scale)
    dequantization, the format a 100 TB vector store actually ships
    to disk. Codes: floor((x - min)/scale) clamped to 255, scale =
    (max - min)/255 floored at 1e-12 so constant vectors quantize to
    code 0 instead of dividing by zero.

    All elementwise higher-order functions over the vector — map-only,
    no shuffle. Returns (id, n_dims, code_hash, sum_abs_err_nano):
    codes are hashed (narrow output), reconstruction error is summed
    in exact integer nano-units so the quality metric cross-checks
    bit-for-bit against the oracle (identical IEEE expression trees
    on both engines).

    The per-row params (cast array, min, scale) are materialized as
    COLUMNS through staged selects before any lambda references them:
    HOF lambdas are interpreted, and inlining array_min(transform(..))
    into a per-element expression re-scans the whole vector for every
    element — O(d^2) per row with several scans (measured: a 4x
    scale step went from seconds to ~30 minutes before this
    staging). Columns evaluate once per row; lambdas touch only
    scalars.
    """
    staged = (
        df.select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "__e"
            ),
        )
        .select(
            id_col,
            "__e",
            F.array_min("__e").alias("__vmin"),
            F.array_max("__e").alias("__vmax"),
        )
        .select(
            id_col,
            "__e",
            "__vmin",
            F.greatest(
                (F.col("__vmax") - F.col("__vmin")) / F.lit(255.0),
                F.lit(1e-12),
            ).alias("__scale"),
        )
    )
    vmin = F.col("__vmin")
    scale = F.col("__scale")
    code = lambda x: F.least(  # noqa: E731
        F.lit(255.0), F.floor((x - vmin) / scale)
    ).cast("int")
    codes = F.transform(F.col("__e"), code)
    err = lambda x: F.floor(  # noqa: E731
        F.abs(x - (vmin + code(x).cast("double") * scale)) * 1e9
    ).cast("long")
    return staged.select(
        F.col(id_col),
        F.size(codes).cast("bigint").alias("n_dims"),
        F.md5(F.concat_ws(",", F.transform(codes, lambda c: c.cast("string"))))
        .alias("code_hash"),
        F.aggregate(
            F.transform(F.col("__e"), err),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_abs_err_nano"),
    )


def dimension_stats(
    embeddings: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension mean/std over an embedding column — the
    statistics a pipeline needs before standardizing vectors,
    whitening for a quantizer (ivf/pq_train assume comparable scales),
    or auditing an embedding model for dead/saturated dimensions.

    Exactness discipline (DESIGN.md #8): components are scaled to
    micro-unit integers (floor(x * 1e6) as decimal(38)), and n, sum,
    sum-of-squares accumulate exactly; mean and the variance closed
    form (n*sq - s^2)/n^2 divide ONCE at the end in double, so both
    engines see identical integers and produce identical doubles.
    Headroom: sum sq <= n * 1e12 * max|x|^2 — safe to ~1e20 rows for
    unit-scale embeddings.

    Scale shape: one posexplode (rows x dim), one 64-key hash-agg —
    fully map-side combinable, no shuffle wider than (dim, 3 sums)."""
    dec = "decimal(38,0)"
    y = F.floor(F.col("__e").cast("double") * 1e6).cast(dec)
    exploded = embeddings.select(
        F.posexplode(F.col(vec_col)).alias("__d", "__e")
    ).select((F.col("__d") + 1).alias("dim"), y.alias("__y"))
    s = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).cast(dec).alias("__n"),
        F.sum("__y").alias("__s"),
        F.sum(F.col("__y") * F.col("__y")).alias("__sq"),
    )
    n_d = F.col("__n").cast("double")
    return s.select(
        F.col("dim").cast("bigint").alias("dim"),
        F.col("__n").cast("bigint").alias("n"),
        F.round(F.col("__s").cast("double") / n_d / 1e6, 6).alias("mean"),
        F.round(
            F.sqrt(
                (F.col("__n") * F.col("__sq") - F.col("__s") * F.col("__s"))
                .cast("double")
                / (n_d * n_d)
            )
            / 1e6,
            6,
        ).alias("std"),
    )
