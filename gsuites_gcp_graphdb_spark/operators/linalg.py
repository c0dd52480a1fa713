"""Distributed linear algebra over embedding columns: the Gram
matrix and top-eigenvector power iteration — the whitening / PCA /
spectral-diagnostic primitive a training-data pipeline runs over its
embedding store (is one direction dominating? how concentrated is the
spectrum?). The reference has no vector surface at all; this extends
the engine's embedding operators (operators/similarity.py) with the
classic dense-spectral tool, built to this codebase's cross-engine
determinism policy (DESIGN.md float rules).

Determinism design — why every number here hash-matches DuckDB:

- Inputs quantize ONCE to integer micro-units
  (``floor(x * 1e6 + 0.5)``; multiply/add/floor are all
  correctly-rounded IEEE ops on identical doubles).
- The Gram matrix S = X^T X is EXACT integer arithmetic (sums of
  int64 products in DECIMAL(38,0) — DuckDB mirrors in HUGEINT), so
  the one true float hazard — order-dependent float summation across
  rows — never arises.
- Each power step w = S v is again an exact integer product-sum;
  normalization uses the INFINITY norm (max |w_j| — an
  order-independent aggregate, unlike a float 2-norm sum) and one
  correctly-rounded double division per coordinate, re-quantized to
  micro-units. No pow/exp/log anywhere (libm-dependent); see the
  sqrt-vs-pow note in operators/corpus.temperature_sample.
- The Rayleigh quotient is a ratio of two exact integers, converted
  and divided once in double, rounded to 6 decimals.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000


def _xint(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, dim, x) with x quantized to integer micro-units."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "dim", "__x"
        ),
    ).select(
        "id",
        "dim",
        F.floor(F.col("__x") * MICRO + F.lit(0.5))
        .cast("long")
        .alias("x"),
    )


def gram_matrix(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """The (uncentered) Gram / scatter matrix S_ij = sum_rows x_i x_j
    in exact integer micro^2 units: (i, j, s DECIMAL(38,0)).

    Scale shape (r9): per-Arrow-batch LOCAL accumulation — one
    d x d int64 matmul per batch via mapInPandas emitting d^2 partial
    rows — then one map-combinable hash-agg on (i, j). The r8 shape
    (self-equi-join of the exploded (id, dim, x) relation) shuffled
    n*d^2 product rows; this shuffles d^2 rows PER BATCH (~10k rows),
    a ~n/10k reduction, and replaces the join with one BLAS-free
    integer matmul per batch (measured 4.07 -> 2.14s isolated on the
    pca_power entry at sf0.1). Exactness is preserved: quantization is
    the same floor(x*1e6 + 0.5) on float64 (identical IEEE ops to
    the _xint SQL spelling), per-batch partials are int64 — safe
    while batch_rows * max|x_micro|^2 < 2^63, i.e. ~9.2e18/1e12 ~
    9M unit-scale rows per 10k-row batch, enforced by Arrow's batch
    size — and the global sum accumulates in DECIMAL(38,0) exactly
    as before. Coordinates beyond |x| ~ 3e3 real units would
    overflow an int64 PRODUCT (same bound as the r8 advisory); the
    oracle's HUGEINT and this path share that documented limit."""
    def _partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            # pd.DataFrame over the (possibly ragged) vector lists
            # pads short rows AND maps NULL elements to NaN; zeroing
            # NaN reproduces the posexplode/oracle null-skip contract
            # exactly (a 0 element contributes 0 to every s_ij, and
            # floor(0*1e6+0.5) == 0), and ragged vectors behave as if
            # their missing trailing dims were absent.
            A = np.nan_to_num(
                pd.DataFrame(pdf["__v"].tolist()).to_numpy(
                    dtype=np.float64
                ),
                nan=0.0,
            )
            if A.size == 0:
                continue
            A = np.floor(A * MICRO + 0.5).astype(np.int64)
            S = A.T @ A
            d = S.shape[0]
            ii, jj = np.meshgrid(
                np.arange(d), np.arange(d), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype(np.int32),
                    "j": jj.ravel().astype(np.int32),
                    "s": S.ravel(),
                }
            )

    parts = (
        df.select(F.col(vec_col).cast("array<double>").alias("__v"))
        # posexplode in the r8 spelling dropped NULL vectors; keep
        # that contract before the batches reach numpy.
        .filter(F.col("__v").isNotNull())
        .mapInPandas(_partials, "i int, j int, s long")
    )
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    )


def spectral_summary(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One-row spectral concentration report from the exact-integer
    Gram matrix, no iteration needed: trace and squared Frobenius
    norm are exact DECIMAL(38) sums, and the participation ratio
    ``tr(S)^2 / ||S||_F^2`` — a.k.a. the EFFECTIVE RANK
    (sum lambda)^2 / (sum lambda^2), between 1 (all variance in one
    direction = embedding collapse) and d (isotropic) — needs only
    those two integers. Returns (n_vectors, dim, trace_value,
    effective_rank, top_dim, top_dim_share).

    Decimal headroom: s_ij <= n * MICRO^2, so frob2 <= d^2 * n^2 *
    1e24 — at n = 1e6 64-dim unit-ish vectors that is ~4e39/1e4 ≈
    1e36 < 1e38; quantize coarser (or block the dim range) beyond
    ~1e7 rows. All divisions happen once, in double, rounded to 6 via
    the floor spelling (DESIGN.md float policy).

    Empty input: the top-diagonal join partner has no rows, so the
    result is 0 rows on both engines (not a NULL-filled row)."""
    S = gram_matrix(df, id_col, vec_col)
    agg = S.agg(
        F.sum(F.when(F.col("i") == F.col("j"), F.col("s"))).alias(
            "tr"
        ),
        F.sum(
            (F.col("s") * F.col("s")).cast("decimal(38,0)")
        ).alias("frob2"),
    )
    topd = (
        S.filter(F.col("i") == F.col("j"))
        .orderBy(F.col("s").desc(), F.col("i"))
        .limit(1)
        .select(F.col("i").alias("top_dim"), F.col("s").alias("smax"))
    )
    cnt = df.agg(
        F.count("*").alias("n_vectors"),
        F.max(F.size(F.col(vec_col))).alias("dim"),
    )
    t = F.col("tr").cast("double")
    f2 = F.col("frob2").cast("double")
    six = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return (
        agg.crossJoin(topd)
        .crossJoin(cnt)
        .select(
            F.col("n_vectors").cast("long").alias("n_vectors"),
            F.col("dim").cast("long").alias("dim"),
            six(t / F.lit(float(MICRO)) ** 2).alias("trace_value"),
            six(t * t / F.nullif(f2, F.lit(0.0))).alias(
                "effective_rank"
            ),
            F.col("top_dim").cast("long").alias("top_dim"),
            six(
                F.col("smax").cast("double")
                / F.nullif(t, F.lit(0.0))
            ).alias("top_dim_share"),
        )
    )


def _power_vector(S: DataFrame, iterations: int) -> list[int] | None:
    """``iterations`` rounds of infinity-norm-normalized power
    iteration over a checkpointed Gram relation; returns the
    micro-quantized eigenvector as a Python list (d values — the
    bounded parameter-bind pattern), or None on an empty matrix.
    Every round is one d^2-row hash-agg with the current vector bound
    as literals: no join, no lineage growth, nothing collected that
    scales with the corpus."""
    d = S.agg(F.max("i")).first()[0]
    if d is None:
        return None
    d = int(d) + 1
    v = [MICRO] * d
    for _ in range(iterations):
        vlit = F.array(*[F.lit(int(c)) for c in v])
        w_rows = (
            S.groupBy("i")
            .agg(
                F.sum(
                    F.col("s")
                    * F.element_at(
                        vlit, F.col("j").cast("int") + 1
                    )
                ).alias("w")
            )
            .collect()
        )
        w = [0] * d
        for r in w_rows:
            w[int(r["i"])] = int(r["w"])
        maxabs = max(abs(c) for c in w)
        if maxabs == 0:
            break
        # one correctly-rounded double division + re-quantize per
        # coordinate — identical arithmetic on both engines
        v = [
            int(
                math.floor((float(c) / float(maxabs)) * MICRO + 0.5)
            )
            for c in w
        ]
    return v


def principal_extremes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 8,
    k: int = 10,
) -> DataFrame:
    """The ``k`` most extreme vectors at EACH end of the corpus's top
    principal direction — outlier detection along the axis that
    explains the most variance (a mislabeled batch, a source whose
    embeddings drifted, boilerplate collapsing into one direction all
    surface here first). Returns (side, rank, id, proj_micro2):
    side 'high'/'low', proj_micro2 the exact-integer projection
    sum_dim x_dim * v_dim in micro^2 units — NO division anywhere, so
    the oracle replays it bit-for-bit from the same unrolled rounds.

    Plan shape: the power vector binds as d literals, the projection
    is one map-combinable hash-agg over the exploded (id, dim, x)
    relation, and each side is a TakeOrdered top-k — no window (ranks
    are recoverable from the returned projections), no full sort."""
    x = _xint(df, id_col, vec_col)
    S = gram_matrix(df, id_col, vec_col).localCheckpoint(eager=True)
    v = _power_vector(S, iterations)
    spark = df.sparkSession
    if v is None:
        return spark.createDataFrame(
            [], "side string, id bigint, proj_micro2 bigint"
        )
    vlit = F.array(*[F.lit(int(c)) for c in v])
    proj = x.groupBy("id").agg(
        F.sum(
            F.col("x") * F.element_at(vlit, F.col("dim").cast("int") + 1)
        ).alias("proj_micro2")
    )
    cols = [
        F.col("id").cast("long").alias("id"),
        F.col("proj_micro2").cast("long").alias("proj_micro2"),
    ]
    hi = (
        proj.orderBy(F.col("proj_micro2").desc(), F.col("id"))
        .limit(k)
        .select(F.lit("high").alias("side"), *cols)
    )
    lo = (
        proj.orderBy(F.col("proj_micro2").asc(), F.col("id"))
        .limit(k)
        .select(F.lit("low").alias("side"), *cols)
    )
    return hi.unionByName(lo)


def centered_scatter(
    df: DataFrame,
    S: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, int]:
    """(M, n) where M = n*S - t t^T is n^2 times the covariance
    matrix, every entry an exact DECIMAL(38) integer (t = per-dim
    integer column sums; no mean division anywhere — centering via
    the scaled identity n*Cov = S - t t^T / n, multiplied through by
    n). d^2 rows from a tiny t x t cross join merged onto S.

    Headroom: |t_i t_j| <= (n*MICRO)^2 — at n = 1e6 unit-ish vectors
    that is 1e24, and n*|S_ij| <= n^2*MICRO^2 the same; both orders
    of magnitude inside DECIMAL(38) until n ~ 1e12 rows."""
    n_row = df.agg(F.count("*").alias("n")).first()
    n = int(n_row["n"])
    if n == 0:
        return S, 0
    x = _xint(df, id_col, vec_col)
    t = x.groupBy("dim").agg(
        F.sum(F.col("x").cast("decimal(38,0)")).alias("t")
    )
    tt = (
        t.select(F.col("dim").alias("i"), F.col("t").alias("ti"))
        .crossJoin(
            t.select(F.col("dim").alias("j"), F.col("t").alias("tj"))
        )
        .select("i", "j", (F.col("ti") * F.col("tj")).alias("__tt"))
    )
    return (
        S.join(tt, ["i", "j"])
        .select(
            "i",
            "j",
            (F.col("s") * F.lit(n) - F.col("__tt")).alias("s"),
        ),
        n,
    )


def power_iteration_top(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 8,
    top_dims: int = 8,
    centered: bool = False,
) -> DataFrame:
    """Top eigenvector of the Gram matrix by ``iterations`` rounds of
    infinity-norm-normalized power iteration; returns the ``top_dims``
    largest-|loading| dimensions as (rank, dim, loading_micro,
    eigval): loading_micro is the eigenvector coordinate in exact
    micro-units (sign preserved), eigval the Rayleigh quotient in the
    ORIGINAL value units (micro^2 rescaled), rounded to 6.

    The d-vector v is collected (d values — the same bounded
    parameter-bind as the IVF centroid fetch,
    operators/similarity.ivf_topk) and re-broadcast as literals each
    round, so every step is one d^2-row hash-agg with NO join and no
    iterative lineage growth. The uniform start vector has nonzero
    overlap with the top eigenvector of any PSD Gram matrix unless
    the data is degenerate; convergence to rank stability is what the
    unit test pins.

    With ``centered=True`` the iteration runs on the CENTERED scatter
    M = n*S - t t^T (t = per-dimension integer column sums) — still
    every entry an exact integer, no mean division anywhere — giving
    the true covariance top direction (the uncentered top direction
    is often just the mean direction when embeddings share a bias);
    eigval is then the scatter eigenvalue per row, i.e. the VARIANCE
    along the principal direction, in original value units."""
    spark = df.sparkSession
    S = gram_matrix(df, id_col, vec_col).localCheckpoint(eager=True)
    scale = 1
    if centered:
        S, n = centered_scatter(df, S, id_col, vec_col)
        if n == 0:
            S = None
        else:
            S = S.localCheckpoint(eager=True)
            # M = n * (scatter), and eigval is reported per-row
            # (variance): lambda_M / n^2 in value units
            scale = n * n
    v = _power_vector(S, iterations) if S is not None else None
    if v is None:
        return spark.createDataFrame(
            [],
            "rank bigint, dim bigint, loading_micro bigint,"
            " eigval double",
        )
    # Rayleigh quotient from exact integers: (v^T S v) / (v^T v),
    # rescaled from micro^2 value units to original units
    vlit = F.array(*[F.lit(int(c)) for c in v])
    num_row = S.agg(
        F.sum(
            F.col("s").cast("decimal(38,0)")
            * F.element_at(vlit, F.col("i").cast("int") + 1)
            * F.element_at(vlit, F.col("j").cast("int") + 1)
        ).alias("num")
    ).first()
    num = int(num_row["num"])
    den = sum(c * c for c in v)
    # floor(x*1e6 + 0.5)/1e6, NOT round(): Python round() is
    # half-to-even while SQL round() is half-away — the floor spelling
    # is the one both engines replay bit-identically
    raw = (float(num) / float(den)) / float(MICRO) ** 2 / float(scale)
    eigval = math.floor(raw * 1e6 + 0.5) / 1e6
    ranked = sorted(
        ((abs(c), -dim, c, dim) for dim, c in enumerate(v)),
        reverse=True,
    )[:top_dims]
    rows = [
        (rk + 1, dim, c, eigval)
        for rk, (_, _, c, dim) in enumerate(ranked)
    ]
    return spark.createDataFrame(
        rows,
        "rank bigint, dim bigint, loading_micro bigint, eigval double",
    )
