"""Exact-integer Gram matrix + power iteration (operators/linalg):
hand-computed spectra on tiny embedding tables, plus the degenerate
paths (empty input, zero matrix) that the cross-engine oracle also
has to survive."""

from __future__ import annotations

from gsuites_gcp_graphdb_spark.operators import linalg as la

MICRO = la.MICRO


def test_gram_matrix_hand_computed(spark):
    emb = spark.createDataFrame(
        [(1, [3.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.i, r.j): int(r.s) for r in la.gram_matrix(emb).collect()
    }
    m = MICRO * MICRO
    assert got == {
        (0, 0): 18 * m,
        (0, 1): 0,
        (1, 0): 0,
        (1, 1): 1 * m,
    }


def test_gram_matrix_null_elements_and_ragged(spark):
    """r9 ADVICE regression: a NULL element inside an embedding must
    contribute 0 to every s_ij (the posexplode spelling and the
    DuckDB oracle both drop null products out of SUM — NaN garbage
    from None->nan->floor would be INT64_MIN-scale), and a shorter
    (ragged) vector must behave as if its missing trailing dims were
    absent rather than crash the batch matmul."""
    emb = spark.createDataFrame(
        [
            (1, [3.0, None]),  # null element -> treated as 0
            (2, [3.0, 0.0]),
            (3, [0.0, 1.0]),
            (4, [2.0]),  # ragged: dim 1 absent
            (5, None),  # whole-vector NULL: dropped entirely
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.i, r.j): int(r.s) for r in la.gram_matrix(emb).collect()
    }
    m = MICRO * MICRO
    assert got == {
        (0, 0): (9 + 9 + 0 + 4) * m,
        (0, 1): 0,
        (1, 0): 0,
        (1, 1): 1 * m,
    }


def test_power_iteration_diagonal_dominant(spark):
    """Gram = diag(18, 1): the top eigenvector is axis 0 with
    eigenvalue exactly 18; the off-axis loading decays as (1/18)^k
    and is re-quantized to 0 well before 8 rounds."""
    emb = spark.createDataFrame(
        [(1, [3.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = la.power_iteration_top(emb).collect()
    assert [(r.rank, r.dim, r.loading_micro) for r in rows] == [
        (1, 0, MICRO),
        (2, 1, 0),
    ]
    assert rows[0].eigval == 18.0


def test_power_iteration_sign_convention(spark):
    """An all-negative direction keeps its sign (infinity-norm
    normalization divides by max |w|, preserving orientation)."""
    emb = spark.createDataFrame(
        [(1, [-2.0]), (2, [-2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = la.power_iteration_top(emb).collect()
    # Gram = [[8]]; v stays positive (S v flips no sign), eigval 8.
    assert [(r.dim, r.loading_micro, r.eigval) for r in rows] == [
        (0, MICRO, 8.0)
    ]


def test_principal_extremes_hand_computed(spark):
    """v converges to axis 0, so projections are x[0]*1e6 exactly:
    vectors 1/2 project to 3e12, vector 3 to 0; with k > n both
    sides list all vectors, ordered by (side, projection, id)."""
    emb = spark.createDataFrame(
        [(1, [3.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.side, r.id): r.proj_micro2
        for r in la.principal_extremes(emb, k=2).collect()
    }
    m2 = 3 * MICRO * MICRO
    assert got == {
        ("high", 1): m2,
        ("high", 2): m2,
        ("low", 3): 0,
        ("low", 1): m2,
    }


def test_principal_extremes_empty(spark):
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    out = la.principal_extremes(emb)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "side",
        "id",
        "proj_micro2",
    ]


def test_spectral_summary_hand_computed(spark):
    """Gram = diag(18, 1) in value units: trace 19, effective rank
    19^2/(18^2+1^2) = 361/325, top dim 0 with share 18/19."""
    emb = spark.createDataFrame(
        [(1, [3.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    r = la.spectral_summary(emb).collect()[0]
    assert (r.n_vectors, r.dim, r.top_dim) == (3, 2, 0)
    assert r.trace_value == 19.0
    import math

    assert r.effective_rank == (
        math.floor(361.0 / 325.0 * 1e6 + 0.5) / 1e6
    )
    assert r.top_dim_share == math.floor(18.0 / 19.0 * 1e6 + 0.5) / 1e6


def test_spectral_summary_empty(spark):
    """Empty embeddings: the diagonal top-1 join partner is empty, so
    the summary is 0 rows — mirrored by the oracle's cross join."""
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert la.spectral_summary(emb).count() == 0


def test_power_iteration_empty(spark):
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    out = la.power_iteration_top(emb)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "rank",
        "dim",
        "loading_micro",
        "eigval",
    ]


def test_power_iteration_zero_matrix(spark):
    """All-zero embeddings: maxabs==0 breaks the loop; the start
    vector survives with eigval 0 — no division by zero."""
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    rows = la.power_iteration_top(emb).collect()
    assert [r.eigval for r in rows] == [0.0, 0.0]


def test_centered_vs_uncentered(spark):
    """Vectors = mean direction e0 plus small variance along e1: the
    UNCENTERED top direction is the mean axis (dim 0), the CENTERED
    top direction is the variance axis (dim 1), and the centered
    eigval is the variance along it."""
    emb = spark.createDataFrame(
        [(1, [5.0, 1.0]), (2, [5.0, -1.0]), (3, [5.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    un = la.power_iteration_top(emb).collect()
    assert un[0].dim == 0  # mean direction dominates raw Gram
    ce = la.power_iteration_top(emb, centered=True).collect()
    assert ce[0].dim == 1  # variance lives on axis 1
    assert ce[0].loading_micro in (MICRO, -MICRO)
    # scatter eigval = sum of squared deviations / ... reported as
    # variance: mean 0, deviations (1, -1, 0) -> var = 2/3
    import math

    assert ce[0].eigval == math.floor(2.0 / 3.0 * 1e6 + 0.5) / 1e6


def test_centered_empty(spark):
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert la.power_iteration_top(emb, centered=True).count() == 0
