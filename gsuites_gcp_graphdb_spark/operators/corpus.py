"""Corpus-management operators for training-data pipelines: deterministic
train/val/test splitting, per-domain mixture sampling, benchmark
decontamination, and sequence packing.

These are the remaining ops a 100 TB pretraining pipeline runs between
"raw corpus" and "tokenizer input" that the dedup/similarity/text
modules don't cover. North-star surface (no reference analog —
the reference is an IAM-graph ETL, main.go; these extend the engine the
way SURVEY.md §2C extends the checklist).

Scale design:
- Splits and mixture sampling are PER-ROW hash arithmetic (md5 →
  16-bit integer), no shuffle at all: the decision for a row depends
  only on the row. At 100 TB this is a map-only pass that fuses into
  whatever scan feeds it, and the assignment is stable under
  re-partitioning, retries, and incremental re-runs (content-keyed,
  not rand()-keyed — rand() would reassign rows every run and leak
  val into train).
- Decontamination joins the corpus against a BENCHMARK shingle set.
  Benchmark suites are tiny (≤ millions of n-grams) next to the
  corpus, so the shingle set is broadcast: the 100 TB side never
  shuffles — explode → broadcast-hash-semi-ish inner join → per-doc
  count. No df-cut needed (the small side bounds the blowup).
- Packing uses a two-level scheme: a content-hash group key fans docs
  out to `n_groups` independent packers (parallelism = n_groups, no
  global sort), then a per-group running token total assigns bin ids.
  The window is per-group, so partitions stay bounded; the global
  single-ordering bottleneck of naive first-fit packing is avoided by
  construction.

All arithmetic is integer (16-bit hash buckets, integer thresholds,
integer token counts) so every op here is exactly mirrored in the
DuckDB oracles — no float rounding across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textfns import shingles, tokens

# 16-bit hash space: md5 hex chars 1..4. Big enough for 1/65536 split
# resolution, small enough to stay exact in every engine's integer
# types. The same four chars are expanded positionally in the SQL
# oracles (strpos arithmetic — see pipeline_queries._sql_hex16).
HASH_SPACE = 1 << 16


def hash16(key: Column, salt: str) -> Column:
    """Deterministic uniform int in [0, 65536): first 4 hex chars of
    md5(key || ':' || salt). Salt lets one corpus carry many
    independent assignments (split vs sample vs pack) without
    correlation between them."""
    h = F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint")


# 60-bit ordering space: md5 hex chars 1..15 (16^15 - 1 ~ 1.15e18,
# exact in signed BIGINT in both engines). hash16's 65536 values are
# fine for SPLIT decisions (1/65536 resolution) but collide heavily
# as an ORDERING key once a partition exceeds ~65k rows, leaving long
# runs decided by the (key, id) tie-break — i.e. ascending original
# ids, exactly the correlation a shuffle exists to destroy. 2^60
# keeps the expected tied-pair count ~ n^2 / 2^61 below one up to
# n ~ 1e9 rows per partition. SQL twin: pipeline_queries._sql_hex60.
ORDER_SPACE = 1 << 60


def hash_order(key: Column, salt: str) -> Column:
    """Deterministic uniform int in [0, 2^60): first 15 hex chars of
    md5(key || ':' || salt). Use for within-partition ORDERING keys
    (shard shuffle, permutation inits) where hash16's 16-bit space
    would collide; same salt-independence contract as hash16."""
    h = F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def split_bounds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer upper bounds (exclusive) for each split name,
    in dict order; the final bound is forced to HASH_SPACE so the
    fractions need not sum to exactly 1.0 in floating point.

    Raises ValueError when a fraction falls outside [0, 1] or the
    fractions don't sum to ~1.0 — a mis-specified split silently
    swallowing later splits (acc past HASH_SPACE) is exactly the kind
    of data bug that only surfaces downstream at scale.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for name, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction {name!r}={f} outside [0, 1]")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"fractions sum to {total}, expected ~1.0")
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    names = list(fractions)
    for name in names:
        acc += fractions[name]
        bounds.append((name, int(acc * HASH_SPACE)))
    bounds[-1] = (names[-1], HASH_SPACE)
    return bounds


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label ('train'/'val'/...)
    by content-keyed hash bucketing. Adds a `split` column.

    Map-only (no shuffle); stable across runs and re-partitioning —
    the property rand()-based splitting lacks and the reason every
    production pipeline keys splits on content hashes.
    """
    h = hash16(F.col(key_col), salt)
    expr = None
    for name, ub in split_bounds(fractions):
        cond = h < F.lit(ub)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float,
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Per-domain weighted downsampling: keep a row iff
    hash16(key) < floor(weight(domain) * 65536). Weight 1.0 keeps
    everything, 0.25 keeps a deterministic quarter. Adds `keep`.

    This is the mixture-reweighting pass of a pretraining pipeline
    (downweight boilerplate-heavy domains, upweight curated ones)
    expressed as row-local integer arithmetic — map-only, stable, and
    composable with hash_split (different salt => independent hashes).

    Raises ValueError on weights outside [0, 1] — a weight of 1.3
    would silently clamp to "keep everything" instead of upsampling.
    """
    for dom, w in {**weights, "<default>": default_weight}.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight {dom!r}={w} outside [0, 1]")
    thresh = None
    for dom, w in sorted(weights.items()):
        cond = F.col(domain_col) == dom
        t = F.lit(int(w * HASH_SPACE))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = thresh.otherwise(F.lit(int(default_weight * HASH_SPACE)))
    return df.withColumn("keep", hash16(F.col(key_col), salt) < thresh)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing >=
    `min_overlap` distinct n-token shingles with ANY benchmark doc.
    Returns (id, n_hit_shingles) for flagged docs only.

    The benchmark shingle set is deduped then BROADCAST — eval suites
    are small by definition, so the corpus side (the 100 TB side)
    never shuffles: explode → broadcast hash join → per-doc count.
    The per-doc count groupBy shuffles only (doc_id, shingle-hit)
    pairs, bounded by |benchmark shingles| x df, not corpus size.
    """
    bench_sh = (
        benchmark.select(
            F.explode(shingles(F.col(text_col), n)).alias("shingle")
        )
        .dropDuplicates()
    )
    corpus_sh = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    hits = corpus_sh.join(F.broadcast(bench_sh), "shingle")
    return (
        hits.groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_hit_shingles"))
        .filter(F.col("n_hit_shingles") >= min_overlap)
    )


def stratified_sample(
    df: DataFrame,
    per_stratum: int,
    stratum_col: str,
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exact-count stratified sampling: the first `per_stratum` rows of
    each stratum in deterministic hash order (hash16, then key as the
    total tiebreak). Balanced eval-set construction — every stratum
    contributes exactly min(per_stratum, |stratum|) rows, unlike
    fraction-based sampleBy which only hits counts in expectation.

    One shuffle (hash partition by stratum); rank is a per-stratum
    window, and Catalyst pushes the rank filter into the window sort
    as a group-limit, so no stratum ever materializes fully sorted.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        hash16(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= per_stratum)
        .drop("__rk")
    )


def pack_sequences(
    df: DataFrame,
    capacity: int,
    n_groups: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Sequence packing (fill-and-spill): concatenate docs into bins of
    ~`capacity` tokens. Docs fan out to `n_groups` independent packers
    by content hash; within a packer docs are taken in id order and a
    doc starts bin k when the tokens packed before it reach [k*cap,
    (k+1)*cap). Returns one row per doc: (id, pack_group, bin,
    n_tokens).

    Naive first-fit packing needs one global sequential scan — a
    non-starter at 100 TB. Hash-grouping first gives n_groups-way
    parallelism with zero coordination (each window is per-group), at
    the cost of packing quality only at group boundaries. Window state
    per task is one running sum — O(1) memory, no spill risk.

    `n_groups` defaults to the cluster's `defaultParallelism` so the
    packer scales with the cluster instead of a hard-coded 16 (on a
    1000-executor cluster, 16 groups would cap the stage at 16 tasks).
    Pass an explicit n_groups when the assignment must be reproducible
    across differently-sized clusters (the t2 query does).
    """
    if n_groups is None:
        n_groups = df.sparkSession.sparkContext.defaultParallelism
    if n_groups < 1:
        raise ValueError(f"n_groups={n_groups} must be >= 1")
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    grouped = df.select(
        F.col(id_col),
        (hash16(F.col(id_col), salt) % n_groups).alias("pack_group"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return grouped.select(
        id_col,
        "pack_group",
        F.floor(prev / capacity).cast("bigint").alias("bin"),
        "n_tokens",
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic global corpus shuffle into training shards — the
    last stage of every pretraining data pipeline (decorrelate
    document order, emit S reproducible shard files). shard =
    hash16(id, salt) % S; within-shard order = (hash_order(id,
    salt:ord), id) — a 60-bit draw with an INDEPENDENT salt so shard
    assignment and order don't correlate, and so the key stays
    collision-free well past 65k docs per shard (a 16-bit key there
    degenerates to id order once shards outgrow its space). Returns
    (id, shard, sort_key, position).

    Scale shape: one exchange on shard + a per-shard sort (window
    PARTITIONED by shard) — never `ORDER BY rand()` (a global sort
    whose output isn't reproducible across retries, which breaks
    both resumable writes and any training-data audit). The md5 draw
    makes the permutation a pure function of doc ids: re-running on
    the same corpus reproduces every shard byte-for-byte, and the
    per-shard order fingerprint (see ns_corpus_shuffle_shards) is
    the receipt."""
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards} must be >= 1")
    keyed = df.select(
        F.col(id_col),
        (hash16(F.col(id_col), salt) % n_shards).alias("shard"),
        hash_order(F.col(id_col), salt + ":ord").alias("sort_key"),
    )
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return keyed.withColumn(
        "position", F.row_number().over(w).cast("bigint")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-Res): each row draws a reproducible
    uniform u from its content hash and competes on u^(1/w); the k
    largest keys are the sample, with inclusion probability
    proportional to weight. This is how a pipeline takes "k docs,
    preferring high quality" without a global weighted shuffle: the
    key is map-only per row and the selection is one top-k
    (TakeOrdered — no full sort), reproducible across runs,
    partitionings, and cluster sizes because nothing depends on row
    order. Weights must be > 0; the sampling key is rounded (9) so
    the k-boundary can't flip on last-ulp pow() differences, with
    the content key as the total tiebreak.
    """
    u = (hash16(F.col(key_col), salt) + 1) / F.lit(65536.0)
    skey = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9
    )
    return (
        df.withColumn("sample_key", skey)
        .orderBy(F.col("sample_key").desc(), F.col(key_col))
        .limit(k)
    )


def class_balance(
    df: DataFrame,
    class_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "balance",
) -> DataFrame:
    """DATA-DRIVEN class rebalancing: downsample every class to
    (approximately) the minority class size via deterministic hash
    thinning — the automatic counterpart of :func:`mixture_sample`,
    whose rates are caller-supplied config. The classic use is
    balancing languages/domains before training so the head class
    cannot drown the tail.

    The acceptance test is EXACT integer arithmetic end to end:
    accept iff hash16(key) * n_class < n_min * 65536 — equivalent to
    u < n_min/n_class but with no float division, so both engines
    make the identical keep/drop decision on every row (no rate
    rounding, no last-ulp threshold flips). Expected kept per class
    ~= n_min, and the minority class keeps every row exactly
    (h * n < n * 65536 <=> h < 65536, always true).

    Scale shape: one tiny per-class count (map-side combinable), a
    broadcast join of that <#classes>-row table, then a map-only
    filter. Adds `keep` without dropping rows with a NON-NULL class:
    rows whose ``class_col`` is NULL are EXCLUDED from the output
    (the inner equi-join never matches NULL — same as the catalog
    oracle's JOIN USING). A NULL class has no meaningful count to
    balance against; filter or impute upstream if such rows must
    survive.
    """
    counts = df.groupBy(class_col).agg(F.count("*").alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    return (
        df.join(F.broadcast(counts), class_col)
        .crossJoin(F.broadcast(nmin))
        .withColumn(
            "keep",
            hash16(F.col(key_col), salt) * F.col("__n")
            < F.col("__nmin") * F.lit(HASH_SPACE),
        )
        .drop("__n", "__nmin")
    )


def temperature_sample(
    df: DataFrame,
    class_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "temperature",
) -> DataFrame:
    """Square-root TEMPERATURE sampling (alpha = 0.5): downsample
    every class with keep probability sqrt(n_min / n_class) — the
    standard multilingual/domain rebalancing curve (mC4/mT5 style
    p_i ∝ n_i^alpha): harsher than no-op (alpha=1), gentler than the
    hard floor of :func:`class_balance` (alpha=0), so head classes
    shrink toward — but not onto — the tail. Expected kept per class
    = sqrt(n_min * n_class), the geometric mean.

    Determinism contract: the threshold is floor(65536 *
    sqrt(n_min / n_class)) computed in IEEE doubles — division and
    sqrt are CORRECTLY-ROUNDED operations, so both engines derive the
    identical integer threshold (alpha=0.5 is chosen precisely
    because sqrt is exact-deterministic where pow() is only
    faithfully rounded and may differ across libm builds); the
    accept test hash16(key) < threshold is then pure integers. The
    minority class keeps every row (threshold = 65536).

    Scale shape: one tiny per-class count, broadcast, map-only
    filter — identical plan to class_balance. NULL-class rows are
    excluded (inner join semantics, same contract as class_balance).
    """
    counts = df.groupBy(class_col).agg(F.count("*").alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    thr = F.floor(
        F.lit(float(HASH_SPACE))
        * F.sqrt(
            F.col("__nmin").cast("double") / F.col("__n").cast("double")
        )
    )
    return (
        df.join(F.broadcast(counts), class_col)
        .crossJoin(F.broadcast(nmin))
        .withColumn("keep", hash16(F.col(key_col), salt) < thr)
        .drop("__n", "__nmin")
    )


def greedy_budget_select(
    df: DataFrame,
    budget: int,
    cost_col: str,
    order_col: str,
    id_col: str = "doc_id",
    band_width: int = 16384,
) -> DataFrame:
    """Exact greedy prefix selection under a total cost budget: rows
    are taken in (``order_col`` DESC, ``id_col`` ASC) order while the
    running ``cost_col`` sum stays <= ``budget`` — "fill the token
    budget with the best data first", the subset-selection step of a
    pretraining pipeline. Adds ``selected``.

    No global window (the round-4/5 discipline): ``order_col`` (a
    non-negative integer score) bands by ``band_width``; pass 1 is a
    WITHIN-band inclusive cumulative sum, pass 2 adds each band's
    offset — the total cost of all strictly-HIGHER bands — via a
    broadcast triangular join over the tiny per-band table. Costs are
    non-negative so the running sum is monotone and the selected set
    is a true prefix."""
    d = df.withColumn(
        "__band", F.floor(F.col(order_col) / F.lit(band_width))
    )
    wb = (
        Window.partitionBy("__band")
        .orderBy(F.col(order_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn(
        "__local", F.sum(F.col(cost_col).cast("decimal(38,0)")).over(wb)
    )
    bands = d.groupBy("__band").agg(
        F.sum(F.col(cost_col).cast("decimal(38,0)")).alias("__bt")
    )
    higher = bands.select(
        F.col("__band").alias("__hb"), F.col("__bt").alias("__hm")
    )
    offs = (
        bands.join(F.broadcast(higher), F.col("__hb") > F.col("__band"))
        .groupBy("__band")
        .agg(F.sum("__hm").alias("__off"))
    )
    return (
        local.join(F.broadcast(offs), ["__band"], "left")
        .withColumn(
            "__cum",
            F.col("__local")
            + F.coalesce(F.col("__off"), F.lit(0).cast("decimal(38,0)")),
        )
        .withColumn("selected", F.col("__cum") <= F.lit(budget))
        .drop("__band", "__local", "__off", "__cum")
    )


def pps_systematic_sample(
    df: DataFrame,
    k: int,
    weight_col: Column,
    id_col: str = "doc_id",
    band_width: int = 65536,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (Madow
    1949; the PPS workhorse of survey statistics and of
    epoch-weighted corpus mixing): lay k gridpoints at
    (2j+1)·W/(2k), j = 0..k-1, over the cumulative-weight line of
    the ``id_col``-ordered corpus (W = total weight) and give each
    row one copy per gridpoint inside its interval [cum-w, cum).
    Every row's inclusion count has expectation k·w/W exactly, rows
    with w > W/k get MULTIPLE copies (the oversampling a
    temperature-weighted training mixture wants), and the total
    number of emitted copies is EXACTLY k — no rejection, no
    rounding drift, fully deterministic (no RNG to replay: the only
    randomness PPS needs is the systematic offset, pinned at the
    half-stride midpoint).

    All arithmetic is exact DECIMAL(38) integers: the j-th gridpoint
    lies at or below t iff j <= (2k·t - W)/(2W), so
    count_le(t) = clamp(floor-div(2k·t - W, 2W) + 1, 0, k) and
    n_copies = count_le(cum) - count_le(cum - w) — floor division
    spelled (x - pmod(x, m)) div m because Spark's `div` truncates
    toward zero on the (possible) negative numerator of the first
    gridpoint. Cumulative weights use the banded two-pass scan
    (band by id div band_width, within-band window + broadcast
    triangular offsets over the tiny per-band table — the
    token_budget_select discipline, no global window, no single-task
    sort).

    Returns (id, weight, n_copies) for sampled rows (n_copies >= 1).
    Empty/zero-weight input returns 0 rows on both engines.
    """
    dec = "decimal(38,0)"
    d = df.select(
        F.col(id_col).alias("id"),
        weight_col.cast("long").alias("w"),
    ).filter(F.col("w") > 0)
    d = d.withColumn("__band", F.expr(f"id div {band_width}"))
    wb = (
        Window.partitionBy("__band")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn(
        "__local", F.sum(F.col("w").cast(dec)).over(wb)
    )
    bands = d.groupBy("__band").agg(
        F.sum(F.col("w").cast(dec)).alias("__bt")
    )
    lower = bands.select(
        F.col("__band").alias("__lb"), F.col("__bt").alias("__lm")
    )
    offs = (
        bands.join(F.broadcast(lower), F.col("__lb") < F.col("__band"))
        .groupBy("__band")
        .agg(F.sum("__lm").alias("__off"))
    )
    tot = bands.agg(F.sum("__bt").alias("__W"))
    cum = (
        local.join(F.broadcast(offs), ["__band"], "left")
        .withColumn(
            "__cum",
            F.col("__local")
            + F.coalesce(F.col("__off"), F.lit(0).cast(dec)),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("__W") > 0)
    )

    def count_le(t: Column) -> Column:
        # #gridpoints <= t: j-th gridpoint at (2j+1)W/(2k) <= t iff
        # j <= (2k*t - W)/(2W). Shift the numerator by +2kW so it is
        # non-negative (t >= 0), making truncating `div` == floor on
        # both engines: count = div(2k*t + (2k-1)W, 2W) - k + 1,
        # clamped to [0, k].
        num = (
            F.lit(2 * k).cast(dec) * t
            + F.lit(2 * k - 1).cast(dec) * F.col("__W")
        )
        den = F.lit(2).cast(dec) * F.col("__W")
        # num - pmod(num, den) is an exact multiple of den, so the
        # decimal division is exact; the quotient is <= 2k (small),
        # far inside decimal(38,6) exactness.
        q = (num - F.pmod(num, den)) / den
        return F.greatest(
            F.lit(0).cast(dec),
            F.least(
                F.lit(k).cast(dec),
                q.cast(dec) - F.lit(k) + F.lit(1),
            ),
        )

    out = cum.withColumn(
        "__n",
        count_le(F.col("__cum"))
        - count_le(F.col("__cum") - F.col("w").cast(dec)),
    )
    return out.filter(F.col("__n") > 0).select(
        F.col("id"),
        F.col("w").cast("bigint").alias("weight"),
        F.col("__n").cast("bigint").alias("n_copies"),
    )
