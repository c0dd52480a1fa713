"""Deduplication operators for training-data pipelines (north-star
surface, SURVEY.md §2C/§7.7): exact, MinHash-LSH, SimHash, and n-gram
Jaccard. All hot paths are built-in expressions (codegen'd); nothing
collects to the driver.

Scale design:
- exact dedup = hash-groupBy — one shuffle, map-side combinable;
- n-gram Jaccard = inverted-index self-join on shingle (shuffle keyed
  by shingle, skew-prone on stop-shingles → filter ubiquitous
  shingles like df-cut in IR); candidate set is linear in the
  posting-list sizes, never the O(n^2) cross join;
- MinHash-LSH = signature (narrow) → band explode (x bands) →
  self-join on band hash: the classic sub-quadratic near-dup path for
  100 TB corpora;
- SimHash = 64-bit sketch via per-bit vote aggregation, candidates by
  chunk-match banding (hamming<=k implies some k+1-chunk equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfns import (
    band_hashes,
    shingles,
)

# Scratch-cache registry: intermediate relations that feed both sides
# of a self-join are persisted (Catalyst does not reuse exchanges
# across a/b aliases of the same plan), but a long-lived session
# running many queries must not accrete storage memory. Operators
# register their persists here; the query layer calls
# release_scratch() once the previous result has been consumed
# (unpersisting is safe even if a stale plan is re-run — it just
# recomputes).
_SCRATCH: list[DataFrame] = []


def release_scratch() -> None:
    """Unpersist every scratch relation cached by dedup operators."""
    while _SCRATCH:
        _SCRATCH.pop().unpersist()


def _scratch_persist(df: DataFrame) -> DataFrame:
    _SCRATCH.append(df.persist())
    return df


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical texts: (text_md5, n_dups, doc_ids).
    md5 (not raw text) is the group key so the shuffle moves 16-byte
    keys, not documents."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count("*").cast("bigint").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the min-id representative of each exact-duplicate group.

    The group key is unhex(md5(text)) — 16-byte binary instead of the
    32-char hex string (guide §2.3 narrower types): unhex is a
    bijection on md5 output, so grouping is identical, and the key is
    internal (the result is a semi-join on id), so nothing downstream
    sees the type."""
    w = df.select(
        F.col(id_col), F.unhex(F.md5(F.col(text_col))).alias("__k")
    )
    keep = w.groupBy("__k").agg(F.min(id_col).alias(id_col))
    return df.join(keep, [id_col], "left_semi")


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, n: int,
    hash_shingles: bool = False,
) -> DataFrame:
    """(id, shingle) posting relation + per-doc set size.

    hash_shingles=True replaces the shingle string with its xxhash64
    — the scale path: the self-join shuffles 8-byte keys instead of
    ~20-byte strings and compares longs. Collision probability at
    64 bits is negligible for dedup purposes but nonzero, so the
    oracle-checked queries keep strings."""
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), n).alias("sh"),
    )
    shingle = (
        F.xxhash64(F.col("shingle")) if hash_shingles else F.col("shingle")
    )
    return sh.select(
        "id",
        F.size("sh").cast("bigint").alias("set_size"),
        F.explode("sh").alias("shingle"),
    ).select("id", "set_size", shingle.alias("shingle"))


def _dfcut_posts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    hash_shingles: bool,
    max_df: int | None,
) -> DataFrame:
    """Shared df-cut prologue of the n-gram operators: the persisted
    posting relation with stop-shingles removed and set sizes
    recomputed over the kept universe.

    The raw posting relation is persisted BEFORE the df computation
    (guide §5): ``heavy`` (the document-frequency aggregate) and the
    kept postings both derive from it, so the corpus is scanned,
    split, and exploded ONCE — previously the heavy subtree re-ran
    the whole shingling pass as the anti-join's broadcast side
    (visible as the second `Scan parquet -> ... -> Exchange (12)`
    branch in plans/r14/ns_dedup_ngram_jaccard_before.txt)."""
    posts = shingle_sets(df, id_col, text_col, n, hash_shingles)
    if max_df is None:
        return _scratch_persist(posts)
    posts = _scratch_persist(posts)
    # One map-combinable groupBy finds the (few) ubiquitous shingles;
    # the anti-join against that small set broadcasts.
    heavy = (
        posts.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("shingle")
    )
    kept = posts.join(F.broadcast(heavy), ["shingle"], "left_anti")
    kept = kept.withColumn(
        "set_size",
        F.count("*").over(Window.partitionBy("id")).cast("bigint"),
    )
    # The kept relation still feeds both sides of the candidate
    # self-join (no exchange reuse across aliases), so it is persisted
    # too; both scratch entries release together.
    return _scratch_persist(kept)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    hash_shingles: bool = False,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via inverted-index
    join — (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.

    The self-join on `shingle` only pairs docs sharing at least one
    shingle; intersection sizes come from one groupBy. This is the
    exact (no false positive/negative) counterpart that also serves
    as the verifier stage after MinHash candidate generation.

    ``max_df`` is the scale guard: shingles appearing in more than
    max_df documents are removed from the shingle universe (classic
    stop-shingle/df-cut from IR) BEFORE the self-join — a shingle
    shared by m docs yields ~m^2/2 candidate rows, so without the cut
    the join goes quadratic on exactly the shingles a real corpus has
    most of. Jaccard is then computed over the reduced universe
    (set sizes recomputed over kept shingles), keeping the operator
    deterministic and oracle-mirrorable.
    """
    # Persisted posting relation (shared df-cut prologue: one
    # shingling pass feeds the df aggregate AND both self-join sides).
    posts = _dfcut_posts(df, id_col, text_col, n, hash_shingles, max_df)
    a = posts.alias("a")
    b = posts.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    # Threshold on the EXACT integer inequality (r8 advisory):
    # inter/union >= num/den  <=>  inter*den >= num*(|A|+|B|-inter).
    # Filtering on round(jaccard, 6) admits pairs whose true Jaccard
    # is just below t but rounds to it (possible once the union
    # exceeds ~2e6 shingles) — which the prefix variant's lossless
    # cut would legitimately prune, breaking the "same output"
    # contract between the two operators. The rounded jaccard is a
    # display column only.
    from fractions import Fraction

    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    jac = inter.withColumn(
        "jaccard",
        F.round(
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
            6,
        ),
    )
    return jac.filter(
        F.col("inter") * F.lit(den)
        >= F.lit(num)
        * (F.col("size_a") + F.col("size_b") - F.col("inter"))
    ).select("id_a", "id_b", "jaccard")


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    hash_shingles: bool = False,
    max_df: int | None = None,
) -> DataFrame:
    """Prefix-filtered exact Jaccard pairs (AllPairs/PPJoin family —
    Bayardo/Ma/Srikant WWW'07, Xiao et al. WWW'08): same output as
    ngram_jaccard_pairs at t = threshold_num/threshold_den, but the
    candidate self-join runs over per-doc PREFIXES instead of full
    posting lists — the classic set-similarity-join cut.

    Lossless by the prefix lemma: order every doc's shingles by one
    global total order (ascending document frequency, rarest first —
    the order that shrinks candidates most — tie-broken by shingle);
    J(A,B) >= t implies |A∩B| >= ceil(t·max(|A|,|B|)), and a pair
    with overlap >= alpha must share an element inside BOTH prefixes
    of length |x| − alpha + 1 <= |x| − ceil(t|x|) + 1. The threshold
    enters the prefix length as EXACT integer arithmetic
    (ceil(t·s) = (num·s + den − 1) div den), so no float rounding
    can shorten a prefix below the lossless bound.

    Verification joins the (distinct) candidate pairs back to the
    full posting lists keyed on (id, shingle) — cost is candidates ×
    set size, not postings², which is the whole point at 100 TB."""
    posts = _dfcut_posts(df, id_col, text_col, n, hash_shingles, max_df)
    dfreq = posts.groupBy("shingle").agg(F.count("*").alias("__gdf"))
    ranked = posts.join(dfreq, ["shingle"]).withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("id").orderBy("__gdf", "shingle")
        ),
    )
    num, den = threshold_num, threshold_den
    plen = (
        F.col("set_size")
        - F.expr(f"({num}L * set_size + {den - 1}L) DIV {den}L")
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("__rk") <= plen).select(
        "id", "set_size", "shingle"
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    pa = posts.select(F.col("id").alias("__ia"), "shingle")
    pb = posts.select(
        F.col("id").alias("__ib"), F.col("shingle").alias("__shb")
    )
    inter = (
        cand.join(pa, cand.id_a == F.col("__ia"))
        .join(
            pb,
            (cand.id_b == F.col("__ib"))
            & (F.col("shingle") == F.col("__shb")),
        )
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    # Same EXACT integer threshold as ngram_jaccard_pairs (r8
    # advisory) — the losslessness claim only holds if the final
    # filter uses the same rational inequality the prefix length was
    # derived from; rounded jaccard is display-only.
    jac = inter.withColumn(
        "jaccard",
        F.round(
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
            6,
        ),
    )
    return jac.filter(
        F.col("inter") * F.lit(den)
        >= F.lit(num)
        * (F.col("size_a") + F.col("size_b") - F.col("inter"))
    ).select("id_a", "id_b", "jaccard")


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    hash_shingles: bool = False,
    max_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC shingle containment C(A in B) = |A ∩ B| / |A|
    (Broder 1997's containment measure, the companion to resemblance/
    Jaccard): detects documents SUBSUMED by larger ones — a quoted
    article inside a commentary page, boilerplate-wrapped copies —
    which symmetric Jaccard structurally misses (a small doc fully
    inside a big one has Jaccard ~|A|/|B| but containment 1.0).

    Returns DIRECTED rows (id, container_id, containment) with
    containment >= threshold and id != container_id: "id's shingles
    are (mostly) inside container_id's".

    Scale shape identical to ngram_jaccard_pairs — one posting-list
    self-join computes each unordered pair's intersection ONCE, then
    both directed containments are emitted from that single row (a
    cheap projection, not a second join); ``max_df`` is the same
    stop-shingle quadratic guard (set sizes recomputed over the kept
    universe so the ratio stays a true containment of the reduced
    sets)."""
    posts = _dfcut_posts(df, id_col, text_col, n, hash_shingles, max_df)
    a = posts.alias("a")
    b = posts.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    fwd = inter.select(
        F.col("id_a").alias("id"),
        F.col("id_b").alias("container_id"),
        F.round(F.col("inter") / F.col("size_a"), 6).alias("containment"),
    )
    rev = inter.select(
        F.col("id_b").alias("id"),
        F.col("id_a").alias("container_id"),
        F.round(F.col("inter") / F.col("size_b"), 6).alias("containment"),
    )
    return fwd.unionByName(rev).filter(
        F.col("containment") >= threshold
    )


def _minhash_sig(
    sh: DataFrame, num_hashes: int, use_md5: bool
) -> DataFrame:
    """(id, sh array<string>) -> (id, mh_0..mh_{k-1}): the MinHash
    signature as an explode + k codegen'd min-aggregates instead of
    k interpreted array_min(transform(...)) HOFs (guide §4 applied
    to the JVM's own interpreter: HigherOrderFunctions are
    CodegenFallback, so the seeded md5/xxhash per shingle per
    component ran outside whole-stage codegen — the dominant compute
    of every MinHash operator). Bit-identical to the HOF spelling
    (functions/textfns.py minhash_signature_md5/_xxhash, kept as the
    documented column-expression form): min over the same seeded
    multiset, string min = lexicographic = array_min's ordering; a
    null/empty shingle array explode_outer's to one null element
    whose seeded hash is null (md5 via concat null-propagation,
    xxhash via the explicit isNotNull guard — xxhash64 itself never
    returns null), and min over only-nulls is null, matching
    array_min(transform(null|[])). The groupBy shuffles one row per
    doc (partial agg collapses each doc's shingles map-side)."""
    ex = sh.select("id", F.explode_outer("sh").alias("__s"))
    if use_md5:
        aggs = [
            F.min(
                F.md5(F.concat(F.col("__s"), F.lit(f"|{j}")))
            ).alias(f"mh_{j}")
            for j in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(
                F.when(
                    F.col("__s").isNotNull(),
                    F.xxhash64(F.col("__s"), F.lit(j)),
                )
            ).alias(f"mh_{j}")
            for j in range(num_hashes)
        ]
    return ex.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    use_md5: bool = True,
    with_agreement: bool = False,
) -> DataFrame:
    """MinHash + LSH banding candidate pairs (id_a, id_b), id_a<id_b.

    use_md5=True computes signatures with the portable md5 family
    (bit-identical in DuckDB → oracle-checkable); use_md5=False uses
    xxhash64 (the fast path for real corpora).

    with_agreement=True additionally returns ``est_matches`` — the
    count of agreeing signature components for each candidate pair —
    computed INSIDE the band self-join by carrying the k signature
    columns through the band explode, so a consumer that needs the
    MinHash estimate (minhash_calibration) pays zero extra joins
    (r9 VERDICT item 3: the r9 spelling re-joined both full
    signatures onto the candidates the band join had just produced).
    The carried width is k extra columns on a bands-x-exploded
    relation — bounded by k, never by the corpus — and the pair
    dedup is unchanged because est_matches is functionally determined
    by the pair."""
    rows = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
    )
    # r14: codegen'd signature (see _minhash_sig) instead of the
    # interpreted HOF column expressions — identical values
    sig = _minhash_sig(sh, num_hashes, use_md5)
    sig_cols = [f"mh_{j}" for j in range(num_hashes)]
    carry = sig_cols if with_agreement else []
    banded = sig.select(
        "id", *carry, *band_hashes(sig_cols, bands, rows, use_md5)
    )
    # r14 (guide §2.3 narrower types): the join key `h` never leaves
    # this operator, so the md5 hex string is unhex'd to 16-byte
    # binary (a bijection on md5 output — the candidate set is
    # bit-identical) and the xxhash path keeps its native bigint
    # instead of casting to string. Halves (md5) or fifth-s (xxhash)
    # the band self-join's shuffled/persisted key bytes.
    long = (
        banded.select(
            "id",
            *carry,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            (
                                F.unhex(F.col(f"band_{b}"))
                                if use_md5
                                else F.col(f"band_{b}")
                            ).alias("h"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bh"),
        )
        .select(
            "id",
            *carry,
            F.col("bh.band").alias("band"),
            F.col("bh.h").alias("h"),
        )
    )
    # feeds both sides of the band self-join (no exchange reuse across
    # aliases) — avoids recomputing the signatures, the expensive
    # part, twice
    long = _scratch_persist(long)
    a = long.alias("a")
    b = long.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.h") == F.col("b.h"))
        & (F.col("a.id") < F.col("b.id")),
    )
    if with_agreement:
        agree = sum(
            F.when(
                F.col(f"a.{c}") == F.col(f"b.{c}"), 1
            ).otherwise(0)
            for c in sig_cols
        )
        return joined.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            agree.cast("bigint").alias("est_matches"),
        ).dropDuplicates()
    return (
        joined.select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .dropDuplicates()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    threshold: float = 0.5,
    use_md5: bool = True,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify.
    Output (id_a, id_b, jaccard) — a subset of ngram_jaccard_pairs
    (LSH may miss pairs; it never invents them)."""
    cand = minhash_lsh_candidates(
        df, id_col, text_col, n, num_hashes, bands, use_md5
    )
    posts = _scratch_persist(shingle_sets(df, id_col, text_col, n))
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
    jac = inter.withColumn(
        "jaccard",
        F.round(
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
            6,
        ),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: per-bit +/-1 votes over the token
    stream (explode + 64 map-side-combinable SUMs — the shuffle
    carries one 64-long row per doc), the sign vector packed into
    one BIGINT.

    Returns (id, simhash bigint)."""
    # r14 spelling (guide §4 applied to the JVM interpreter): the
    # previous single-row aggregate/zip_with/transform fold ran 64
    # interpreted lambda evaluations per TOKEN (HigherOrderFunctions
    # are CodegenFallback); now tokens explode and the 64 votes are
    # codegen'd SUM aggregates (partial agg collapses each doc's
    # tokens map-side, so the exchange carries one 64-long row per
    # doc). Values bit-identical: same xxhash64 per token, same vote
    # arithmetic, same pack. A null text (null token array)
    # explode_outer's to one null token whose guarded hash is null
    # -> every vote -1 -> every bit 0 -> simhash 0, exactly the old
    # fold's output on a null array (null votes -> all-zero pack).
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(F.split(F.col(text_col), " ")).alias("__t"),
    ).select(
        "id",
        F.expr(
            "CASE WHEN __t IS NULL THEN NULL ELSE xxhash64(__t) END"
        ).alias("__h"),
    )
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.expr(
                    f"CASE WHEN ((__h >> {i}) & 1) = 1"
                    " THEN 1L ELSE -1L END"
                )
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    pack_expr = (
        " + ".join(
            f"CASE WHEN v{i} > 0 THEN {1 << i}L ELSE 0L END"
            for i in range(63)
        )
        + " + CASE WHEN v63 > 0 THEN -9223372036854775808 ELSE 0L END"
    )
    return votes.select("id", F.expr(pack_expr).alias("simhash"))


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= max_hamming.

    Pigeonhole banding: split the 64-bit sketch into max_hamming+1
    chunks; any pair within distance k must agree on >=1 chunk, so we
    self-join per chunk (linear-ish) then verify with bit_count(xor).
    """
    k = max_hamming + 1
    width = 64 // k
    sh = simhash64(df, id_col, text_col)
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.expr(
                            f"(simhash >> {c * width}) & {(1 << width) - 1}"
                        ).alias("v"),
                    )
                    for c in range(k)
                ]
            )
        ).alias("ch"),
    ).select("id", "simhash", "ch.c", "ch.v")
    chunks = _scratch_persist(chunks)
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "hamming", F.expr("bit_count(sh_a ^ sh_b)").cast("bigint")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-duplicate CLUSTERS from a pair relation (id_a, id_b):
    transitive closure via connected components, representative = min
    doc id. This is the step real training-data pipelines run after
    candidate verification — near-dup relations are not transitive
    (A~B, B~C but A≁C), so keeping "one of each pair" both
    over-deletes and under-deletes; the correct unit of removal is
    the connected component.

    Returns (cluster_rep, n_members) for every cluster of size >= 2.
    Scale: partition-local union-find contraction
    (algorithms.connected_components_contract) — the round-8 profile
    showed thresholded pair relations are NOT always shallow (the
    sf0.1 semantic graph at tau=0.4 chains to diameter ~16, costing
    hash-min 17 full-shuffle rounds); contraction collapses every
    within-group path in one Arrow pass, so rounds track how often
    components straddle ~1M-edge groups, not the chain length.
    """
    from ..graph.algorithms import connected_components_contract
    from ..graph.traversal import Graph

    # Materialize the pair relation ONCE: it feeds the vertex set, the
    # edge set, and every propagation round — without this the whole
    # upstream shingle/join pipeline re-executes per derivation
    # (measured 3x the runtime at sf0.1).
    pairs = pairs.select("id_a", "id_b").localCheckpoint()
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    comp = connected_components_contract(Graph(v, e))
    return (
        comp.groupBy("component")
        .agg(F.count("*").cast("bigint").alias("n_members"))
        .select(
            F.col("component").cast("bigint").alias("cluster_rep"),
            "n_members",
        )
    )


def semantic_dedup_members(pairs: DataFrame) -> DataFrame:
    """SemDeDup-style per-member decisions (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public arXiv 2303.09540): given semantic
    near-dup pairs (id_a, id_b) from embedding cosine, group them
    into clusters (transitive closure — same rationale as
    :func:`dedup_clusters`) and KEEP exactly one representative (min
    id) per cluster. Returns (id, cluster_rep, keep) for every
    clustered member; singletons never appear (nothing to remove).

    Scale: pair generation is the LSH-bucketed path
    (similarity.embedding_near_duplicates); closure is partition-local
    union-find contraction (connected_components_contract — near-dup
    graphs chain: the sf0.1 tau=0.4 pair graph has diameter ~16,
    which cost hash-min 17 full-shuffle rounds and ~60% of this
    operator's round-7 wall time); the decision column is a
    comparison, no extra shuffle."""
    pairs = pairs.select("id_a", "id_b").localCheckpoint()
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    from ..graph.algorithms import connected_components_contract
    from ..graph.traversal import Graph

    comp = connected_components_contract(Graph(v, e))
    return comp.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("component").cast("bigint").alias("cluster_rep"),
        (F.col("id") == F.col("component")).alias("keep"),
    )


def minhash_calibration(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    use_md5: bool = True,
) -> DataFrame:
    """Per-pair MinHash ESTIMATOR CALIBRATION (r9): for every LSH
    candidate pair, the signature-agreement estimate of Jaccard
    (matching components / k — the unbiased MinHash estimator,
    Broder 1997) side by side with the exact posting-list Jaccard,
    plus the absolute calibration error. This is the measurement a
    pipeline runs before trusting signature-only dedup decisions at
    a given k: the estimator's stderr is sqrt(J(1-J)/k) (~0.14 at
    k=12, J=0.5), and the observed error distribution tells you
    whether to raise k or keep the verify stage.

    Returns (id_a, id_b, est_matches, est_jaccard, jaccard, cal_err)
    for candidate pairs with a non-empty shingle intersection (band
    agreement implies a shared argmin shingle, so this drops nothing
    in practice on either engine — both sides use the same inner
    posting join). Scale shape (r10, VERDICT item 3): est_matches is
    computed INSIDE the band self-join via
    minhash_lsh_candidates(with_agreement=True) — the r9 spelling
    recomputed the signatures and re-joined both k-column halves
    onto the candidate relation, i.e. two extra shuffling joins over
    work the band join had already touched; now the only remaining
    stage beyond candidate generation is the exact posting join the
    verified-dedup path pays anyway. (A candidate-id semi-join prune
    of the posting stage was measured and REJECTED: it makes the
    exact stage O(candidate docs) but serializes a branch Spark
    otherwise runs concurrently with the band join — isolated median
    4.1s -> 5.6s at sf0.1. At index scale the pruned shape wins on
    volume; minhash_incremental_candidates is the operator that
    already embodies it.)"""
    # r14 note: an eager localCheckpoint of est (to stop the band
    # self-join executing under both the verify subtree and the final
    # join) was MEASURED and REVERTED — isolated median 4.33s -> 5.02s
    # at sf0.1: the checkpoint serializes a branch Spark otherwise
    # runs concurrently, the same trade the r9 candidate-prune
    # rejection below documents. The r14 wave-7 fix removes the double
    # execution WITHOUT a persist: est_matches is functionally
    # determined by (id_a, id_b), so it rides THROUGH the posting join
    # as an extra grouping column and the final join-back of est onto
    # its own derivative drops out — est has exactly one consumer, the
    # band self-join plans once, and no concurrent branch is
    # serialized (the posting scan still overlaps the band join inside
    # the single query).
    est = minhash_lsh_candidates(
        df,
        id_col,
        text_col,
        n,
        num_hashes,
        bands,
        use_md5,
        with_agreement=True,
    )
    posts = _scratch_persist(shingle_sets(df, id_col, text_col, n))
    a = posts.alias("a")
    b = posts.alias("b")
    inter = (
        est.join(a, est.id_a == F.col("a.id"))
        .join(
            b,
            (est.id_b == F.col("b.id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy(
            "id_a",
            "id_b",
            "est_matches",
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    k = float(num_hashes)
    out = inter.select(
        "id_a",
        "id_b",
        "est_matches",
        F.round(F.col("est_matches") / F.lit(k), 6).alias("est_jaccard"),
        F.round(
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
            6,
        ).alias("jaccard"),
    )
    return out.withColumn(
        "cal_err",
        F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 6),
    )


def minhash_incremental_candidates(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    use_md5: bool = True,
) -> DataFrame:
    """Incremental ingest dedup: LSH candidates between an INCOMING
    batch and the EXISTING corpus (plus earlier members of the same
    batch) without ever re-comparing corpus x corpus — the production
    ingestion shape. At 100 TB the corpus band table is a materialized
    index (write it once, partitioned by band hash); each new batch
    computes only its own signatures and equi-joins against the index,
    so per-batch cost scales with |batch|, not |corpus|.

    Returns (new_id, match_id): new_id is from `batch`; match_id is an
    earlier doc sharing an LSH band (corpus member, or batch member
    with a smaller id — so a batch containing its own duplicates still
    reports them). Ids must be disjoint across the two inputs.
    """
    rows = num_hashes // bands

    def _banded(df: DataFrame, is_new: bool) -> DataFrame:
        sh = df.select(
            F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
        )
        # r14: codegen'd signature (see _minhash_sig) — identical values
        sig = _minhash_sig(sh, num_hashes, use_md5)
        banded = sig.select(
            "id",
            *band_hashes(
                [f"mh_{j}" for j in range(num_hashes)], bands, rows, use_md5
            ),
        )
        # r14 (guide §2.3): internal join key narrowed — see the same
        # rewrite in minhash_lsh_candidates (unhex is a bijection on
        # md5 output, so the match set is identical).
        return banded.select(
            "id",
            F.lit(is_new).alias("is_new"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            (
                                F.unhex(F.col(f"band_{b}"))
                                if use_md5
                                else F.col(f"band_{b}")
                            ).alias("h"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bh"),
        ).select(
            "id", "is_new",
            F.col("bh.band").alias("band"), F.col("bh.h").alias("h"),
        )

    # The corpus side only ever probes as the EXISTING side of the
    # join; the batch side appears on both (new-vs-new within a batch).
    old = _banded(corpus, False)
    new = _scratch_persist(_banded(batch, True))
    existing = old.unionByName(new)
    a = existing.alias("a")
    b = new.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (
                (~F.col("a.is_new"))
                | (F.col("a.id") < F.col("b.id"))
            ),
        )
        .select(
            F.col("b.id").alias("new_id"), F.col("a.id").alias("match_id")
        )
        .dropDuplicates()
    )


def substring_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    fast: bool = False,
) -> DataFrame:
    """Exact substring-duplication profiling at k-token-window
    granularity (the ExactSubstr idea: text that occurs verbatim more
    than once in the corpus is a dedup target even when the containing
    documents are unrelated). Every k-token rolling window is hashed;
    a window whose total corpus occurrence count exceeds 1 is
    duplicated text — whether it repeats across documents (template
    boilerplate, licensing headers) or within one (the repetition
    pathologies Gopher filters by).

    Returns per-doc (id, n_windows, n_dup_windows, dup_frac): the
    fraction of a document that is verbatim-shared text. A pipeline
    drops or trims docs above a dup_frac threshold; unlike
    MinHash-LSH (whole-doc near-dup) this catches PARTIAL overlap —
    the two operators are complementary, not alternatives.

    Scale shape: one explode (corpus tokens x ~1 row per token), one
    hash-agg on the 16-byte window hash (map-side combinable — the
    count table is vastly smaller than the window stream because
    popular windows collapse), one join back keyed by the same hash
    (both sides arrive partitioned by h from the agg's exchange), one
    per-doc re-agg. No self-join, no pair space. fast=True swaps md5
    for xxhash64 (8-byte keys, no hex encoding) — the 100 TB path;
    md5 is kept as the cross-engine-oracle spelling.
    """
    win = shingles(F.col(text_col), k, distinct=False)
    wins = df.select(F.col(id_col), F.explode(win).alias("w"))
    # r14 (guide §2.3): the window hash is internal (only grouped and
    # counted; the output is per-doc stats), so the md5 path carries
    # unhex(md5(w)) — the 16-byte binary the docstring promises rather
    # than the 32-char hex string. Bijective, so the census counts and
    # unique-owner sets are identical.
    hcol = F.xxhash64("w") if fast else F.unhex(F.md5("w"))
    # The window stream feeds BOTH the count census and the per-doc
    # total; Catalyst does not reuse a subtree across those two uses,
    # so without the persist the corpus explodes + hashes twice
    # (DESIGN.md #9 — persist only proven re-use).
    wins = _scratch_persist(wins.select(id_col, hcol.alias("h")))
    # r14 (guide §2.4, the ns_text_ngram_novelty rewrite applied
    # here): the old shape joined the count table back onto the FULL
    # window stream (a second posting-volume shuffle) to label each
    # occurrence dup/unique. But a window with corpus-wide count 1
    # has exactly ONE occurrence, whose owner the census itself can
    # name (max(id) over a 1-row group), so
    #   n_dup_windows(id) = n_windows(id) − |{h : cnt(h)=1, owner=id}|
    # — the join-back drops out; what remains is two aggregates of
    # the persisted window stream and a doc-keyed join of two small
    # frames. (Unlike the winnowing variant of this trick — measured
    # and rejected in wave 3 — the persist here predates the change
    # on both sides, so no concurrent branch gets serialized.)
    census = wins.groupBy("h").agg(
        F.count("*").alias("__cnt"), F.max(id_col).alias("__owner")
    )
    uniq = (
        census.filter(F.col("__cnt") == 1)
        .groupBy(F.col("__owner").alias(id_col))
        .agg(F.count("*").cast("bigint").alias("__uniq"))
    )
    tot = wins.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_windows")
    )
    return (
        tot.join(uniq, [id_col], "left_outer")
        .select(
            id_col,
            "n_windows",
            (
                F.col("n_windows")
                - F.coalesce(F.col("__uniq"), F.lit(0))
            )
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
    )
