"""Text analysis operators (north-star surface): language ID, quality
scoring, token counting, document fingerprinting. All built-in
expressions — per-row work stays in whole-stage codegen.

Each operator's arithmetic is mirrored exactly in the DuckDB oracle
(same tokenization, same integer->double divisions, same rounding),
so t2 hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import shingles, tokens

# Tiny per-language stopword lists for the n-gram/stopword-ratio
# heuristic. Deterministic and mirrored in the oracle SQL.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
}

# A BPE-ish word/number/symbol splitter: runs of letters, runs of
# digits, or single non-space symbols — the classic pre-tokenizer
# shape. Same regex (POSIX classes) runs in DuckDB.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _stopword_ratio(toks: Column, words: tuple[str, ...]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*words))).cast("double")
    return hits / F.size(toks).cast("double")


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-ratio language ID: argmax over per-language stopword
    hit ratios; 'und' (undetermined) when the best ratio < 2%.
    Returns (id, lang_pred, ratio)."""
    toks = tokens(F.lower(F.col(text_col)))
    ratios = [
        F.struct(
            F.round(_stopword_ratio(toks, words), 6).alias("ratio"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(STOPWORDS.items())
    ]
    # array_max over structs compares field-by-field: (ratio, lang) —
    # ties break toward the lexicographically-max lang; the oracle
    # mirrors with greatest-of-structs semantics.
    best = F.array_max(F.array(*ratios))
    return df.select(
        F.col(id_col),
        F.when(best["ratio"] >= 0.02, best["lang"])
        .otherwise("und")
        .alias("lang_pred"),
        best["ratio"].alias("ratio"),
    )


def token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, unique
    ratio. (id, n_ws_tokens, n_bpe_tokens, uniq_ratio)."""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double"),
            6,
        ).alias("uniq_ratio"),
    )


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality scoring: length, mean word length, stopword
    ratio, alpha ratio -> composite score in [0,1]. The exact recipe
    is arbitrary (as all quality heuristics are); what matters is
    it's deterministic, cheap, and columnar."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    mean_wlen = F.round((n_chars - (n_tok - 1)) / n_tok, 6)
    stop = F.round(
        _stopword_ratio(F.transform(toks, F.lower), STOPWORDS["en"]), 6
    )
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    wlen_score = F.when(
        (mean_wlen >= 3.0) & (mean_wlen <= 8.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    stop_score = F.least(stop * 10.0, F.lit(1.0))
    return df.select(
        F.col(id_col),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        mean_wlen.alias("mean_word_len"),
        stop.alias("stopword_ratio"),
        F.round(
            0.4 * len_score + 0.3 * wlen_score + 0.3 * stop_score, 6
        ).alias("quality"),
    )


def keyness(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    min_count: int = 5,
    topk: int = 5,
) -> DataFrame:
    """Chi-square keyness: the top-k terms most over-represented in
    each source vs the rest of the corpus (Dunning-style keyword
    extraction, but with the chi-square statistic so the arithmetic
    stays in integers until ONE shared division — log-likelihood G2
    needs ln(), which is libm-dependent). The corpus-curation use:
    each source's keyness profile IS its domain signature — drift in
    a crawl source shows up here before it shows up in loss.

    For term t in source s with a = count(t in s), n_s = tokens in s,
    k_t = count(t overall), N = total tokens:
    chi2 = N*(a*d - b*c)^2 / (n_s*(N-n_s)*k_t*(N-k_t)), and the
    numerator core collapses to delta = a*N - n_s*k_t (identity).
    Products run in DECIMAL(38) with operands cast BEFORE multiplying
    (the int64-wrap advisory rule); exact until the single division,
    then round(6); only delta > 0 (over-represented) qualifies.
    DECIMAL(38) headroom: N*delta^2 <= N^5 needs N <= ~3.9e7 tokens —
    past that, shard keyness per corpus slice and union (each shard's
    statistic is self-contained), as a 100 TB run would anyway.

    Plan shape: one (source, term) hash-agg over the exploded tokens;
    k_t and N attach as broadcasts; the per-source top-k is the only
    window, partitioned by source (never global). Ties break on
    (rounded chi2 desc, term asc) identically cross-engine.
    Returns (source, term, term_count, corpus_count, chi2).
    """
    d38 = "decimal(38,0)"
    toks_long = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    st = toks_long.groupBy("source", "term").agg(
        F.count("*").cast("bigint").alias("a")
    )
    ns = toks_long.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_s")
    )
    kt = st.groupBy("term").agg(F.sum("a").cast("bigint").alias("k_t"))
    nn = toks_long.agg(F.count("*").cast("bigint").alias("n"))
    sc = (
        st.join(F.broadcast(kt), ["term"])
        .join(ns, ["source"])
        .crossJoin(F.broadcast(nn))
    )
    delta = F.col("a").cast(d38) * F.col("n") - F.col("n_s").cast(
        d38
    ) * F.col("k_t")
    num = (F.col("n").cast(d38) * delta * delta).cast("double")
    den = F.nullif(
        (
            F.col("n_s").cast(d38)
            * (F.col("n") - F.col("n_s"))
            * F.col("k_t")
            * (F.col("n") - F.col("k_t"))
        ).cast("double"),
        F.lit(0.0),
    )
    scored = sc.select(
        "source",
        "term",
        F.col("a").alias("term_count"),
        F.col("k_t").alias("corpus_count"),
        F.round(num / den, 6).alias("chi2"),
        delta.alias("__delta"),
    ).filter((F.col("__delta") > 0) & (F.col("k_t") >= min_count))
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("chi2").desc(), F.col("term")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= topk)
        .select("source", "term", "term_count", "corpus_count", "chi2")
    )


def fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Document fingerprints: full-text md5 + winnowing-style minimum
    shingle hash (the rolling-hash min over n-gram windows — here the
    lexicographic min of per-shingle md5s, identical cross-engine).
    (id, fp_md5, fp_min_shingle)."""
    sh = shingles(F.col(text_col), n)
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fp_md5"),
        F.array_min(F.transform(sh, F.md5)).alias("fp_min_shingle"),
    )


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
) -> DataFrame:
    """Corpus-level top-k n-gram frequencies — the corpus-stats pass a
    training pipeline runs before building vocabularies or pruning
    boilerplate. Shingles keep multiplicity (distinct=False: counting,
    not set similarity); top-k goes through orderBy+limit, which
    Catalyst plans as TakeOrderedAndProject — per-partition heaps then
    a k-row merge, never a global sort of the full n-gram table.
    Returns (rank, ngram, n) with a total (count desc, ngram) order.
    """
    sh = df.select(
        F.explode(
            shingles(F.lower(F.col(text_col)), n, distinct=False)
        ).alias("ngram")
    )
    counts = sh.groupBy("ngram").agg(F.count("*").cast("bigint").alias("n"))
    from ..functions.ranking import ranked_limit

    return ranked_limit(counts, [F.desc("n"), "ngram"], k).select(
        "rank", "ngram", "n"
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): the
    within-document repetition signals used to drop boilerplate and
    degenerate generations from a training corpus —

    - ``dup_tok_frac``: fraction of tokens that are repeats of an
      earlier token (1 - distinct/total), computed with array ops
      only (no explode, no shuffle);
    - ``top2_gram``/``top2_count``: the document's most frequent
      2-gram (ties break lexicographically) via explode -> per-doc
      count -> per-doc argmax. The argmax is min(struct(-cnt, gram))
      — a map-side-combinable hash aggregate, NOT a row_number window
      (a window would sort every doc's gram partition; the struct-min
      needs no sort and no second shuffle beyond the (doc, gram) agg,
      which has no hot keys because grams are doc-scoped);
    - ``top2_char_frac``: fraction of the document's characters
      covered by copies of that top 2-gram — Gopher's
      "fraction of characters in most common n-gram" filter.

    Returns (id, n_tokens, dup_tok_frac, top2_gram, top2_count,
    top2_char_frac); every expression has an exact DuckDB twin.
    """
    toks = tokens(F.col(text_col))
    stats = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("__n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            # nullif guard: an empty/degenerate doc yields NULL (not
            # inf/nan), identically on the DuckDB oracle side
            F.lit(1.0)
            - F.size(F.array_distinct(toks)).cast("double")
            / F.nullif(F.size(toks).cast("double"), F.lit(0.0)),
            6,
        ).alias("dup_tok_frac"),
    )
    grams = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), 2, distinct=False)).alias(
            "gram"
        ),
    )
    top = (
        grams.groupBy(id_col, "gram")
        .agg(F.count("*").cast("bigint").alias("__cnt"))
        .groupBy(id_col)
        .agg(
            F.min(
                F.struct((-F.col("__cnt")).alias("neg"), F.col("gram"))
            ).alias("__best")
        )
        .select(
            F.col(id_col),
            F.col("__best.gram").alias("top2_gram"),
            (-F.col("__best.neg")).cast("bigint").alias("top2_count"),
        )
    )
    return stats.join(top, id_col).select(
        F.col(id_col),
        "n_tokens",
        "dup_tok_frac",
        "top2_gram",
        "top2_count",
        F.round(
            F.col("top2_count")
            * F.length("top2_gram").cast("double")
            / F.nullif(F.col("__n_chars").cast("double"), F.lit(0.0)),
            6,
        ).alias("top2_char_frac"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """LM-proxy quality scoring (the CCNet-style filter): each doc's
    mean unigram log-likelihood under the CORPUS'S OWN unigram
    distribution. Unlike the per-doc heuristics (quality_score), this
    uses corpus-level statistics — docs made of globally rare tokens
    score low, boilerplate made of dominant tokens scores high; both
    tails are what a pipeline trims.

    Scale shape: the vocabulary is a tiny aggregate of the corpus
    (|V| << N), so the per-token scoring join broadcasts the vocab —
    the corpus explodes once, joins map-side, and re-aggregates by
    doc; the only wide shuffle is the (doc) re-agg. ln() agrees
    across engines to ~1 ulp and the per-doc mean is rounded to 6
    decimals, the catalog's standard float-absorption policy.

    Returns (id, n_tokens, mean_logprob).
    """
    toks_long = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks_long.groupBy("tok").agg(F.count("*").alias("__cnt"))
    total = vocab.agg(F.sum("__cnt").cast("double").alias("__tot"))
    return (
        toks_long.join(F.broadcast(vocab), ["tok"])
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("__cnt") / F.col("__tot"))), 6
            ).alias("mean_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Second-order LM-proxy scoring: each doc's mean bigram
    log-likelihood under the corpus's own add-one-smoothed bigram
    model — ln((c(w1,w2) + 1) / (c(w1) + V)). The step up from
    :func:`unigram_logprob` that actually penalizes improbable
    token SEQUENCES (shuffled or templated text scores near the
    unigram model; fluent text scores higher) — the KenLM-filter
    approximation expressible as pure dataflow.

    Scale shape: bigram strings are built in-array (zip of the
    token list against its own tail — map-only, no positional
    self-join); the bigram count table is corpus-bounded and joins
    by key (broadcast when small, shuffle otherwise — Catalyst's
    call); V and the unigram table are tiny broadcasts. Float
    policy: ln to ~1 ulp + round(6), same as unigram_logprob.

    The bigram key joins w1 and w2 with a single space — tokens are
    single-space-split (textfns.tokens), so ' ' can never occur
    inside a token and the key is collision-free for any corpus; w1
    is carried as its own column from the zip projection rather
    than recovered by re-splitting the key.

    Returns (id, n_bigrams, mean_bigram_logprob); docs with < 2
    tokens drop out (no bigrams)."""
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    )
    bi = toks.select(
        id_col,
        F.explode(
            F.zip_with(
                F.expr("slice(__t, 1, greatest(size(__t) - 1, 0))"),
                F.expr("slice(__t, 2, greatest(size(__t) - 1, 0))"),
                lambda a, b: F.struct(
                    F.concat_ws(" ", a, b).alias("bg"),
                    a.alias("w1"),
                ),
            )
        ).alias("__p"),
    ).select(id_col, F.col("__p.bg").alias("bg"), F.col("__p.w1").alias("__w1"))
    uni = df.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    ).groupBy("w").agg(F.count("*").alias("__c1"))
    vsize = uni.agg(F.count("*").cast("double").alias("__v"))
    c2 = bi.groupBy("bg").agg(F.count("*").alias("__c2"))
    return (
        bi.join(c2, ["bg"])
        .join(
            F.broadcast(uni.select(F.col("w").alias("__w1"), "__c1")),
            ["__w1"],
        )
        .crossJoin(F.broadcast(vsize))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(
                        (F.col("__c2") + 1)
                        / (F.col("__c1") + F.col("__v"))
                    )
                ),
                6,
            ).alias("mean_bigram_logprob"),
        )
    )


# PII patterns, shared verbatim with the oracle SQL (RE2 and Java
# regex agree on these constructs: char classes, bounded repeats,
# alternation — no lookarounds, no \b ambiguity on the inputs we
# feed). Redaction order matters (an email's host could otherwise
# look dotted-quad-ish), so scrub applies them in this list's order
# and the oracle mirrors it.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("phone", r"\+[0-9]{7,15}"),
)


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII detection + redaction — the compliance pass every
    training-data pipeline runs before anything ships (emails, IPs,
    phone numbers → typed placeholders, plus per-doc match counts so
    the pipeline can quarantine PII-dense sources).

    Pure built-in regexp expressions (regexp_count/regexp_replace):
    per-row, map-only, whole-stage codegen — zero shuffles, which is
    the only acceptable shape for a scrub that must touch every byte
    of a 100 TB corpus. Patterns are applied in PII_PATTERNS order;
    counts are taken BEFORE any redaction so overlapping matches
    (an IP inside an email host) count under the first pattern that
    owns them textually.

    Returns (id, n_email, n_ipv4, n_phone, clean_hash, n_chars_clean)
    — the redacted text itself is hashed, not returned, so the
    operator's output stays narrow however wide the documents are.
    """
    txt = F.col(text_col)
    counts = [
        F.regexp_count(txt, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    clean = txt
    for name, pat in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, f"<{name.upper()}>")
    return df.select(
        F.col(id_col),
        *counts,
        F.md5(clean).alias("clean_hash"),
        F.length(clean).cast("bigint").alias("n_chars_clean"),
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical text normalization (the pre-dedup pass): lowercase,
    strip everything outside [a-z0-9 ], collapse whitespace runs,
    trim. Dedup keyed on raw bytes misses trivially-reformatted
    copies; keying on this normal form is what DataComp-LM-style
    pipelines actually hash.

    Map-only built-ins (lower/regexp_replace/trim) — same zero-shuffle
    argument as pii_scrub. Returns (id, norm_hash, n_tokens_norm,
    changed): the hash is the dedup key, ``changed`` flags docs whose
    normal form differs from their raw text (an audit signal for how
    dirty a source is).
    """
    txt = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(txt), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("norm_hash"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("bigint")
        .alias("n_tokens_norm"),
        (norm != txt).alias("changed"),
    )


def tfidf_top_term(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Each document's most characteristic term by tf-idf
    (Sparck Jones 1972): tf = term count / doc length, idf =
    ln(N / doc-frequency) — the classic "what is this document
    about" signal a pipeline uses for topic binning and near-dup
    triage beyond raw hashes.

    Scale shape mirrors unigram_logprob: the document-frequency table
    is a small corpus aggregate joined BROADCAST onto the per-doc
    term counts, so the corpus shuffles only for the (doc, term) and
    (doc) hash-aggs. The per-doc argmax is min(struct(-score, term))
    — map-side-combinable, no window. Scores are rounded to 6
    decimals BEFORE the argmax on both engines so the comparison the
    tie-break sees is identical cross-engine (ln() differs by ~1 ulp
    between libms; 6-decimal rounding absorbs it).

    Returns (id, top_term, top_tfidf).
    """
    toks_long = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks_long.groupBy(id_col, "term").agg(
        F.count("*").alias("__cnt")
    )
    doclen = toks_long.groupBy(id_col).agg(F.count("*").alias("__len"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("__df"))
    n_docs = df.agg(F.count("*").cast("double").alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), ["term"])
        .join(doclen, [id_col])
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.round(
                (F.col("__cnt") / F.col("__len"))
                * F.log(F.col("__n") / F.col("__df")),
                6,
            ).alias("__s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct((-F.col("__s")).alias("neg"), F.col("term"))
            ).alias("__best")
        )
        .select(
            F.col(id_col),
            F.col("__best.term").alias("top_term"),
            (-F.col("__best.neg")).alias("top_tfidf"),
        )
    )


def dsir_importance(
    df: DataFrame,
    target_filter: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> DataFrame:
    """Data-selection importance scoring (the DSIR recipe): weight
    each document by how much more likely its tokens are under a
    TARGET distribution (the high-quality / in-domain slice selected
    by ``target_filter``) than under the raw-corpus distribution —
    per-doc mean of ln(p_target(tok)/p_raw(tok)) with add-one
    smoothing so target-unseen tokens score finitely negative
    instead of -inf. Sampling proportional to exp(score) tilts a raw
    crawl toward the target domain; here the score itself is the
    output so the policy stays composable (threshold, stratify, or
    resample downstream).

    Scale shape mirrors unigram_logprob: both distributions come from
    ONE hash-agg over the exploded corpus (target counts as a
    conditional sum in the same pass), the resulting feature table is
    |V|-sized (tiny vs corpus) and broadcasts into the scoring join;
    the only wide shuffle is the per-doc re-agg. With
    ``n_buckets`` set, tokens hash into a fixed-size feature space
    (xxhash64 % n_buckets — DSIR's hashed n-gram features), capping
    the feature table at a constant independent of corpus vocabulary:
    that is the 100 TB spelling (no cross-engine oracle: hash
    functions differ; the exact-token path is the oracle-checked one).

    Returns (id, n_tokens, dsir_logratio) with the catalog's
    round-6 float-absorption policy.
    """
    feat = F.explode(tokens(F.col(text_col))).alias("tok")
    toks_long = df.select(
        F.col(id_col), target_filter.alias("__is_t"), feat
    )
    if n_buckets is not None:
        toks_long = toks_long.select(
            id_col,
            "__is_t",
            (F.abs(F.xxhash64("tok")) % n_buckets).alias("tok"),
        )
    vocab = toks_long.groupBy("tok").agg(
        F.count("*").alias("__cr"),
        F.sum(F.col("__is_t").cast("long")).alias("__ct"),
    )
    totals = vocab.agg(
        F.sum("__cr").alias("__tr"),
        F.sum("__ct").alias("__tt"),
        F.count("*").alias("__v"),
    )
    # add-one smoothing on both sides keeps the ratio finite and the
    # denominators exact integers (no float totals enter the log).
    ratio = F.log(
        ((F.col("__ct") + 1) / (F.col("__tt") + F.col("__v")))
        / ((F.col("__cr") + 1) / (F.col("__tr") + F.col("__v")))
    )
    return (
        toks_long.join(F.broadcast(vocab), ["tok"])
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg(ratio), 6).alias("dsir_logratio"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Token-window document chunking — the context-window prep step
    (training sequences, retrieval corpora): each doc explodes into
    overlapping ``chunk_tokens``-token windows advancing by
    ``stride`` (overlap = chunk_tokens - stride). The final partial
    window is kept iff it starts before the text ends, so every token
    lands in >= 1 chunk and short docs yield exactly one chunk.

    Pure built-ins: one sequence() per doc (O(n_chunks) array) and a
    posexplode — per-row work stays in codegen, no shuffle at all
    until whatever consumes the chunks aggregates. Returns
    (id, chunk_idx, n_tokens, chunk_hash) — the chunk TEXT is hashed,
    not carried, so the relation stays narrow at corpus scale; a
    consumer re-slices the source doc by (chunk_idx*stride,
    chunk_tokens) when it needs bytes.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)), F.lit(0)
        ).cast("int"),
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"), starts.alias("__s"))
        .select(
            id_col,
            "__toks",
            F.posexplode("__s").alias("chunk_idx", "__i"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.slice(
                F.col("__toks"),
                F.col("__i") * stride + 1,
                F.lit(chunk_tokens),
            ).alias("__w"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("__w").cast("bigint").alias("n_tokens"),
            F.md5(F.concat_ws(" ", "__w")).alias("chunk_hash"),
        )
    )


def _winnow_grams(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, pos, h): unhex(md5) of every positional k-token shingle.

    r14 (guide §2.3 narrower types): the hash is internal to the
    winnowing operators (their outputs are per-doc / per-source
    counts), so it is carried as 16-byte binary instead of the
    32-char hex string. unhex is a bijection on md5 output AND
    order-isomorphic for fixed-length lowercase hex (hex chars are
    ASCII-ascending, so string order == unsigned byte order), hence
    the running-min fingerprint SELECTION — not just equality — is
    identical to the hex spelling the DuckDB oracle uses."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            shingles(F.col(text_col), k, distinct=False)
        ).alias("pos", "g"),
    ).select(id_col, "pos", F.unhex(F.md5("g")).alias("h"))


def _winnow_fp_relation(
    grams: DataFrame, id_col: str, w: int
) -> DataFrame:
    """(id, fp): the distinct winnowed fingerprints per document —
    the w-window running minimum over the positional shingle hashes
    (doc-partitioned window, never global). Shared by the per-doc
    census and the source-overlap matrix."""
    from pyspark.sql import Window

    doc = Window.partitionBy(id_col)
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("__n", F.count("*").over(doc))
        .withColumn("fp", F.min("h").over(run))
        .filter(F.col("pos") <= F.col("__n") - w)
        .select(id_col, "fp")
        .dropDuplicates()
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003 — the MOSS scheme): hash every k-token shingle, slide a
    w-wide window over the hash sequence, keep each window's MINIMUM
    hash. The selected set is a ~2/(w+1)-density fingerprint with the
    winnowing guarantee: any shared run of >= w+k-1 tokens between two
    documents shares at least one fingerprint — so matching
    fingerprints against the corpus finds partial overlap at a
    fraction of the full k-gram index cost (the same detection as
    substring_dup_stats, at ~1/w the index size).

    Returns per-doc (id, n_kgrams, n_fingerprints, n_shared_fp) where
    n_shared_fp counts this doc's fingerprints that also occur in
    ANOTHER document — the cross-corpus overlap signal a pipeline
    gates on. Docs with fewer than w k-grams yield 0 fingerprints
    (no full window), deterministically on both engines.

    Scale shape: one posexplode (O(corpus tokens)), a doc-partitioned
    running-min window (doc-scoped partitions — no global sort, no
    hot keys), distinct + hash-agg on the fingerprint value (the
    winnowed stream is ~2/(w+1) of the k-gram stream), one join back.
    Hashes are unhex(md5) 16-byte binaries whose unsigned-byte order
    equals the hex strings' lexicographic order — so the winnowing
    minima match DuckDB's hex-string spelling exactly."""
    # r14 optimization note: two rewrites were MEASURED here and both
    # LOST at sf0.1, so the original shape stands. (1) _scratch_persist
    # of fps (it feeds the share census and the join-back): 1.6 -> 2.8 s
    # median — the persist serializes branches Spark runs concurrently,
    # the minhash_calibration trade. (2) replacing the join-back with
    # unique-count arithmetic (n_shared_fp = n_fingerprints - fps
    # unique to the doc) plus a size()-based n_kgrams: still ~2.8 s —
    # the extra aggregate/join stages cost more than the saved
    # fp-keyed shuffle at this scale.
    grams = _winnow_grams(df, id_col, text_col, k)
    fps = _winnow_fp_relation(grams, id_col, w)
    share = fps.groupBy("fp").agg(
        F.count_distinct(F.col(id_col)).alias("__nd")
    )
    per_doc = (
        fps.join(share, ["fp"])
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_fingerprints"),
            F.sum((F.col("__nd") > 1).cast("int"))
            .cast("bigint")
            .alias("n_shared_fp"),
        )
    )
    kg = grams.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_kgrams")
    )
    return kg.join(per_doc, [id_col], "left").select(
        F.col(id_col),
        "n_kgrams",
        F.coalesce("n_fingerprints", F.lit(0)).alias("n_fingerprints"),
        F.coalesce("n_shared_fp", F.lit(0)).alias("n_shared_fp"),
    )


def source_overlap_matrix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Source-by-source shared-fingerprint matrix — the provenance
    audit "which sources copy from which": winnowed fingerprints
    (same scheme/guarantee as :func:`winnow_fingerprints` — any
    shared run of >= w+k-1 tokens leaves at least one common
    fingerprint) are deduped to (source, fp), self-joined on fp
    across ordered source pairs, and counted. overlap_coef divides by
    the SMALLER source's fingerprint count (containment-style: a tiny
    source cloned from a big one scores ~1 even though the big side
    barely notices). Pairs sharing nothing are absent, not 0 rows.

    Scale shape: the join key is the fingerprint value, output
    bounded by (distinct fp) x (sources sharing it)^2 — sources are
    few; no doc x doc pair space ever forms. The only windows are
    doc-partitioned running minima."""
    fps = _winnow_fp_relation(
        _winnow_grams(df, id_col, text_col, k), id_col, w
    )
    # (source, fp) feeds THREE consumers (the per-source census and
    # both sides of the fp self-join) — deliberately left UNpersisted:
    # an r14 _scratch_persist here was measured at sf0.1 and LOST
    # (1.78/1.82 -> 1.91/2.00 s paired medians) because the persist
    # serializes branches Spark runs concurrently on an underloaded
    # scheduler; the three stitched re-executions overlap in wall
    # time. (At full cluster utilization the persist wins on total
    # work — revisit if this operator ever dominates a saturated run.)
    sf = (
        fps.join(
            df.select(F.col(id_col), F.col(source_col).alias("__src")),
            [id_col],
        )
        .select(F.col("__src").alias("source"), "fp")
        .dropDuplicates()
    )
    per = sf.groupBy("source").agg(F.count("*").alias("__n"))
    a = sf.alias("a")
    b = sf.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_shared_fp"))
    )
    return (
        pairs.join(
            per.select(
                F.col("source").alias("source_a"),
                F.col("__n").alias("__na"),
            ),
            ["source_a"],
        )
        .join(
            per.select(
                F.col("source").alias("source_b"),
                F.col("__n").alias("__nb"),
            ),
            ["source_b"],
        )
        .select(
            "source_a",
            "source_b",
            "n_shared_fp",
            F.round(
                F.col("n_shared_fp").cast("double")
                / F.least("__na", "__nb").cast("double"),
                6,
            ).alias("overlap_coef"),
        )
    )


def bpe_token_census(
    df: DataFrame,
    rounds: int = 8,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Train ``rounds`` BPE merges (bpe_train) and APPLY them — the
    train->apply closure of the tokenizer loop. Application is free:
    tokenization is deterministic per distinct word, so the trainer's
    final vocab-keyed state IS the applied tokenization, and corpus
    token counts are just the per-word counts weighted by the exact
    integer word frequency (never a second corpus pass). Returns the
    top-``k`` subword tokens by weighted count (rank, tok, n) after
    the learned merges."""
    from ..functions.ranking import ranked_limit

    _, state = _bpe_loop(df, rounds, text_col)
    counts = state.groupBy("tok").agg(
        F.sum("freq").cast("bigint").alias("n")
    )
    return ranked_limit(
        counts, [F.col("n").desc(), F.col("tok")], k
    ).select("rank", "tok", "n")


def bpe_train(
    df: DataFrame,
    rounds: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Byte-pair-encoding MERGE TRAINING — the actual tokenizer-
    trainer loop, not just its first-round census (text_bpe_pairs):
    ``rounds`` greedy merges over the corpus word-frequency table,
    returning the learned merge table (merge_round, left_tok,
    right_tok, merged, pair_count). Reference for the algorithm:
    Sennrich/Haddow/Birch, "Neural Machine Translation of Rare Words
    with Subword Units" (ACL 2016).

    Design for scale — the three properties that matter at 100 TB:

    1. State is the DISTINCT-WORD token table (word, freq, pos, tok),
       so per-round cost is O(vocab x avg word length), NOT corpus
       length — corpus mass rides in the exact-integer ``freq``
       weight. This is precisely how production BPE trainers scale.
    2. Every window is partitioned by word (never global): adjacent
       pairs via lead(), greedy run arithmetic via a per-word
       cumulative count, position renumbering via row_number().
    3. The greedy "merge non-overlapping occurrences left-to-right"
       rule needs NO sequential scan: when left != right, matches
       cannot overlap (an overlap at i, i+1 forces left = right), so
       ALL matches merge; when left = right, matches sit in maximal
       equal-token runs and greedy merges exactly the odd positions
       within each run — both are closed-form window expressions,
       which is what lets DuckDB replay the loop as unrolled
       MATERIALIZED CTEs and hash-match the merge table.

    The per-round best pair is fetched with a 1-row first() (the
    AQE-statistics pattern: the next round's plan is parameterized by
    literals, never by a join against a 1-row frame), so building the
    result runs ``rounds`` small jobs eagerly. Ties break
    lexicographically on (left, right) so both engines pick the same
    pair."""
    return _bpe_loop(df, rounds, text_col)[0]


def _bpe_loop(
    df: DataFrame, rounds: int, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared trainer loop: returns (merge table, final token state
    (w, freq, pos, tok)) — bpe_train keeps the merges,
    bpe_token_census weights the final state by the word freq."""
    from pyspark.sql import Window

    spark = df.sparkSession
    words = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    state = words.select(
        "w",
        "freq",
        F.posexplode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("pos", "tok"),
    ).localCheckpoint(eager=True)

    wspec = Window.partitionBy("w").orderBy("pos")
    out_schema = (
        "merge_round int, left_tok string, right_tok string,"
        " merged string, pair_count bigint"
    )
    merges: list[tuple] = []
    for r in range(1, rounds + 1):
        # r15 REVERT of the r14 per-round localCheckpoint of `paired`
        # (guide §1 — measured, lost): the r14 rationale (the
        # lead()-window executes twice per round without it) is true,
        # but the materialization costs more than the saved recompute
        # at BOTH measurable scales — sf0.1 was a disclosed wash in
        # r14, and the r15 x64 paired receipt (tools/x64_receipts.py,
        # 5 interleaved pairs) has the unpersisted spelling winning 4
        # of 5 (medians 3.75 vs 4.27 / 2.94 vs 3.83). The state is
        # vocab-bounded (corpus mass rides in `freq`), so the re-run
        # window is cheap relative to writing the relation out; do
        # not re-add without a receipt at a scale where it wins.
        paired = state.withColumn("nxt", F.lead("tok").over(wspec))
        best = (
            paired.filter(F.col("nxt").isNotNull())
            .groupBy("tok", "nxt")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "tok", "nxt")
            .limit(1)
            .first()
        )
        if best is None:
            break
        a, b, n = best["tok"], best["nxt"], int(best["n"])
        merges.append((r, a, b, a + b, n))
        cand = (F.col("tok") == F.lit(a)) & (F.col("nxt") == F.lit(b))
        if a != b:
            start = cand
            marked = paired.withColumn("start", start)
        else:
            # Greedy within equal-token runs: island = pos - (number
            # of a-tokens seen so far in the word); odd rank within
            # the island merges, even rank is consumed by its left
            # neighbour.
            cum_a = F.sum(
                F.when(F.col("tok") == F.lit(a), 1).otherwise(0)
            ).over(wspec.rowsBetween(Window.unboundedPreceding, 0))
            isl = F.when(
                F.col("tok") == F.lit(a), F.col("pos") - cum_a
            ).otherwise(-F.col("pos") - 1)
            with_isl = paired.withColumn("isl", isl)
            rk = F.row_number().over(
                Window.partitionBy("w", "isl").orderBy("pos")
            )
            marked = with_isl.withColumn(
                "start", cand & (rk % 2 == 1)
            ).drop("isl")
        consumed = F.coalesce(
            F.lag("start").over(wspec), F.lit(False)
        )
        rebuilt = (
            marked.withColumn("consumed", consumed)
            .filter(~F.col("consumed"))
            .select(
                "w",
                "freq",
                "pos",
                F.when(F.col("start"), F.lit(a + b))
                .otherwise(F.col("tok"))
                .alias("tok"),
            )
            .withColumn("pos", F.row_number().over(wspec) - 1)
        )
        state = rebuilt.localCheckpoint(eager=True)
    return spark.createDataFrame(merges, out_schema), state
