"""Text column expressions — all built-in/JVM-side (no UDFs), so they
stay inside whole-stage codegen and vectorize at 100 TB scale.

Every function here has an exact DuckDB twin used by the oracle SQL
(plans/pipeline_queries.py); the pairs are kept semantically identical
(same tokenization, same fold order) so results hash-match across
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization. DuckDB twin: string_split(text, ' ')."""
    return F.split(text, " ")


def shingles(text: Column, n: int, distinct: bool = True) -> Column:
    """n-token shingles (w-shingling). For size >= n yields size-n+1
    shingles; shorter docs yield one partial shingle (total function —
    the reference's member-string parser crashes on short input,
    main.go:563-564; ours never does).

    DuckDB twin:
      list_transform(range(0, greatest(len(toks)-n,0)+1),
                     i -> array_to_string(toks[i+1:i+n], ' '))
    """
    toks = tokens(text)
    sz = F.size(toks)
    # zip_with chain: shingle i = toks[i] ++ toks[i+1] ++ ... built by
    # zipping the token array with its own 1..n-1 shifted copies —
    # ~6x faster than transform(i -> slice/element_at) because HOF
    # lambdas are interpreted and this does O(n) array ops per doc
    # instead of O(shingles*n) per-element lambda evaluations.
    # zip_with pads the shorter (shifted) side with null and concat_ws
    # skips nulls, which reproduces the partial-shingle case exactly.
    acc = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(sz - j, F.lit(1)))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat_ws(" ", x, y))
    sh = F.slice(acc, 1, F.greatest(sz - (n - 1), F.lit(1)))
    return F.array_distinct(sh) if distinct else sh


def minhash_signature_md5(
    sh: Column, num_hashes: int
) -> list[Column]:
    """MinHash signature using md5 as the hash family (seeded by
    suffixing the salt): portable — DuckDB computes bit-identical
    signatures, which is what makes the MinHash-LSH dedup pipeline
    oracle-checkable. Use the xxhash64 variant for the 100 TB path.

    DuckDB twin per j: list_min(list_transform(sh, s -> md5(s || '|j')))
    """
    return [
        F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(f"|{j}"))))
        ).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]


def minhash_signature_xxhash(sh: Column, num_hashes: int) -> list[Column]:
    """Scale-path MinHash: xxhash64 is JVM-native and ~10x cheaper than
    md5-over-string; semantics identical (min over seeded hashes)."""
    return [
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(j)))).alias(
            f"mh_{j}"
        )
        for j in range(num_hashes)
    ]


def band_hashes(
    sig_cols: list[str], bands: int, rows: int, use_md5: bool = True
) -> list[Column]:
    """LSH banding: hash each band of `rows` consecutive signature
    components. Docs sharing any band hash are candidate pairs.

    DuckDB twin per band: md5(mh_a || '|' || mh_b ...)
    """
    assert bands * rows == len(sig_cols)
    out = []
    for b in range(bands):
        cols = [F.col(c).cast("string") for c in sig_cols[b * rows : (b + 1) * rows]]
        h = F.concat_ws("|", *cols)
        out.append((F.md5(h) if use_md5 else F.xxhash64(h)).alias(f"band_{b}"))
    return out
