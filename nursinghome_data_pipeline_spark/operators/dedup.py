"""Deduplication operators for corpus-scale (100 TB) text pipelines.

Extends the reference's duplicate-*detection* audit
(``/root/reference/build.py:39-53`` — GROUP BY natural key HAVING
COUNT(*)>1) into duplicate-*resolution* operators:

- exact dedup: content-hash groupBy (uniform md5 keys → no skew);
- near-dup: MinHash signatures + LSH banding, expressed entirely with
  native higher-order functions (``transform``/``aggregate``/``slice``)
  so signature computation is a single codegen'd projection — no UDF,
  no shuffle. Only the band-bucket self-join shuffles, and it shuffles
  *bands* (a few ints per doc), not document text;
- n-gram Jaccard: exact verification for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keep one arbitrary row per key (pandas drop_duplicates analog)."""
    return df.dropDuplicates(keys)


def exact_dedup_fingerprints(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-row index: md5 fingerprint → lowest id + copy count.

    Deterministic (MIN id wins), unlike ``dropDuplicates`` which keeps
    an arbitrary row — determinism matters for reproducible training
    corpora.
    """
    return df.groupBy(F.md5(F.col(text_col)).alias("fingerprint")).agg(
        F.min(F.col(id_col)).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles as an array<string>; whole string if < k tokens."""
    c = F.col(text) if isinstance(text, str) else text
    tokens = F.split(F.trim(c), r"\s+")
    n = F.size(tokens)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.array_join(F.slice(tokens, i, k), " "))


_MAX_LONG = (1 << 63) - 1


def _perm_constants(n: int, seed: int = 0x9E3779B97F4A7C15) -> list[int]:
    """Deterministic 64-bit XOR constants (splitmix64 sequence)."""
    out = []
    x = seed
    for _ in range(n):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z ^= z >> 31
        # to signed 64-bit for Spark LongType literals
        out.append(z - (1 << 64) if z >= (1 << 63) else z)
    return out


def minhash_signature_col(
    text: Column | str, *, n_hashes: int = 16, shingle_k: int = 3
) -> Column:
    """MinHash signature (array<bigint>) of the text's shingle set.

    Cost model: each shingle is built and ``xxhash64``-hashed exactly
    ONCE; the ``n_hashes`` "permutations" are XORs with fixed splitmix64
    constants (a bijection on int64, the standard cheap minhash
    permutation family), folded in a single ``aggregate`` pass that
    keeps a running elementwise-min array. All JVM-side expressions —
    embarrassingly parallel map work at 100 TB, no shuffle.
    """
    consts = _perm_constants(n_hashes)
    hashes = F.transform(_shingles(text, shingle_k), lambda s: F.xxhash64(s))
    init = F.array(*[F.lit(_MAX_LONG).cast("long") for _ in range(n_hashes)])
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[h.bitwiseXOR(F.lit(c)) for c in consts]),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding.

    Signature is split into ``bands`` bands of ``n_hashes//bands`` rows;
    documents sharing any identical band land in the same bucket. The
    shuffle key is (band_index, band_hash) — uniformly distributed, so
    no skew; bucket sizes stay tiny for non-pathological corpora. The
    self-join inside buckets emits each unordered pair once (id_a < id_b).
    """
    rows_per_band = n_hashes // bands
    sig = df.select(
        F.col(id_col),
        minhash_signature_col(text_col, n_hashes=n_hashes, shingle_k=shingle_k).alias(
            "sig"
        ),
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.band_hash")
    left = banded.withColumnRenamed(id_col, "id_a")
    right = banded.withColumnRenamed(id_col, "id_b")
    return (
        left.join(right, on=["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_col(a: Column | str, b: Column | str, *, shingle_k: int = 3) -> Column:
    """Exact Jaccard similarity of two texts' shingle sets (verify step)."""
    sa = F.array_distinct(_shingles(a, shingle_k))
    sb = F.array_distinct(_shingles(b, shingle_k))
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def near_duplicate_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidates verified by exact n-gram Jaccard >= threshold.

    Verification re-joins candidate ids back to text, so only candidate
    pairs (a tiny fraction of n²) ever carry document bodies through a
    shuffle.
    """
    cands = minhash_lsh_candidate_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        bands=bands,
        shingle_k=shingle_k,
    )
    ta = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a"))
    tb = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b"))
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            ngram_jaccard_col("text_a", "text_b", shingle_k=shingle_k).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
