"""Similarity search over embedding columns (``array<float>``).

Baseline: exact brute-force cosine top-k — one scan, broadcast query,
per-partition heaps (Spark's TakeOrderedAndProject), no full sort.
Scale path: sign-random-projection LSH bucketing so candidate
generation touches only matching buckets instead of every vector.

All scoring uses the sequential-order double arithmetic from
``functions/vectors.py`` so results are reproducible across runs,
partitionings, and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot_product_col


def _cosine(a: Column | str, b: Column | str) -> Column:
    # num/(sqrt(aa)*sqrt(bb)) in exactly this operation order — mirrored
    # verbatim in the DuckDB oracle (registry.knn_cosine_topk).
    num = dot_product_col(a, b)
    return num / (
        F.sqrt(dot_product_col(a, a)) * F.sqrt(dot_product_col(b, b))
    )


def knn_brute_force(
    candidates: DataFrame,
    query: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact top-k by cosine similarity against a 1-row query DataFrame.

    ``query`` must have a single column ``query_embedding``; it is
    broadcast so the scan side never shuffles. Deterministic tiebreak on
    the id column.
    """
    scored = candidates.crossJoin(F.broadcast(query)).select(
        id_col,
        *extra_cols,
        _cosine(vec_col, "query_embedding").alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def random_projection_buckets(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Add a sign-random-projection LSH bucket id column (``bucket``).

    Hyperplanes are generated deterministically on the driver (seeded
    numpy) and embedded as literals, so the same bucketing reproduces on
    any cluster. 2^n_planes buckets; near vectors collide with high
    probability. ANN query = compute the query's bucket, scan only that
    bucket (+ optional neighboring buckets by Hamming distance) — at
    100 TB this prunes the scan by ~2^n_planes with bucket-partitioned
    storage.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane_col = F.array(*[F.lit(float(v)) for v in planes[i]])
        proj = dot_product_col(F.col(vec_col), plane_col)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def embedding_near_duplicate_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH bucket self-join.

    Vectors in the same sign-projection bucket are scored exactly;
    pairs with cosine >= threshold survive. The self-join shuffles on
    the bucket id (2^n_planes uniform buckets), never all-pairs. Recall
    for very-high-threshold dedup is high because near-identical
    vectors almost always share every sign bit; raise recall further by
    multi-probing neighboring buckets.
    """
    bucketed = random_projection_buckets(
        df, vec_col=vec_col, dim=dim, n_planes=n_planes, seed=seed
    ).select(F.col(id_col), F.col(vec_col), F.col("bucket"))
    left = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "bucket"
    )
    right = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "bucket"
    )
    return (
        left.join(right, on="bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _cosine("vec_a", "vec_b").alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def knn_lsh(
    candidates: DataFrame,
    query: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict brute force to the query's LSH bucket.

    Recall can be raised by probing more buckets (multi-probe); exact
    when n_planes=0. Returned schema matches :func:`knn_brute_force`.
    """
    bucketed = random_projection_buckets(
        candidates, vec_col=vec_col, dim=dim, n_planes=n_planes, seed=seed
    )
    qb = random_projection_buckets(
        query.withColumnRenamed("query_embedding", vec_col),
        vec_col=vec_col,
        dim=dim,
        n_planes=n_planes,
        seed=seed,
    ).select(F.col(vec_col).alias("query_embedding"), F.col("bucket").alias("qbucket"))
    scored = (
        bucketed.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .select(id_col, _cosine(vec_col, "query_embedding").alias("cosine_sim"))
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)
