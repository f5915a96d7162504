"""Distributed k-means (Lloyd) over embedding columns.

The iterative-refinement sibling of the one-shot IVF training in
``operators/similarity.py`` (which k-means a bounded driver-side
sample): here BOTH steps are distributed DataFrame ops, the shape that
holds when the corpus no longer fits a sample —

- **assign**: candidates cross-join the k broadcast centroids
  (k rows), squared-L2 via the bit-stable sequential dot product
  (``functions/vectors.py``), argmin with a deterministic tie-break
  (smallest centroid id) via one per-vector window.
- **update**: posexplode to (vector, dim, value), group by
  (centroid, dim) with QUANTIZED means (``functions/exprs.q_avg``) —
  bit-equal across engines and partition layouts, which is what makes
  a k-means run hash-checkable against a SQL oracle at all — then
  rebuild each centroid array sorted by dim.
- each iteration ``localCheckpoint``s the new centroids: k·dim tiny
  rows, and the lineage stays O(1) deep instead of growing by a
  cross-join + two aggregations per iteration.

Convergence is NOT tested by the oracle (fixed iteration count,
unrolled in the oracle SQL); at 100 TB the loop adds a movement-delta
stop condition — the per-iteration plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exprs import q_avg
from ..functions.vectors import dot_product_col


def assign_to_centroids(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid) — nearest centroid per vector, ties to smallest cid.

    ``centroids``: (cid: long, clist: array<double>). Distance is
    squared L2 expanded as dot(x,x) - 2*dot(x,c) + dot(c,c), written
    in exactly that operation order (mirrored by the oracle SQL).
    """
    dist = (
        dot_product_col(vec_col, vec_col)
        - F.lit(2.0) * dot_product_col(vec_col, "clist")
        + dot_product_col("clist", "clist")
    )
    w = Window.partitionBy(id_col).orderBy(dist.alias("d"), F.col("cid"))
    return (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, "cid")
    )


def update_centroids(
    df: DataFrame,
    assignment: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, clist) — per-dim quantized means of each cluster."""
    dims = df.join(assignment, on=id_col).select(
        "cid", F.posexplode(vec_col).alias("dim", "val")
    )
    per_dim = dims.groupBy("cid", "dim").agg(
        q_avg(F.col("val").cast("double"), "mv")
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mv"))),
            lambda s: s["mv"],
        ).alias("clist")
    )


def kmeans_lloyd(
    df: DataFrame,
    init_centroids: DataFrame,
    *,
    iterations: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iterations`` Lloyd steps; return (cid, dim, c_val,
    n_assigned) — the final centroids exploded to scalar rows (driver-
    hashable) plus each cluster's final population."""
    centroids = init_centroids.localCheckpoint(eager=True)
    assignment = None
    for _ in range(iterations):
        assignment = assign_to_centroids(
            df, centroids, id_col=id_col, vec_col=vec_col
        )
        centroids = update_centroids(
            df, assignment, id_col=id_col, vec_col=vec_col
        ).localCheckpoint(eager=True)
    counts = assignment.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_assigned")
    )
    return (
        centroids.select(
            "cid", F.posexplode("clist").alias("dim", "c_val")
        )
        .join(counts, on="cid")
        .select("cid", "dim", "c_val", "n_assigned")
    )
