"""Unit tests for distributed Lloyd k-means (oracle parity is covered
by test_oracle_parity: two full iterations hash-match the unrolled
recursive SQL twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.operators.clustering import (
    assign_to_centroids,
    kmeans_lloyd,
    update_centroids,
)


def _points(spark):
    # two tight clusters around (0,0) and (10,10)
    rows = [
        (1, [0.0, 0.1]),
        (2, [0.1, 0.0]),
        (3, [-0.1, 0.0]),
        (4, [10.0, 10.1]),
        (5, [10.1, 10.0]),
        (6, [9.9, 10.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _init(spark):
    # deliberately bad init: both centroids inside cluster 1
    return spark.createDataFrame(
        [(1, [0.0, 0.1]), (2, [0.2, 0.2])], ["cid", "clist"]
    )


def test_kmeans_separates_clusters(spark):
    out = kmeans_lloyd(_points(spark), _init(spark), iterations=3).collect()
    by_cid = {}
    for r in out:
        by_cid.setdefault(r["cid"], {})[r["dim"]] = (r["c_val"], r["n_assigned"])
    assert len(by_cid) == 2
    # each centroid owns 3 points and sits at its cluster's mean
    cents = sorted(
        (v[0][0], v[0][1]) for v in by_cid.values()
    )
    assert abs(cents[0][0] - 0.0) < 0.2 and abs(cents[1][0] - 10.0) < 0.2
    assert all(v[0][1] == 3 for v in by_cid.values())


def test_assignment_tie_breaks_to_smallest_cid(spark):
    pts = spark.createDataFrame([(7, [5.0, 5.0])], ["vec_id", "embedding"])
    cents = spark.createDataFrame(
        [(2, [4.0, 5.0]), (1, [6.0, 5.0])], ["cid", "clist"]
    )
    # equidistant: must pick cid=1 (smallest), deterministically
    got = assign_to_centroids(pts, cents).collect()
    assert got[0]["cid"] == 1


def test_update_is_partition_layout_invariant(spark):
    pts = _points(spark)
    assign = assign_to_centroids(pts, _init(spark))
    a = update_centroids(pts, assign).orderBy("cid").collect()
    b = (
        update_centroids(pts.repartition(7), assign)
        .orderBy("cid")
        .collect()
    )
    assert [(r["cid"], r["clist"]) for r in a] == [
        (r["cid"], r["clist"]) for r in b
    ]


def test_tol_stops_early_at_fixed_point(spark):
    # after round 1 the two tight clusters are separated and round 2
    # reproduces the same quantized means exactly — movement 0, so a
    # tol run must stop at the round-2 check and still match the
    # full fixed-iteration result bit-for-bit
    from nursinghome_data_pipeline_spark.operators.clustering import (
        lloyd_train,
    )

    pts, init = _points(spark), _init(spark)
    fixed = lloyd_train(pts, init, iterations=5)
    early = lloyd_train(pts, init, iterations=5, tol=0.0)
    assert early._trained_rows == fixed._trained_rows
    assert fixed._rounds_run == 5
    assert early._rounds_run < 5  # the stop condition actually fired


def test_max_centroid_movement_edge_cases():
    from nursinghome_data_pipeline_spark.operators.clustering import (
        max_centroid_movement,
    )

    a = [(1, [0.0, 1.0]), (2, [5.0, 5.0])]
    assert max_centroid_movement(a, a) == 0.0
    assert max_centroid_movement(a, [(1, [0.0, 1.5]), (2, [5.0, 5.0])]) == 0.5
    # a dropped (emptied) cluster is never "converged"
    assert max_centroid_movement(a, [(1, [0.0, 1.0])]) == float("inf")
