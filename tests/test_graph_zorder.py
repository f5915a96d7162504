"""Triangle counting (operators/graph.py) and Morton keys
(functions/zorder.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.functions.zorder import (
    morton2_col,
    morton2_py,
    oracle_morton2,
)
from nursinghome_data_pipeline_spark.operators.graph import (
    cooccurrence_edges,
    triangle_stats,
)


def _stats(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "u long, v long")
    return triangle_stats(edges).collect()[0]


def test_triangle_known_graph(spark):
    # K4 (complete graph on 4 nodes): 4 triangles, 12 wedges
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _stats(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (4, 6, 4, 12)
    assert r.clustering == 1.0


def test_triangle_with_hub(spark):
    # star (hub 0 to 1..5) has no triangle; adding edge (1,2) closes one
    star = [(0, i) for i in range(1, 6)]
    assert _stats(spark, star).n_triangles == 0
    r = _stats(spark, star + [(1, 2)])
    assert r.n_triangles == 1
    # wedge count: hub degree 5 -> C(5,2)=10, nodes 1,2 degree 2 -> 1 each
    assert r.n_wedges == 12


def test_triangle_free_graph_null_clustering(spark):
    r = _stats(spark, [(0, 1)])  # single edge: no wedge at all
    assert r.n_triangles == 0 and r.n_wedges == 0
    assert r.clustering is None


def test_cooccurrence_edges_dedup_and_order(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "a"), (3, "b"), (4, "b"), (None, "a")],
        "node long, b string",
    )
    got = sorted(
        (r.u, r.v)
        for r in cooccurrence_edges(df, node_col="node", bucket_cols=["b"]).collect()
    )
    assert got == [(1, 2), (1, 3), (2, 3), (3, 4)]


def test_morton_differential_vs_python(spark):
    vals = [(x, y) for x in [0, 1, 2, 3, 7, 255, 65535, 65536, -1] for y in [0, 1, 5, 1024, -7]]
    df = spark.createDataFrame(vals, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton2_col("x", "y").alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == morton2_py(x, y), (x, y, z)


def test_morton_duckdb_matches_spark(spark):
    import duckdb

    vals = [(x, y) for x in [0, 3, 9, 100, 65535, -4] for y in [0, 2, 77, 9999, -1]]
    df = spark.createDataFrame(vals, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton2_col("x", "y").alias("z")).collect()
    }
    con = duckdb.connect()
    sql = f"SELECT x, y, {oracle_morton2('x', 'y')} AS z FROM t"
    con.sql("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", vals)
    for x, y, z in con.sql(sql).fetchall():
        assert got[(x, y)] == z, (x, y)


def test_morton_locality(spark):
    """Points adjacent in both dims land in the same 4x4 z-block:
    the prefix of the key is a spatial bucket (the pruning property)."""
    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", (morton2_col("x", "y") / 16).cast("long").alias("blk")).collect()
    blocks = {(r.x, r.y): r.blk for r in rows}
    # all 16 points of each aligned 4x4 tile share one block id
    for bx in range(0, 8, 4):
        for by in range(0, 8, 4):
            tile = {blocks[(x, y)] for x in range(bx, bx + 4) for y in range(by, by + 4)}
            assert len(tile) == 1
