"""Grouped applyInPandas whitening + the synthetic_docs Python data
source: determinism under repartitioning is the property both must hold
at cluster scale, so it is what the tests pin."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.operators.similarity import whiten_by_label
from nursinghome_data_pipeline_spark.sources.pydatasource import register
from nursinghome_data_pipeline_spark.sources.tpch import load_tables


def test_whiten_by_label_moments_and_determinism(spark, sf_dir):
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    white = whiten_by_label(emb).cache()
    # per-label, per-dimension: mean ~ 0, std ~ 1 (population)
    stats = (
        white.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.avg("v").alias("mu"),
            F.stddev_pop("v").alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert stats
    for r in stats:
        assert abs(r.mu) < 1e-5, f"label {r.label} dim {r.dim} mean {r.mu}"
        # zero-variance dims pass through centered (sd 0 allowed)
        assert r.sd < 1e-5 or abs(r.sd - 1.0) < 1e-4 or r.n == 1

    # deterministic under a different partitioning
    again = whiten_by_label(emb.repartition(7, "vec_id"))
    a = {r.vec_id: r.embedding for r in white.collect()}
    b = {r.vec_id: r.embedding for r in again.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], f"vec {k} differs across partitionings"
    white.unpersist()


def test_synthetic_docs_source_reads_and_is_partition_invariant(spark):
    register(spark)
    df4 = (
        spark.read.format("synthetic_docs")
        .option("rows", 500)
        .option("partitions", 4)
        .load()
    )
    assert df4.count() == 500
    assert df4.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    df1 = (
        spark.read.format("synthetic_docs")
        .option("rows", 500)
        .option("partitions", 11)
        .load()
    )
    # identical content for any partition count (pure function of doc_id)
    h4 = df4.agg(F.sum(F.xxhash64(*df4.columns)).alias("h")).collect()[0].h
    h1 = df1.agg(F.sum(F.xxhash64(*df1.columns)).alias("h")).collect()[0].h
    assert h4 == h1
    # n_chars is consistent with text
    bad = df4.where(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_synthetic_docs_feed_registry_operators(spark):
    """The generated corpus must be a drop-in for documents-table ops."""
    from nursinghome_data_pipeline_spark.functions.text import quality_score_col

    register(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("rows", 200)
        .option("partitions", 3)
        .load()
    )
    scored = docs.select("doc_id", quality_score_col("text").alias("q"))
    vals = [r.q for r in scored.collect()]
    assert len(vals) == 200
    assert all(not math.isnan(v) and 0.0 <= v <= 1.0 for v in vals)


def test_oracle_cte_regenerates_corpus_exactly():
    """The DuckDB recursive-CTE twin must replay the generator's hash
    recurrence bit-for-bit — this is what licenses the end-to-end
    value-check of queries over the custom data source."""
    import duckdb

    from nursinghome_data_pipeline_spark.sources.pydatasource import (
        _doc_row,
        oracle_corpus_cte,
    )

    con = duckdb.connect(":memory:")
    got = con.execute(
        f"WITH RECURSIVE {oracle_corpus_cte(200)} "
        "SELECT doc_id, text, lang, source, n_chars FROM docs ORDER BY doc_id"
    ).fetchall()
    assert len(got) == 200
    for row in got:
        assert tuple(row) == _doc_row(row[0])
