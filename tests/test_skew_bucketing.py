"""Skew-mitigation and bucketing operators: results must be identical
to the unsalted/unbucketed plans; bucketed joins must be shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.operators.skew import (
    has_exchange,
    salted_aggregate,
    salted_join,
    write_bucketed,
)


def _skewed_df(spark):
    # 90% of rows share one hot key
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"), F.max("v").alias("m")
    )
    salted = salted_aggregate(
        df,
        ["k"],
        {
            "s": ("sum", F.col("v")),
            "n": ("count", F.lit(1)),
            "m": ("max", F.col("v")),
        },
        n_salts=8,
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salt_is_deterministic_under_recomputation(spark):
    """The salt must reproduce identical bucket assignments when the
    plan is recomputed from scratch (task retry / stage retry model) —
    a monotonically_increasing_id- or rand-derived salt would not."""
    from nursinghome_data_pipeline_spark.operators.skew import _SALT, _salt_col

    df = _skewed_df(spark)
    a = df.withColumn(_SALT, _salt_col(df, None, 8)).collect()
    # force an independent end-to-end recomputation with different
    # upstream partitioning — deterministic salts must not care
    b = (
        df.repartition(13)
        .withColumn(_SALT, _salt_col(df, None, 8))
        .collect()
    )
    key = lambda r: (r["k"], r["v"], r[_SALT])
    assert sorted(a, key=key) == sorted(b, key=key)
    # and salts actually spread the hot key over multiple buckets
    hot_salts = {r[_SALT] for r in a if r["k"] == "HOT"}
    assert len(hot_salts) > 1


def test_salted_aggregate_stable_across_runs(spark):
    df = _skewed_df(spark)
    aggs = {"s": ("sum", F.col("v")), "n": ("count", F.lit(1))}
    r1 = sorted(salted_aggregate(df, ["k"], aggs, n_salts=8).collect())
    r2 = sorted(salted_aggregate(df.repartition(7), ["k"], aggs, n_salts=8).collect())
    assert r1 == r2


def test_salted_join_matches_plain(spark):
    large = _skewed_df(spark)
    small = spark.createDataFrame(
        [("HOT", 1), ("k5", 2), ("missing", 3)], "k string, tag int"
    )
    plain = large.join(small, on="k").select("k", "v", "tag")
    salted = salted_join(large, small, ["k"], n_salts=4).select("k", "v", "tag")
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "b_orders", bucket_col="o_custkey", n_buckets=8)
    write_bucketed(customer, "b_customer", bucket_col="c_custkey", n_buckets=8)
    joined = (
        spark.table("b_orders")
        .join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_name")
    )
    # disable broadcast so the co-located sort-merge path is exercised
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert not has_exchange(joined)
        plain = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/customer.parquet"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "c_name")
        )
        assert sorted(joined.collect()) == sorted(plain.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_compact_files_reduces_file_count_preserving_rows(spark, tmp_path):
    from nursinghome_data_pipeline_spark.operators.skew import compact_files

    path = str(tmp_path / "frag")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 tiny files
    import glob
    import os

    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before >= 32
    n_after = compact_files(spark, path, target_bytes=1 << 30)
    assert n_after < before
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("v")).first()[0] == 10000 * 9999  # content intact


def test_compact_files_sorted_keeps_rowgroup_stats_selective(spark, tmp_path):
    from nursinghome_data_pipeline_spark.operators.skew import compact_files

    path = str(tmp_path / "frag_sorted")
    spark.range(0, 5000).withColumn("k", (F.col("id") * 7919) % 5000).write.mode(
        "overwrite"
    ).parquet(path)
    compact_files(spark, path, target_bytes=1 << 30, sort_col="k")
    back = spark.read.parquet(path)
    assert back.count() == 5000
    # sorted-within-file: each partition's k values are non-decreasing
    import pandas as pd

    def check(it):
        for pdf in it:
            ks = pdf["k"].tolist()
            yield pd.DataFrame({"ok": [ks == sorted(ks)]})

    assert all(
        r.ok for r in back.select("k").mapInPandas(check, "ok boolean").collect()
    )


def test_salted_join_rejects_small_side_preserving_outer(spark):
    # replicated-small salting cannot express right/full outer: every
    # unmatched small-side key would emit its null-extended row once
    # per salt replica (silent row multiplication)
    import pytest

    large = _skewed_df(spark)
    small = spark.createDataFrame([("HOT", 1), ("nope", 2)], "k string, tag int")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="unmatched small-side row"):
            salted_join(large, small, ["k"], how=how)
    # left outer preserves the salted (large) side — allowed and exact
    plain = large.join(small, ["k"], "left")
    salted = salted_join(large, small, ["k"], how="left", n_salts=8)
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_compact_files_recovers_interrupted_swap(spark, tmp_path):
    # simulate a compaction that crashed after demoting the live dir:
    # path is gone, .compact.old holds the data — the next compaction
    # must restore and proceed instead of failing on the leftover
    import os

    from nursinghome_data_pipeline_spark.operators.skew import compact_files

    path = str(tmp_path / "crashy")
    spark.range(0, 1000).repartition(8).write.parquet(path)
    os.rename(path, path + ".compact.old")  # crash state: demote done
    n = compact_files(spark, path, target_bytes=1 << 30)
    assert n >= 1
    assert not os.path.exists(path + ".compact.old")
    assert spark.read.parquet(path).count() == 1000
