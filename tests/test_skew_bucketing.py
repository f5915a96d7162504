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
