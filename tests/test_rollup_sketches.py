"""Rollup cascade losslessness + HLL sketch merge guarantees
(operators/rollup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.operators.rollup import (
    hll_rollup,
    rollup_cascade,
)
from nursinghome_data_pipeline_spark.sources.tpch import load_tables


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir, ["events"])["events"]


def test_cascade_equals_direct_day_aggregate(spark, sf_dir):
    """minute→hour→day cascade must be bit-equal to aggregating raw
    events at day level directly (mergeability of every aggregate)."""
    events = _events(spark, sf_dir)
    cascaded = {
        r["bucket"]: r
        for r in rollup_cascade(events).collect()
    }
    direct = {
        r["bucket"]: r
        for r in rollup_cascade(events, levels=("day",)).collect()
    }
    assert set(cascaded) == set(direct)
    for b, row in direct.items():
        got = cascaded[b]
        for c in ("n_events", "total_value", "avg_value", "min_value", "max_value"):
            assert got[c] == row[c], (b, c, got[c], row[c])


def test_cascade_intermediate_levels_consistent(spark, sf_dir):
    """Each level's n_events must sum to the same corpus total."""
    events = _events(spark, sf_dir)
    total = events.count()
    for levels in (("minute",), ("minute", "hour"), ("minute", "hour", "day")):
        got = (
            rollup_cascade(events, levels=levels)
            .agg(F.sum("n_events"))
            .collect()[0][0]
        )
        assert got == total, levels


def test_hll_merge_equals_single_pass(spark, sf_dir):
    """Union of per-day sketches must estimate EXACTLY what one sketch
    over the raw rows estimates (register-wise max is lossless)."""
    events = _events(spark, sf_dir)
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(
            events, key_cols=["event_type"], distinct_col="user_id"
        ).collect()
    }
    single = {
        r["event_type"]: r["est"]
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("est")
        )
        .collect()
    }
    assert merged == single


def test_hll_estimate_within_epsilon_of_exact(spark, sf_dir):
    """lgK=14 HLL relative standard error ≈ 0.8%; assert a generous 5%
    bound vs exact COUNT DISTINCT."""
    events = _events(spark, sf_dir)
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(
            events, key_cols=["event_type"], distinct_col="user_id"
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.05 * n), (k, approx[k], n)


def test_md5_hll_estimate_within_epsilon_and_merge_lossless(spark, sf_dir):
    """The oracle-exact md5-register HLL (m=256, RSE ≈ 1.04/sqrt(256)
    ≈ 6.5%): assert a 3-sigma ~20% bound vs exact COUNT DISTINCT, and
    that the day-merged registers estimate EXACTLY what a single pass
    (no day level) estimates — register-wise max is lossless."""
    from nursinghome_data_pipeline_spark.operators.rollup import (
        md5_hll_rollup,
    )

    events = _events(spark, sf_dir)
    rolled = {
        r["event_type"]: r["approx_distinct"]
        for r in md5_hll_rollup(
            events, key_cols=["event_type"], distinct_col="user_id"
        ).collect()
    }
    # single pass = bucket by a constant unit so every row lands in one
    # "day" — the merge level then has nothing to merge
    single = {
        r["event_type"]: r["approx_distinct"]
        for r in md5_hll_rollup(
            events.withColumn("ts", F.lit("2000-01-01").cast("timestamp")),
            key_cols=["event_type"],
            distinct_col="user_id",
        ).collect()
    }
    assert rolled == single
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rolled) == set(exact)
    for k, n in exact.items():
        assert abs(rolled[k] - n) <= max(2, 0.20 * n), (k, rolled[k], n)
