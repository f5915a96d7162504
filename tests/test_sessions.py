"""sessionize_bucketed differentials: the split-and-stitch plan must be
BIT-IDENTICAL to the single-window twin (same total order) — across
bucket widths (including bucket ≪ gap, where sessions routinely span
many buckets and the stitch follows merge chains), null ts / null user
rows, equal-timestamp ties, and a planted hot key whose timeline the
bucketed plan actually splits across tasks."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.operators.sessions import (
    sessionize_bucketed,
)
from nursinghome_data_pipeline_spark.sources.tpch import load_tables

GAP_MIN = 30


def _twin(events, gap_minutes=GAP_MIN, user_col="user_id"):
    """The single-window form with the SAME deterministic total order
    (ts, event_id) in BOTH windows (the registry twin orders its prefix
    sum by ts alone, which is only tie-ambiguous; this pins ties)."""
    w = Window.partitionBy(user_col).orderBy("ts", "event_id")
    ltz = F.col("ts").cast("timestamp_ltz")
    gap_us = F.unix_micros(ltz) - F.unix_micros(F.lag(ltz).over(w))
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (gap_us > gap_minutes * 60_000_000),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
    )


def _rows(df):
    def key(t):
        return tuple((v is None, v if v is not None else 0) for v in t[:2]) + (
            t[2],
            (t[3] is None, t[3] or datetime.datetime.min),
        )

    return sorted(
        (
            (r["user_id"], r["session_id"], r["n_events"], r["session_start"])
            for r in df.collect()
        ),
        key=key,
    )


@pytest.mark.parametrize("bucket_minutes", [7, 60, 24 * 60, 10**9])
def test_bucketed_equals_twin_on_testdata(spark, sf_dir, bucket_minutes):
    """Real events at sf0.01, bucket widths from far-below-gap to a
    degenerate single bucket (which reduces the plan to the twin)."""
    events = load_tables(spark, sf_dir, ["events"])["events"]
    got = _rows(sessionize_bucketed(events, bucket_minutes=bucket_minutes))
    want = _rows(_twin(events))
    assert got == want


def _frame(spark, rows):
    return spark.createDataFrame(
        [
            (
                i,
                None
                if ts is None
                else datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=ts),
                u,
            )
            for i, (u, ts) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long",
    )


def test_edge_cases_equal_twin(spark):
    """Null ts (each opens a session; the next real row does too), null
    user, exact-gap boundary (strictly-greater semantics: 30 min 00 s
    continues the session), ties, and a session chained across 5
    consecutive 7-minute buckets."""
    rows = [
        (1, None),  # null ts -> own session
        (1, None),  # second null ts -> own session
        (1, 0.0),  # after null ts -> new session
        (1, 30.0),  # exactly the gap -> SAME session (strict >)
        (1, 60.0001),  # 30 min + 6 ms -> new session
        (1, 60.0001),  # tie (same ts, higher event_id) -> same session
        # a chain walking 5 adjacent 7-minute buckets, 5-minute steps
        (2, 0.0),
        (2, 5.0),
        (2, 10.0),
        (2, 15.0),
        (2, 20.0),
        (2, 25.0),
        (2, 30.0),
        (2, 35.0),
        # then silence past the gap
        (2, 80.0),
        (None, 0.0),  # null user is its own partition
        (None, 200.0),
    ]
    df = _frame(spark, rows)
    for bucket_minutes in (7, 13, 60, 10**6):
        got = _rows(sessionize_bucketed(df, bucket_minutes=bucket_minutes))
        want = _rows(_twin(df))
        assert got == want, f"bucket_minutes={bucket_minutes}"
    # spot-check the semantics themselves, not just twin agreement
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"])
        for r in sessionize_bucketed(df, bucket_minutes=7).collect()
    }
    assert out[(1, 1)] == 1 and out[(1, 2)] == 1  # null-ts singletons
    assert out[(1, 3)] == 2  # 0.0 + 30.0 share a session
    assert out[(1, 4)] == 2  # the tie pair
    assert out[(2, 1)] == 8 and out[(2, 2)] == 1
    assert out[(None, 1)] == 1 and out[(None, 2)] == 1


def test_seeded_random_battery_equals_twin(spark):
    """Randomized frames (ties, nulls, bursts) across widths — the
    cheap stand-in for a Hypothesis sweep (one Spark job per example
    is too slow for shrinking)."""
    import random

    for seed in range(5):
        rng = random.Random(20260815 + seed)
        rows = []
        for _ in range(300):
            u = rng.choice([1, 2, 3, None])
            ts = (
                None
                if rng.random() < 0.05
                else round(rng.uniform(0, 3000), 1)
            )
            rows.append((u, ts))
        # planted burst: many rows inside one bucket, some tied
        rows += [(1, 500.0)] * 5 + [(1, 500.2)] * 3
        df = _frame(spark, rows)
        bucket_minutes = rng.choice([3, 17, 45, 300])
        got = _rows(sessionize_bucketed(df, bucket_minutes=bucket_minutes))
        want = _rows(_twin(df))
        assert got == want, f"seed={seed} bucket={bucket_minutes}"


def test_far_future_timestamps_bucket_exactly(spark):
    """|unix_micros| > 2^53 (e.g. a 9999-12-31 sentinel) would lose µs
    under double division — bucket assignment must be integer `div` so
    near-boundary events keep their time order and the output still
    matches the twin."""
    far = datetime.datetime(9999, 12, 30, 23, 0, 0)
    rows = [
        (7, far),
        (7, far + datetime.timedelta(microseconds=3)),
        (7, far + datetime.timedelta(minutes=29)),
        (7, far + datetime.timedelta(minutes=61)),  # > gap: new session
        (8, far - datetime.timedelta(days=2)),
    ]
    df = spark.createDataFrame(
        [(i, ts, u) for i, (u, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long",
    )
    for bucket_minutes in (7, 60):
        got = _rows(sessionize_bucketed(df, bucket_minutes=bucket_minutes))
        want = _rows(_twin(df))
        assert got == want, f"bucket_minutes={bucket_minutes}"


def test_hot_key_timeline_is_actually_split(spark):
    """The scale claim: a hot user's rows occupy many (user, bucket)
    groups, so the local window's max per-task partition is bounded by
    the bucket width — while the output still matches the twin."""
    n = 20_000
    hot = spark.range(n).select(
        F.col("id").alias("event_id"),
        # one event per minute for ~14 days
        (
            F.lit(datetime.datetime(2024, 1, 1))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("ts"),
        F.lit(7).alias("user_id"),
    )
    got = sessionize_bucketed(hot, bucket_minutes=60)
    want = _twin(hot)
    assert _rows(got) == _rows(want)
    # every row is ≤ 1 minute from its neighbors -> ONE session
    assert got.count() == 1
    groups = (
        hot.withColumn(
            "__bkt",
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp_ltz")) / 3_600_000_000
            ),
        )
        .groupBy("user_id", "__bkt")
        .count()
    )
    mx, total = groups.agg(F.max("count"), F.sum("count")).first()
    assert total == n
    assert mx <= 60  # bucket width bounds the local-window partition
