"""Stateful running totals across micro-batches
(streaming/running_totals.py)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.functions.exprs import Q_BITS
from nursinghome_data_pipeline_spark.streaming.ingest_stream import (
    run_stream_to_memory,
)
from nursinghome_data_pipeline_spark.streaming.running_totals import (
    finalize_totals,
    running_totals_stream,
    running_totals_stream_agg,
)


@pytest.fixture()
def staged_batches(spark, tmp_path):
    """Three single-file 'micro-batches'; user 1 appears in all three,
    user 2 in the first two, user 3 only in the last."""
    batches = [
        [(1, 1.5), (1, 2.25), (2, 10.0)],
        [(1, 4.0), (2, -3.5)],
        [(1, 0.25), (3, 7.0)],
    ]
    d = os.path.join(tmp_path, "batches")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "user_id long, value double").coalesce(
            1
        ).write.mode("append").parquet(d)
    return d


def _run(spark, staged, name, op=running_totals_stream):
    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    run_stream_to_memory(op(stream), name, output_mode="update")
    return spark.table(name)


def test_state_accumulates_across_batches(spark, staged_batches):
    emitted = _run(spark, staged_batches, "rt_accum")
    rows = sorted(
        ((r.user_id, r.n_events, r.value_q) for r in emitted.collect())
    )
    q = 1 << Q_BITS
    # user 1: cumulative counts must be strictly increasing across its
    # three emissions — state survived the batch boundaries.
    u1 = [(n, vq) for (u, n, vq) in rows if u == 1]
    assert [n for n, _ in u1] == sorted({n for n, _ in u1})
    assert len(u1) == 3
    assert u1[-1] == (4, int(1.5 * q) + int(2.25 * q) + int(4.0 * q) + int(0.25 * q))
    # user 2 emitted twice (batches 1-2), user 3 once (batch 3)
    assert len([1 for (u, _, _) in rows if u == 2]) == 2
    assert len([1 for (u, _, _) in rows if u == 3]) == 1


def test_finalize_matches_batch_aggregate(spark, staged_batches):
    emitted = _run(spark, staged_batches, "rt_final")
    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in finalize_totals(emitted).collect()
    }
    batch = spark.read.parquet(staged_batches)
    expected = {
        r.user_id: (r.n, r.s)
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    F.floor(F.col("value") * F.lit(float(1 << Q_BITS))).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(float(1 << Q_BITS))
            ).alias("s"),
        )
        .collect()
    }
    assert final == expected  # negative values included: max_by, not max


def test_native_agg_twin_emission_identical(spark, staged_batches):
    """The r13 Catalyst-native restatement (streaming groupBy().agg()
    in update mode — the registry query's plan since r13) must emit
    EXACTLY the rows the GroupState fold emits: one cumulative row per
    touched key per micro-batch, bit-equal value_q. Multiset equality
    over the full emission history is the strongest observable pin —
    it proves per-batch update semantics, not just the final fold."""
    by_fold = _run(spark, staged_batches, "rt_diff_fold")
    by_agg = _run(
        spark, staged_batches, "rt_diff_agg", op=running_totals_stream_agg
    )
    rows_fold = sorted(map(tuple, by_fold.collect()))
    rows_agg = sorted(map(tuple, by_agg.collect()))
    assert rows_fold == rows_agg


def test_native_agg_twin_nonfinite_values(spark, tmp_path):
    """Non-finite values: the GroupState fold drops them from the sum
    (``isfinite`` guard) while counting the rows; the native twin gets
    the same semantics from q_sum_term's coerce-to-null decimal cast
    plus coalesce-to-0 (a key whose every value is non-finite must
    report value_q = 0, not NULL). Pin both paths agree per emission."""
    d = os.path.join(tmp_path, "nf_batches")
    batches = [
        [(1, float("inf")), (2, 1.5)],
        [(1, float("nan")), (1, 2.0), (2, float("-inf"))],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "user_id long, value double").coalesce(
            1
        ).write.mode("append").parquet(d)
    by_fold = _run(spark, d, "rt_nf_fold")
    by_agg = _run(spark, d, "rt_nf_agg", op=running_totals_stream_agg)
    rows_fold = sorted(map(tuple, by_fold.collect()))
    rows_agg = sorted(map(tuple, by_agg.collect()))
    assert rows_fold == rows_agg
    q = 1 << Q_BITS
    # user 1 saw only non-finite values in batch 1 → value_q pinned 0;
    # batch 2 adds one finite 2.0 (count still includes non-finite rows)
    assert [(u, n, vq) for (u, n, vq) in rows_agg if u == 1] == [
        (1, 1, 0),
        (1, 3, 2 * q),
    ]


def test_tws_variant_gated_on_protobuf(spark):
    """transformWithStateInPandas needs protobuf (not shipped in this
    container, and the environment forbids installing it — documented
    env constraint). The testable contract is therefore the GATE: where
    protobuf is absent the wiring must raise a clean, actionable
    ImportError instead of a deep Py4J failure mid-stream; where it is
    present, this test fails loudly so the real run path gets enabled.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        protobuf_available = False
    else:
        protobuf_available = True
    assert not protobuf_available, (
        "protobuf became available — enable the TWS run path and assert "
        "batch-equivalence like the applyInPandasWithState twin"
    )

    from nursinghome_data_pipeline_spark.streaming.running_totals import (
        running_totals_stream_tws,
    )

    ratestream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    df = ratestream.selectExpr("value AS user_id", "CAST(value AS DOUBLE) AS value")
    with pytest.raises(ImportError, match="protobuf"):
        running_totals_stream_tws(df)
