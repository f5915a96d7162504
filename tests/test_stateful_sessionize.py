"""Custom stateful streaming sessionization (applyInPandasWithState)
must agree with the window-function batch twin on bounded input."""

from __future__ import annotations

from nursinghome_data_pipeline_spark.sources.tpch import load_tables
from nursinghome_data_pipeline_spark.streaming.ingest_stream import (
    run_stream_to_memory,
)
from nursinghome_data_pipeline_spark.streaming.sessionize import (
    batch_sessionize_twin,
    sessionize_stream,
)


def test_stateful_sessionize_matches_batch_twin(spark, sf_dir, tmp_path):
    events = load_tables(spark, sf_dir, ["events"])["events"].select("user_id", "ts")
    pq_dir = str(tmp_path / "events_sess")
    events.write.parquet(pq_dir)

    stream = sessionize_stream(
        spark.readStream.schema(
            spark.read.parquet(pq_dir).schema
        ).parquet(pq_dir),
        gap_minutes=30,
    )
    assert stream.isStreaming
    run_stream_to_memory(stream, "sessions_stateful", output_mode="update")

    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start)
        for r in spark.sql("SELECT * FROM sessions_stateful").collect()
    }
    exp = {
        (r.user_id, r.session_id): (r.n_events, r.session_start)
        for r in batch_sessionize_twin(
            spark.read.parquet(pq_dir), gap_minutes=30
        ).collect()
    }
    assert got == exp
    assert len(got) > 0


def test_sessionize_group_spanning_arrow_chunks(spark, tmp_path):
    """A group larger than the Arrow batch size arrives as multiple
    pandas chunks; the fold must sort the WHOLE group once — per-chunk
    sorting would fold later-chunk earlier-timestamp events out of
    order and invent extra sessions."""
    from datetime import datetime, timedelta

    # one user, 12 events over 2 true sessions, written DESCENDING so
    # chunk boundaries put later timestamps first
    base = datetime(2024, 1, 1)
    ts = [base + timedelta(minutes=m) for m in (0, 1, 2, 3, 4, 5)]
    ts += [base + timedelta(hours=5, minutes=m) for m in (0, 1, 2, 3, 4, 5)]
    rows = [(7, t) for t in reversed(ts)]
    pq_dir = str(tmp_path / "chunked_sess")
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(pq_dir)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = sessionize_stream(
            spark.readStream.schema(
                spark.read.parquet(pq_dir).schema
            ).parquet(pq_dir),
            gap_minutes=30,
        )
        run_stream_to_memory(stream, "sessions_chunked", output_mode="update")
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    got = {
        (r.user_id, r.session_id): r.n_events
        for r in spark.sql("SELECT * FROM sessions_chunked").collect()
    }
    assert got == {(7, 1): 6, (7, 2): 6}
