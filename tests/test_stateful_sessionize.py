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
