"""Streaming ingest smoke tests: file-source CSV conform stream and the
watermarked windowed aggregate vs its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.config import specs_from_dict
from nursinghome_data_pipeline_spark.sources.tpch import load_tables
from nursinghome_data_pipeline_spark.streaming.ingest_stream import (
    run_stream_to_memory,
    stream_csv_ingest,
    windowed_event_aggregates,
)

SPEC = specs_from_dict(
    {
        "datasets": {
            "pen": {
                "filename_pattern": "*.csv",
                "staging_table": "s",
                "natural_key": [],
                "columns": {
                    "ccn": {"type": "string"},
                    "amount": {"type": "numeric"},
                    "when_date": {"type": "date"},
                },
            }
        }
    }
)["pen"]


def test_stream_csv_ingest(spark, tmp_path):
    (tmp_path / "f1.csv").write_text("ccn,amount,when_date\n001,5.5,01/02/2024\n002,bad,x\n")
    stream = stream_csv_ingest(spark, SPEC, str(tmp_path))
    assert stream.isStreaming
    run_stream_to_memory(stream, "ingested")
    rows = {r.ccn: r for r in spark.sql("SELECT * FROM ingested").collect()}
    assert rows["001"].amount == 5.5
    assert rows["002"].amount is None  # coerce inside the stream too
    assert rows["001"].source_file == "f1.csv"


def test_windowed_aggregates_stream_equals_batch(spark, sf_dir, tmp_path):
    events = load_tables(spark, sf_dir, ["events"])["events"]
    # write through parquet (µs timestamps) so the stream reads the same rows
    pq_dir = str(tmp_path / "events_us")
    events.write.parquet(pq_dir)
    batch = windowed_event_aggregates(spark.read.parquet(pq_dir), window="1 hour")
    stream = windowed_event_aggregates(
        spark.readStream.schema(events.schema).parquet(pq_dir), window="1 hour"
    )
    assert stream.isStreaming
    run_stream_to_memory(stream, "windowed", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM windowed").collect()
    }
    exp = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got.keys() == exp.keys()
    for k, (n, s) in exp.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(s)


def test_checkpoint_restart_no_duplicates(spark, sf_dir, tmp_path):
    """Stop a checkpointed stream mid-input, restart with more files:
    the recovered query must process ONLY the new files (offsets from
    the checkpoint), ending exactly equal to the batch result — the
    at-least-once file source + checkpoint = exactly-once contract."""
    from pyspark.sql import functions as F

    from nursinghome_data_pipeline_spark.sources.tpch import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"].select(
        "event_id", "event_type", "value"
    )
    src = str(tmp_path / "ev_src")
    ckpt = str(tmp_path / "ev_ckpt")
    out = str(tmp_path / "ev_out")
    first, second = events.where(F.col("event_id") % 2 == 0), events.where(
        F.col("event_id") % 2 == 1
    )
    first.write.parquet(src)

    def run_once() -> None:
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()
    second.write.mode("append").parquet(src)
    run_once()

    sunk = spark.read.parquet(out)
    # every input row exactly once: the restart resumed from the
    # checkpointed offsets instead of re-ingesting the first half
    assert sunk.count() == events.count()
    assert sunk.select("event_id").distinct().count() == events.count()
