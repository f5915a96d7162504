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


def test_streaming_dedup_state_is_measurably_evicted(spark, tmp_path):
    """'Bounded state' must be MEASURED, not asserted from structure
    (r5 lesson: two skew claims looked healthy until realized numbers
    were checked). Drive batches whose event time advances far past
    the watermark and read the state operator's own numbers from
    query progress: total state rows at the end must be a fraction of
    the distinct keys ever seen, and evictions must actually occur."""
    import json
    import os

    from nursinghome_data_pipeline_spark.streaming.ingest_stream import (
        streaming_dedup,
    )

    src = tmp_path / "src"
    src.mkdir()
    schema = "k long, ts timestamp"
    stream = spark.readStream.schema(schema).json(str(src))
    deduped = streaming_dedup(stream, keys=["k"], watermark="10 seconds")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_state_probe")
            .start()
        )
        try:
            n_batches, keys_per_batch = 6, 50
            for b in range(n_batches):
                # each batch: fresh keys, event time 60s later than the
                # previous batch — far past the 10s watermark, so every
                # earlier batch's state is evictable by the next one
                with open(os.path.join(str(src), f"b{b}.json"), "w") as f:
                    for i in range(keys_per_batch):
                        f.write(
                            json.dumps(
                                {
                                    "k": b * keys_per_batch + i,
                                    "ts": f"2024-01-01T00:{b:02d}:00",
                                }
                            )
                            + "\n"
                        )
                q.processAllAvailable()
            progress = q.lastProgress
            ops = progress["stateOperators"]
            assert ops, "no state operator reported progress"
            dedup_op = next(
                o for o in ops if "dedupe" in o["operatorName"].lower()
            )
            total_keys = n_batches * keys_per_batch
            # MEASURED bound: end-state holds at most ~2 batches' keys
            # (current batch + not-yet-finalized watermark frontier),
            # nowhere near the 300 distinct keys ever inserted
            assert 0 < dedup_op["numRowsTotal"] <= 2 * keys_per_batch, ops
            assert spark.table("dedup_state_probe").count() == total_keys
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
