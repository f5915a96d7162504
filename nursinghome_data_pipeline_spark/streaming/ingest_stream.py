"""Structured Streaming ingest (SURVEY §2.8 extension, §7.1 step 9).

The reference's batch CSV ingest (``build.py:59-82``) is manually
triggered; its streaming twin is a file-source ``readStream`` over the
same landing directory — each new file becomes a micro-batch, with the
same conform/lineage treatment, plus watermarked tumbling-window DQ
aggregates over an event stream (late data handled by the watermark).

At scale: file-source streaming checkpoints file lists; the windowed
aggregate keeps state per (window, event_type) only — both bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DatasetSpec
from ..sources.csv_source import _spark_type, cast_expr


def stream_csv_ingest(
    spark: SparkSession, spec: DatasetSpec, landing_dir: str
) -> DataFrame:
    """File-source streaming variant of the conform step (P1-P4).

    CSV streaming requires a declared schema — normalized names are the
    declared ones, so files must already use normalized headers (the
    batch path handles arbitrary headers; a landing-zone contract is
    the streaming trade-off).
    """
    schema = ", ".join(f"`{c.name}` STRING" for c in spec.columns)
    raw = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("pathGlobFilter", spec.filename_pattern)
        .csv(landing_dir)
    )
    cols = [cast_expr(F.col(c.name), c.type).alias(c.name) for c in spec.columns]
    return raw.select(
        *cols,
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source_file"),
        F.current_timestamp().alias("ingestion_ts"),
    )


def windowed_event_aggregates(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type.

    Works identically on a batch DataFrame (watermark is a no-op) and a
    stream — tests compare the streaming result against the batch twin.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    *,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "90 days",
) -> DataFrame:
    """Streaming exact dedup with bounded state
    (``dropDuplicatesWithinWatermark``).

    The training-pipeline ingest guard: drop re-delivered documents/
    events whose duplicate arrives within ``watermark`` of the
    original. State is evicted once the event-time watermark passes,
    so state size is bounded by the key arrival rate × delay — unlike
    plain ``dropDuplicates`` on a stream, whose state grows forever.

    A duplicate arriving LATER than the watermark delay re-emits (its
    state was evicted) — choose the delay ≥ the real re-delivery bound.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def run_stream_to_memory(
    df: DataFrame, query_name: str, *, output_mode: str = "append"
) -> None:
    """Drive a streaming DataFrame to completion synchronously into an
    in-memory table (local smoke-test harness)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
