"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; all Spark-side mechanics — schema, partition sizing,
Arrow batch shape, Pandas-UDF signatures — are real and tested. The
actual codec work (image decode, audio resample, frame extraction)
needs media libraries that are NOT in this environment, so the decode
kernels are stubbed: ``decode_stub=True`` (default) computes a
deterministic fake feature from the bytes; ``decode_stub=False`` raises
``NotImplementedError`` at the point a real codec would run.

Scale notes: media blobs make rows wide — ``media_repartition`` sizes
partitions by *bytes*, not rows, so Arrow batches stay within executor
memory; feature extraction is ``mapInPandas`` (streamed batches, no
per-row pickling).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal record schema
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def media_repartition(df: DataFrame, *, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition a media table so each partition holds ~target_bytes
    of payload (blob tables must be sized by bytes, not row counts)."""
    total = df.agg(
        F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("b")
    ).first()["b"] or 0
    n = max(1, int(total / target_bytes) + 1)
    return df.repartition(n)


def _fake_feature(payload: bytes | None) -> list[float]:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats
    derived from a sha256 of the bytes."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(df: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """Per-payload feature vectors via ``mapInPandas`` (Arrow-batched).

    Output: (media_id, mime, feature array<double>). With a real codec
    library installed, replace ``_fake_feature`` with the decode +
    model forward pass — the Spark plumbing is unchanged.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("mime", T.StringType(), True),
            T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; use decode_stub=True"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m.get("mime") if m else None for m in pdf["meta"]],
                    "feature": [_fake_feature(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame, *, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame timestamp (media_id, frame_ts_ms, frame binary).

    The frame timestamps come from metadata (duration), so the row
    explosion is computable WITHOUT decoding; only the frame pixel
    payload needs the codec (stubbed: sha256-derived bytes).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ts, frames = [], [], []
            for _, row in pdf.iterrows():
                meta = row["meta"] or {}
                duration = meta.get("duration_ms") or 0
                for t in range(0, int(duration), every_ms):
                    if not decode_stub:
                        raise NotImplementedError(
                            "real frame extraction requires codec libraries"
                        )
                    ids.append(row["media_id"])
                    ts.append(t)
                    seed = hashlib.sha256(
                        (row["payload"] or b"") + t.to_bytes(8, "little")
                    ).digest()
                    frames.append(seed)
            yield pd.DataFrame(
                {"media_id": ids, "frame_ts_ms": ts, "frame": frames}
            )

    return df.mapInPandas(batches, schema=out_schema)
