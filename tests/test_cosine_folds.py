"""Bit-equality pins for the pre-folded cosine forms.

`_cosine_lit` (literal-vector self-dot folded driver-side) and
`_cosine_with_norms` (norms folded per row/member instead of per
pair) are PERFORMANCE rewrites of `_cosine`; their whole correctness
argument is that every IEEE-754 operation sees the same operands in
the same order, so results are bit-identical — not merely close.
These tests pin that claim with IS DISTINCT FROM (no tolerance) over
the real embeddings table PLUS handmade edge rows: a zero vector
(NULL-guard path), a negative vector, and a tiny-magnitude vector.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.functions.vectors import l2_norm_col
from nursinghome_data_pipeline_spark.operators.similarity import (
    _cosine,
    _cosine_lit,
    _cosine_with_norms,
)


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.first()["embedding"])
    edge = spark.createDataFrame(
        [
            (1_000_001, [0.0] * dim),  # zero norm -> NULL cosine
            (1_000_002, [-1.0] * dim),
            (1_000_003, [1e-30] * (dim - 1) + [1e-30]),
        ],
        "vec_id long, embedding array<float>",
    )
    return emb.unionByName(edge)


def test_cosine_lit_bit_equal(vectors):
    qvec = [float(v) for v in vectors.orderBy("vec_id").first()["embedding"]]
    qcol = F.array(*[F.lit(v) for v in qvec])
    diff = vectors.select(
        _cosine("embedding", qcol).alias("old"),
        _cosine_lit("embedding", qvec).alias("new"),
    ).where(F.expr("old IS DISTINCT FROM new"))
    assert diff.count() == 0


def test_cosine_lit_zero_literal_is_null(vectors):
    dim = len(vectors.first()["embedding"])
    out = vectors.select(_cosine_lit("embedding", [0.0] * dim).alias("c"))
    assert out.where(F.col("c").isNotNull()).count() == 0


def test_cosine_with_norms_bit_equal_on_pairs(vectors):
    a = vectors.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("ea"),
        l2_norm_col("embedding").alias("na"),
    )
    b = vectors.select(
        (F.col("vec_id") + 1).alias("idb"),
        F.col("embedding").alias("eb"),
        l2_norm_col("embedding").alias("nb"),
    )
    pairs = a.join(b, F.col("ida") == F.col("idb"))
    diff = pairs.select(
        _cosine("ea", "eb").alias("old"),
        _cosine_with_norms("ea", "eb", F.col("na"), F.col("nb")).alias(
            "new"
        ),
    ).where(F.expr("old IS DISTINCT FROM new"))
    assert pairs.count() > 0 and diff.count() == 0


def test_driver_side_sqrt_matches_engine():
    # the _cosine_lit proof leans on math.sqrt == Math.sqrt (both
    # correctly rounded); spot-pin the fold+sqrt agreement end to end
    vals = [0.1, -2.5, 3.75, 1e-3, 7.0, -0.125, 42.0, 1e6]
    acc = 0.0
    for v in vals:
        acc = acc + float(v) * float(v)
    py = math.sqrt(acc)
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session("sqrt-pin")
    arr = F.array(*[F.lit(float(v)) for v in vals])
    row = spark.range(1).select(l2_norm_col(arr).alias("n")).first()
    assert row["n"] == py
