"""SimHash + embedding near-dup operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.operators.dedup import (
    hamming_distance_col,
    simhash_col,
    simhash_near_duplicate_pairs,
)
from nursinghome_data_pipeline_spark.operators.similarity import (
    embedding_near_duplicate_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "under a bright morning sun with dew still on the grass"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # identical
        (2, BASE.replace("garden", "meadow")),  # near dup
        (3, "an entirely different treatise on distributed query engines "
            "columnar storage vectorized execution and shuffle services "
            "with adaptive partition coalescing at petabyte scale"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_properties(spark, docs):
    sigs = {r.doc_id: r.sh for r in docs.select("doc_id", simhash_col("text").alias("sh")).collect()}
    assert sigs[0] == sigs[1]  # identical text → identical fingerprint
    d = spark.createDataFrame([(sigs[0], sigs[2]), (sigs[0], sigs[3])], "a long, b long")
    near, far = [r.h for r in d.select(hamming_distance_col("a", "b").alias("h")).collect()]
    assert near < far  # near-dup closer in Hamming space than unrelated
    assert near <= 8


def test_simhash_near_duplicate_pairs(docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_duplicate_pairs(docs).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_embedding_near_dup_pairs(spark):
    base = [float(i) / 10 for i in range(8)]
    near = list(base)
    near[0] += 0.01
    far = [1.0, -1.0] * 4
    df = spark.createDataFrame(
        [(0, base), (1, list(base)), (2, near), (3, far)],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_duplicate_pairs(df, dim=8, threshold=0.99).collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.99
    assert all(3 not in p for p in pairs)


def test_simhash_long_doc_fallback_consistent(spark):
    """Docs over 255 tokens take the per-bit fallback path; simhash is
    invariant under multiset repetition (2*c > n is scale-free), so a
    6x-repeated doc (300 tokens, fallback) must equal the 50-token
    original (SWAR path)."""
    base = " ".join(f"tok{i * 7 % 53}" for i in range(50))
    df = spark.createDataFrame(
        [(1, base), (2, " ".join([base] * 6))], "doc_id long, text string"
    )
    from nursinghome_data_pipeline_spark.operators.dedup import simhash_col

    sigs = [r.s for r in df.orderBy("doc_id").select(simhash_col("text").alias("s")).collect()]
    assert sigs[0] == sigs[1]
