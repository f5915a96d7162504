"""Corpus-prep operators: benchmark decontamination and sequence
packing — planted-data semantics plus plan-shape gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.operators.corpus import (
    decontaminate,
    pack_sequences,
)


def _corpus(spark):
    rows = [
        # shares the 5-gram "alpha beta gamma delta epsilon" with bench
        (1, "intro words alpha beta gamma delta epsilon closing remark"),
        # clean: no 5-token run in common with the benchmark
        (2, "totally unrelated text about distributed query planning"),
        # shares nothing despite single common words
        (3, "alpha words appear here but never five in a row together"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the eval set contains alpha beta gamma delta epsilon exactly")],
        "doc_id long, text string",
    )


def test_decontaminate_removes_overlapping_docs(spark):
    out = decontaminate(_corpus(spark), _bench(spark), shingle_k=5)
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]


def test_decontaminate_keeps_all_when_benchmark_disjoint(spark):
    bench = spark.createDataFrame(
        [(100, "zz yy xx ww vv uu tt ss rr qq")], "doc_id long, text string"
    )
    out = decontaminate(_corpus(spark), bench, shingle_k=5)
    assert out.count() == 3


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """The contamination probe must be a broadcast semi join — the
    corpus postings never shuffle (the 100 TB requirement)."""
    plan = (
        decontaminate(_corpus(spark), _bench(spark), shingle_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_pack_sequences_bins_by_running_budget(spark):
    # 4 docs of 3 tokens each, budget 6 → bins of 2 docs, in id order
    rows = [(i, "tok tok tok", "web") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.bin_id: r
        for r in pack_sequences(docs, budget_tokens=6, n_shards=1).collect()
    }
    assert set(out) == {0, 1}
    assert (out[0].first_doc, out[0].last_doc, out[0].n_docs) == (0, 1, 2)
    assert (out[1].first_doc, out[1].last_doc, out[1].n_docs) == (2, 3, 2)
    assert all(r.total_tokens == 6 for r in out.values())


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    rows = [
        (0, " ".join(["t"] * 10), "web"),  # exceeds the budget alone
        (1, "a b", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sorted(
        pack_sequences(docs, budget_tokens=4, n_shards=1).collect(),
        key=lambda r: r.bin_id,
    )
    # doc 0 starts at offset 0 → bin 0; doc 1 starts at offset 10 → bin 2
    assert [(r.bin_id, r.n_docs) for r in out] == [(0, 1), (2, 1)]


def test_pack_sequences_sharding_is_deterministic(spark):
    rows = [(i, "x y z", "web") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted(map(tuple, pack_sequences(docs, budget_tokens=9, n_shards=4).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(
                docs.repartition(7), budget_tokens=9, n_shards=4
            ).collect(),
        )
    )
    assert a == b
    shards = {t[1] for t in a}
    assert shards == {0, 1, 2, 3}  # all shard streams populated
