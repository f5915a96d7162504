#!/usr/bin/env python3
"""Core-scaling probe: measured evidence for SCALE.md.

The sf0.1 bench tables are small enough that task-launch overhead
dominates (8 vs 16 local threads time within noise of each other), so
per-query wall time says nothing about how the PLANS scale. This probe
inflates lineitem/orders/events ~``INFLATE``x into a /tmp parquet copy
(same schemas, perturbed keys so group/join cardinalities grow with the
data instead of collapsing onto the originals) and times representative
plan shapes — scan+group-agg, star join, window, text map — at several
``local[n]`` widths.

Near-linear speedup 8→32 threads on the inflated copy is the property
the 100 TB design rests on: work per partition dominating fixed
overhead, no serial stage, no skewed reducer. Run:

    python scripts/scaling_probe.py [--inflate 8] [--cores 8,16,32]

Writes nothing outside the system tempdir; deletes nothing.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _inflated_dir(inflate: int) -> str:
    # keyed by the inflate factor: a probe at a different factor must
    # re-stage, not reuse the previous copy via its _SUCCESS marker
    return os.path.join(
        tempfile.gettempdir(), f"spark-graft-scaling-x{inflate}"
    )

#: (name, SQL over the inflated views) — one representative per family
PROBES = [
    (
        "scan_group_agg",
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               SUM(l_quantity) AS sq, AVG(l_extendedprice) AS ap
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
    ),
    (
        "join_agg",
        """
        SELECT o_orderpriority, COUNT(*) AS n, SUM(l_extendedprice) AS rev
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        """,
    ),
    (
        "window_rank",
        """
        SELECT COUNT(*) FROM (
          SELECT o_custkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC) AS rn
          FROM orders) WHERE rn <= 3
        """,
    ),
    (
        "text_map",
        """
        SELECT event_type, COUNT(*) AS n,
               SUM(length(props)) AS chars,
               SUM(size(split(props, ','))) AS fields
        FROM events GROUP BY event_type
        """,
    ),
]


#: LLM-pipeline probes over the inflated documents table — the shapes
#: SCALE.md's dedup/text sections make claims about. Expressed through
#: the engine's own operators (not plain SQL) so the probe measures
#: the real plans: map-only signatures, the banded LSH shuffle, and
#: the inverted-index exact-Jaccard join with its df-cutoff.
def _doc_probes(spark, inflate: int):
    import time

    from pyspark.sql import functions as F

    from nursinghome_data_pipeline_spark.functions.text import (
        quality_score_col,
        token_count_col,
    )
    from nursinghome_data_pipeline_spark.operators.dedup import (
        jaccard_pair_join,
        minhash_signature_col,
        near_duplicate_pairs,
    )

    docs = spark.read.parquet(os.path.join(_inflated_dir(inflate), "documents"))
    probes = {
        "text_score_map": lambda: docs.select(
            "doc_id",
            token_count_col("text").alias("n_tok"),
            quality_score_col("text").alias("q"),
        ),
        "minhash_map": lambda: docs.select(
            "doc_id", minhash_signature_col("text", n_hashes=16)
        ),
        "lsh_near_dup": lambda: near_duplicate_pairs(docs, threshold=0.9),
        "exact_jaccard": lambda: jaccard_pair_join(
            docs, threshold=0.9, max_df=64
        ),
    }
    emb = spark.read.parquet(
        os.path.join(_inflated_dir(inflate), "embeddings")
    )
    qdf = emb.orderBy("vec_id").limit(1).select(
        F.col("embedding").alias("query_embedding")
    )
    from nursinghome_data_pipeline_spark.operators.similarity import (
        knn_brute_force,
        random_projection_buckets,
    )

    probes["knn_brute"] = lambda: knn_brute_force(emb, qdf, k=10)
    probes["lsh_bucketize"] = lambda: random_projection_buckets(
        emb, dim=64, n_planes=8
    )
    out = {}
    for name, mk in probes.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    out.update(_iterative_probes(spark, inflate, docs, emb))
    return out


def _iterative_probes(spark, inflate: int, docs, emb):
    """Iterative-operator shapes: rounds × (join + agg + checkpoint).

    These are the operators whose 100 TB story depends on ROUND COUNT
    staying bounded while per-round cost scales linearly — exactly what
    wall-clock at small sf cannot show. The inflation plants `inflate`
    exact copies of every document, so the near-dup graph is n_docs
    components of size `inflate`: CC is measured on a graph whose
    component count and edge count both grow with the data.

    Edge generation (the LSH join) is timed separately above
    (`lsh_near_dup`); edges are staged to parquet once per inflate
    factor so the timings here isolate the iterative phase.
    """
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from nursinghome_data_pipeline_spark.operators.clustering import (
        kmeans_lloyd,
    )
    from nursinghome_data_pipeline_spark.operators.dedup import (
        connected_components,
        near_duplicate_pairs,
    )
    from nursinghome_data_pipeline_spark.operators.graph import bfs_hops

    edge_dir = os.path.join(_inflated_dir(inflate), "nd_edges")
    if not os.path.exists(os.path.join(edge_dir, "_SUCCESS")):
        near_duplicate_pairs(docs, threshold=0.9).select(
            "id_a", "id_b"
        ).write.mode("overwrite").parquet(edge_dir)
    edges = spark.read.parquet(edge_dir)
    nodes = docs.select("doc_id")
    # synthetic long-path graph for the star-vs-propagation comparison:
    # a few chains of length ~1000 — the adversarial diameter case the
    # star algorithm exists for (near-dup graphs have diameter 2-3)
    chain = spark.range(0, 8000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    ).where((F.col("id") + 1) % 1000 != 0)
    chain_nodes = spark.range(0, 8000).select(F.col("id").alias("doc_id"))
    events = spark.read.parquet(os.path.join(_inflated_dir(inflate), "events"))
    ev_edges = (
        events.where(F.col("user_id").isNotNull())
        .select(
            F.col("user_id").alias("u"),
            ((F.col("user_id") * 2654435761) % 997).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    seeds = spark.range(0, 5).select(F.col("id").alias("node"))
    init = emb.orderBy("vec_id").limit(4).select(
        F.row_number().over(Window.orderBy("vec_id")).alias("cid"),
        F.col("embedding").alias("clist"),
    )
    probes = {
        "cc_near_dup": lambda: connected_components(nodes, edges),
        "cc_star_near_dup": lambda: connected_components(
            nodes, edges, algorithm="star"
        ),
        "cc_long_chain_star": lambda: connected_components(
            chain_nodes, chain, algorithm="star", max_iter=30
        ),
        "bfs_3hop": lambda: bfs_hops(ev_edges, seeds, max_hops=3),
        "kmeans_2iter": lambda: kmeans_lloyd(emb, init, iterations=2),
    }
    out = {}
    for name, mk in probes.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def _skew_probes(cores: int = 32, n: int = 4_000_000) -> dict:
    """Adversarial-skew probes (VERDICT r3 item #4): measured bounds,
    not prose, for the two skew-sensitive operators.

    - ``bucketed_global_order`` on a 90%-one-VALUE revenue column: a
      point mass of identical values shares one bucket at any width,
      so without tie-splitting one WindowExec partition holds 90% of
      the data. Reports wall time + the realized max window-partition
      fraction for uniform vs point-mass inputs (the operator
      sub-buckets single-value heavy buckets by tiebreak range).
    - ``salted_aggregate`` vs direct groupBy on a 90%-one-KEY column:
      with map-side partial aggregation Spark already combines the hot
      key per-partition, so this measures what salting buys (or costs)
      ON TOP of partial aggregation for a high-cardinality-payload agg
      (collect-style aggs are where salting matters; sum-like partials
      make direct groupBy fine — both recorded).

    Run: python scripts/scaling_probe.py --skew
    """
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.skew import (
        bucketed_global_order,
        salted_aggregate,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"skew-probe-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    out: dict = {"n_rows": n, "cores": cores}

    base = spark.range(n).select(F.col("id").alias("ck"))
    uniform = base.withColumn(
        "rev", (F.col("ck") % 613_211).cast("double") / 7.0
    )
    point_mass = base.withColumn(
        "rev",
        F.when(F.col("ck") % 10 < 9, F.lit(42.5)).otherwise(
            (F.col("ck") % 613_211).cast("double") / 7.0
        ),
    )
    dbg_by_label: dict[str, dict] = {}
    for label, df in (("uniform", uniform), ("point_mass_90pct", point_mass)):
        src = df.localCheckpoint(eager=True)  # exclude generation cost
        best = float("inf")
        dbg: dict = {}
        for _ in range(3):
            t0 = time.perf_counter()
            dbg = {}
            bucketed_global_order(
                src, value_col="rev", tiebreak_col="ck", debug_stats=dbg
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        dbg_by_label[label] = dbg
        out[f"bgo_{label}_sec"] = round(best, 3)
        out[f"bgo_{label}_refine_rounds"] = dbg.get("rounds")
        out[f"bgo_{label}_refined_groups"] = dbg.get("refined_groups")
    # realized max window-partition fraction under the point mass,
    # MEASURED from the operator's own final per-(__bkt,__sub)
    # populations (debug_stats.max_partition_rows) — not a derived
    # even-split assumption (ADVICE r4). The unsplit fraction is the
    # heavy value's share, counted on the ranked output.
    pm = point_mass.localCheckpoint(eager=True)
    ranked = bucketed_global_order(pm, value_col="rev", tiebreak_col="ck")
    heavy = ranked.where(F.col("rev") == 42.5).count()
    out["bgo_point_mass_heavy_rows"] = heavy
    out["bgo_unsplit_max_partition_frac"] = round(heavy / n, 3)
    pm_dbg = dbg_by_label["point_mass_90pct"]
    out["bgo_split_max_partition_frac"] = round(
        pm_dbg["max_partition_rows"] / max(pm_dbg["total_rows"], 1), 4
    )

    hot = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % 100_000).cast("long"))
        .alias("k"),
        # high-cardinality payload: partial aggregation cannot shrink a
        # collect_set of per-row-distinct values, so the hot key really
        # ships its full 90% to one reducer in the direct plan
        F.col("id").cast("double").alias("v"),
    ).localCheckpoint(eager=True)
    for label, mk in (
        (
            "direct_groupby",
            lambda: hot.groupBy("k").agg(
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
            ),
        ),
        (
            "salted_aggregate",
            lambda: salted_aggregate(
                hot,
                ["k"],
                {"s": ("sum", F.col("v")), "c": ("count", F.lit(1))},
                n_salts=32,
            ),
        ),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[f"hot_key_{label}_sec"] = round(best, 3)
    # the shape where salting actually matters: a partial-agg-resistant
    # payload (collect_set of distinct values per key) on the hot key
    for label, mk in (
        (
            "direct_collect_set",
            lambda: hot.groupBy("k").agg(
                F.size(F.collect_set(F.col("v"))).alias("nv")
            ),
        ),
        (
            "salted_collect_set",
            lambda: hot.withColumn("__s", (F.col("v") % 32).cast("int"))
            .groupBy("k", "__s")
            .agg(F.collect_set(F.col("v")).alias("p"))
            .groupBy("k")
            .agg(
                F.size(
                    F.array_distinct(F.flatten(F.collect_list("p")))
                ).alias("nv")
            ),
        ),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[f"hot_key_{label}_sec"] = round(best, 3)
    spark.stop()
    return out


def _ivf_probes(cores: int = 32, inflate: int = 256) -> dict:
    """IVF-index-at-rest probe: MEASURED byte pruning + wall time.

    ``write_ivf_index`` claims the read-path payoff of cell-partitioned
    storage: a probe query's ``cell IN (...)`` filter becomes a
    PARTITION filter, so non-probed cells cost zero I/O. The plan gate
    (``tests/test_ivf.py``) proves the filter lands in
    ``PartitionFilters``; this probe measures what that buys at a
    volume where scan cost is visible — the sf0.1 embeddings inflated
    ``inflate``× (id-shifted copies, same technique as :func:`_inflate`).

    Reports, for the SAME top-k query (results pinned identical by
    test):

    - ``fixed_fullscan_sec`` — :func:`knn_ivf_fixed` over flat parquet:
      reads every byte, assigns cells on the fly, filters post-scan;
    - ``partitioned_sec`` — :func:`knn_ivf_partitioned` over the index:
      reads only the probed cells' directories;
    - ``bytes_frac`` — probed-directory bytes / total index bytes, from
      the filesystem (ground truth, not plan output). Expected ≈
      n_probe/n_cells for balanced cells; the speedup should track it.

    Run: python scripts/scaling_probe.py --ivf
    """
    import glob
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.similarity import (
        fixed_ivf_seeds,
        ivf_probe_cells,
        knn_brute_force,
        knn_ivf_fixed,
        knn_ivf_partitioned,
        write_ivf_index,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    n_seeds, n_probe, k = 16, 2, 10
    spark = build_session(
        f"ivf-probe-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb = (
        base.crossJoin(
            spark.range(inflate).select(F.col("id").alias("__rep"))
        )
        .select(
            (F.col("vec_id") + F.col("__rep") * (1 << 40)).alias("vec_id"),
            "embedding",
            "label",
        )
    )
    flat_dir = os.path.join(
        tempfile.gettempdir(), f"spark-graft-ivf-flat-x{inflate}"
    )
    index_dir = os.path.join(
        tempfile.gettempdir(), f"spark-graft-ivf-index-x{inflate}"
    )
    emb.write.mode("overwrite").parquet(flat_dir)
    flat = spark.read.parquet(flat_dir)
    seeds = fixed_ivf_seeds(flat, n_seeds=n_seeds)
    qvec = base.orderBy("vec_id").first()["embedding"]
    t0 = time.perf_counter()
    write_ivf_index(flat, index_dir, seeds)
    write_sec = time.perf_counter() - t0

    def _dir_bytes(pattern: str) -> int:
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(pattern, "*.parquet"))
        )

    probes = ivf_probe_cells(seeds, qvec, n_probe=n_probe)
    bytes_total = sum(
        _dir_bytes(d) for d in glob.glob(os.path.join(index_dir, "cell=*"))
    )
    bytes_probed = sum(
        _dir_bytes(os.path.join(index_dir, f"cell={c}")) for c in probes
    )
    out: dict = {
        "n_rows": flat.count(),
        "n_cells": n_seeds,
        "n_probe": n_probe,
        "write_index_sec": round(write_sec, 3),
        "bytes_total": bytes_total,
        "bytes_probed": bytes_probed,
        "bytes_frac": round(bytes_probed / bytes_total, 4),
    }
    qdf = spark.createDataFrame(
        [([float(v) for v in qvec],)], "query_embedding array<float>"
    )
    timed = {
        "brute_force": lambda: knn_brute_force(flat, qdf, k=k),
        "fixed_fullscan": lambda: knn_ivf_fixed(
            flat, qvec, seeds, k=k, n_probe=n_probe
        ),
        "partitioned": lambda: knn_ivf_partitioned(
            spark, index_dir, qvec, seeds, k=k, n_probe=n_probe
        ),
    }
    for label, mk in timed.items():
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t1)
        out[f"{label}_sec"] = round(best, 3)
    out["pruning_speedup"] = round(
        out["fixed_fullscan_sec"] / out["partitioned_sec"], 2
    )
    spark.stop()
    return out


def _lsh_probes(cores: int = 32, inflate: int = 256) -> dict:
    """Multi-probe LSH at rest: the measured recall-vs-bytes curve.

    Multi-probe exists to spend I/O for recall; over a
    ``write_lsh_index`` layout each extra probed bucket is one more
    directory read, so the trade is directly measurable. For
    ``n_probe_buckets`` in 1/2/4/8 over the 256×-inflated embeddings
    (64 buckets, n_planes=6) this records the probed-bytes fraction
    (filesystem ground truth), wall time, and recall@10 against the
    brute-force top-k. Reuses the ``--ivf`` probe's inflated flat
    parquet staging.

    Run: python scripts/scaling_probe.py --lsh
    """
    import glob
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.similarity import (
        knn_brute_force,
        knn_lsh_partitioned,
        lsh_probe_buckets,
        write_lsh_index,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    n_planes, k = 6, 10
    spark = build_session(
        f"lsh-probe-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    flat_dir = os.path.join(
        tempfile.gettempdir(), f"spark-graft-ivf-flat-x{inflate}"
    )
    if not os.path.exists(os.path.join(flat_dir, "_SUCCESS")):
        base.crossJoin(
            spark.range(inflate).select(F.col("id").alias("__rep"))
        ).select(
            (F.col("vec_id") + F.col("__rep") * (1 << 40)).alias("vec_id"),
            "embedding",
            "label",
        ).write.mode("overwrite").parquet(flat_dir)
    flat = spark.read.parquet(flat_dir)
    index_dir = os.path.join(
        tempfile.gettempdir(), f"spark-graft-lsh-index-x{inflate}"
    )
    qvec = base.orderBy("vec_id").first()["embedding"]
    t0 = time.perf_counter()
    write_lsh_index(flat, index_dir, dim=len(qvec), n_planes=n_planes)
    write_sec = time.perf_counter() - t0
    import pandas as pd

    qdf = spark.createDataFrame(
        pd.DataFrame({"query_embedding": [[float(v) for v in qvec]]}),
        "query_embedding array<float>",
    )
    t0 = time.perf_counter()
    knn_brute_force(flat, qdf, k=k).collect()
    brute_sec = time.perf_counter() - t0
    # recall is a property of the hash GEOMETRY, so it is measured on
    # the distinct base vectors: the inflated corpus is id-shifted
    # COPIES, where every true top-k is copies of one vector sharing
    # one bucket and any recall curve degenerates to 0-or-1. Averaged
    # over 8 query vectors for a stable estimate.
    from nursinghome_data_pipeline_spark.operators.similarity import knn_lsh

    qids = [int(r["vec_id"]) for r in base.orderBy("vec_id").limit(8).collect()]
    recalls: dict[int, list[float]] = {1: [], 2: [], 4: [], 8: []}
    for qid in qids:
        q1 = base.where(F.col("vec_id") == qid).select(
            F.col("embedding").alias("query_embedding")
        )
        exact = {r["vec_id"] for r in knn_brute_force(base, q1, k=k).collect()}
        for nb in recalls:
            got = {
                r["vec_id"]
                for r in knn_lsh(
                    base, q1, k=k, dim=len(qvec), n_planes=n_planes,
                    n_probe_buckets=nb,
                ).collect()
            }
            recalls[nb].append(len(got & exact) / k)

    def _dir_bytes(pattern: str) -> int:
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(pattern, "*.parquet"))
        )

    bytes_total = sum(
        _dir_bytes(d) for d in glob.glob(os.path.join(index_dir, "bucket=*"))
    )
    out: dict = {
        "n_rows": flat.count(),
        "n_buckets": 1 << n_planes,
        "write_index_sec": round(write_sec, 3),
        "brute_force_sec": round(brute_sec, 3),
        "bytes_total": bytes_total,
    }
    for nb in (1, 2, 4, 8):
        probes = lsh_probe_buckets(
            qvec, dim=len(qvec), n_planes=n_planes, n_probe_buckets=nb
        )
        bytes_probed = sum(
            _dir_bytes(os.path.join(index_dir, f"bucket={b}"))
            for b in probes
        )
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            knn_lsh_partitioned(
                spark, index_dir, qvec, k=k, dim=len(qvec),
                n_planes=n_planes, n_probe_buckets=nb,
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t1)
        out[f"probe{nb}_bytes_frac"] = round(bytes_probed / bytes_total, 4)
        out[f"probe{nb}_sec"] = round(best, 3)
        out[f"probe{nb}_mean_recall_at_{k}"] = round(
            sum(recalls[nb]) / len(recalls[nb]), 3
        )
    spark.stop()
    return out


def _compaction_probes(cores: int = 32, inflate: int = 256) -> dict:
    """Measured effect of ``files_per_partition`` on the at-rest LSH
    index: files per bucket directory, build wall, and probe wall,
    fragmented (shuffle-free default — every writer task may emit into
    every directory) vs compacted (one build-time shuffle bounding
    writers per directory). The SAME top-k rows come back from both
    layouts; only file counts and walls differ.

    Run: python scripts/scaling_probe.py --compaction
    """
    import glob
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.similarity import (
        knn_lsh_partitioned,
        write_lsh_index,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    n_planes = 6
    spark = build_session(
        f"compaction-probe-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    flat_dir = os.path.join(
        tempfile.gettempdir(), f"spark-graft-ivf-flat-x{inflate}"
    )
    if not os.path.exists(os.path.join(flat_dir, "_SUCCESS")):
        base.crossJoin(
            spark.range(inflate).select(F.col("id").alias("__rep"))
        ).select(
            (F.col("vec_id") + F.col("__rep") * (1 << 40)).alias("vec_id"),
            "embedding",
            "label",
        ).write.mode("overwrite").parquet(flat_dir)
    # Stage the corpus across MANY partitions (materialized, excluded
    # from build timing): the fragmentation failure mode is one file
    # per (writer task x bucket dir), so it only shows when the build
    # input has many tasks — exactly the 1000-executor situation the
    # compaction option exists for. 128 input tasks x 64 buckets
    # without compaction => up to 128 files per directory.
    flat = (
        spark.read.parquet(flat_dir).repartition(128).localCheckpoint(eager=True)
    )
    qvec = [float(v) for v in base.orderBy("vec_id").first()["embedding"]]
    out: dict = {"cores": cores, "inflate": inflate, "input_tasks": 128}

    def _files_per_dir(path: str) -> tuple[int, float]:
        per = [
            len([f for f in os.listdir(d) if f.endswith(".parquet")])
            for d in glob.glob(os.path.join(path, "bucket=*"))
        ]
        return max(per), round(sum(per) / len(per), 1)

    for label, fpp in (("fragmented", None), ("compacted", 2)):
        path = os.path.join(
            tempfile.gettempdir(), f"spark-graft-lsh-{label}-x{inflate}"
        )
        t0 = time.perf_counter()
        write_lsh_index(
            flat, path, dim=len(qvec), n_planes=n_planes,
            files_per_partition=fpp,
        )
        out[f"{label}_build_sec"] = round(time.perf_counter() - t0, 2)
        mx, mean = _files_per_dir(path)
        out[f"{label}_max_files_per_dir"] = mx
        out[f"{label}_mean_files_per_dir"] = mean
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            knn_lsh_partitioned(
                spark, path, qvec, k=10, n_probe_buckets=4
            ).collect()
            best = min(best, time.perf_counter() - t0)
        out[f"{label}_probe_sec"] = round(best, 3)
    spark.stop()
    return out


def _stage_big_docs(spark, docs):
    """30× content-distinct copy of the sf docs (per-copy token tag →
    cross-copy Jaccard 0, no fake dup inflation) — shared staging for
    the --dedupcadence regeometry leg and --ingestloop (one cached
    parquet, one tagging scheme; a drift between two copies of this
    block would silently reuse the other leg's stale cache)."""
    from pyspark.sql import functions as F

    big_dir = os.path.join(
        tempfile.gettempdir(), "spark-graft-dedup-regeo-src"
    )
    if not os.path.exists(os.path.join(big_dir, "_SUCCESS")):
        docs.crossJoin(
            spark.range(30).select(F.col("id").alias("__rep"))
        ).select(
            (F.col("doc_id") + F.col("__rep") * (1 << 40)).alias("doc_id"),
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    "text", r"(\S+)",
                    F.concat(F.lit("c"), F.col("__rep"), F.lit("$1")),
                )
            ).alias("text"),
        ).write.mode("overwrite").parquet(big_dir)
    return spark.read.parquet(big_dir)


def _dedup_cadence_probes(
    cores: int = 32,
    checkpoints: tuple[int, ...] = (1, 32, 128),
    batch_docs: int = 100,
    legs: tuple[str, ...] = ("cadence", "regeo"),
) -> dict:
    """Append-cadence file growth on the at-rest minhash index (r8
    asks #2/#3, re-measured r9 after the LSM delta change): probe
    latency + file counts after 1/32/128 appends, the compaction
    restore point, and the regeometry before/after on a deliberately
    outgrown index.

    r8 measured the per-directory routed appends (≤1 file per matched
    directory per append → N appends ≈ N files/dir): +25% probe
    latency at 32 appends, 3.0× at 128. r9's appends are single-file
    ``pb=-1`` deltas, so the same sweep now measures the DELTA curve:
    +1 file and one small extra directory scan per append, which
    should hold the probe nearly flat until the delta's row count
    itself matters.

    The regeometry leg: a 30× corpus indexed at the geometry auto
    would pick for the 1× corpus (n_buckets=16 where auto(150k)=64) —
    the exact shape an append-grown index reaches — probed with a
    SMALL batch (20 docs), where pruning granularity is the whole
    game: per band, k keys match ≤k of n_buckets directories, so 4×
    more buckets reads ~¼ the postings.

    Run: python scripts/scaling_probe.py --dedupcadence
    """
    import glob
    import shutil
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.dedup_index import (
        dedup_batch_against_index,
        write_dedup_index,
    )
    from nursinghome_data_pipeline_spark.operators.similarity import (
        append_to_ann_index,
        compact_ann_index,
        load_ann_meta,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"dedup-cadence-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    out: dict = {"cores": cores, "sf_dir": SF_DIR, "batch_docs": batch_docs}

    def _index_stats(path: str) -> tuple[int, int, float]:
        from nursinghome_data_pipeline_spark.operators.similarity import (
            active_data_root,
        )

        per = [
            len([f for f in os.listdir(d) if f.endswith(".parquet")])
            for d in glob.glob(
                os.path.join(active_data_root(path), "pb=*")
            )
        ]
        return sum(per), max(per), round(sum(per) / len(per), 2)

    def _probe_best(path: str, batch, n: int = 3) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            dedup_batch_against_index(spark, batch, path).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def _matched_rows(path: str, batch) -> tuple[int, int, int]:
        """(matched dirs, postings rows behind them, total rows) — the
        scan-volume quantity the wall can't show at probe-overhead-
        dominated corpus sizes; reuses the probe's own banding."""
        from nursinghome_data_pipeline_spark.operators.dedup_index import (
            _banded_rows,
        )

        meta = load_ann_meta(path)
        b = _banded_rows(
            batch,
            id_col=meta["id_col"],
            text_col=meta["text_col"],
            n_hashes=int(meta["n_hashes"]),
            bands=int(meta["bands"]),
            shingle_k=int(meta["shingle_k"]),
            n_buckets=int(meta["n_buckets"]),
        )
        pbs = [r["pb"] for r in b.select("pb").distinct().collect()]
        from nursinghome_data_pipeline_spark.operators.similarity import (
            active_data_root,
        )

        idx = spark.read.parquet(active_data_root(path))
        return (
            len(pbs),
            idx.where(F.col("pb").isin(pbs)).count(),
            idx.count(),
        )

    # ---- append-cadence leg: base index + 128 fresh-content appends
    if "cadence" in legs:
        path = os.path.join(
            tempfile.gettempdir(), "spark-graft-dedup-cadence"
        )
        shutil.rmtree(path, ignore_errors=True)
        write_dedup_index(docs, path, n_buckets="auto")
        out["base_docs"] = docs.count()
        out["geometry"] = (
            f"{load_ann_meta(path)['bands']}"
            f"x{load_ann_meta(path)['n_buckets']}"
        )
        # fixed probe batch: known-match copies of 1k corpus docs under
        # fresh ids (timed probes exercise the verify join, not an
        # empty candidate set) — materialized so probe timing excludes
        # staging
        probe_batch = (
            docs.orderBy("doc_id").limit(1000)
            .select((F.col("doc_id") + (1 << 50)).alias("doc_id"), "text")
            .localCheckpoint(eager=True)
        )
        out["probe_sec_appends_0"] = _probe_best(path, probe_batch)
        files0, mx0, mean0 = _index_stats(path)
        out["files_appends_0"] = files0
        # 128 append batches of fresh docs (per-batch token tag →
        # disjoint shingles: content-fresh daily batches, uniform
        # band keys)
        append_wall = 0.0
        for i in range(max(checkpoints)):
            batch = (
                docs.orderBy("doc_id").limit(batch_docs)
                .select(
                    (F.col("doc_id") + (i + 1) * (1 << 40)).alias("doc_id"),
                    F.regexp_replace(
                        "text", r"(\S+)", f"a{i}$1"
                    ).alias("text"),
                )
            )
            t0 = time.perf_counter()
            append_to_ann_index(batch, path)
            append_wall += time.perf_counter() - t0
            if (i + 1) in checkpoints:
                files, mx, mean = _index_stats(path)
                out[f"files_appends_{i + 1}"] = files
                out[f"max_files_per_dir_appends_{i + 1}"] = mx
                out[f"probe_sec_appends_{i + 1}"] = _probe_best(
                    path, probe_batch
                )
        out["append_wall_total_sec"] = round(append_wall, 2)
        t0 = time.perf_counter()
        compact_ann_index(spark, path)
        out["compact_sec"] = round(time.perf_counter() - t0, 2)
        files_c, mx_c, mean_c = _index_stats(path)
        out["files_after_compact"] = files_c
        out["probe_sec_after_compact"] = _probe_best(path, probe_batch)

    if "regeo" not in legs:
        spark.stop()
        return out

    # ---- regeometry leg: 30× corpus indexed at the 1×-corpus geometry
    big = _stage_big_docs(spark, docs)
    out["regeo_docs"] = big.count()
    stale = os.path.join(tempfile.gettempdir(), "spark-graft-dedup-regeo-idx")
    shutil.rmtree(stale, ignore_errors=True)
    write_dedup_index(big, stale, n_buckets=16)  # the outgrown geometry
    small_probe = (
        big.orderBy("doc_id").limit(20)
        .select((F.col("doc_id") + (1 << 50)).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    out["regeo_before_geometry"] = f"4x{load_ann_meta(stale)['n_buckets']}"
    out["regeo_before_probe_sec"] = _probe_best(stale, small_probe, n=5)
    dirs_b, rows_b, total_b = _matched_rows(stale, small_probe)
    out["regeo_before_matched_dirs"] = dirs_b
    out["regeo_before_rows_scanned"] = rows_b
    t0 = time.perf_counter()
    compact_ann_index(spark, stale, regeometry=True)
    out["regeo_compact_sec"] = round(time.perf_counter() - t0, 2)
    out["regeo_after_geometry"] = f"4x{load_ann_meta(stale)['n_buckets']}"
    out["regeo_after_probe_sec"] = _probe_best(stale, small_probe, n=5)
    dirs_a, rows_a, total_a = _matched_rows(stale, small_probe)
    out["regeo_after_matched_dirs"] = dirs_a
    out["regeo_after_rows_scanned"] = rows_a
    out["regeo_total_postings"] = total_a
    spark.stop()
    return out


def _simhash_index_probes(cores: int = 32) -> dict:
    """At-rest simhash index (r8): fixed-batch probe cost vs corpus
    size — the same flat-probe claim the minhash index carries,
    measured at 1× (5k docs) and 30× (150k content-distinct docs).
    Records wall, auto geometry, matched dirs, and postings rows
    behind them (the quantity that scales when wall is overhead-
    dominated). Run: python scripts/scaling_probe.py --simhashindex
    """
    import shutil
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.dedup_index import (
        simhash_batch_against_index,
        write_simhash_index,
    )
    from nursinghome_data_pipeline_spark.operators.similarity import (
        load_ann_meta,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"simhash-index-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    big = _stage_big_docs(spark, docs)
    out: dict = {"cores": cores, "sf_dir": SF_DIR}
    for label, corpus in (("x1", docs), ("x30", big)):
        path = os.path.join(
            tempfile.gettempdir(), f"spark-graft-simhash-idx-{label}"
        )
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        write_simhash_index(corpus, path)
        out[f"{label}_build_sec"] = round(time.perf_counter() - t0, 2)
        meta = load_ann_meta(path)
        out[f"{label}_docs"] = corpus.count()
        out[f"{label}_n_buckets"] = meta["n_buckets"]
        batch = (
            corpus.orderBy("doc_id").limit(1000)
            .select((F.col("doc_id") + (1 << 50)).alias("doc_id"), "text")
            .localCheckpoint(eager=True)
        )
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            simhash_batch_against_index(
                spark, batch, path, max_hamming=8
            ).count()
            best = min(best, time.perf_counter() - t0)
        out[f"{label}_probe_sec"] = round(best, 3)
        # scan volume behind the matched dirs (the scaling quantity)
        from nursinghome_data_pipeline_spark.operators.dedup_index import (
            _simhash_rows,
        )

        b = _simhash_rows(
            batch,
            id_col=meta["id_col"],
            text_col=meta["text_col"],
            hash_family=meta["hash_family"],
            n_chunks=int(meta["n_chunks"]),
            chunks_per_key=int(meta["chunks_per_key"]),
            n_buckets=int(meta["n_buckets"]),
        )
        pbs = [r["pb"] for r in b.select("pb").distinct().collect()]
        idx = spark.read.parquet(path)
        out[f"{label}_matched_dirs"] = len(pbs)
        out[f"{label}_rows_scanned"] = idx.where(
            F.col("pb").isin(pbs)
        ).count()
        out[f"{label}_total_postings"] = idx.count()
        # a SMALL batch is where partition pruning pays (a 1k-doc
        # batch posts 10k keys and matches every directory): 20 docs
        # -> 200 keys -> a bounded fraction of the dirs
        small = (
            corpus.orderBy("doc_id").limit(20)
            .select((F.col("doc_id") + (1 << 51)).alias("doc_id"), "text")
            .localCheckpoint(eager=True)
        )
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            simhash_batch_against_index(
                spark, small, path, max_hamming=8
            ).count()
            best = min(best, time.perf_counter() - t0)
        out[f"{label}_small_probe_sec"] = round(best, 3)
        bs = _simhash_rows(
            small,
            id_col=meta["id_col"],
            text_col=meta["text_col"],
            hash_family=meta["hash_family"],
            n_chunks=int(meta["n_chunks"]),
            chunks_per_key=int(meta["chunks_per_key"]),
            n_buckets=int(meta["n_buckets"]),
        )
        spbs = [r["pb"] for r in bs.select("pb").distinct().collect()]
        out[f"{label}_small_matched_dirs"] = len(spbs)
        out[f"{label}_small_rows_scanned"] = idx.where(
            F.col("pb").isin(spbs)
        ).count()
    spark.stop()
    return out


def _big_probe_probes(
    cores: int = 32,
    copies: int = 200,
    batch_sizes: tuple[int, ...] = (10, 100, 1000, 10000),
) -> dict:
    """Minhash probe at the next order of magnitude (r9 ask #2):

    (a) FLAT-PROBE: a fixed 100-doc batch probed against 5k / 150k /
        1M-doc indexes (content-distinct staged copies) — the claim
        that probe cost is O(batch + matched buckets), never corpus,
        extended to ~1M docs where auto geometry reaches 4×256 dirs.
    (b) CROSSOVER: at the 1M-doc index, sweep the probe batch size
        and record matched-dirs fraction, rows scanned, and wall.
        B docs post ``bands·B`` near-uniform keys over
        ``bands·n_buckets`` directories, so the matched fraction is
        ≈ 1 − exp(−B/n_buckets): pruning pays while B ≪ n_buckets and
        dies at B ≈ n_buckets — the number the probe's docstring
        guidance quotes.

    Run: python scripts/scaling_probe.py --bigprobe
    """
    import shutil
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.dedup_index import (
        _banded_rows,
        dedup_batch_against_index,
        write_dedup_index,
    )
    from nursinghome_data_pipeline_spark.operators.similarity import (
        load_ann_meta,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"big-probe-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    big30 = _stage_big_docs(spark, docs)
    # 200× content-distinct staging (same per-copy token-tag bijection
    # as _stage_big_docs — cross-copy Jaccard 0, so pair volume tracks
    # real near-dup density, not staging artifacts)
    huge_dir = os.path.join(
        tempfile.gettempdir(), f"spark-graft-bigprobe-src-x{copies}"
    )
    if not os.path.exists(os.path.join(huge_dir, "_SUCCESS")):
        docs.crossJoin(
            spark.range(copies).select(F.col("id").alias("__rep"))
        ).select(
            (F.col("doc_id") + F.col("__rep") * (1 << 40)).alias("doc_id"),
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    "text", r"(\S+)",
                    F.concat(F.lit("g"), F.col("__rep"), F.lit("$1")),
                )
            ).alias("text"),
        ).write.mode("overwrite").parquet(huge_dir)
    huge = spark.read.parquet(huge_dir)
    out: dict = {"cores": cores, "sf_dir": SF_DIR, "copies": copies}

    def probe_best_of_3(batch, path):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            dedup_batch_against_index(
                spark, batch, path, threshold=0.8
            ).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def matched(batch, meta, idx):
        b = _banded_rows(
            batch,
            id_col=meta["id_col"], text_col=meta["text_col"],
            n_hashes=int(meta["n_hashes"]), bands=int(meta["bands"]),
            shingle_k=int(meta["shingle_k"]),
            n_buckets=int(meta["n_buckets"]),
        )
        pbs = [r["pb"] for r in b.select("pb").distinct().collect()]
        return len(pbs), idx.where(F.col("pb").isin(pbs)).count()

    # ---- (a) flat-probe across corpus sizes, fixed 100-doc batch
    for label, corpus in (("x1", docs), ("x30", big30), ("x200", huge)):
        path = os.path.join(
            tempfile.gettempdir(), f"spark-graft-bigprobe-idx-{label}"
        )
        if not os.path.exists(os.path.join(path, "_ann_meta.json")):
            shutil.rmtree(path, ignore_errors=True)
            t0 = time.perf_counter()
            write_dedup_index(corpus, path)
            out[f"{label}_build_sec"] = round(time.perf_counter() - t0, 2)
        meta = load_ann_meta(path)
        idx = spark.read.parquet(path)
        out[f"{label}_docs"] = corpus.count()
        out[f"{label}_geometry"] = f"{meta['bands']}x{meta['n_buckets']}"
        batch = (
            corpus.orderBy("doc_id").limit(100)
            .select((F.col("doc_id") + (1 << 55)).alias("doc_id"), "text")
            .localCheckpoint(eager=True)
        )
        out[f"{label}_probe100_sec"] = probe_best_of_3(batch, path)
        dirs, rows = matched(batch, meta, idx)
        out[f"{label}_probe100_matched_dirs"] = dirs
        out[f"{label}_probe100_rows_scanned"] = rows
        out[f"{label}_total_postings"] = idx.count()

    # ---- (b) batch-size crossover at the biggest index
    path = os.path.join(tempfile.gettempdir(), "spark-graft-bigprobe-idx-x200")
    meta = load_ann_meta(path)
    idx = spark.read.parquet(path)
    total_dirs = int(meta["bands"]) * int(meta["n_buckets"])
    out["x200_total_dirs"] = total_dirs
    for bs in batch_sizes:
        batch = (
            huge.orderBy("doc_id").limit(bs)
            .select((F.col("doc_id") + (1 << 56)).alias("doc_id"), "text")
            .localCheckpoint(eager=True)
        )
        out[f"x200_bs{bs}_probe_sec"] = probe_best_of_3(batch, path)
        dirs, rows = matched(batch, meta, idx)
        out[f"x200_bs{bs}_matched_dirs"] = dirs
        out[f"x200_bs{bs}_rows_scanned"] = rows

    # ---- (c) lifecycle timings at 1M docs (r9 stretch): one 1k-doc
    # delta append, the probe that then also reads the delta, and the
    # LSM-merge compaction
    from nursinghome_data_pipeline_spark.operators.similarity import (
        append_to_ann_index,
        compact_ann_index,
    )

    append_batch = (
        huge.orderBy("doc_id").limit(1000)
        .select((F.col("doc_id") + (1 << 57)).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    append_to_ann_index(append_batch, path)
    out["x200_append1k_sec"] = round(time.perf_counter() - t0, 2)
    probe = (
        huge.orderBy("doc_id").limit(100)
        .select((F.col("doc_id") + (1 << 58)).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    out["x200_probe100_with_delta_sec"] = probe_best_of_3(probe, path)
    t0 = time.perf_counter()
    out["x200_compact_files"] = compact_ann_index(spark, path)
    out["x200_compact_sec"] = round(time.perf_counter() - t0, 2)
    out["x200_probe100_after_compact_sec"] = probe_best_of_3(probe, path)
    spark.stop()
    return out


def _hot_bucket_probes(
    cores: int = 32, boiler_docs: int = 5000
) -> dict:
    """Planted-boilerplate hot-bucket probe (r9 ask #3): index the
    150k-doc staged corpus clean vs poisoned with ``boiler_docs``
    one-token-tail variants of a single document (distinct texts, so
    EXACT dedup keeps every one), then measure what the poison costs a
    probe whose batch contains one more variant — the hot band key
    makes that single doc verify against ~boiler_docs postings
    (population² pair generation, bucket-local). Records the
    ``dedup_index_bucket_stats`` summary for both indexes (the debug
    stat must light up on the poisoned one), probe walls, and the
    verified-candidate count behind them.

    Run: python scripts/scaling_probe.py --hotbucket
    """
    import shutil
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.dedup_index import (
        dedup_batch_against_index,
        dedup_index_bucket_stats,
        write_dedup_index,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"hot-bucket-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    big = _stage_big_docs(spark, docs)
    base = big.orderBy("doc_id").limit(1).collect()[0]["text"]
    boiler = spark.createDataFrame(
        [(1 << 50 | i, f"{base} boiler{i}") for i in range(boiler_docs)],
        "doc_id long, text string",
    )
    out: dict = {
        "cores": cores, "sf_dir": SF_DIR, "boiler_docs": boiler_docs,
    }
    probe_batch = spark.createDataFrame(
        [(1 << 55, f"{base} probevariant")]
        + [
            (1 << 55 | i, " ".join(f"hb{i}t{k}" for k in range(40)))
            for i in range(1, 20)
        ],
        "doc_id long, text string",
    ).localCheckpoint(eager=True)
    for label, corpus in (
        ("clean", big),
        ("poisoned", big.unionByName(boiler)),
    ):
        path = os.path.join(
            tempfile.gettempdir(), f"spark-graft-hotbucket-{label}"
        )
        shutil.rmtree(path, ignore_errors=True)
        write_dedup_index(corpus, path)
        stats = dedup_index_bucket_stats(spark, path)
        out[f"{label}_max_postings_per_key"] = stats[
            "max_postings_per_key"
        ]
        out[f"{label}_mean_postings_per_key"] = round(
            stats["mean_postings_per_key"], 2
        )
        best, n_pairs = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            n_pairs = dedup_batch_against_index(
                spark, probe_batch, path, threshold=0.8
            ).count()
            best = min(best, time.perf_counter() - t0)
        out[f"{label}_probe_sec"] = round(best, 3)
        out[f"{label}_pairs"] = n_pairs
        # candidate volume BEHIND the verify (threshold 0 keeps every
        # bucket-mate pair) — the population^2 quantity itself
        out[f"{label}_candidates"] = dedup_batch_against_index(
            spark, probe_batch, path, threshold=0.0
        ).count()
    spark.stop()
    return out


def _srp_index_probes(
    cores: int = 32,
    copies: tuple = (1, 50, 500),
) -> dict:
    """At-rest SRP embedding near-dup index (r9): fixed-batch probe
    cost vs corpus size — the flat-probe claim the minhash/simhash
    indexes carry, for the cosine family, measured at 2k / 100k / 1M
    vectors. Staging: copy c multiplies every element i by a
    deterministic ±1 drawn from xxhash64((c, i)) — elementwise signs
    square away within a copy (intra-copy cosines preserved
    bit-for-bit) while cross-copy cosines drop to ~N(0, 1/dim), so
    pair volume tracks real near-dup density, not staging artifacts.
    The probe batch is 100 driver-planted cosine-0.97 partners of
    corpus vectors, so each leg also verifies the probe FINDS planted
    pairs at scale (recall floor: 1-(1-r1(0.97))^t with the auto
    geometry). Also times the LSM lifecycle at the biggest leg:
    1k-vector delta append, probe-with-delta, compaction.

    Run: python scripts/scaling_probe.py --srpindex
    """
    import shutil
    import time

    import numpy as np
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.embedding_index import (
        _srp_rows,
        embedding_batch_against_index,
        write_srp_index,
    )
    from nursinghome_data_pipeline_spark.operators.similarity import (
        append_to_ann_index,
        compact_ann_index,
        load_ann_meta,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"srp-index-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    base = emb.orderBy("vec_id").limit(100).collect()
    rng = np.random.default_rng(20260816)

    def partner(v, c):
        v = np.asarray(v, dtype=np.float64)
        v = v / np.linalg.norm(v)
        g = rng.standard_normal(dim)
        u = g - (g @ v) * v
        u = u / np.linalg.norm(u)
        return c * v + np.sqrt(1.0 - c * c) * u

    probe = spark.createDataFrame(
        [
            (
                int(r["vec_id"]) + (1 << 55),
                [float(x) for x in np.asarray(partner(r["embedding"], 0.97),
                                              dtype=np.float32)],
            )
            for r in base
        ],
        "vec_id long, embedding array<float>",
    ).localCheckpoint(eager=True)

    def staged(n_copies: int):
        if n_copies == 1:
            return emb
        reps = spark.range(n_copies).select(F.col("id").alias("__rep"))
        return (
            emb.crossJoin(reps)
            # the base table is ONE parquet file; a broadcast-NL join
            # inherits its single partition, which would serialize the
            # downstream signature projection onto one task (r11: the
            # first 10M build ran ~1 core for 80+ min before this).
            # Real corpora arrive in many files — spread the staged
            # rows so the build measures the engine, not the staging.
            .repartition(cores * 2)
            .select(
                (F.col("vec_id") + F.col("__rep") * (1 << 40)).alias(
                    "vec_id"
                ),
                F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
                    F.transform(
                        "embedding",
                        lambda x, i: x * F.when(
                            F.pmod(
                                F.xxhash64(F.col("__rep"), i), F.lit(2)
                            ) == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0)).cast("float"),
                    )
                ).alias("embedding"),
            )
        )

    out: dict = {"cores": cores, "sf_dir": SF_DIR, "dim": dim}
    path = None
    for c in copies:
        label = f"x{c}"
        corpus = staged(c)
        path = os.path.join(
            tempfile.gettempdir(), f"spark-graft-srp-idx-{label}"
        )
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        write_srp_index(corpus, path, dim=dim, design_threshold=0.95)
        out[f"{label}_build_sec"] = round(time.perf_counter() - t0, 2)
        meta = load_ann_meta(path)
        out[f"{label}_vectors"] = corpus.count()
        out[f"{label}_geometry"] = (
            f"{meta['n_planes']}p x {meta['n_tables']}t x "
            f"{meta['n_buckets']}b"
        )
        best = float("inf")
        n_pairs = None
        for _ in range(3):
            t0 = time.perf_counter()
            n_pairs = embedding_batch_against_index(
                spark, probe, path, threshold=0.95
            ).count()
            best = min(best, time.perf_counter() - t0)
        out[f"{label}_probe100_sec"] = round(best, 3)
        out[f"{label}_probe100_pairs"] = n_pairs
        b = _srp_rows(
            probe,
            id_col=meta["id_col"], vec_col=meta["vec_col"], dim=dim,
            n_planes=int(meta["n_planes"]),
            n_tables=int(meta["n_tables"]),
            seed=int(meta["seed"]), n_buckets=int(meta["n_buckets"]),
        )
        pbs = [r["pb"] for r in b.select("pb").distinct().collect()]
        idx = spark.read.parquet(path)
        out[f"{label}_matched_dirs"] = len(pbs)
        out[f"{label}_total_dirs"] = (
            int(meta["n_tables"]) * int(meta["n_buckets"])
        )
        out[f"{label}_rows_scanned"] = idx.where(
            F.col("pb").isin(pbs)
        ).count()
        out[f"{label}_total_postings"] = idx.count()
        out[f"{label}_bytes_at_rest"] = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fls in os.walk(path)
            for f in fls
        )
    # LSM lifecycle at the biggest leg: delta append + probe + compact
    biggest = staged(copies[-1])
    append_batch = (
        biggest.orderBy("vec_id").limit(1000)
        .select((F.col("vec_id") + (1 << 56)).alias("vec_id"), "embedding")
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    append_to_ann_index(append_batch, path)
    out["append1k_sec"] = round(time.perf_counter() - t0, 2)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        embedding_batch_against_index(
            spark, probe, path, threshold=0.95
        ).count()
        best = min(best, time.perf_counter() - t0)
    out["probe100_with_delta_sec"] = round(best, 3)
    t0 = time.perf_counter()
    out["compact_files"] = compact_ann_index(spark, path)
    out["compact_sec"] = round(time.perf_counter() - t0, 2)
    spark.stop()
    return out



def _ingest_loop_probes(
    cores: int = 32,
    n_batches: int = 20,
    scales: tuple[int, ...] = (1, 10),
    batch_docs: int = 200,
    compact_every: int | None = None,
) -> dict:
    """End-to-end ``streaming_dedup_ingest`` scale point (r8 ask #4):
    drive the composed loop — exact-in-batch → near-in-batch →
    near-vs-index → target write → index append — for ``n_batches``
    micro-batches at 1× and 10× batch size against a 150k-doc index,
    recording per-batch wall, accepted rate, and index file count
    per batch. The pieces are each measured flat (probe at r7, state
    at r7); this measures the composition: per-batch wall should be
    FLAT in batch index (corpus size never appears in the loop's
    cost) and ~linear in batch size.

    Batch mix: 75% fresh docs (unique tokens), 12.5% exact copies of
    indexed corpus docs (dropped via the index probe), 12.5% one-token
    variants of the PREVIOUS batch's fresh docs (dropped via the
    index the previous batch appended to — the cross-batch path).

    Run: python scripts/scaling_probe.py --ingestloop
    """
    import glob
    import json as _json
    import shutil
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.dedup_index import (
        write_dedup_index,
    )
    from nursinghome_data_pipeline_spark.session import build_session
    from nursinghome_data_pipeline_spark.streaming.ingest_dedup import (
        streaming_dedup_ingest,
    )

    spark = build_session(
        f"ingest-loop-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    # 150k-doc corpus: shared 30× content-distinct staging
    big = _stage_big_docs(spark, docs)
    pristine = os.path.join(tempfile.gettempdir(), "spark-graft-ingest-pristine")
    if not os.path.exists(os.path.join(pristine, "_SUCCESS")):
        write_dedup_index(big, pristine, n_buckets="auto")
    n_corpus = big.count()
    # driver-side corpus sample for the exact-copy slice of each batch
    corpus_sample = [
        (int(r["doc_id"]), r["text"])
        for r in big.orderBy("doc_id").limit(
            max(1, batch_docs * max(scales) * n_batches // 8)
        ).collect()
    ]
    out: dict = {
        "cores": cores, "sf_dir": SF_DIR, "corpus_docs": n_corpus,
        "n_batches": n_batches, "batch_docs_1x": batch_docs,
        "compact_every": compact_every,
    }

    def _mk_batch(scale: int, i: int, prev_fresh: list[tuple[int, str]]):
        """(rows, fresh) for batch i at this scale — see docstring mix."""
        size = batch_docs * scale
        n_fresh = size * 3 // 4
        n_corp = (size - n_fresh) // 2
        n_prev = size - n_fresh - n_corp
        base_id = (scale * 100 + i) * (1 << 32)
        fresh = [
            (
                base_id + j,
                " ".join(f"w{scale}b{i}d{j}t{k}" for k in range(40)),
            )
            for j in range(n_fresh)
        ]
        rows = list(fresh)
        off = (scale * 100 + i) * n_corp
        for j in range(n_corp):
            cid, text = corpus_sample[(off + j) % len(corpus_sample)]
            rows.append((base_id + n_fresh + j, text))
        if prev_fresh:
            for j in range(n_prev):
                pid, text = prev_fresh[j % len(prev_fresh)]
                toks = text.split()
                toks[20] = f"v{scale}b{i}j{j}"  # one-token near-variant
                rows.append((base_id + n_fresh + n_corp + j, " ".join(toks)))
        return rows, fresh

    for scale in scales:
        index = os.path.join(
            tempfile.gettempdir(), f"spark-graft-ingest-idx-x{scale}"
        )
        shutil.rmtree(index, ignore_errors=True)
        shutil.copytree(pristine, index)
        root = os.path.join(
            tempfile.gettempdir(), f"spark-graft-ingest-run-x{scale}"
        )
        shutil.rmtree(root, ignore_errors=True)
        src = os.path.join(root, "src")
        os.makedirs(src)
        stream = spark.readStream.schema("doc_id long, text string").json(src)
        q = streaming_dedup_ingest(
            stream,
            index,
            os.path.join(root, "target"),
            threshold=0.8,
            checkpoint_dir=os.path.join(root, "ckpt"),
            # None here = exercise the unmaintained curve (the r8
            # table); pass --ingestloop-compact-every to measure the
            # folded-in cadence flattening the tail
            compact_every=compact_every,
        )
        walls, accepted, idx_files = [], [], []
        prev_fresh: list[tuple[int, str]] = []
        try:
            for i in range(n_batches):
                rows, prev_fresh = _mk_batch(scale, i, prev_fresh)
                with open(
                    os.path.join(src, f"batch-{i:03d}.json"),
                    "w", encoding="utf-8",
                ) as fh:
                    for did, text in rows:
                        fh.write(
                            _json.dumps({"doc_id": did, "text": text}) + "\n"
                        )
                t0 = time.perf_counter()
                q.processAllAvailable()
                walls.append(round(time.perf_counter() - t0, 3))
                part = os.path.join(root, "target", "data", f"ingest_batch={i}")
                accepted.append(
                    spark.read.parquet(part).count()
                    if os.path.exists(part) else 0
                )
                idx_files.append(len(glob.glob(
                    os.path.join(index, "**", "*.parquet"), recursive=True
                )))
        finally:
            q.stop()
        size = batch_docs * scale
        out[f"x{scale}"] = {
            "batch_docs": size,
            "wall_sec": walls,
            "first_batch_sec": walls[0],
            "steady_mean_sec": round(sum(walls[2:]) / len(walls[2:]), 3),
            "steady_last5_mean_sec": round(sum(walls[-5:]) / 5, 3),
            "accepted_per_batch": accepted,
            "accepted_rate": round(sum(accepted) / (size * n_batches), 3),
            "index_files_per_batch": idx_files,
        }
    spark.stop()
    return out


def _srp_norm_ab_probes(cores: int = 32, copies: int = 500) -> dict:
    """A/B the srp index's postings-carry-payload trade at 1M vectors
    (r9 verdict #2). Layout A (current): every posting row carries the
    vector + norm, duplicated n_tables times — zero joins at probe
    time, n_tables-times the storage. Layout B (normalized): postings
    keep only (pb, tbl, bucket, id); vectors + norms live ONCE in a
    sibling table partitioned by ``vb = xxhash64(id) mod 256``, so the
    probe is pruned-postings scan -> candidate pairs -> vb-pruned
    vector fetch (broadcast candidates) -> cosine verify. Measures
    bytes at rest, probe wall, and compact-equivalent wall for both;
    pins the pair set equal.

    HISTORICAL NOTE (r10): this probe's 1M measurement (A 2.61 GB /
    5.81 s probe / 41.4 s compact vs B 330 MB / 6.75 s / 14.9 s,
    pairs set-equal) decided the switch — ``write_srp_index`` now
    builds the normalized layout natively, so the "A" leg measures
    the post-switch engine, not the old payload-carrying layout.

    Run: python scripts/scaling_probe.py --srpnorm
    """
    import shutil

    import numpy as np
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.embedding_index import (
        _srp_rows,
        embedding_batch_against_index,
        write_srp_index,
    )
    from nursinghome_data_pipeline_spark.operators.similarity import (
        _compact_for_write,
        _cosine_with_norms,
        load_ann_meta,
        read_matched_partitions,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"srp-norm-ab-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    base = emb.orderBy("vec_id").limit(100).collect()
    rng = np.random.default_rng(20260816)

    def partner(v, c):
        v = np.asarray(v, dtype=np.float64)
        v = v / np.linalg.norm(v)
        g = rng.standard_normal(dim)
        u = g - (g @ v) * v
        u = u / np.linalg.norm(u)
        return c * v + np.sqrt(1.0 - c * c) * u

    probe = spark.createDataFrame(
        [
            (
                int(r["vec_id"]) + (1 << 55),
                [float(x) for x in np.asarray(partner(r["embedding"], 0.97),
                                              dtype=np.float32)],
            )
            for r in base
        ],
        "vec_id long, embedding array<float>",
    ).localCheckpoint(eager=True)
    reps = spark.range(copies).select(F.col("id").alias("__rep"))
    corpus = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("__rep") * (1 << 40)).alias("vec_id"),
        F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
            F.transform(
                "embedding",
                lambda x, i: x * F.when(
                    F.pmod(F.xxhash64(F.col("__rep"), i), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)).cast("float"),
            )
        ).alias("embedding"),
    )

    def du(path):
        total = 0
        for root, _, files in os.walk(path):
            for fn in files:
                total += os.path.getsize(os.path.join(root, fn))
        return total

    out: dict = {"cores": cores, "copies": copies, "dim": dim}
    tmp = tempfile.gettempdir()

    # ---- layout A: current payload-carrying index -------------------
    a_path = os.path.join(tmp, "spark-graft-srpab-a")
    shutil.rmtree(a_path, ignore_errors=True)
    t0 = time.perf_counter()
    write_srp_index(corpus, a_path, dim=dim, design_threshold=0.95)
    out["a_build_sec"] = round(time.perf_counter() - t0, 2)
    meta = load_ann_meta(a_path)
    geometry = dict(
        id_col=meta["id_col"], vec_col=meta["vec_col"], dim=dim,
        n_planes=int(meta["n_planes"]), n_tables=int(meta["n_tables"]),
        seed=int(meta["seed"]), n_buckets=int(meta["n_buckets"]),
    )
    out["geometry"] = (
        f"{meta['n_planes']}p x {meta['n_tables']}t x {meta['n_buckets']}b"
    )
    out["a_bytes"] = du(a_path)
    best = float("inf")
    a_pairs = None
    for _ in range(3):
        t0 = time.perf_counter()
        a_pairs = {
            (r["batch_id"], r["corpus_id"])
            for r in embedding_batch_against_index(
                spark, probe, a_path, threshold=0.95
            ).collect()
        }
        best = min(best, time.perf_counter() - t0)
    out["a_probe100_sec"] = round(best, 3)
    out["a_probe100_pairs"] = len(a_pairs)
    # compact-equivalent: full read -> repartition(pb) -> rewrite
    t0 = time.perf_counter()
    a2 = os.path.join(tmp, "spark-graft-srpab-a2")
    shutil.rmtree(a2, ignore_errors=True)
    _compact_for_write(
        spark.read.option("basePath", a_path).parquet(a_path), "pb", 1,
        "vec_id",
    ).write.partitionBy("pb").parquet(a2)
    out["a_compact_sec"] = round(time.perf_counter() - t0, 2)

    # ---- layout B: normalized postings + vector sidecar -------------
    VB = 256
    p_path = os.path.join(tmp, "spark-graft-srpab-post")
    v_path = os.path.join(tmp, "spark-graft-srpab-vec")
    shutil.rmtree(p_path, ignore_errors=True)
    shutil.rmtree(v_path, ignore_errors=True)
    t0 = time.perf_counter()
    rows = _srp_rows(corpus, **geometry)
    _compact_for_write(
        rows.select("pb", "tbl", "bucket", "vec_id"), "pb", 1, "vec_id"
    ).write.partitionBy("pb").parquet(p_path)
    from nursinghome_data_pipeline_spark.functions.vectors import l2_norm_col

    vecs = corpus.select(
        F.pmod(F.xxhash64("vec_id"), F.lit(VB)).cast("int").alias("vb"),
        "vec_id", "embedding", l2_norm_col("embedding").alias("nrm"),
    )
    _compact_for_write(vecs, "vb", 1, "vec_id").write.partitionBy(
        "vb"
    ).parquet(v_path)
    out["b_build_sec"] = round(time.perf_counter() - t0, 2)
    out["b_postings_bytes"] = du(p_path)
    out["b_vectors_bytes"] = du(v_path)
    out["b_bytes"] = out["b_postings_bytes"] + out["b_vectors_bytes"]

    total_dirs = geometry["n_tables"] * geometry["n_buckets"]

    def probe_norm():
        b = _srp_rows(probe, **geometry).localCheckpoint(eager=False)
        pbs = [r["pb"] for r in b.select("pb").distinct().collect()]
        post = read_matched_partitions(
            spark, p_path, "pb", pbs, total_partitions=total_dirs
        )
        post = post.where(F.col("pb").isin(pbs)).select(
            "tbl", "bucket", F.col("vec_id").alias("corpus_id")
        )
        bb = b.select(
            "tbl", "bucket", F.col("vec_id").alias("batch_id"),
            F.col("embedding").alias("_v_b"), F.col("nrm").alias("_n_b"),
        )
        cands = (
            bb.join(post, ["tbl", "bucket"])
            .where(F.col("batch_id") != F.col("corpus_id"))
            .select("batch_id", "corpus_id", "_v_b", "_n_b")
            .dropDuplicates(["batch_id", "corpus_id"])
            .localCheckpoint(eager=False)
        )
        vbs = [
            r["vb"]
            for r in cands.select(
                F.pmod(F.xxhash64("corpus_id"), F.lit(VB))
                .cast("int")
                .alias("vb")
            ).distinct().collect()
        ]
        vrel = read_matched_partitions(
            spark, v_path, "vb", vbs, total_partitions=VB
        )
        fetched = vrel.where(F.col("vb").isin(vbs)).select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("_v_c"),
            F.col("nrm").alias("_n_c"),
        )
        return (
            F.broadcast(cands).join(fetched, "corpus_id")
            .select(
                "batch_id", "corpus_id",
                _cosine_with_norms(
                    F.col("_v_b"), F.col("_v_c"),
                    F.col("_n_b"), F.col("_n_c"),
                ).alias("cosine_sim"),
            )
            .where(F.col("cosine_sim") >= 0.95)
        ), len(vbs)

    best = float("inf")
    b_pairs = None
    n_vbs = None
    for _ in range(3):
        t0 = time.perf_counter()
        pairs_df, n_vbs = probe_norm()
        b_pairs = {
            (r["batch_id"], r["corpus_id"]) for r in pairs_df.collect()
        }
        best = min(best, time.perf_counter() - t0)
    out["b_probe100_sec"] = round(best, 3)
    out["b_probe100_pairs"] = len(b_pairs)
    out["b_matched_vec_dirs"] = f"{n_vbs}/{VB}"
    out["pairs_equal"] = a_pairs == b_pairs
    # compact-equivalent for B: postings only (vectors are append-only)
    t0 = time.perf_counter()
    p2 = os.path.join(tmp, "spark-graft-srpab-post2")
    shutil.rmtree(p2, ignore_errors=True)
    _compact_for_write(
        spark.read.option("basePath", p_path).parquet(p_path), "pb", 1,
        "vec_id",
    ).write.partitionBy("pb").parquet(p2)
    out["b_compact_sec"] = round(time.perf_counter() - t0, 2)
    out["bytes_ratio_a_over_b"] = round(out["a_bytes"] / out["b_bytes"], 2)
    spark.stop()
    return out


def _srp_ingest_loop_probes(
    cores: int = 32,
    n_batches: int = 20,
    batch_vecs: int = 200,
    compact_every: int | None = 32,
) -> dict:
    """End-to-end ``streaming_dedup_ingest`` over a ``kind="srp"``
    index (r9): the vector loop's per-batch cadence, measured the same
    way as the minhash loop (--ingestloop) — per-batch wall must be
    FLAT in batch index (corpus size never appears in the loop's
    cost). Corpus = the 100k-vector staged index from --srpindex's x50
    leg (auto geometry 11p × 7t). Batch mix mirrors the text probe:
    75% fresh random vectors, 12.5% exact copies of indexed corpus
    vectors (dropped by the index probe), 12.5% cosine-0.97 partners
    of the PREVIOUS batch's fresh vectors (dropped via the postings
    the previous batch appended — the cross-batch path).

    Run: python scripts/scaling_probe.py --srpingest
    """
    import glob
    import json as _json
    import shutil
    import time

    import numpy as np
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.embedding_index import (
        write_srp_index,
    )
    from nursinghome_data_pipeline_spark.session import build_session
    from nursinghome_data_pipeline_spark.streaming.ingest_dedup import (
        streaming_dedup_ingest,
    )

    spark = build_session(
        f"srp-ingest-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    # 50x staged corpus — same sign-pattern decorrelation as --srpindex
    reps = spark.range(50).select(F.col("id").alias("__rep"))
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("__rep") * (1 << 40)).alias("vec_id"),
        F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
            F.transform(
                "embedding",
                lambda x, i: x * F.when(
                    F.pmod(F.xxhash64(F.col("__rep"), i), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)).cast("float"),
            )
        ).alias("embedding"),
    )
    pristine = os.path.join(
        tempfile.gettempdir(), "spark-graft-srp-ingest-pristine"
    )
    if not os.path.exists(os.path.join(pristine, "_ann_meta.json")):
        shutil.rmtree(pristine, ignore_errors=True)
        write_srp_index(big, pristine, dim=dim, design_threshold=0.95)
    n_corpus = big.count()
    corpus_sample = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in big.orderBy("vec_id").limit(
            max(1, batch_vecs * n_batches // 8)
        ).collect()
    ]
    rng = np.random.default_rng(20260816)

    def unit():
        v = rng.standard_normal(dim)
        return v / np.linalg.norm(v)

    def partner(vals, c):
        v = np.asarray(vals, dtype=np.float64)
        v = v / np.linalg.norm(v)
        g = rng.standard_normal(dim)
        u = g - (g @ v) * v
        u = u / np.linalg.norm(u)
        return c * v + np.sqrt(1.0 - c * c) * u

    def as_list(v):
        return [float(x) for x in np.asarray(v, dtype=np.float32)]

    def _mk_batch(i: int, prev_fresh):
        size = batch_vecs
        n_fresh = size * 3 // 4
        n_corp = (size - n_fresh) // 2
        n_prev = size - n_fresh - n_corp
        base_id = (100 + i) * (1 << 44)
        fresh = [(base_id + j, as_list(unit())) for j in range(n_fresh)]
        rows = list(fresh)
        off = i * n_corp
        for j in range(n_corp):
            _, vals = corpus_sample[(off + j) % len(corpus_sample)]
            rows.append((base_id + n_fresh + j, vals))
        if prev_fresh:
            for j in range(n_prev):
                _, vals = prev_fresh[j % len(prev_fresh)]
                rows.append(
                    (
                        base_id + n_fresh + n_corp + j,
                        as_list(partner(vals, 0.97)),
                    )
                )
        return rows, fresh

    out: dict = {
        "cores": cores, "sf_dir": SF_DIR, "corpus_vecs": n_corpus,
        "n_batches": n_batches, "batch_vecs": batch_vecs,
        "compact_every": compact_every, "dim": dim,
    }
    index = os.path.join(tempfile.gettempdir(), "spark-graft-srp-ingest-idx")
    shutil.rmtree(index, ignore_errors=True)
    shutil.copytree(pristine, index)
    root = os.path.join(tempfile.gettempdir(), "spark-graft-srp-ingest-run")
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    os.makedirs(src_dir)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).json(src_dir)
    q = streaming_dedup_ingest(
        stream,
        index,
        os.path.join(root, "target"),
        checkpoint_dir=os.path.join(root, "ckpt"),
        compact_every=compact_every,
    )
    walls, accepted, idx_files = [], [], []
    prev_fresh = []
    try:
        for i in range(n_batches):
            rows, prev_fresh = _mk_batch(i, prev_fresh)
            with open(
                os.path.join(src_dir, f"batch-{i:03d}.json"),
                "w", encoding="utf-8",
            ) as fh:
                for vid, vals in rows:
                    fh.write(
                        _json.dumps({"vec_id": vid, "embedding": vals})
                        + "\n"
                    )
            t0 = time.perf_counter()
            q.processAllAvailable()
            walls.append(round(time.perf_counter() - t0, 3))
            part = os.path.join(root, "target", "data", f"ingest_batch={i}")
            accepted.append(
                spark.read.parquet(part).count()
                if os.path.exists(part) else 0
            )
            idx_files.append(len(glob.glob(
                os.path.join(index, "**", "*.parquet"), recursive=True
            )))
    finally:
        q.stop()
    out["run"] = {
        "wall_sec": walls,
        "first_batch_sec": walls[0],
        "steady_mean_sec": round(sum(walls[2:]) / len(walls[2:]), 3),
        "steady_last5_mean_sec": round(sum(walls[-5:]) / 5, 3),
        "accepted_per_batch": accepted,
        "accepted_rate": round(
            sum(accepted) / (batch_vecs * n_batches), 3
        ),
        "index_files_per_batch": idx_files,
    }
    spark.stop()
    return out


def _srp_regeo_probes(cores: int = 32) -> dict:
    """SRP geometry refresh at 1M vectors (r9): what does
    ``compact --regeometry`` buy the cosine family? An index built
    when the corpus was small keeps its stale bucket count as appends
    grow it — every directory accumulates ∝ corpus postings and a
    probe's matched-dirs read converges to the whole index. This leg
    fabricates that state WITHOUT re-fingerprinting 1M vectors: the
    stored (tbl, bucket) columns re-route to the 2k-corpus geometry
    (n_buckets=16 — what auto picks at 2k), exactly the rows an
    outgrown index would hold. Then: probe, compact(regeometry=True)
    (re-derives 256 from the current corpus), probe again.

    Requires the --srpindex x500 index in the temp dir (run that
    first). Run: python scripts/scaling_probe.py --srpregeo
    """
    import json as _json
    import shutil
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.operators.embedding_index import (
        _srp_rows,
        embedding_batch_against_index,
    )
    from nursinghome_data_pipeline_spark.operators.similarity import (
        ANN_META_FILE,
        compact_ann_index,
        load_ann_meta,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"srp-regeo-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    source = os.path.join(tempfile.gettempdir(), "spark-graft-srp-idx-x500")
    if not os.path.exists(os.path.join(source, ANN_META_FILE)):
        raise SystemExit("run --srpindex first (needs the x500 index)")
    meta = load_ann_meta(source)
    dim = int(meta["dim"])
    stale_nb = 16  # auto_dedup_buckets(2000) — the 2k-corpus geometry
    path = os.path.join(tempfile.gettempdir(), "spark-graft-srp-regeo")
    shutil.rmtree(path, ignore_errors=True)
    rows = spark.read.parquet(source).withColumn(
        "pb",
        (
            F.col("tbl") * stale_nb
            + F.pmod(F.xxhash64(F.col("bucket")), F.lit(stale_nb))
        ).cast("int"),
    )
    t0 = time.perf_counter()
    rows.repartition(
        F.col("pb"), F.pmod(F.xxhash64(F.col(meta["id_col"])), F.lit(1))
    ).write.mode("overwrite").partitionBy("pb").parquet(path)
    with open(os.path.join(path, ANN_META_FILE), "w") as fh:
        _json.dump({**meta, "n_buckets": stale_nb}, fh)
    out: dict = {
        "cores": cores,
        "vectors": spark.read.parquet(path)
        .select(meta["id_col"]).distinct().count(),
        "stale_geometry": f"{meta['n_tables']}t x {stale_nb}b",
        "stage_sec": round(time.perf_counter() - t0, 2),
    }
    # 100 planted 0.97-partners, same construction as --srpindex
    import numpy as np

    emb = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).select("vec_id", "embedding").orderBy("vec_id").limit(100).collect()
    rng = np.random.default_rng(20260816)

    def partner(vals, c):
        v = np.asarray(vals, dtype=np.float64)
        v = v / np.linalg.norm(v)
        g = rng.standard_normal(dim)
        u = g - (g @ v) * v
        u = u / np.linalg.norm(u)
        return c * v + np.sqrt(1.0 - c * c) * u

    probe = spark.createDataFrame(
        [
            (
                int(r["vec_id"]) + (1 << 55),
                [float(x) for x in np.asarray(
                    partner(r["embedding"], 0.97), dtype=np.float32
                )],
            )
            for r in emb
        ],
        "vec_id long, embedding array<float>",
    ).localCheckpoint(eager=True)

    def measure(tag: str):
        m = load_ann_meta(path)
        b = _srp_rows(
            probe,
            id_col=m["id_col"], vec_col=m["vec_col"], dim=dim,
            n_planes=int(m["n_planes"]), n_tables=int(m["n_tables"]),
            seed=int(m["seed"]), n_buckets=int(m["n_buckets"]),
        )
        pbs = [r["pb"] for r in b.select("pb").distinct().collect()]
        idx = spark.read.parquet(path)
        out[f"{tag}_matched_dirs"] = len(pbs)
        out[f"{tag}_total_dirs"] = int(m["n_tables"]) * int(m["n_buckets"])
        out[f"{tag}_rows_scanned"] = idx.where(F.col("pb").isin(pbs)).count()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            embedding_batch_against_index(
                spark, probe, path, threshold=0.95
            ).count()
            best = min(best, time.perf_counter() - t0)
        out[f"{tag}_probe100_sec"] = round(best, 3)

    measure("stale")
    t0 = time.perf_counter()
    compact_ann_index(spark, path, regeometry=True)
    out["regeo_compact_sec"] = round(time.perf_counter() - t0, 2)
    out["refreshed_geometry"] = (
        f"{load_ann_meta(path)['n_tables']}t x "
        f"{load_ann_meta(path)['n_buckets']}b"
    )
    measure("refreshed")
    spark.stop()
    return out


def _zorder_probes(cores: int = 32, n: int = 4_000_000, n_files: int = 64) -> dict:
    """MEASURE the z-order data-skipping claim instead of deriving it.

    The registry's ``zorder_key_events`` docstring claims: sorting by
    the Morton key clusters BOTH dimensions so parquet min/max stats
    prune files for range predicates on either column, while a
    single-column sort prunes only itself. This probe writes the same
    uniform 2-d data (x, y ~ U[0, 2^16)) in three 64-file layouts —
    unsorted, sorted by x, sorted by morton(x, y) — then computes each
    file's realized (min, max) of x and y (exactly the stats parquet
    footer pruning consults) and counts the files a 1%-per-dimension
    range predicate cannot rule out. Fractions of files touched, per
    layout x predicate, are the output.

    Run: python scripts/scaling_probe.py --zorder
    """
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.functions.zorder import morton2_col
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"zorder-probe-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    dom = 1 << 16
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        (F.xxhash64(F.col("id")) % dom + dom) % dom,
        (F.xxhash64(F.col("id"), F.lit(1)) % dom + dom) % dom,
    ).toDF("rid", "x", "y")
    z = morton2_col("x", "y")
    out: dict = {"n_rows": n, "n_files": n_files, "cores": cores}
    lo, hi = dom // 2, dom // 2 + dom // 100  # 1% band per dimension
    preds = {
        "x_range": (F.col("fxmin") <= hi) & (F.col("fxmax") >= lo),
        "y_range": (F.col("fymin") <= hi) & (F.col("fymax") >= lo),
        "xy_box": (F.col("fxmin") <= hi)
        & (F.col("fxmax") >= lo)
        & (F.col("fymin") <= hi)
        & (F.col("fymax") >= lo),
    }
    for label, key in (
        ("unsorted", None),
        ("sorted_by_x", F.col("x")),
        ("sorted_by_morton", z.alias("__z")),
    ):
        path = os.path.join(
            tempfile.gettempdir(), f"spark-graft-zorder-{label}-{n}"
        )
        t0 = time.perf_counter()
        src = df
        if key is not None:
            src = df.repartitionByRange(n_files, key).sortWithinPartitions(key)
        else:
            src = df.repartition(n_files)
        src.select("rid", "x", "y").write.mode("overwrite").parquet(path)
        out[f"{label}_write_sec"] = round(time.perf_counter() - t0, 2)
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("x").alias("fxmin"), F.max("x").alias("fxmax"),
                F.min("y").alias("fymin"), F.max("y").alias("fymax"),
            )
        ).cache()
        total = stats.count()
        for pname, cond in preds.items():
            frac = stats.where(cond).count() / total
            out[f"{label}_{pname}_file_frac"] = round(frac, 3)
        stats.unpersist()
    spark.stop()
    return out


#: The most expensive non-streaming bench queries (BENCH_r05 order,
#: second tier appended in r6) — the --sfcurve working set. Includes
#: all six the r5 verdict named.
SFCURVE_QUERIES = [
    "knn_ivf_topk",
    "canonical_doc_selection",
    "bfs_reachability_events",
    "ngram_jaccard_pairs_docs",
    "fuzzy_match_customers",
    "corpus_build_docs",
    "near_duplicate_pairs_docs",
    "triangle_count_events",
    "kmeans_lloyd_embeddings",
    "simhash_near_dup_pairs",
    # second tier (r6): the next-costliest shapes — embedding LSH
    # near-dup, corpus decontamination, in-memory LSH/IVF top-k, the
    # TPC-H star joins, and the two map-only fingerprint batteries
    "embedding_near_dup_pairs",
    "decontaminate_docs",
    "knn_lsh_topk",
    "local_supplier_volume",
    "revenue_by_region",
    "knn_ivf_fixed_topk",
    "nation_market_share",
    "minhash_signatures_docs",
    "simhash_docs",
    # operator-level entries (r7): the registry embedding twin pins
    # n_planes=6 for oracle tractability (frozen), so the adaptive
    # default is measured through a probe-local entry instead
    "embedding_near_dup_auto",
    # operator-level (r8): pagerank has no registry twin (registry
    # frozen at 192) — curve it through the same co-activity edge
    # builder the graph queries use; under --skewed the 5%-hot user
    # is a hub of degree ∝ N, the adversarial case for the
    # contribution groupBy
    "pagerank_events",
]


def _sfcurve_extra_queries():
    """Probe-local (spark, sf_dir) callables for operator-level curves
    the frozen registry can't carry. Same calling convention as
    ``registry.queries()`` entries."""
    from pyspark.sql import functions as F  # noqa: F401

    from nursinghome_data_pipeline_spark.operators.similarity import (
        embedding_near_duplicate_pairs,
    )

    def embedding_near_dup_auto(spark, sf_dir):
        # the registry twin frozen at n_planes=6; this is the operator
        # default a caller gets with size-adaptive sizing (one plane
        # per corpus doubling past the 64-row bucket target)
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        return embedding_near_duplicate_pairs(
            emb, dim=64, threshold=0.9, n_planes="auto"
        )

    def pagerank_events(spark, sf_dir):
        # the same hourly co-activity edge builder the registry graph
        # queries (triangle/BFS) run on, -> 5-iteration power method
        from nursinghome_data_pipeline_spark.operators.graph import (
            cooccurrence_edges,
            pagerank,
        )
        from nursinghome_data_pipeline_spark.sources.tpch import load_tables

        events = load_tables(spark, sf_dir, ["events"])["events"]
        buckets = events.select(
            "user_id",
            F.col("event_type").alias("et"),
            (F.unix_micros(F.col("ts").cast("timestamp_ltz")) / 3_600_000_000)
            .cast("long")
            .alias("hr"),
        )
        edges = cooccurrence_edges(
            buckets, node_col="user_id", bucket_cols=["et", "hr"]
        )
        return pagerank(edges, max_iter=5)

    return {
        "embedding_near_dup_auto": embedding_near_dup_auto,
        "pagerank_events": pagerank_events,
    }

#: All engine tables, staged per factor so every registry query runs
#: unmodified against the scaled copy.
_SFCURVE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


#: Bump when the staging recipe changes — the staged dir is keyed by
#: (version, factor), so a recipe change can never silently reuse a
#: copy staged by an older recipe via its _SUCCESS marker.
#: v3: token SUBSTITUTION (not just permutation — simhash is
#: order-independent, so permuted copies had bit-identical
#: fingerprints) and per-copy sign-flip isometry on embeddings
#: (verbatim copies were the mass-duplication regime the staging
#: exists to avoid).
_SFCURVE_STAGE_VERSION = 3


#: The two planted hot keys for ``--sfcurve --skewed``. The passage is
#: EXACTLY 100 chars = passage_dedup's window_chars, so the hot docs'
#: first window is one identical passage whose group/join key
#: population grows linearly with the corpus (the adversarial case for
#: any per-key reducer). The user id is a fixed key 5% of all events
#: collapse onto — a hot aggregation key AND a hub node of degree
#: ∝ N in every event-graph query.
_HOT_PASSAGE = (
    "This document is provided under the corpus license "
    "terms; redistribution requires attribution notes."
)
assert len(_HOT_PASSAGE) == 100
_HOT_USER = 424_242
_SKEW_FRACTION_MOD = 20  # 1-in-20 = 5% of rows get the hot key


def _sfcurve_dir(factor: int, skewed: bool = False) -> str:
    # keyed by (recipe version, SOURCE dir, factor, skew): a recipe
    # change bumps the version, and a different SPARK_GRAFT_SF_DIR (or
    # a regenerated dataset under a new name) must never silently reuse
    # a copy staged from other source data via its _SUCCESS marker
    src = os.path.basename(SF_DIR.rstrip("/"))
    tag = "-skew" if skewed else ""
    return os.path.join(
        tempfile.gettempdir(),
        f"spark-graft-sfcurve-v{_SFCURVE_STAGE_VERSION}-{src}-x{factor}{tag}",
    )


def _stage_sfcurve(factor: int, skewed: bool = False) -> str:
    """Write a COMPLETE testdata-layout copy at ``factor``× sf0.1 rows.

    Unlike :func:`_inflate` (which plants exact duplicates — the dedup
    stress case), this stages ORGANIC growth: a 10× corpus has 10× the
    entities, not every entity duplicated 10×. Exact duplication makes
    every blocked/banded candidate-pair count grow quadratically BY
    CONSTRUCTION (each dup group's size ×f → pairs ×f²), which would
    make any dedup/ER query read as superlinear regardless of its plan.
    Per copy i:

    - every ``*key`` / id column shifts by ``i·2^40`` (disjoint keys,
      join fan-outs and group counts scale with volume — same rule as
      :func:`_inflate`);
    - ``customer.c_name`` is regenerated from the SHIFTED key with the
      original ``Customer#<9 digits>`` shape, so copies introduce NEW
      names with the same block-size distribution (prefix-16+length
      blocking sees ×f more blocks of constant size);
    - ``events.ts`` shifts by ``i × 4000 days``, putting copies in
      DISJOINT time ranges: a grown event log covers more time at the
      same bucket density, so time-bucketed co-occurrence (the
      triangle/co-activity graph's (type, k, hour) buckets) gains ×f
      more buckets of constant population. Without the shift, copies
      stack onto the same hours and per-bucket pair counts grow ×f² —
      a densification artifact that misread triangle_count_events as
      superlinear (measured exponent 1.09 under v1 staging);
    - ``documents.text`` gets a two-step copy-specific rewrite. Step
      1 applies a per-copy VOCABULARY BIJECTION: every non-stopword
      token maps to an md5-derived, letters-only string of the SAME
      length keyed by (token, copy) — the "each copy speaks its own
      synonym dictionary" model. Within a copy the map is consistent
      (all occurrences of a token share one image), so every within-
      copy similarity structure is preserved exactly; across copies
      the multisets share only stopwords, so order-independent
      fingerprints (SimHash votes over per-token hashes) diverge by
      ~half the bits. (A ~25%-substitution variant was tried first
      and REJECTED by the validation gate: SimHash is designed to be
      robust to small multiset edits, and 323 cross-copy pairs
      survived hamming ≤ 8 at factor 2.)
      Step 2 permutes the tokens by a (token, position, copy) hash
      key, collapsing cross-copy 3-word-shingle ORDER overlap on top.
      Both steps preserve every statistic the content filters read —
      stopword count (stopwords are never substituted; the Caesar
      image of a non-stopword is not a stopword), token count,
      n_chars, alphabetic-char count — so lang/quality filters pass
      the copies exactly, while cross-copy near-dup similarity
      (Jaccard AND Hamming) collapses: near-dup structure replicates
      within copies instead of fusing across them — the
      constant-dup-RATE model of a growing corpus. (Two failed
      predecessors, both caught by reading the curves: v1 vowel
      rotation broke the stopword filter and measured the filter
      instead of the pipeline; v2 permutation-only preserved the
      MULTISET, so simhash fingerprints were bit-identical across
      copies and the simhash curve measured C(f,2) constructed
      duplicates, not keyspace behavior.)
    - ``embeddings.embedding`` is multiplied per copy by a
      deterministic ±1 sign pattern per dimension (a diagonal
      orthogonal transform): an ISOMETRY, so every within-copy cosine
      — and with it the near-dup pair structure — is preserved
      exactly, while cross-copy cosine between images of the same
      vector randomizes to ≈0 (mean zero, σ≈1/√dim). v2 copied
      vectors verbatim, which made every vector an f-way exact
      duplicate — the embedding curve measured C(f,2) constructed
      pairs;

    Factor 1 is the untouched SF_DIR (no staging).

    ``skewed=True`` (r6 verdict ask #3) plants two hot keys ON TOP of
    the organic recipe — the anti-duplication gates above keep
    cross-copy similarity collapsed, so any superlinear curve under
    this mode isolates HOT-KEY behavior, not duplicate inflation:

    - 5% of documents (every copy, factor 1 included) get
      ``_HOT_PASSAGE`` — exactly one ``window_chars`` block —
      prepended, so passage_dedup sees one passage fingerprint whose
      population grows ∝ corpus size: its groupBy key is algebraic
      (map-side-combined MIN — bounded by partial aggregation), but
      the winners JOIN routes every hot-passage row to one reducer
      unless AQE skew-split intervenes. That reducer-side behavior is
      what this mode measures.
    - 5% of events collapse onto ``user_id = _HOT_USER``: a hot
      aggregation key and a degree-∝N hub node for the event-graph
      queries (triangle/co-occurrence, BFS frontier fan-out).

    Skewed staging always writes (factor 1 too — the hot keys must
    exist at every point of the curve)."""
    if factor == 1 and not skewed:
        return SF_DIR
    out = _sfcurve_dir(factor, skewed)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from nursinghome_data_pipeline_spark.session import build_session
    from nursinghome_data_pipeline_spark.sources.tpch import load_tables

    spark = build_session("sfcurve-stage")
    tables = load_tables(spark, SF_DIR, _SFCURVE_TABLES)
    os.makedirs(out, exist_ok=True)
    for name, df in tables.items():
        copies = []
        for i in range(factor):
            c = df
            for col, _typ in c.dtypes:
                if col.endswith("key") or col in (
                    "user_id", "event_id", "doc_id", "vec_id",
                ):
                    c = c.withColumn(
                        col, (F.col(col) + F.lit(i * (1 << 40))).cast("long")
                    )
            if name == "customer" and i > 0:
                c = c.withColumn(
                    "c_name",
                    F.concat(
                        F.lit("Customer#"),
                        F.lpad(
                            F.pmod(F.col("c_custkey"), F.lit(10**9)).cast(
                                "string"
                            ),
                            9,
                            "0",
                        ),
                    ),
                )
            if name == "events" and i > 0:
                c = c.withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {i * 4000} DAYS")
                )
            if name == "documents" and i > 0:
                from nursinghome_data_pipeline_spark.functions.text import (
                    STOPWORDS_EN,
                )

                subbed = F.transform(
                    F.split(F.col("text"), " "),
                    lambda t, p: F.when(
                        (~F.lower(t).isin(*STOPWORDS_EN))
                        & (F.length(t) <= 32),
                        F.translate(
                            F.md5(F.concat(t, F.lit(f"#{i}"))),
                            "0123456789",
                            "ghijklmnop",
                        ).substr(F.lit(1), F.length(t)),
                    ).otherwise(t),
                )
                toks = F.transform(
                    subbed,
                    lambda t, p: F.struct(
                        F.xxhash64(t, p, F.lit(i)).alias("k"), t.alias("t")
                    ),
                )
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(F.array_sort(toks), lambda s: s["t"]),
                        " ",
                    ),
                )
            if name == "embeddings" and i > 0:
                sign = lambda d: F.when(  # noqa: E731
                    F.pmod(F.xxhash64(d, F.lit(i)), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"), lambda v, d: v * sign(d)
                    ).cast("array<float>"),
                )
            # hot-key planting runs AFTER the per-copy rewrites (the
            # vocabulary bijection would otherwise make each copy's
            # "hot" passage distinct, defeating the hotness) and on
            # EVERY copy including i=0, so the hot populations grow
            # with the factor
            if skewed and name == "documents":
                c = c.withColumn(
                    "text",
                    F.when(
                        F.pmod(F.col("doc_id"), F.lit(_SKEW_FRACTION_MOD))
                        == 7,
                        F.concat(F.lit(_HOT_PASSAGE), F.col("text")),
                    ).otherwise(F.col("text")),
                )
            if skewed and name == "events":
                c = c.withColumn(
                    "user_id",
                    F.when(
                        F.pmod(F.col("event_id"), F.lit(_SKEW_FRACTION_MOD))
                        == 7,
                        F.lit(_HOT_USER).cast("long"),
                    ).otherwise(F.col("user_id")),
                )
            copies.append(c)
        merged = copies[0]
        for c in copies[1:]:
            merged = merged.unionByName(c)
        merged.write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    open(os.path.join(out, "_SUCCESS"), "w").close()
    spark.stop()
    return out


def _sfcurve_child(
    factor: int, only: list[str] | None = None, skewed: bool = False
) -> None:
    """Child-process entry: time SFCURVE_QUERIES at one factor."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark import registry
    from nursinghome_data_pipeline_spark.session import build_session

    sf_dir = (
        SF_DIR
        if factor == 1 and not skewed
        else _sfcurve_dir(factor, skewed)
    )
    spark = build_session(f"sfcurve-{factor}")
    qs = {**registry.queries(), **_sfcurve_extra_queries()}
    # warm JVM + parquet footers with the cheapest query
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    for name in (only or SFCURVE_QUERIES):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    spark.stop()
    print("CHILD" + json.dumps(out))


def _sfcurve(
    factors: list[int],
    only: list[str] | None = None,
    skewed: bool = False,
) -> dict:
    """Wall-time-vs-data-volume slopes for the most expensive queries.

    For each query, reports per-factor best-of-2 wall times plus the
    fitted exponent ``log(t_max/t_1)/log(f_max)`` — ≈1.0 is linear
    scaling, <1 means fixed overhead still dominates at these sizes,
    >1 is the superlinear red flag the round's fix list feeds on.
    Fresh JVM per factor (same isolation as the --cores probe)."""
    import math

    results: dict[str, dict[str, float]] = {}
    for f in factors:
        _stage_sfcurve(f, skewed)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_sfchild", str(f)]
            + (["--queries", ",".join(only)] if only else [])
            + (["--skewed"] if skewed else []),
            capture_output=True,
            text=True,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("CHILD")),
            None,
        )
        if proc.returncode != 0 or line is None:
            # a crashed child (OOM, import error, missing table) must
            # surface its own traceback, not a bare StopIteration
            raise RuntimeError(
                f"--sfcurve child at factor {f} failed "
                f"(rc={proc.returncode}); stderr tail:\n"
                + "\n".join(proc.stderr.splitlines()[-15:])
            )
        results[str(f)] = json.loads(line[len("CHILD"):])
    out = {
        "sf_dir": SF_DIR,
        "factors": factors,
        "skewed": skewed,
        "wall_sec": results,
    }
    if len(set(factors)) > 1:
        lo, hi = str(min(factors)), str(max(factors))
        out["exponent"] = {
            q: round(
                math.log(results[hi][q] / results[lo][q])
                / math.log(max(factors) / min(factors)),
                3,
            )
            for q in (only or SFCURVE_QUERIES)
        }
    return out


def _streamstate_probes() -> dict:
    """State-growth-vs-stream-length table (r6 verdict ask #5).

    Drives each stateful streaming operator with fresh keys per
    micro-batch and event time advancing far past the watermark, at 1x
    and 10x STREAM LENGTH (same per-batch arrival rate), and reads the
    state store's own row counts from query progress. The bounded-state
    claim at 100 TB is exactly this table: a 10x-longer stream must
    hold ~1x the state (watermark horizon), while total input — and a
    naive dropDuplicates/groupBy-forever design — grows 10x.
    """
    import datetime as _dt
    import json as _json
    import shutil as _shutil

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from nursinghome_data_pipeline_spark.session import build_session
    from nursinghome_data_pipeline_spark.streaming.ingest_stream import (
        streaming_dedup,
        windowed_event_aggregates,
    )
    from nursinghome_data_pipeline_spark.streaming.running_totals import (
        running_totals_stream,
    )
    from nursinghome_data_pipeline_spark.streaming.sessionize import (
        sessionize_stream,
    )

    spark = build_session("streamstate", shuffle_partitions=4)
    base = _dt.datetime(2024, 1, 1)
    rows_per_batch = 100

    def drive(tag, schema, mk_stream, mode, n_batches, write_row):
        src = tempfile.mkdtemp(prefix=f"ss-{tag}-")
        stream = mk_stream(
            spark.readStream.schema(schema).json(src)
        )
        q = (
            stream.writeStream.outputMode(mode)
            .format("memory")
            .queryName(f"ss_{tag}_{n_batches}")
            .start()
        )
        peak = final = 0
        t0 = time.perf_counter()
        try:
            for b in range(n_batches):
                ts = (base + _dt.timedelta(minutes=10 * b)).isoformat()
                with open(os.path.join(src, f"b{b}.json"), "w") as f:
                    for i in range(rows_per_batch):
                        f.write(
                            _json.dumps(write_row(b, i, ts)) + "\n"
                        )
                q.processAllAvailable()
                ops = (q.lastProgress or {}).get("stateOperators") or []
                rows = sum(o["numRowsTotal"] for o in ops)
                peak = max(peak, rows)
                final = rows
        finally:
            q.stop()
            _shutil.rmtree(src, ignore_errors=True)
        return {
            "input_rows": n_batches * rows_per_batch,
            "state_rows_final": final,
            "state_rows_peak": peak,
            "wall_sec": round(time.perf_counter() - t0, 3),
        }

    ops = {
        "streaming_dedup": (
            "k long, ts timestamp",
            lambda st: streaming_dedup(
                st, keys=["k"], watermark="10 seconds"
            ),
            "append",
            lambda b, i, ts: {"k": b * rows_per_batch + i, "ts": ts},
        ),
        "windowed_event_aggregates": (
            "event_type string, value double, ts timestamp",
            lambda st: windowed_event_aggregates(
                st, window="1 minute", watermark="2 minutes"
            ),
            "append",
            lambda b, i, ts: {
                "event_type": f"t{i % 5}",
                "value": float(i),
                "ts": ts,
            },
        ),
        "sessionize_stream": (
            "user_id long, ts timestamp",
            lambda st: sessionize_stream(
                st, gap_minutes=1, watermark="10 seconds"
            ),
            "update",
            lambda b, i, ts: {"user_id": b * rows_per_batch + i, "ts": ts},
        ),
        # the operator behind streaming_stateful_user_totals (the most
        # expensive bench entry, r6 verdict ask #5): NoTimeout keyed
        # state, so the bound is DISTINCT KEYS, not the watermark —
        # fixed 100-user population here, so a 10x-longer stream must
        # hold exactly 1x state while a dropDuplicates-forever design
        # would hold 10x
        "running_totals_stream": (
            "user_id long, value double",
            running_totals_stream,
            "update",
            lambda b, i, ts: {"user_id": i, "value": float(b)},
        ),
    }
    out: dict[str, dict] = {}
    for tag, (schema, mk, mode, row) in ops.items():
        short = drive(tag, schema, mk, mode, 5, row)
        long = drive(tag, schema, mk, mode, 50, row)
        out[tag] = {
            "1x": short,
            "10x": long,
            "input_ratio": round(
                long["input_rows"] / short["input_rows"], 2
            ),
            "state_final_ratio": round(
                long["state_rows_final"]
                / max(1, short["state_rows_final"]),
                2,
            ),
            "state_peak_ratio": round(
                long["state_rows_peak"] / max(1, short["state_rows_peak"]),
                2,
            ),
            "wall_ratio": round(
                long["wall_sec"] / max(1e-9, short["wall_sec"]), 2
            ),
        }
    spark.stop()
    return out


def _hotsession_probe(n_rows: int = 20_000_000) -> dict:
    """Hot-key sessionization: single-window twin vs sessionize_bucketed.

    The r7 skewed sf-curve left `user_sessions` with a documented
    ceiling — the hot user's whole timeline sorts in ONE task. This
    probe plants a timeline hot enough to matter -- 95% of ``n_rows``
    on ONE user (2 ev/s for months, one unbroken session: the stitch
    must chain thousands of buckets), 5% over 50 cold users whose
    sessions chain normally -- and times both plans over the same
    staged parquet.
    Outputs must match exactly (asserted on the session count per
    plan) — the bucketed plan buys wall-clock with extra bounded
    shuffles, not different answers.
    """
    import datetime as _dt

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nursinghome_data_pipeline_spark.operators.sessions import (
        sessionize_bucketed,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session("hotsession")
    staged = os.path.join(tempfile.gettempdir(), f"hotsession-{n_rows}")
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        df = spark.range(n_rows).select(
            F.col("id").alias("event_id"),
            (
                F.lit(_dt.datetime(2024, 1, 1)).cast("timestamp")
                + F.make_interval(secs=(F.col("id") / 2).cast("int"))
            ).alias("ts"),
            # 19-in-20 rows: hot user 7; the rest over 50 cold users
            # (their per-user spacing ~500 s < the 30-min gap, so cold
            # sessions chain instead of degenerating to singletons)
            F.when(
                F.pmod("id", 20) != 0, F.lit(7)
            ).otherwise(
                F.pmod(F.floor(F.col("id") / 20), 50) + 10
            ).alias("user_id"),
        )
        df.write.mode("overwrite").parquet(staged)

    def twin(events):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ltz = F.col("ts").cast("timestamp_ltz")
        gap = F.unix_micros(ltz) - F.unix_micros(F.lag(ltz).over(w))
        flagged = events.withColumn(
            "new_session",
            F.when(
                F.lag("ts").over(w).isNull() | (gap > 1_800_000_000), 1
            ).otherwise(0),
        )
        numbered = flagged.withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        return numbered.groupBy("user_id", "session_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
        )

    out: dict = {"n_rows": n_rows, "hot_rows": n_rows * 19 // 20}
    counts = {}
    for tag, fn in (
        ("single_window_twin", twin),
        (
            "sessionize_bucketed_60m",
            lambda ev: sessionize_bucketed(ev, bucket_minutes=60),
        ),
    ):
        walls = []
        for _ in range(2):
            ev = spark.read.parquet(staged)
            t0 = time.perf_counter()
            counts[tag] = fn(ev).count()
            walls.append(round(time.perf_counter() - t0, 3))
        out[tag] = {"wall_sec_best": min(walls), "walls": walls}
    assert len(set(counts.values())) == 1, counts
    out["n_sessions"] = next(iter(counts.values()))
    out["speedup"] = round(
        out["single_window_twin"]["wall_sec_best"]
        / out["sessionize_bucketed_60m"]["wall_sec_best"],
        2,
    )
    spark.stop()
    return out


def _inflate(inflate: int) -> None:
    """One-time write of the inflated copy (reused across core runs)."""
    inflated = _inflated_dir(inflate)
    if os.path.exists(os.path.join(inflated, "_SUCCESS")):
        return
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from nursinghome_data_pipeline_spark.session import build_session
    from nursinghome_data_pipeline_spark.sources.tpch import load_tables

    spark = build_session("scaling-inflate")
    tables = load_tables(
        spark, SF_DIR, ["lineitem", "orders", "events", "documents", "embeddings"]
    )
    os.makedirs(inflated, exist_ok=True)
    for name, df in tables.items():
        copies = []
        for i in range(inflate):
            c = df
            # shift the high bits so keys from different copies never
            # collide: join fan-outs and group counts scale with the
            # data volume instead of stacking onto the original keys
            for col, typ in c.dtypes:
                if col.endswith("key") or col in (
                    "user_id",
                    "event_id",
                    "doc_id",
                    "vec_id",
                ):
                    c = c.withColumn(
                        col, (F.col(col) + F.lit(i * (1 << 40))).cast("long")
                    )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(inflated, name))
    # single marker for the whole set
    open(os.path.join(inflated, "_SUCCESS"), "w").close()
    spark.stop()


def _run_one(cores: int, inflate: int) -> dict[str, float]:
    """Child-process entry: time every probe at local[cores]."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    for name in ("lineitem", "orders", "events"):
        spark.read.parquet(os.path.join(_inflated_dir(inflate), name)).createOrReplaceTempView(
            name
        )
    # warm: JVM + parquet footers
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    out: dict[str, float] = {}
    for name, sql in PROBES:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.sql(sql).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    # LLM-pipeline shapes over the duplicated-document corpus (the
    # inflation itself plants exact duplicates — the dedup stress case)
    out.update(_doc_probes(spark, inflate))
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inflate", type=int, default=8)
    ap.add_argument("--cores", default="8,16,32")
    ap.add_argument("--_child", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument(
        "--skew", action="store_true",
        help="run only the adversarial-skew probes (point-mass global "
        "order, hot-key aggregation)",
    )
    ap.add_argument(
        "--ivf", action="store_true",
        help="run only the IVF-index-at-rest probe (measured partition "
        "pruning bytes + wall time vs full scan)",
    )
    ap.add_argument(
        "--lsh", action="store_true",
        help="run only the multi-probe-LSH-at-rest probe (measured "
        "recall-vs-bytes curve over the bucket-partitioned index)",
    )
    ap.add_argument(
        "--compaction", action="store_true",
        help="run only the index-compaction probe (files per bucket "
        "dir + probe wall, fragmented vs files_per_partition-bounded)",
    )
    ap.add_argument(
        "--sfcurve", action="store_true",
        help="run only the wall-time-vs-data-volume probe: the 10 most "
        "expensive non-streaming bench queries at 1x/3x/10x sf0.1 "
        "(organically grown copies), with fitted scaling exponents",
    )
    ap.add_argument(
        "--factors", default="1,3,10",
        help="comma-separated inflation factors for --sfcurve",
    )
    ap.add_argument("--_sfchild", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument(
        "--skewed", action="store_true",
        help="with --sfcurve: plant hot keys in the staged copies (one "
        "100-char passage shared by 5%% of documents, one user_id "
        "shared by 5%% of events) — isolates hot-key scaling from "
        "volume scaling",
    )
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated subset of --sfcurve query names (default all)",
    )
    ap.add_argument(
        "--streamstate", action="store_true",
        help="run only the streaming state-growth probe: state-store "
        "rows (from query progress) at 1x vs 10x stream length for "
        "each stateful operator",
    )
    ap.add_argument(
        "--hotsession", type=int, nargs="?", const=20_000_000, default=None,
        metavar="N_ROWS",
        help="run only the hot-key sessionization probe: single-window "
        "twin vs sessionize_bucketed on a planted timeline with 95%% "
        "of N_ROWS (default 20M) on one user",
    )
    ap.add_argument(
        "--dedupcadence", action="store_true",
        help="run only the dedup-index append-cadence probe: probe "
        "latency + files per dir after 1/32/128 appends, compaction "
        "restore point, and regeometry before/after on an outgrown "
        "index",
    )
    ap.add_argument(
        "--dedupcadence-legs", default="cadence,regeo",
        help="comma-separated subset of the --dedupcadence legs "
        "(cadence = append-growth curve, regeo = geometry refresh)",
    )
    ap.add_argument(
        "--ingestloop-compact-every", type=int, default=None,
        help="with --ingestloop: in-loop compaction cadence "
        "(default none, the unmaintained curve)",
    )
    ap.add_argument(
        "--ingestloop-scales", default="1,10",
        help="with --ingestloop: comma-separated batch-size multipliers",
    )
    ap.add_argument(
        "--ingestloop-batches", type=int, default=20,
        help="with --ingestloop: micro-batches per scale",
    )
    ap.add_argument(
        "--simhashindex", action="store_true",
        help="run only the at-rest simhash index probe: fixed-batch "
        "probe wall + scan volume at 1x/30x corpus",
    )
    ap.add_argument(
        "--bigprobe", action="store_true",
        help="run only the 1M-doc minhash probe: flat-probe across "
        "5k/150k/1M corpora + probe-batch-size crossover where "
        "matched dirs saturate",
    )
    ap.add_argument(
        "--srpindex", action="store_true",
        help="run only the at-rest srp embedding near-dup index probe: "
        "planted-partner probe wall + scan volume at 2k/100k/1M vectors "
        "+ LSM append/compact lifecycle",
    )
    ap.add_argument(
        "--srpindex-copies", default="1,50,500",
        help="comma-separated staging multipliers for --srpindex "
        "(base = sf-dir embeddings row count; r11's 10M-vector leg "
        "runs --srpindex-copies 5000)",
    )
    ap.add_argument(
        "--srpnorm", action="store_true",
        help="A/B the srp postings-carry-payload trade at 1M vectors: "
        "current layout vs normalized postings + vb-partitioned vector "
        "sidecar (bytes, probe wall, compact wall, pair-set equality)",
    )
    ap.add_argument(
        "--srpingest", action="store_true",
        help="run only the srp-family streaming ingest loop cadence: "
        "20 micro-batches of vectors against a 100k-vector index",
    )
    ap.add_argument(
        "--srpregeo", action="store_true",
        help="run only the srp geometry-refresh probe: stale 16-bucket "
        "1M-vector index vs compact --regeometry (needs --srpindex "
        "run first)",
    )
    ap.add_argument(
        "--hotbucket", action="store_true",
        help="run only the planted-boilerplate hot-bucket probe: "
        "bucket stats + probe cost on a clean vs poisoned index",
    )
    ap.add_argument(
        "--ingestloop", action="store_true",
        help="run only the end-to-end streaming dedup-ingest probe: "
        "20 micro-batches at 1x/10x batch size against a 150k-doc "
        "index (per-batch wall, accepted rate, index files)",
    )
    ap.add_argument(
        "--zorder", action="store_true",
        help="run only the z-order data-skipping probe (realized "
        "per-file min/max pruning, three layouts x three predicates)",
    )
    args = ap.parse_args()
    only = args.queries.split(",") if args.queries else None
    if args._sfchild is not None:
        _sfcurve_child(args._sfchild, only, args.skewed)
        return
    if args.sfcurve:
        factors = [int(x) for x in args.factors.split(",")]
        print(json.dumps(_sfcurve(factors, only, args.skewed), indent=2))
        return
    if args.compaction:
        print(json.dumps(_compaction_probes(), indent=2))
        return
    if args.streamstate:
        print(json.dumps(_streamstate_probes(), indent=2))
        return
    if args.hotsession is not None:
        print(json.dumps(_hotsession_probe(args.hotsession), indent=2))
        return
    if args.dedupcadence:
        print(json.dumps(_dedup_cadence_probes(
            legs=tuple(args.dedupcadence_legs.split(","))
        ), indent=2))
        return
    if args.simhashindex:
        print(json.dumps(_simhash_index_probes(), indent=2))
        return
    if args.bigprobe:
        print(json.dumps(_big_probe_probes(), indent=2))
        return
    if args.srpindex:
        print(json.dumps(_srp_index_probes(
            copies=tuple(int(x) for x in args.srpindex_copies.split(","))
        ), indent=2))
        return
    if args.srpnorm:
        print(json.dumps(_srp_norm_ab_probes(), indent=2))
        return
    if args.srpingest:
        print(json.dumps(_srp_ingest_loop_probes(), indent=2))
        return
    if args.srpregeo:
        print(json.dumps(_srp_regeo_probes(), indent=2))
        return
    if args.hotbucket:
        print(json.dumps(_hot_bucket_probes(), indent=2))
        return
    if args.ingestloop:
        print(json.dumps(_ingest_loop_probes(
            scales=tuple(int(x) for x in args.ingestloop_scales.split(",")),
            compact_every=args.ingestloop_compact_every,
            n_batches=args.ingestloop_batches,
        ), indent=2))
        return
    if args.zorder:
        print(json.dumps(_zorder_probes(), indent=2))
        return
    if args.skew:
        print(json.dumps(_skew_probes(), indent=2))
        return
    if args.ivf:
        print(json.dumps(_ivf_probes(), indent=2))
        return
    if args.lsh:
        print(json.dumps(_lsh_probes(), indent=2))
        return
    if args._child is not None:
        print("CHILD" + json.dumps(_run_one(args._child, args.inflate)))
        return
    _inflate(args.inflate)
    results: dict[str, dict[str, float]] = {}
    for c in (int(x) for x in args.cores.split(",")):
        # fresh JVM per width — a reused driver would pin its thread pool
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_child", str(c),
             "--inflate", str(args.inflate)],
            capture_output=True,
            text=True,
        )
        line = next(
            l for l in proc.stdout.splitlines() if l.startswith("CHILD")
        )
        results[str(c)] = json.loads(line[len("CHILD"):])
    print(json.dumps({"inflate": args.inflate, "sf_dir": SF_DIR, "results": results}, indent=2))


if __name__ == "__main__":
    main()
