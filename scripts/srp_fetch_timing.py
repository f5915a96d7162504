"""Probe-wall timing for an EXISTING at-rest srp index — the r12
fetch-pruning A/B harness.

Reconstructs the exact probe batch `--srpindex` uses (100 planted
cosine-0.97 partners of the sf-dir embeddings' first 100 vectors,
rng seed 20260816) and times `embedding_batch_against_index` against
an already-built index (default: the 10M-vector
/tmp/spark-graft-srp-idx-x5000 leg from SCALE.md's r11 stretch),
reporting best-of-N wall, the pair count, and a stable digest of the
full pair set so two code versions can be checked set-equal without
storing the pairs.

Run:  python scripts/srp_fetch_timing.py [--path P] [--reps 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="/tmp/spark-graft-srp-idx-x5000")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument(
        "--batch",
        type=int,
        default=100,
        help="probe batch size (first N of the 100 planted partners) — "
        "small values exercise the candidate-pruned fetch regime",
    )
    args = ap.parse_args()

    import numpy as np

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from nursinghome_data_pipeline_spark.operators.embedding_index import (
        embedding_batch_against_index,
    )
    from nursinghome_data_pipeline_spark.session import build_session

    spark = build_session(
        f"srp-fetch-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
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

    # the rng partner stream must be consumed for ALL 100 base rows so
    # --batch N probes with the same vectors a --batch 100 run leads
    # with (prefix property — pair sets nest across batch sizes)
    rows = [
        (
            int(r["vec_id"]) + (1 << 55),
            [
                float(x)
                for x in np.asarray(
                    partner(r["embedding"], 0.97), dtype=np.float32
                )
            ],
        )
        for r in base
    ][: args.batch]
    probe = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint(eager=True)

    best = float("inf")
    walls = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        n = embedding_batch_against_index(
            spark, probe, args.path, threshold=0.95
        ).count()
        walls.append(round(time.perf_counter() - t0, 3))
        best = min(best, walls[-1])
    rows = embedding_batch_against_index(
        spark, probe, args.path, threshold=0.95
    ).collect()
    pairset = sorted(
        (int(r["batch_id"]), int(r["corpus_id"]), round(r["cosine_sim"], 9))
        for r in rows
    )
    digest = hashlib.sha256(
        json.dumps(pairset, separators=(",", ":")).encode()
    ).hexdigest()[:16]
    recall = len({b for b, _c, _s in pairset})
    print(
        json.dumps(
            {
                "path": args.path,
                "probe100_best_sec": best,
                "walls": walls,
                "pairs": n,
                "pairset_sha": digest,
                "planted_found": recall,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
