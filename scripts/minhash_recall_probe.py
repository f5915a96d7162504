"""Measured minhash-banding recall table for SCALE.md (r7 verdict ask
#1): planted Jaccard-controlled pairs (tests/minhash_recall_lib.py —
analytically exact j, collision-UNverified), recall of
``near_duplicate_pairs`` measured per (n_hashes, bands) against the
closed form ``banding_detection_prob``. Run::

    python scripts/minhash_recall_probe.py [--pairs 400]

Prints a markdown table (measured vs predicted, 3σ binomial bound) and
one JSON line for the record.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=400,
                    help="planted pairs per Jaccard level")
    args = ap.parse_args()

    from nursinghome_data_pipeline_spark.operators.dedup import (
        banding_detection_prob,
        near_duplicate_pairs,
    )
    from nursinghome_data_pipeline_spark.session import build_session
    from tests.minhash_recall_lib import (
        LEVEL_SUBS,
        exact_jaccard,
        measured_recall,
        planted_jaccard_corpus,
    )

    spark = build_session("minhash-recall-probe")
    docs, planted = planted_jaccard_corpus(spark, args.pairs)
    docs = docs.localCheckpoint()  # one corpus, many banding configs
    threshold = exact_jaccard(max(LEVEL_SUBS)) - 0.01

    grid = [(16, 4), (32, 8), (32, 4), (64, 16), (64, 8), (128, 16)]
    record: dict[str, dict[str, float]] = {}
    lines = [
        "| n_hashes | bands | r | "
        + " | ".join(f"j={exact_jaccard(s):.3f}" for s in LEVEL_SUBS)
        + " |",
        "|---|---|---|" + "---|" * len(LEVEL_SUBS),
    ]
    worst = 0.0
    for n_hashes, bands in grid:
        found = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
            for r in near_duplicate_pairs(
                docs, threshold=threshold, n_hashes=n_hashes, bands=bands
            ).collect()
        }
        assert found <= set().union(*planted.values()), "non-planted pair?!"
        recalls = measured_recall(found, planted)
        cells = []
        for s in LEVEL_SUBS:
            p = banding_detection_prob(
                exact_jaccard(s), n_hashes=n_hashes, bands=bands
            )
            sigma = math.sqrt(max(p * (1 - p), 1e-9) / args.pairs)
            dev = (recalls[s] - p) / sigma if sigma > 0 else 0.0
            worst = max(worst, abs(recalls[s] - p))
            cells.append(f"{recalls[s]:.3f} (pred {p:.3f}, {dev:+.1f}σ)")
            record[f"h{n_hashes}b{bands}s{s}"] = {
                "recall": round(recalls[s], 4),
                "predicted": round(p, 4),
                "sigma": round(sigma, 4),
            }
        lines.append(
            f"| {n_hashes} | {bands} | {n_hashes // bands} | "
            + " | ".join(cells) + " |"
        )
    print("\n".join(lines))
    print(f"\nworst |measured - predicted| across the grid: {worst:.4f}")
    print(json.dumps({"pairs_per_level": args.pairs, "grid": record}))
    spark.stop()


if __name__ == "__main__":
    main()
