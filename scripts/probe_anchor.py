"""Clean-anchor measurement for the at-rest index probe bench entries.

r10 verdict items #2/#3: `simhash_index_batch_probe` read 1.26 s and
`srp_index_batch_probe` 1.40 s in the driver's r10 recording, both on
a host whose calib started at 0.1871 (1.75x the 0.1069 reference).
This script re-measures JUST those entries (plus the minhash probe as
a control) under the clean-anchor protocol — calib sampled before and
after, per-entry /proc/stat steal, caches pre-warmed so no build lands
in a timed window, best-of-N with all reps printed — so a regression
claim can be separated from host contention.

Usage: python scripts/probe_anchor.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from nursinghome_data_pipeline_spark.session import build_session

    calib0 = bench._cpu_calibration()
    spark = build_session("probe-anchor")
    entries = [
        "dedup_index_batch_probe",
        "simhash_index_batch_probe",
        "srp_index_batch_probe",
    ]
    # pre-warm: builds (if cold) + one untimed probe per entry so JVM,
    # parquet footers, and code paths are hot before any timed rep
    for name in entries:
        bench.EXTRA_BENCH[name](spark, bench.SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
    out: dict[str, dict] = {}
    for name in entries:
        fn = bench.EXTRA_BENCH[name]
        times: list[float] = []
        steals: list[float] = []
        for _ in range(reps):
            ct0 = bench._cpu_times()
            t0 = time.perf_counter()
            fn(spark, bench.SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 4))
            ct1 = bench._cpu_times()
            steals.append(
                round(
                    100 * (ct1[0] - ct0[0]) / max(1, ct1[1] - ct0[1]), 3
                )
                if ct0 and ct1
                else -1.0
            )
        out[name] = {
            "best": min(times),
            "reps": times,
            "steal_pct": steals,
        }
    calib1 = bench._cpu_calibration()
    print(
        json.dumps(
            {
                "calib": [calib0, calib1],
                "calib_ref": bench.CALIB_REF,
                "load1": round(os.getloadavg()[0], 2),
                "sf_dir": bench.SF_DIR,
                "entries": out,
            },
            indent=2,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
