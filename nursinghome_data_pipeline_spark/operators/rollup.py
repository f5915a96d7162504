"""Multi-resolution rollup cascades (hypertable-style continuous aggregates).

The 100 TB pattern: maintain the FINEST time bucket (e.g. minute) as a
materialized aggregate, then derive every coarser resolution (hour, day,
month) by re-aggregating the finer rollup — never by re-scanning the
raw fact table. A day bucket re-aggregates 24 hourly rows instead of
millions of events, so each cascade level costs O(|finer rollup|).

That only works if every aggregate is MERGEABLE — composable from
partials. count/min/max merge trivially; sums of doubles do NOT
(re-summing partial double sums in a different order drifts in the last
bits, so a cascaded result would not equal a direct one). We therefore
carry the quantized integer term from ``functions/exprs.py`` through the
cascade: partial sums are exact ``decimal(38,0)`` values, associative at
every level, and the final unscaling produces a double that is
BIT-IDENTICAL to aggregating the raw events directly — which is exactly
what the DuckDB oracle (a direct day-level aggregate over raw events)
verifies. avg cascades as (merged sum, merged non-null count).

The reference pipeline has no time-series layer (SURVEY §2.8 — absent
category); this operator family is the engine-native gap-fill, modeled
on continuous-aggregate designs in public time-series databases.

HLL sketch rollups follow the same mergeability story for COUNT
DISTINCT: per-bucket Apache DataSketches HLL sketches
(``hll_sketch_agg``) merge losslessly via ``hll_union_agg`` (register-
wise max with a shared lgK), so a coarse bucket's distinct estimate
equals the estimate a single pass over raw data would produce — at any
scale, the merge moves kilobyte sketches, never user ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import Q_BITS, q_sum_term

#: cascade resolutions, finest first (date_trunc units shared by Spark
#: and DuckDB/ANSI).
DEFAULT_LEVELS = ("minute", "hour", "day")


def rollup_cascade(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    levels: tuple[str, ...] = DEFAULT_LEVELS,
    bits: int = Q_BITS,
) -> DataFrame:
    """Cascade ``events`` through ``levels`` (finest → coarsest) and
    return the coarsest-level aggregate.

    Every level after the first re-aggregates the PREVIOUS level's
    output only: counts sum, quantized value terms sum exactly
    (decimal(38,0) — associative), min/max take min/max. The result is
    bit-equal to aggregating raw events at the coarsest level directly.

    At scale each level is one small shuffle over the finer rollup
    (|buckets| rows, not |events|); the finest level is the only pass
    over the fact table and benefits from partial aggregation map-side.
    """
    finest, *coarser = levels
    cur = events.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(q_sum_term(value_col, bits=bits)).alias("_value_q"),
        F.count(value_col).alias("_value_n"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    for lvl in coarser:
        cur = cur.groupBy(
            F.date_trunc(lvl, F.col("bucket")).alias("bucket")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_value_q").alias("_value_q"),
            F.sum("_value_n").alias("_value_n"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    q = float(1 << bits)
    total = F.col("_value_q").cast("double") / F.lit(q)
    return cur.select(
        "bucket",
        "n_events",
        total.alias("total_value"),
        (total / F.nullif(F.col("_value_n"), F.lit(0)).cast("bigint")).alias(
            "avg_value"
        ),
        "min_value",
        "max_value",
    )


def hll_rollup(
    events: DataFrame,
    *,
    key_cols: list[str] | None = None,
    distinct_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
    lgk: int = 14,
) -> DataFrame:
    """Distinct-count rollup via mergeable HLL sketches.

    Builds one HLL sketch per (key, ``bucket``) — the materializable
    fine rollup — then merges the per-bucket sketches per key with
    ``hll_union_agg`` and estimates. Because union takes the register-
    wise max over a shared lgK, the merged estimate is IDENTICAL to
    sketching the raw rows in one pass (asserted in
    tests/test_rollup_sketches.py), while the merge stage shuffles only
    ~2^lgk-byte sketches per bucket — the pattern that makes daily →
    monthly → all-time distinct-user rollups O(buckets) at 100 TB.

    Estimates are deterministic (DataSketches hashing is seed-fixed) but
    engine-specific, so the registry records this rows-only; the ε-bound
    vs exact distinct is pinned by tests.
    """
    keys = key_cols or []
    per_bucket = events.groupBy(
        *keys, F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    ).agg(F.hll_sketch_agg(distinct_col, F.lit(lgk)).alias("sketch"))
    merged = per_bucket.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("sketch", F.lit(False))
        ).alias("approx_distinct"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    return merged


def md5_hll_rollup(
    events: DataFrame,
    *,
    key_cols: list[str] | None = None,
    distinct_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Distinct-count rollup via an md5-register HLL — the
    ORACLE-EXACT twin of :func:`hll_rollup` (same playbook as the md5
    minhash/KMV families: the registry entry uses the hash family
    every engine reproduces bit-for-bit; the DataSketches-native path
    stays for production and is benched under its own label).

    HLL core, chosen so EVERY arithmetic step is deterministic and
    engine-independent:

    - register index = first 2 md5 hex chars (m = 256 registers);
      rho = leading-zero count of the next 11 hex chars (44 bits) + 1,
      computed with STRING ops (regexp ``^0*`` + a 16-way nibble CASE)
      — no floating log2, no bit intrinsics to disagree on;
    - per (keys, day-bucket, register): max(rho) — the mergeable fine
      rollup; per (keys, register): max over buckets. Register-wise
      max is associative, so the merged registers EQUAL a single pass
      over raw rows (the same mergeability contract as
      ``hll_union_agg``, here oracle-checkable);
    - harmonic sum S = Σ 2^-M over the 256 registers: every term is an
      exact power of two built as ``1.0 / (1 << M)`` (no ``pow``), and
      with m = 2^8, rho ≤ 45 every partial sum spans ≤ 53 bits — S is
      EXACT in a double, hence order-independent across partitions;
    - estimate = α·m²/S with α = 0.7213/(1 + 1.079/256) (literal
      arithmetic, bit-identical in any IEEE engine); the linear-
      counting branch (E ≤ 2.5m, V empty registers > 0) uses
      m·ln(m/V) — ``ln`` differs from glibc by 1 ulp on 18 of the 255
      possible V values on the JVM, so the output is quantized
      ``floor(x·2^20)/2^20``, verified EXHAUSTIVELY over the finite
      V ∈ 1..255 domain to absorb every such difference (both branches
      quantized for uniformity).

    m is pinned at 256 because both exactness arguments above (53-bit
    harmonic-sum span; exhaustive ln check) are proofs FOR m = 256.
    Output: keys + ``approx_distinct`` (double), ``n_buckets``
    (distinct time buckets merged), ``v_empty`` (empty registers —
    the accuracy-regime witness).
    """
    keys = list(key_cols or [])
    h = F.md5(
        F.concat(F.lit("hll:"), F.col(distinct_col).cast("string")).cast(
            "binary"
        )
    )
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    hex11 = F.substring(h, 3, 11)
    lz = F.length(F.regexp_extract(hex11, "^0*", 0))
    c = hex11.substr(lz + F.lit(1), F.lit(1))
    nibz = (
        F.when(c == "1", 3)
        .when(c.isin("2", "3"), 2)
        .when(c.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(lz == 11, F.lit(45)).otherwise(lz * 4 + nibz + 1)

    fine = (
        events.where(F.col(distinct_col).isNotNull())
        .select(
            *keys,
            F.date_trunc(bucket, F.col(ts_col)).alias("__bkt_ts"),
            reg.alias("__reg"),
            rho.alias("__rho"),
        )
        .groupBy(*keys, "__bkt_ts", "__reg")
        .agg(F.max("__rho").alias("__m"))
    )
    merged = fine.groupBy(*keys, "__reg").agg(F.max("__m").alias("__m"))
    per_key = merged.groupBy(*keys).agg(
        F.sum(
            F.lit(1.0)
            / F.expr("CAST(shiftleft(1L, __m) AS DOUBLE)")
        ).alias("__s_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    days = fine.groupBy(*keys).agg(
        F.countDistinct("__bkt_ts").alias("n_buckets")
    )
    m = 256.0
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(m))
    s_total = F.col("__s_present") + (F.lit(m) - F.col("__n_present"))
    v_empty = (F.lit(256).cast("long") - F.col("__n_present")).alias("v_empty")
    e_raw = alpha * F.lit(m) * F.lit(m) / s_total
    e_lin = F.lit(m) * F.log(
        F.lit(m) / (F.lit(256).cast("long") - F.col("__n_present")).cast("double")
    )
    q = float(1 << 20)
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (F.col("__n_present") < 256),
        F.floor(e_lin * q) / q,
    ).otherwise(F.floor(e_raw * q) / q)
    out = per_key.select(
        *keys, est.alias("approx_distinct"), v_empty
    )
    return out.join(days, keys) if keys else out.crossJoin(days)
