"""Distributed Bloom-filter build and semi-join reduction.

The classic 100 TB pattern: a big fact table joins a filtered dimension
whose distinct-key set is too large to broadcast *as keys* but whose
Bloom bitmap is tiny. Build the bitmap distributed (one shuffle of
(word, mask) pairs, ``bit_or`` combine), then pre-filter the fact side
with k broadcast hash-joins against the bitmap table BEFORE the real
join's shuffle — rows that cannot match never enter the exchange.

Design notes (vs the obvious alternatives):

- No driver collect, no Python UDF. The bitmap lives as a DataFrame of
  ``(word: long, bits: long)`` — at most ``n_bits/64`` rows (8 KiB of
  payload per 2^16 bits) — and membership is tested by joining the
  probe side's ``xxhash64``-derived word index against it with
  ``broadcast()``. k hash functions → k broadcast joins; each is a
  map-side hash lookup, whole-stage-codegen friendly, and AQE folds
  them into one stage with the scan.
- Spark itself injects ``BloomFilterMightContain`` runtime filters
  under AQE for shuffle joins, but only per-query and only when its
  cost model fires. An explicit operator lets a pipeline build the
  filter ONCE and reuse it across many scans (e.g. filtering 30 daily
  partitions of events by this month's active customers).
- False positives only cost wasted rows in the downstream exact join;
  false negatives are impossible: every bit set at build time is set
  in the single combined bitmap (``bit_or`` is associative/commutative
  and retry-safe — re-aggregation reproduces the same words/masks
  because positions derive from ``xxhash64`` of data columns only).

Reference parity: the reference has no bloom operator (it has no join
larger than driver memory — SURVEY.md §2.4 J1); this is a §2.11-class
scale extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k bit positions for a key: pmod(xxhash64(seed_i, key), n_bits).

    Seeding by a literal first argument (not the ``seed`` parameter)
    keeps the expression a plain deterministic function of the data,
    so build and probe sides — and any task retry — agree bit-for-bit.
    """
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(n_bits)) for i in range(n_hashes)
    ]


def build_bloom(
    keys: DataFrame, key_col: str, *, n_bits: int = 1 << 16, n_hashes: int = 4
) -> DataFrame:
    """Aggregate a Bloom bitmap over ``keys[key_col]``.

    Returns a DataFrame ``(word: bigint, bits: bigint)`` with one row
    per 64-bit word that has at least one bit set (≤ n_bits/64 rows).
    One narrow shuffle: explode k positions per key, group by word,
    ``bit_or`` the masks. Partial aggregation makes the map side emit
    at most n_bits/64 rows per task regardless of input size.
    """
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, n_bits, n_hashes))).alias("pos")
    # shiftleft's PySpark wrapper takes a literal shift count only, so
    # the variable-count shift goes through expr; 1L keeps it a long.
    return (
        keys.where(key.isNotNull())
        .select(pos)
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the bloom set.

    k broadcast joins against the bitmap table; a row survives iff its
    bit is set for every hash. Inner join drops keys whose word has no
    row at all (no bit in that word was ever set — a definite miss).
    ``n_bits``/``n_hashes`` must match ``build_bloom``.
    """
    out = df
    key = F.col(key_col)
    for i, pos in enumerate(_positions(key, n_bits, n_hashes)):
        b = bloom.select(
            F.col("word").alias(f"__bw{i}"), F.col("bits").alias(f"__bb{i}")
        )
        # bitwiseAND, not shift-and-mod: bit 63 makes the word negative
        # and an arithmetic right shift would smear the sign bit.
        mask = F.expr(f"shiftleft(1L, cast(__p{i} % 64 as int))")
        out = (
            out.withColumn(f"__p{i}", pos)
            .join(
                F.broadcast(b),
                F.shiftright(F.col(f"__p{i}"), 6) == F.col(f"__bw{i}"),
                "inner",
            )
            .where(F.col(f"__bb{i}").bitwiseAND(mask) != 0)
            .drop(f"__p{i}", f"__bw{i}", f"__bb{i}")
        )
    return out


def bloom_semi_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    *,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Bloom-accelerated exact semi-join: big rows whose key appears in
    ``small``. The bloom prefilter removes definite misses before the
    exact semi-join's shuffle; the final ``left_semi`` keeps the result
    exact (false positives die there)."""
    pre = bloom_prefilter(
        big,
        big_key,
        build_bloom(small, small_key, n_bits=n_bits, n_hashes=n_hashes),
        n_bits=n_bits,
        n_hashes=n_hashes,
    )
    return pre.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        on=big_key,
        how="left_semi",
    )
