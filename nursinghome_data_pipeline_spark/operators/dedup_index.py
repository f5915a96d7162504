"""At-rest near-duplicate index: dedup a batch WITHOUT rescanning the corpus.

``incremental_ingest_dedup`` (registry) already shows the exact-dup
half of incremental ingest: anti-join the batch against a persisted
fingerprint column, O(batch) work. This module is the NEAR-dup half —
the one that actually hurts at 100 TB, because the in-memory
:func:`~.dedup.near_duplicate_pairs` re-shingles and re-bands the
ENTIRE corpus on every call: a daily 0.1% increment would pay a
99.9%-redundant full-corpus pass, every day.

Layout (``write_dedup_index``): one parquet table partitioned by
``pb = band · n_buckets + (band_key mod n_buckets)`` — a bounded
directory count (``bands × n_buckets``) with uniform hash occupancy.
Each row carries the doc's id, its band key, AND its distinct shingle
hashes (``sh``), so a probe is ONE pruned scan + band-key join + exact
Jaccard verify against ``sh`` — no second corpus lookup. The ``sh``
array is duplicated ``bands``× (by default 4×); that is the deliberate
postings-carry-payload trade, MEASURED and kept (r10, after the srp
index switched the other way): at 1M docs the normalized alternative
(postings stripped to (pb, band, bkey, id) + one ``sh`` row per doc
under hash-of-id directories) read 3.6× smaller at rest but probed
2.5× slower (5.62 s vs 2.29 s, pair set equal — SCALE.md r10), because
the variable-length ``sh`` fetch join moves the same heavy arrays the
duplication would have co-located. The srp index's 10×-duplicated
fixed-width vectors cut the other way (7.9× storage for +16% probe) —
the trade is payload-size- and fan-out-dependent, not doctrine.
Shingle hashes, not text — the index never stores corpus text at all.

Probe (``dedup_batch_against_index``): the batch's band keys pick the
``pb`` partitions to read — at the default 4×64 geometry a small batch
touches a bounded set of directories and the scan's
``PartitionFilters`` prune everything else at FILE level (same
mechanism, and the same plan gate in tests, as the IVF/LSH ANN
indexes). Candidates then verify with the exact same Jaccard formula
as :func:`~.dedup.near_duplicate_pairs`, so the result is
BIT-IDENTICAL to running the in-memory operator over corpus ∪ batch
and keeping the cross pairs (pinned by ``tests/test_dedup_index.py``).

Lifecycle: the index is ``kind="minhash"`` under the SAME sidecar +
append/compact protocol as the ANN indexes
(:func:`~.similarity.append_to_ann_index` bands new docs with the
sidecar's own geometry; :func:`~.similarity.compact_ann_index` bounds
files per directory under the Dekker intent/lock handshake) — one
lifecycle implementation, five index kinds (r8 adds
``kind="simhash"``: the same incremental-dedup story for the Hamming
family — :func:`write_simhash_index` / :func:`simhash_batch_against_index`,
pinned bit-equal to ``simhash_near_duplicate_pairs`` cross pairs;
r9 adds ``kind="srp"`` for the cosine family —
``operators/embedding_index.py``).
Appends are LSM-style (r9): each batch lands as ONE file in a
``pb=-1`` delta directory (:data:`DELTA_PB`) that every probe also
reads, and compaction merges deltas into their true buckets — append
cost ∝ batch instead of ∝ ``bands × n_buckets`` file creations.

The same probe is decontamination-at-rest: index the TRAINING corpus
once, probe with the evaluation/benchmark set — every returned pair is
a contaminated training doc, found without rescanning the corpus (the
in-memory `corpus.decontaminate` twin re-shingles the corpus per
benchmark sweep).

Reference parity note: the reference pipeline has no dedup at all;
this extends the engine-native dedup family (SURVEY §2.10 ext) to the
incremental-ingest shape a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _intra_bucket_pairs,
    band_key_col,
    jaccard_verify_col,
    minhash_signature_col,
    shingle_hash_col,
)
from .similarity import (
    _require_kind,
    _write_ann_meta,
    active_data_root,
    load_ann_meta,
    read_matched_partitions,
)

from .. import fs


#: Internal projection names (`sig` is _banded_rows-local; pb/band/
#: bkey/sh persist in the minhash index; bucket/sh in the simhash
#: index; batch_id/corpus_id/hamming are probe output aliases). A
#: caller id_col with one of these names would silently collide or
#: misbind — same guard as ``skew.bucketed_global_order``'s reserved
#: columns.
_RESERVED_COLS = frozenset(
    {"pb", "band", "bkey", "sh", "sig", "bucket",
     "batch_id", "corpus_id", "hamming"}
)

#: partition value of the LSM-style append delta (r9). Builds route
#: every posting to its real ``pb`` directory; APPENDS instead land
#: whole in the single ``pb=-1`` directory, one file per append —
#: cost ∝ batch, not ∝ ``bands × n_buckets`` (the routed append wrote
#: ≤1 file into EVERY matched directory, measured 3.5 s of a 6.9 s
#: ingest micro-batch for ~230 file creations + commits). Probes read
#: their matched directories PLUS the delta (bounded by the
#: compaction cadence — ~32 micro-batches of postings, a trivial
#: scan); compaction re-routes delta rows to their true buckets from
#: the STORED routing columns, so the compacted index is bit-identical
#: to a fresh rebuild. Real pb values are non-negative by
#: construction (band·n_buckets + pmod ≥ 0), so -1 can never collide.
DELTA_PB = -1


def as_delta_append(rows: DataFrame) -> DataFrame:
    """Stamp a routed ``_banded_rows``/``_simhash_rows`` projection as
    one LSM delta append: every row goes to the ``pb=-1`` directory in
    a single file (micro-batch appends are small by contract — a bulk
    backfill should use ``write_dedup_index`` or compact right after).
    The routing columns (band/bkey or bucket) stay untouched — they
    are what compaction re-routes from and what probes join on, so
    delta rows match candidates exactly like base rows."""
    return rows.withColumn(
        "pb", F.lit(DELTA_PB).cast("int")
    ).repartition(1)


def _require_unreserved(id_col: str, caller: str) -> None:
    if id_col in _RESERVED_COLS:
        raise ValueError(
            f"{caller}: id_col {id_col!r} collides with an internal "
            f"index column — rename it (reserved: "
            f"{sorted(_RESERVED_COLS)})"
        )


def _banded_rows(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_k: int,
    n_buckets: int,
) -> DataFrame:
    """(pb, band, bkey, <id>, sh) rows — bands rows per doc, the shared
    projection for index build, append routing, and the batch side of
    the probe. One pass: tokenize/shingle once, signature once."""
    _require_unreserved(id_col, "_banded_rows")
    if n_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide n_hashes ({n_hashes})"
        )
    rows_per_band = n_hashes // bands
    sig = df.select(
        F.col(id_col),
        minhash_signature_col(
            text_col, n_hashes=n_hashes, shingle_k=shingle_k
        ).alias("sig"),
        F.array_distinct(shingle_hash_col(text_col, shingle_k)).alias("sh"),
    )
    banded = sig.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_key_col(F.col("sig"), b, rows_per_band).alias(
                            "bkey"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    )
    return banded.select(
        (F.col("bh.band") * n_buckets + F.pmod(F.col("bh.bkey"), F.lit(n_buckets)))
        .cast("int")
        .alias("pb"),
        F.col("bh.band").alias("band"),
        F.col("bh.bkey").alias("bkey"),
        id_col,
        "sh",
    )


def pairs_from_banded_rows(
    banded: DataFrame, *, id_col: str, threshold: float
) -> DataFrame:
    """Within-set near-dup pairs from a precomputed ``_banded_rows``
    projection — ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` and
    jaccard ≥ threshold, identical (as a set) to
    :func:`~.dedup.near_duplicate_pairs` over the same docs at the
    same geometry (pinned by ``tests/test_dedup_index.py``): the band
    keys are the same :func:`~.dedup.band_key_col` values and the
    verify is the same :func:`~.dedup.jaccard_verify_col` over the
    same distinct-shingle arrays, just read from the rows instead of
    recomputed from text. This is the streaming ingest loop's
    in-batch pass (r9): one fingerprint pass feeds in-batch pairing,
    the index probe, AND the append routing. Verification happens
    inside the bucket (before the pair explode), so sub-threshold
    candidates are pruned without a second sets-join."""
    return _intra_bucket_pairs(
        banded,
        ["band", "bkey"],
        [id_col, "sh"],
        lambda x, y: F.struct(
            x[id_col].alias("id_a"),
            y[id_col].alias("id_b"),
            jaccard_verify_col(x["sh"], y["sh"]).alias("jaccard"),
        ),
        lambda p: (p["id_a"] < p["id_b"])
        & (p["jaccard"] >= F.lit(threshold)),
    )


def pairs_from_simhash_rows(
    rows: DataFrame, *, id_col: str, max_hamming: int
) -> DataFrame:
    """Within-set near-dup pairs from a precomputed ``_simhash_rows``
    projection — ``(id_a, id_b, hamming)``, identical (as a set) to
    :func:`~.dedup.simhash_near_duplicate_pairs` over the same docs at
    the same geometry (same :func:`~.dedup.simhash_bucket_keys`
    buckets, same ``bit_count`` verify — pinned). The Hamming-family
    twin of :func:`pairs_from_banded_rows`."""
    return _intra_bucket_pairs(
        rows,
        ["bucket"],
        [id_col, "sh"],
        lambda x, y: F.struct(
            x[id_col].alias("id_a"),
            y[id_col].alias("id_b"),
            F.bit_count(x["sh"].bitwiseXOR(y["sh"])).alias("hamming"),
        ),
        lambda p: (p["id_a"] < p["id_b"])
        & (p["hamming"] <= F.lit(max_hamming)),
    )


def dedup_index_bucket_stats(
    spark, path: str, *, top_k: int = 10
) -> dict:
    """Hot-bucket debug stat (r9): postings per BAND KEY of an at-rest
    dedup index — the ``top_k`` hottest keys plus max/mean/key-count,
    so one small collect answers "is this index poisoned by a hot
    bucket?".

    Probe cost is O(batch + matched-bucket population) and a bucket's
    pair contribution is population², so ONE hot key — mass-duplicated
    boilerplate that survived exact dedup because of trivial
    variations — quietly turns a bounded probe into a quadratic scan.
    Band keys hash 4-row signature slices, so under uniform content
    the max should sit within a small factor of
    ``n_docs / distinct keys``; a max orders of magnitude above that
    is the boilerplate signature. Remedies, in order: run
    ``exact_dedup_fingerprints`` (and ``passage_dedup`` for shared
    passages) BEFORE indexing; raise ``shingle_k`` so boilerplate
    shingles stop dominating the minhash; drop the offending docs.
    Works for all three dedup kinds — for ``kind="simhash"`` the key
    is the packed chunk ``bucket`` (reported with ``band = -1``); for
    ``kind="srp"`` it is the per-table sign-projection ``bucket``
    (reported with ``band = tbl``, and the remedy for a hot key is
    exact-dedup-by-vector before indexing).

    One aggregation over the index, one bounded (top_k+1)-row collect —
    at 100 TB run it on the cadence that runs compaction, not per
    probe. Returns a plain dict:
    ``{kind, n_postings, n_keys, max_postings_per_key,
    mean_postings_per_key, top: [(band, bkey, n_postings), ...]}``."""
    meta = load_ann_meta(path)
    if meta.get("kind") not in ("minhash", "simhash", "srp"):
        raise ValueError(
            f"dedup_index_bucket_stats: index kind {meta.get('kind')!r} "
            "not supported — expected one of ['minhash', 'simhash', "
            "'srp']"
        )
    rows = spark.read.parquet(active_data_root(path))
    if meta["kind"] == "minhash":
        keyed = rows.select("band", "bkey")
    elif meta["kind"] == "srp":
        # normalized layout: vector rows (tbl NULL) are storage, not
        # postings — only posting rows feed the hot-key stat
        keyed = rows.where(F.col("tbl").isNotNull()).select(
            F.col("tbl").alias("band"), F.col("bucket").alias("bkey")
        )
    else:
        keyed = rows.select(
            F.lit(-1).alias("band"), F.col("bucket").alias("bkey")
        )
    counts = keyed.groupBy("band", "bkey").agg(
        F.count(F.lit(1)).alias("n_postings")
    )
    summary = counts.agg(
        F.sum("n_postings").alias("total"),
        F.count(F.lit(1)).alias("keys"),
        F.max("n_postings").alias("mx"),
    ).collect()[0]
    top = (
        counts.orderBy(F.desc("n_postings"), "band", "bkey")
        .limit(top_k)
        .collect()
    )
    n_keys = int(summary["keys"] or 0)
    total = int(summary["total"] or 0)
    return {
        "kind": meta["kind"],
        "n_postings": total,
        "n_keys": n_keys,
        "max_postings_per_key": int(summary["mx"] or 0),
        "mean_postings_per_key": (total / n_keys) if n_keys else 0.0,
        "top": [
            (int(r["band"]), int(r["bkey"]), int(r["n_postings"]))
            for r in top
        ],
    }


def auto_dedup_buckets(
    n_docs: int,
    *,
    bands: int = 4,
    target_docs_per_dir: int = 4096,
    lo: int = 16,
    hi: int = 4096,
) -> int:
    """Corpus-size-adaptive ``n_buckets``: hold directory payload
    constant as the corpus grows — the same sizing logic as
    :func:`~.similarity.auto_lsh_planes`, applied to the dedup index's
    partition geometry. Each band spreads its ``n_docs`` rows over
    ``n_buckets`` directories, so ``n_buckets ≈ n_docs /
    target_docs_per_dir`` keeps one directory a comfortable scan-task
    unit at any corpus size (the fixed 64-bucket default reads 15M
    rows/dir at a 10⁹-doc corpus). Rounded up to a power of two so
    bucket populations stay uniform under the pmod; clamped: below
    ``lo`` the probe reads most of the index anyway, above ``hi``
    (4 096 dirs ≈ the measured discovery-tax regime the matched-dirs
    read already absorbs) size by hand. Pure driver arithmetic —
    pin-testable."""
    import math

    if n_docs <= 0:
        return lo
    want = math.ceil(n_docs / target_docs_per_dir)
    return max(lo, min(hi, 1 << max(0, (want - 1).bit_length())))


def route_dedup_append(df: DataFrame, meta: dict) -> tuple[DataFrame, str]:
    """Append routing for ``kind="minhash"`` — called by
    :func:`~.similarity.append_to_ann_index` so new batches band with
    the SIDECAR's geometry (never recomputed parameters).

    Appends are LSM-style deltas (r9, see :data:`DELTA_PB`): the whole
    batch lands as ONE file in the ``pb=-1`` directory instead of ≤1
    file in every matched directory. The r8 routed-append cadence
    measured probe latency +25% after 32 appends and 3.0× after 128
    from exactly that per-directory file growth; the delta form writes
    one file per append regardless of geometry, and probes pay one
    small extra directory scan bounded by the compaction cadence.
    **Compact every ~32 appends** still — compaction
    (``compact_ann_index``) re-routes delta rows to their true buckets
    from the stored band/bkey columns, bit-identical to a fresh
    rebuild."""
    missing = {meta["id_col"], meta["text_col"]} - set(df.columns)
    if missing:
        raise ValueError(
            f"append to minhash index: batch lacks column(s) "
            f"{sorted(missing)} — the sidecar expects "
            f"id_col={meta['id_col']!r}, text_col={meta['text_col']!r}"
        )
    routed = _banded_rows(
        df,
        id_col=meta["id_col"],
        text_col=meta["text_col"],
        n_hashes=int(meta["n_hashes"]),
        bands=int(meta["bands"]),
        shingle_k=int(meta["shingle_k"]),
        n_buckets=int(meta["n_buckets"]),
    )
    return as_delta_append(routed), "pb"


def write_dedup_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    n_buckets: int | str = "auto",
    n_docs: int | None = None,
    files_per_partition: int | None = 1,
) -> None:
    """Build the at-rest near-dup index (see module docstring).

    ``n_buckets`` trades directory count against pruning granularity:
    ``bands × n_buckets`` directories total, and a probe reads the
    batch's matched buckets only — size it so one directory's postings
    fit comfortably in a scan task (the same dial as the ANN indexes'
    cell/bucket count). The default ``"auto"`` derives it from the
    corpus size (:func:`auto_dedup_buckets`; pass ``n_docs`` to skip
    the internal count), so the geometry tracks corpus growth the way
    ``n_planes="auto"`` does for the embedding LSH.

    ``(n_hashes, bands)`` set the recall curve, and the curve is
    MEASURED, not assumed (tests/test_minhash_recall.py + SCALE.md
    "minhash banding recall"): recall at Jaccard j is
    ``dedup.banding_detection_prob(j, n_hashes=…, bands=…)`` =
    ``1−(1−j^r)^b`` within sampling tolerance for this signature
    family. Guidance from the measured table: the default 16×4
    (r=4) reads ~0.99 at j≈0.90 but only ~0.59 at j≈0.67 — size for
    the LOOSEST threshold you probe at. Holding r=4 and doubling
    bands (32×8) lifts the j≈0.67 floor to ~0.83 at 2× signature
    cost; 64×16 reaches ~0.97. Raising r at fixed bands (32×4, r=8)
    COSTS recall at every level (~0.91 at j≈0.90) — do that only to
    suppress low-j candidate noise, never to "use more hashes".
    Recall composes with the banding only — the exact verify never
    rejects a true pair above ``threshold``.

    Probe cost is O(batch + matched-bucket population), so a corpus
    carrying m exact copies of one document makes every probe that
    hits their bucket verify against all m (same population² caveat
    as the in-memory operator): run ``exact_dedup_fingerprints``
    before indexing — the streaming ingest loop does this as its
    stage 1, so index growth through the loop stays copy-free.

    Unlike the IVF/LSH writers, ``files_per_partition`` DEFAULTS ON
    (1): band keys are uniform by construction, so a shuffle-free
    write puts every input task's rows into every directory — measured
    121,776 files for a 600k-row index at 4×1024 geometry, and the
    probe paid 13.4 s of listing/footer tax to read 9% of the bytes
    (SCALE.md r7). One build-time shuffle bounds it to
    ``bands × n_buckets × files_per_partition`` files forever. Pass
    ``None`` only when the caller compacts separately."""
    from .similarity import _compact_for_write

    fs.check_fs(path, "write_dedup_index")
    # before the auto-sizing count — a reserved id_col must not cost
    # a full corpus scan to discover
    _require_unreserved(id_col, "write_dedup_index")
    if n_hashes % bands != 0:
        # validate BEFORE the auto-sizing count — invalid parameters
        # must not cost a full corpus scan to discover
        raise ValueError(
            f"bands ({bands}) must divide n_hashes ({n_hashes})"
        )
    if n_buckets == "auto":
        n_buckets = auto_dedup_buckets(
            n_docs if n_docs is not None else docs.count(), bands=bands
        )
    n_buckets = int(n_buckets)
    rows = _banded_rows(
        docs,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        bands=bands,
        shingle_k=shingle_k,
        n_buckets=n_buckets,
    )
    _compact_for_write(rows, "pb", files_per_partition, id_col).write.mode(
        "overwrite"
    ).partitionBy("pb").parquet(path)
    _write_ann_meta(
        path,
        {
            "kind": "minhash",
            "id_col": id_col,
            "text_col": text_col,
            "n_hashes": n_hashes,
            "bands": bands,
            "shingle_k": shingle_k,
            "n_buckets": n_buckets,
        },
    )


def dedup_batch_against_index(
    spark,
    batch: DataFrame,
    path: str,
    *,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs between ``batch`` and the indexed corpus.

    Returns ``(batch_id, corpus_id, jaccard)`` with jaccard ≥
    threshold — the cross-set slice of what
    :func:`~.dedup.near_duplicate_pairs` would emit over
    corpus ∪ batch, at O(batch + matched buckets) cost instead of
    O(corpus). The batch's distinct ``pb`` values (bounded by
    ``bands × n_buckets``, collected driver-side from a tiny agg)
    become a partition ``isin`` filter, so unmatched corpus
    directories contribute ZERO I/O. "Fresh" docs for ingest are the
    batch anti-joined against this result's ``batch_id``.

    Batch-size regime (MEASURED, SCALE.md r9 ``--bigprobe``, 1M-doc
    corpus at the auto 4×256 geometry): a batch of B docs posts
    ``bands·B`` near-uniform band keys, so the matched-directory
    fraction is ≈ ``1 − exp(−B/n_buckets)`` — measured 39/1024 dirs at
    B=10, 323 at B=100, 1002 at B=1000, all 1024 at B=10⁴, walls
    0.84/1.60/3.58/4.45 s. Partition pruning pays while
    ``B ≪ n_buckets`` (the daily-increment shape); at ``B ≳
    n_buckets`` the probe reads the whole index ONCE — still bounded
    (4.45 s for 10⁴ docs vs 10⁶-doc corpus here). ENFORCED (r10): past
    :data:`~.similarity.FLAT_READ_CROSSOVER` of the directories the
    probe skips the per-directory listing and reads the index flat
    (same rows, one listing pass saved) with a warning naming the
    regime; if that is your steady batch size, split the batch to keep
    probes pruned or size ``n_buckets`` above the batch size at build
    time.
    Probe cost stays flat in CORPUS size either way: 100-doc probes
    measured 1.17/1.32/1.72 s against 5k/150k/1M-doc indexes (auto
    geometry growing 4×16 → 4×256 holds rows-behind-matched-dirs
    bounded).
    """
    meta = load_ann_meta(path)
    _require_kind(meta, "minhash", "dedup_batch_against_index")
    b = _banded_rows(
        batch,
        id_col=meta["id_col"],
        text_col=meta["text_col"],
        n_hashes=int(meta["n_hashes"]),
        bands=int(meta["bands"]),
        shingle_k=int(meta["shingle_k"]),
        n_buckets=int(meta["n_buckets"]),
    ).localCheckpoint(eager=False)
    return probe_index_with_banded_rows(
        spark, b, path, meta, threshold=threshold
    )


def probe_index_with_banded_rows(
    spark,
    b: DataFrame,
    path: str,
    meta: dict,
    *,
    threshold: float,
) -> DataFrame:
    """The probe body of :func:`dedup_batch_against_index`, taking the
    batch side as an ALREADY-COMPUTED ``_banded_rows`` projection (at
    the sidecar's geometry — the caller's contract). Exists so the
    streaming ingest loop can fingerprint each micro-batch ONCE and
    feed the same projection to the in-batch pass, this probe, and the
    append routing (r9 — the fixed per-batch fingerprint redundancy
    measured as part of the loop's ~7 s cadence). ``b`` should be
    pinned (localCheckpoint) by the caller: the pb collect below and
    the candidate join both consume it."""
    # bounded driver collect: ≤ bands × n_buckets ints (256 at the
    # default geometry) — the partition-pruning literal, same shape as
    # the ANN probes' cell/bucket lists
    pbs = [r["pb"] for r in b.select("pb").distinct().collect()]
    # the active generation dir after a generational compaction (r12),
    # the index root before one
    droot = active_data_root(path)
    # un-compacted LSM delta appends (pb=-1, see DELTA_PB) hold recent
    # postings for EVERY bucket, so every probe reads them too — a
    # single small directory bounded by the compaction cadence
    if fs.is_dir(fs.join(droot, f"pb={DELTA_PB}")):
        pbs = pbs + [DELTA_PB]
    id_col = meta["id_col"]
    # Matched-directories-only read: above ~32 directories Spark's
    # partition discovery launches a listing JOB over every directory
    # — measured 7.4 s of the probe's 8.1 s at a 4×1024 geometry
    # (4 096 dirs), paid even though the scan then pruned 91% of the
    # bytes. See read_matched_partitions; the redundant isin filter
    # below still lands in PartitionFilters (plan-gated) as a guard.
    # total_partitions arms the flat-read crossover (r9 verdict #3):
    # a batch matching > half the bands×n_buckets directories reads
    # the index flat instead of listing ~every directory explicitly.
    rel = read_matched_partitions(
        spark,
        droot,
        "pb",
        pbs,
        total_partitions=int(meta["bands"]) * int(meta["n_buckets"]),
    )
    if rel is None:
        from pyspark.sql.types import DoubleType, StructField, StructType

        idt = b.schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("batch_id", idt),
                    StructField("corpus_id", idt),
                    StructField("jaccard", DoubleType()),
                ]
            ),
        )
    corpus = (
        rel
        .where(F.col("pb").isin(pbs))
        .select(
            F.col("band").alias("band"),
            F.col("bkey").alias("bkey"),
            F.col(id_col).alias("corpus_id"),
            F.col("sh").alias("_sh_c"),
        )
    )
    bb = b.select(
        "band",
        "bkey",
        F.col(id_col).alias("batch_id"),
        F.col("sh").alias("_sh_b"),
    )
    cands = (
        bb.join(corpus, ["band", "bkey"])
        # a re-probed doc whose id already lives in the index would
        # match its own postings (jaccard 1.0) — the in-memory twin
        # over corpus ∪ batch can never emit a self-pair (id_a < id_b),
        # so neither does this probe
        .where(F.col("batch_id") != F.col("corpus_id"))
        .select("batch_id", "corpus_id", "_sh_b", "_sh_c")
        # a pair sharing several bands must verify once, not per band
        .dropDuplicates(["batch_id", "corpus_id"])
    )
    return cands.select(
        "batch_id",
        "corpus_id",
        jaccard_verify_col(F.col("_sh_b"), F.col("_sh_c")).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash at rest — the same incremental-dedup story for the Hamming
# family (near_duplicate_pairs ↔ write_dedup_index is the Jaccard
# pair). One parquet table partitioned by pb = xxhash64(bucket) mod
# n_buckets, rows carrying the packed chunk-bucket key AND the full
# 64-bit fingerprint, so a probe is one pruned scan + bucket equi-join
# + bit_count verify — never a corpus re-fingerprint. Rides the SAME
# sidecar/append/compact lifecycle (kind="simhash"), including
# regeometry (pb recomputes from the stored bucket column).
# ---------------------------------------------------------------------------


def _simhash_rows(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    hash_family: str,
    n_chunks: int,
    chunks_per_key: int,
    n_buckets: int,
) -> DataFrame:
    """(pb, bucket, <id>, sh) rows — keys_per_doc rows per doc, the
    shared projection for build, append routing, and the probe's batch
    side. Fingerprint once, explode the packed keys once. The bucket
    formula is owned by :func:`~.dedup.simhash_bucket_keys` (byte-
    identical to the in-memory operator); ``pb`` mixes the packed key
    through xxhash64 before the mod because the key's low bits are raw
    chunk bits (a plain mod would route every combo's chunk-value
    residue to the same few directories)."""
    from .dedup import simhash_bucket_keys, simhash_col

    _require_unreserved(id_col, "_simhash_rows")
    sig = df.select(
        F.col(id_col),
        simhash_col(text_col, hash_family=hash_family).alias("sh"),
    )
    keys = simhash_bucket_keys(
        F.col("sh"), n_chunks=n_chunks, chunks_per_key=chunks_per_key
    )
    banded = sig.select(
        id_col, "sh", F.explode(F.array(*keys)).alias("bucket")
    )
    return banded.select(
        F.pmod(F.xxhash64(F.col("bucket")), F.lit(n_buckets))
        .cast("int")
        .alias("pb"),
        "bucket",
        id_col,
        "sh",
    )


def simhash_keys_per_doc(n_chunks: int, chunks_per_key: int) -> int:
    """Rows each doc posts: n_chunks single-chunk keys, or
    C(n_chunks, 2) pair-chunk keys."""
    if chunks_per_key == 1:
        return n_chunks
    return n_chunks * (n_chunks - 1) // 2


def route_simhash_append(df: DataFrame, meta: dict) -> tuple[DataFrame, str]:
    """Append routing for ``kind="simhash"`` — sidecar geometry only,
    same contract (and the same LSM delta form) as
    :func:`route_dedup_append`."""
    missing = {meta["id_col"], meta["text_col"]} - set(df.columns)
    if missing:
        raise ValueError(
            f"append to simhash index: batch lacks column(s) "
            f"{sorted(missing)} — the sidecar expects "
            f"id_col={meta['id_col']!r}, text_col={meta['text_col']!r}"
        )
    routed = _simhash_rows(
        df,
        id_col=meta["id_col"],
        text_col=meta["text_col"],
        hash_family=meta["hash_family"],
        n_chunks=int(meta["n_chunks"]),
        chunks_per_key=int(meta["chunks_per_key"]),
        n_buckets=int(meta["n_buckets"]),
    )
    return as_delta_append(routed), "pb"


def write_simhash_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "xxhash64",
    n_chunks: int = 5,
    chunks_per_key: int = 2,
    n_buckets: int | str = "auto",
    n_docs: int | None = None,
    files_per_partition: int | None = 1,
) -> None:
    """Build the at-rest SimHash near-dup index.

    Defaults to the SCALE-PATH banding (5 chunks, pair keys → C(5,2)
    keys of ~2^26 space, pigeonhole guarantee h ≤ 3) rather than the
    in-memory operator's 4×1 default: an index exists because the
    corpus is large, which is exactly the regime where 16-bit
    single-chunk buckets saturate (measured r6: candidates 24.6M→7.4M,
    wall 15.4→2.8 s at 50k docs). ``n_buckets="auto"`` holds directory
    payload constant like the minhash index — each doc posts
    ``keys_per_doc`` rows, so the bucket count derives from
    ``n_docs × keys_per_doc``. Probes verify with ``bit_count`` ≤ the
    caller's max_hamming; pairs beyond the geometry's pigeonhole
    guarantee may be missed (same recall trade as the in-memory
    operator — the guarantee, not a probability, is the contract).
    ``files_per_partition`` defaults ON for the same measured reason
    as :func:`write_dedup_index` (uniform keys → shuffle-free write
    explodes file count) — and the same exact-dedup-before-indexing
    guidance applies (m exact copies share every bucket; the ingest
    loop's stage 1 already guarantees this for loop-grown indexes)."""
    from .similarity import _compact_for_write

    fs.check_fs(path, "write_simhash_index")
    _require_unreserved(id_col, "write_simhash_index")
    from .dedup import simhash_bucket_keys as _validate

    # parameter validation (raises on bad n_chunks/chunks_per_key)
    # BEFORE the auto-sizing count — same rule as write_dedup_index
    _validate(F.lit(0), n_chunks=n_chunks, chunks_per_key=chunks_per_key)
    kpd = simhash_keys_per_doc(n_chunks, chunks_per_key)
    if n_buckets == "auto":
        n_buckets = auto_dedup_buckets(
            (n_docs if n_docs is not None else docs.count()) * kpd,
            bands=1,
        )
    n_buckets = int(n_buckets)
    rows = _simhash_rows(
        docs,
        id_col=id_col,
        text_col=text_col,
        hash_family=hash_family,
        n_chunks=n_chunks,
        chunks_per_key=chunks_per_key,
        n_buckets=n_buckets,
    )
    _compact_for_write(rows, "pb", files_per_partition, id_col).write.mode(
        "overwrite"
    ).partitionBy("pb").parquet(path)
    _write_ann_meta(
        path,
        {
            "kind": "simhash",
            "id_col": id_col,
            "text_col": text_col,
            "hash_family": hash_family,
            "n_chunks": n_chunks,
            "chunks_per_key": chunks_per_key,
            "n_buckets": n_buckets,
        },
    )


def simhash_batch_against_index(
    spark,
    batch: DataFrame,
    path: str,
    *,
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs between ``batch`` and the indexed corpus under
    Hamming distance — ``(batch_id, corpus_id, hamming)`` with
    hamming ≤ max_hamming, the cross-set slice of what
    :func:`~.dedup.simhash_near_duplicate_pairs` emits over
    corpus ∪ batch (pinned bit-equal), at O(batch + matched buckets)
    cost. Same partition-pruned matched-directories read, bounded
    driver collect, self-pair filter, and per-pair dedup as the
    minhash probe."""
    meta = load_ann_meta(path)
    _require_kind(meta, "simhash", "simhash_batch_against_index")
    b = _simhash_rows(
        batch,
        id_col=meta["id_col"],
        text_col=meta["text_col"],
        hash_family=meta["hash_family"],
        n_chunks=int(meta["n_chunks"]),
        chunks_per_key=int(meta["chunks_per_key"]),
        n_buckets=int(meta["n_buckets"]),
    ).localCheckpoint(eager=False)
    return probe_index_with_simhash_rows(
        spark, b, path, meta, max_hamming=max_hamming
    )


def probe_index_with_simhash_rows(
    spark,
    b: DataFrame,
    path: str,
    meta: dict,
    *,
    max_hamming: int,
) -> DataFrame:
    """Probe body of :func:`simhash_batch_against_index` over an
    already-computed ``_simhash_rows`` projection — the Hamming twin
    of :func:`probe_index_with_banded_rows`, same caller contract
    (including the delta-directory read)."""
    pbs = [r["pb"] for r in b.select("pb").distinct().collect()]
    droot = active_data_root(path)
    if fs.is_dir(fs.join(droot, f"pb={DELTA_PB}")):
        pbs = pbs + [DELTA_PB]
    id_col = meta["id_col"]
    rel = read_matched_partitions(
        spark, droot, "pb", pbs, total_partitions=int(meta["n_buckets"])
    )
    if rel is None:
        from pyspark.sql.types import IntegerType, StructField, StructType

        idt = b.schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("batch_id", idt),
                    StructField("corpus_id", idt),
                    StructField("hamming", IntegerType()),
                ]
            ),
        )
    corpus = rel.where(F.col("pb").isin(pbs)).select(
        "bucket",
        F.col(id_col).alias("corpus_id"),
        F.col("sh").alias("_sh_c"),
    )
    bb = b.select(
        "bucket",
        F.col(id_col).alias("batch_id"),
        F.col("sh").alias("_sh_b"),
    )
    cands = (
        bb.join(corpus, "bucket")
        .where(F.col("batch_id") != F.col("corpus_id"))
        .select("batch_id", "corpus_id", "_sh_b", "_sh_c")
        .dropDuplicates(["batch_id", "corpus_id"])
    )
    return cands.select(
        "batch_id",
        "corpus_id",
        F.bit_count(F.col("_sh_b").bitwiseXOR(F.col("_sh_c")))
        .cast("int")
        .alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
