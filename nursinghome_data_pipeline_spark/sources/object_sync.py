"""Object-store sync: Spark-native parity for the reference uploader
(SURVEY §2.1 S8, §2.2 K7-K10 — ``/root/reference/upload_to_s3.py``).

The reference is a boto3 CLI: recursive glob with include/exclude
filters, sha256 per file, HEAD-compare to skip already-uploaded
objects, manifest lines, dry-run. Spark-natively the same capabilities
are: a ``binaryFile`` datasource scan (distributed checksumming — the
reference hashes serially on one thread), a manifest *table*, an
anti-join for idempotent skip, and a plan-only mode. Writing the
payload bytes to the destination is a filesystem/S3A copy — Spark's
committers already handle multipart + integrity, so this module's job
is the *decision* layer (what to copy, what to skip, what was copied).
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "path string, size_bytes long, mtime timestamp, sha256 string"


def collect_files(
    base_dir: str,
    *,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    include_hidden: bool = False,
    max_size_bytes: int | None = None,
) -> list[str]:
    """S8: recursive listing with fnmatch include/exclude globs, hidden
    filter, max-size filter (upload_to_s3.py:39-83 semantics)."""
    out: list[str] = []
    for root, dirs, files in os.walk(base_dir):
        if not include_hidden:
            dirs[:] = [d for d in dirs if not d.startswith(".")]
        for name in sorted(files):
            if not include_hidden and name.startswith("."):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, base_dir)
            if include and not any(fnmatch.fnmatch(rel, p) for p in include):
                continue
            if exclude and any(fnmatch.fnmatch(rel, p) for p in exclude):
                continue
            if max_size_bytes is not None and os.path.getsize(full) > max_size_bytes:
                continue
            out.append(full)
    return sorted(out)


def checksum_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed sha256 manifest of the given files via the
    ``binaryFile`` datasource (replaces the serial hashing loop at
    upload_to_s3.py:96-116). Each file is one row; hashing scales with
    the cluster, not the driver."""
    if not paths:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    df = spark.read.format("binaryFile").load(paths)
    return df.select(
        F.col("path"),
        F.col("length").alias("size_bytes"),
        F.col("modificationTime").alias("mtime"),
        F.lower(F.sha2(F.col("content"), 256)).alias("sha256"),
    )


def plan_sync(
    new_manifest: DataFrame, existing_manifest: DataFrame | None
) -> DataFrame:
    """K8: idempotent skip — a file is copied only if its (path, size,
    sha256) is not already in the destination manifest (the HEAD +
    metadata compare of upload_to_s3.py:86-93 as one anti-join)."""
    if existing_manifest is None:
        return new_manifest
    return new_manifest.join(
        existing_manifest.select("path", "size_bytes", "sha256"),
        on=["path", "size_bytes", "sha256"],
        how="left_anti",
    )


def manifest_lines(manifest: DataFrame) -> DataFrame:
    """K9: ``"<sha256>  <path>"`` manifest lines (upload_to_s3.py:174)."""
    return manifest.select(
        F.concat_ws("  ", F.col("sha256"), F.col("path")).alias("line")
    )


COPY_RESULT_SCHEMA = (
    MANIFEST_SCHEMA + ", dest_path string, copied boolean, verify_sha256 string"
)


def _local_path(p: str) -> str:
    """Strip the ``file:`` scheme the binaryFile source prefixes."""
    if p.startswith("file://"):
        return p[len("file://"):]
    if p.startswith("file:"):
        return p[len("file:"):]
    return p


#: Hadoop scheme spelling → the spelling ``pyarrow.fs.FileSystem.from_uri``
#: resolves. Arrow has no client at all for the legacy Azure ``wasb(s)``
#: spellings — fail fast with the scheme named rather than let from_uri
#: raise a generic "unrecognized filesystem" deep inside an executor
#: task (r11 verdict #5: only s3a was translated; abfs/gs destinations
#: silently depended on Arrow happening to accept the Hadoop spelling).
_ARROW_SCHEME_MAP = {
    "s3a": "s3",
    "s3n": "s3",
    "gs": "gcs",
    "abfs": "abfs",  # Arrow >= 16 ships AzureFileSystem under this name
    "abfss": "abfss",
    "file": "file",
    "s3": "s3",
    "gcs": "gcs",
    "hdfs": "hdfs",  # needs libhdfs at runtime; Arrow names the gap
}
_ARROW_UNSUPPORTED = {"wasb", "wasbs", "swift"}


def arrow_uri(uri: str) -> str:
    """Translate a Hadoop-spelled destination URI to Arrow's spelling,
    failing fast (scheme named) for spellings Arrow has no client
    for."""
    import re as _re

    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", uri)
    if not m:
        return uri
    scheme = m.group(1).lower()
    if scheme in _ARROW_UNSUPPORTED:
        raise ValueError(
            f"copy_files: destination scheme {scheme!r} has no "
            "pyarrow.fs client — use the abfs(s):// spelling for "
            "Azure, or copy via a Hadoop-side tool"
        )
    mapped = _ARROW_SCHEME_MAP.get(scheme)
    if mapped is None:
        # unknown scheme: pass through and let from_uri name it —
        # Arrow may grow clients we don't know about
        return uri
    return _re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://", mapped + "://", uri)


def copy_files(
    plan: DataFrame,
    base_dir: str,
    dest_root: str,
    *,
    verify: bool = True,
) -> DataFrame:
    """K7 byte-copy executor (upload_to_s3.py:119-203's actual upload).

    Copies each planned file to ``dest_root`` preserving its path
    relative to ``base_dir``, ON THE EXECUTORS (``mapInPandas`` over the
    plan rows — each task copies its partition's files, so throughput
    scales with the cluster exactly like the reference's thread pool,
    but without a driver bottleneck).

    ``dest_root`` may be a plain local path (the ``os``/``shutil`` fast
    path, tmp-file + atomic ``os.replace``) or a ``scheme://`` URI
    resolved with ``pyarrow.fs.FileSystem.from_uri`` (r11) — executors
    have no SparkSession, so the object-store client here is Arrow's,
    not Hadoop's. Hadoop scheme spellings are translated via
    :func:`arrow_uri` (``s3a``/``s3n``→``s3``, ``gs``→``gcs``,
    ``abfs(s)`` passes through to Arrow's Azure client) and spellings
    Arrow has no client for (``wasb(s)``) fail fast on the driver with
    the scheme named (r12). ``file://`` is exercised end-to-end in
    tests; remote schemes work where the pyarrow wheel ships the
    filesystem. On an object store the tmp+move commit is
    copy-based rather than atomic — a killed task can leave an
    ``.__inflight`` object, which never enters the manifest and is
    overwritten by the retry.

    ``verify=True`` re-hashes the DESTINATION bytes and marks
    ``copied`` false on mismatch (the reference's end-to-end integrity
    check). Only rows with ``copied=true`` may enter the manifest —
    see :func:`sync`.
    """
    import hashlib
    import re
    import shutil

    dest_is_uri = bool(re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", dest_root))
    if dest_is_uri:
        # validate the scheme ON THE DRIVER — an unsupported spelling
        # must raise here with the scheme named, not as an opaque
        # executor-task failure after the job launches
        arrow_uri(dest_root)

    def do_copy(pdfs):
        if dest_is_uri:
            from pyarrow import fs as pafs

            # Hadoop scheme spellings → Arrow's (fail-fast for schemes
            # Arrow has no client for — see arrow_uri)
            dfs, droot = pafs.FileSystem.from_uri(arrow_uri(dest_root))
            droot = droot.rstrip("/")
        for pdf in pdfs:
            dests, ok, vsha = [], [], []
            for p, sha in zip(pdf["path"], pdf["sha256"]):
                src = _local_path(p)
                rel = os.path.relpath(src, base_dir)
                dst = (
                    f"{dest_root.rstrip('/')}/{rel}"
                    if dest_is_uri
                    else os.path.join(dest_root, rel)
                )
                try:
                    if dest_is_uri:
                        dpath = f"{droot}/{rel}"
                        dest_dir_ = dpath.rsplit("/", 1)[0]
                        dfs.create_dir(dest_dir_, recursive=True)
                        tmp = f"{dpath}.__inflight"
                        with open(src, "rb") as fh, dfs.open_output_stream(
                            tmp
                        ) as out:
                            shutil.copyfileobj(fh, out, 1 << 20)
                        dfs.move(tmp, dpath)
                        if verify:
                            h = hashlib.sha256()
                            with dfs.open_input_stream(dpath) as fh:
                                for chunk in iter(
                                    lambda: fh.read(1 << 20), b""
                                ):
                                    h.update(chunk)
                            vsha.append(h.hexdigest())
                            ok.append(vsha[-1] == sha)
                        else:
                            vsha.append(None)
                            ok.append(True)
                    else:
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                        tmp = f"{dst}.__inflight"
                        shutil.copyfile(src, tmp)
                        os.replace(tmp, dst)
                        if verify:
                            with open(dst, "rb") as fh:
                                h = hashlib.sha256(fh.read()).hexdigest()
                            vsha.append(h)
                            ok.append(h == sha)
                        else:
                            vsha.append(None)
                            ok.append(True)
                except OSError:
                    vsha.append(None)
                    ok.append(False)
                dests.append(dst)
            pdf = pdf.copy()
            pdf["dest_path"] = dests
            pdf["copied"] = ok
            pdf["verify_sha256"] = vsha
            yield pdf

    return plan.mapInPandas(do_copy, schema=COPY_RESULT_SCHEMA)


def sync(
    spark: SparkSession,
    base_dir: str,
    *,
    manifest_table: str | None = None,
    dest_dir: str | None = None,
    dry_run: bool = False,
    verify: bool = True,
    **collect_kwargs,
) -> DataFrame:
    """End-to-end: list → checksum → skip-existing → copy → manifest.

    ``dry_run=True`` (K10) returns the plan without writing anything.
    With ``dest_dir`` the payload bytes are physically copied
    (:func:`copy_files`) and ONLY files whose copy succeeded (and, with
    ``verify``, whose destination re-checksum matches) are recorded —
    a failed copy stays out of the manifest, so the K8 anti-join
    retries it on the next run instead of permanently skipping a file
    that was never transferred. Returns the DataFrame of files that
    would be / were newly recorded.
    """
    paths = collect_files(base_dir, **collect_kwargs)
    fresh = checksum_files(spark, paths)
    existing = None
    if manifest_table is not None:
        if any(t.name == manifest_table for t in spark.catalog.listTables()):
            existing = spark.table(manifest_table)
    todo = plan_sync(fresh, existing)
    if dry_run:
        return todo
    # copy runs whenever a destination is given — a manifest is an
    # optional idempotence ledger, not a precondition for moving bytes
    # (the old early-return skipped the copy entirely for
    # dest_dir-without-manifest runs while reporting the plan as done)
    if dest_dir is not None:
        done = copy_files(todo, base_dir, dest_dir, verify=verify)
        todo = done.where(F.col("copied")).select(
            "path", "size_bytes", "mtime", "sha256"
        )
    if manifest_table is None:
        return todo
    # materialize the newly-recorded rows BEFORE appending: the return
    # value is this run's delta (as documented), not the ever-growing
    # manifest history — and reading the table back after the append
    # would also re-trigger the copy job's lineage
    todo = todo.localCheckpoint(eager=True)
    todo.write.mode("append").format("parquet").saveAsTable(manifest_table)
    return todo
