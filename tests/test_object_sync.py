"""Object-store sync parity tests (S8, K7-K10): glob filters,
distributed checksumming, idempotent skip, manifest lines, dry-run."""

from __future__ import annotations

import hashlib

import pytest

from nursinghome_data_pipeline_spark.sources.object_sync import (
    checksum_files,
    collect_files,
    copy_files,
    manifest_lines,
    plan_sync,
    sync,
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("sync_src")
    (d / "a.csv").write_bytes(b"alpha,beta\n1,2\n")
    (d / "b.txt").write_bytes(b"hello world")
    (d / "big.bin").write_bytes(b"x" * 10_000)
    (d / ".hidden").write_bytes(b"secret")
    sub = d / "nested"
    sub.mkdir()
    (sub / "c.csv").write_bytes(b"gamma\n3\n")
    hid = d / ".git"
    hid.mkdir()
    (hid / "inside.csv").write_bytes(b"nope")
    return d


def test_collect_filters(tree):
    base = str(tree)
    all_files = collect_files(base)
    names = [p.split("sync_src")[-1] for p in all_files]
    assert any("a.csv" in n for n in names)
    assert any("nested" in n for n in names)
    assert not any("hidden" in n or ".git" in n for n in names)
    only_csv = collect_files(base, include=["*.csv", "**/*.csv"])
    assert all(p.endswith(".csv") for p in only_csv) and len(only_csv) == 2
    no_big = collect_files(base, max_size_bytes=100)
    assert not any("big.bin" in p for p in no_big)
    excl = collect_files(base, exclude=["*.txt"])
    assert not any(p.endswith(".txt") for p in excl)


def test_checksums_match_hashlib(spark, tree):
    files = collect_files(str(tree), include=["b.txt"])
    row = checksum_files(spark, files).first()
    assert row.sha256 == hashlib.sha256(b"hello world").hexdigest()
    assert row.size_bytes == 11


def test_plan_sync_skips_existing(spark, tree):
    files = collect_files(str(tree))
    fresh = checksum_files(spark, files)
    # everything is "already uploaded" → nothing to do (K8 idempotency)
    assert plan_sync(fresh, fresh).count() == 0
    # drop one from the destination → exactly that one is planned
    partial = fresh.where(~fresh.path.endswith("b.txt"))
    todo = plan_sync(fresh, partial).collect()
    assert len(todo) == 1 and todo[0].path.endswith("b.txt")


def test_manifest_lines_format(spark, tree):
    files = collect_files(str(tree), include=["b.txt"])
    line = manifest_lines(checksum_files(spark, files)).first().line
    sha, path = line.split("  ", 1)
    assert len(sha) == 64 and path.endswith("b.txt")


def test_copy_files_transfers_bytes_and_verifies(spark, tree, tmp_path):
    """K7: the copy executor physically moves payload bytes (executor-
    side), preserves the relative layout, and the verify re-checksum of
    the DESTINATION matches the source hash."""
    import os

    dest = str(tmp_path / "dest")
    files = collect_files(str(tree))
    plan = checksum_files(spark, files)
    out = copy_files(plan, str(tree), dest, verify=True).collect()
    assert len(out) == len(files) and all(r.copied for r in out)
    for r in out:
        assert os.path.exists(r.dest_path)
        assert r.verify_sha256 == r.sha256
    # byte-for-byte identical content at the destination
    src_b = (tree / "b.txt").read_bytes()
    rel = [r for r in out if r.dest_path.endswith("b.txt")][0]
    assert open(rel.dest_path, "rb").read() == src_b


def test_sync_with_dest_copies_then_skips(spark, tree, tmp_path):
    """End-to-end K7+K8: first sync copies everything; a re-run copies
    nothing (manifest anti-join), and only successfully-copied files
    are ever recorded."""
    import os

    t = "manifest_copy_test"
    dest = str(tmp_path / "dest2")
    n_files = len(collect_files(str(tree)))
    first = sync(spark, str(tree), manifest_table=t, dest_dir=dest)
    assert first.count() == n_files
    copied = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(dest)
        for f in fs
        if not f.startswith("_")
    ]
    assert len(copied) == n_files
    # re-run: nothing new planned, nothing re-copied (mtimes unchanged);
    # the return is THIS run's newly-recorded delta (empty), while the
    # manifest table keeps the full history
    mtimes = {p: os.path.getmtime(p) for p in copied}
    second = sync(spark, str(tree), manifest_table=t, dest_dir=dest)
    assert second.count() == 0
    assert spark.table(t).count() == n_files
    assert {p: os.path.getmtime(p) for p in copied} == mtimes


def test_sync_dest_without_manifest_still_copies(spark, tree, tmp_path):
    """A destination with no manifest ledger must still move bytes —
    the plan is just not recorded (every re-run re-copies)."""
    import os

    dest = str(tmp_path / "dest3")
    n_files = len(collect_files(str(tree)))
    done = sync(spark, str(tree), dest_dir=dest)
    assert done.count() == n_files
    copied = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(dest)
        for f in fs
        if not f.startswith("_")
    ]
    assert len(copied) == n_files


def test_sync_end_to_end_idempotent(spark, tree):
    t = "manifest_sync_test"
    first = sync(spark, str(tree), manifest_table=t)
    n = first.count()
    assert n == collect_files(str(tree)) .__len__()
    # second run appends nothing (idempotent) — and returns the empty
    # newly-recorded delta, not the manifest history
    second = sync(spark, str(tree), manifest_table=t)
    assert second.count() == 0
    # dry-run never writes
    dry = sync(spark, str(tree), manifest_table=t, dry_run=True)
    assert dry.count() == 0
    assert spark.table(t).count() == n


def test_copy_files_to_file_uri_dest(spark, tree, tmp_path):
    """r11: a scheme-qualified destination routes through
    pyarrow.fs.FileSystem.from_uri on the EXECUTORS (no SparkSession
    there) — file:// exercises that code path end-to-end: bytes land,
    layout preserved, destination re-checksum verifies, and a re-plan
    against the recorded manifest skips everything."""
    import os

    dest_local = str(tmp_path / "dest_uri")
    dest = f"file://{dest_local}"
    files = collect_files(str(tree))
    plan = checksum_files(spark, files)
    out = copy_files(plan, str(tree), dest, verify=True).collect()
    assert len(out) == len(files) and all(r.copied for r in out)
    for r in out:
        assert r.dest_path.startswith("file://")
        assert os.path.exists(r.dest_path[len("file://"):])
        assert r.verify_sha256 == r.sha256
    src_b = (tree / "b.txt").read_bytes()
    rel = [r for r in out if r.dest_path.endswith("b.txt")][0]
    assert open(rel.dest_path[len("file://"):], "rb").read() == src_b
    # no torn .__inflight leftovers
    leftovers = [
        f for dp, _, fls in os.walk(dest_local) for f in fls
        if f.endswith(".__inflight")
    ]
    assert leftovers == []


def test_arrow_uri_scheme_map():
    """r12 (r11 verdict #5): Hadoop scheme spellings translate to the
    pyarrow.fs spellings; spellings Arrow has no client for fail with
    the scheme named; unknown schemes pass through for from_uri to
    adjudicate."""
    from nursinghome_data_pipeline_spark.sources.object_sync import arrow_uri

    assert arrow_uri("s3a://bkt/p") == "s3://bkt/p"
    assert arrow_uri("s3n://bkt/p") == "s3://bkt/p"
    assert arrow_uri("gs://bkt/p") == "gcs://bkt/p"
    assert arrow_uri("abfs://c@a.dfs.core.windows.net/p") == (
        "abfs://c@a.dfs.core.windows.net/p"
    )
    assert arrow_uri("file:///x/y") == "file:///x/y"
    assert arrow_uri("/plain/path") == "/plain/path"
    assert arrow_uri("someFutureFs://x/y") == "someFutureFs://x/y"
    with pytest.raises(ValueError, match="'wasb'"):
        arrow_uri("wasb://c@a.blob.core.windows.net/p")


def test_copy_files_unsupported_scheme_fails_on_driver(spark, tree):
    """A wasb:// destination must raise at plan time with the scheme
    named — not as an opaque executor-task failure."""
    files = collect_files(str(tree))
    plan = checksum_files(spark, files)
    with pytest.raises(ValueError, match="'wasbs'"):
        copy_files(plan, str(tree), "wasbs://c@a.blob.core.windows.net/d")
