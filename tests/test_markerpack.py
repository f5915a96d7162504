"""Marker-set pack compaction (streaming/markerpack.py — r13, r12
verdict #9: bound the per-batch marker listings)."""

from __future__ import annotations

import os

from nursinghome_data_pipeline_spark.streaming import commitlog, markerpack


def _touch(d, name):
    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, name), "w").close()


def test_pack_roundtrip_and_loose_gc(tmp_path):
    d = str(tmp_path / "m")
    names = {f"{i:04d}" for i in range(300)}
    for n in names:
        _touch(d, n)
    assert markerpack.list_markers(d) == names
    assert markerpack.compact(d, threshold=256) is True
    # every fact survives; loose markers are gone; one committed pack
    assert markerpack.list_markers(d) == names
    left = os.listdir(d)
    loose = [n for n in left if not n.startswith(markerpack.PACK_PREFIX)]
    assert loose == []
    assert sorted(left) == ["_pack-00000000", "_pack-00000000.ok"]


def test_below_threshold_no_pack(tmp_path):
    d = str(tmp_path / "m")
    for i in range(10):
        _touch(d, str(i))
    assert markerpack.compact(d, threshold=256) is False
    assert not any(
        n.startswith(markerpack.PACK_PREFIX) for n in os.listdir(d)
    )


def test_uncommitted_pack_invisible_and_union_semantics(tmp_path):
    """Crash states: a pack without its .ok is ignored (markers all
    still loose); a committed pack plus leftover loose markers union
    idempotently; a second compaction supersedes the first pack."""
    d = str(tmp_path / "m")
    for i in range(5):
        _touch(d, f"a{i}")
    # torn/uncommitted pack claims a bogus entry — must be invisible
    with open(os.path.join(d, "_pack-00000007"), "w") as f:
        f.write("bogus\n")
    assert markerpack.list_markers(d) == {f"a{i}" for i in range(5)}
    # committed pack + overlapping loose markers -> union, no dupes
    with open(os.path.join(d, "_pack-00000001"), "w") as f:
        f.write("a0\nz9\n")
    _touch(d, "_pack-00000001.ok")
    assert markerpack.list_markers(d) == {
        "a0", "a1", "a2", "a3", "a4", "z9"
    }
    # compaction folds everything into one new pack and GCs the rest
    assert markerpack.compact(d, threshold=1) is True
    assert markerpack.list_markers(d) == {
        "a0", "a1", "a2", "a3", "a4", "z9"
    }
    left = sorted(os.listdir(d))
    assert left == ["_pack-00000008", "_pack-00000008.ok"]


def test_missing_dir_is_empty(tmp_path):
    d = str(tmp_path / "nope")
    assert markerpack.list_markers(d) == set()
    assert markerpack.compact(d) is False


def test_commitlog_survives_compaction(tmp_path):
    """committed_ids / is_committed / n_committed read packed ids; a
    fresh commit after compaction stays on the loose-marker hot path."""
    t = str(tmp_path / "target")
    ids = list(range(300))
    for i in ids:
        commitlog.record_commit(t, i)
    assert commitlog.compact_markers(t, threshold=256) is True
    assert commitlog.committed_ids(t) == set(ids)
    assert commitlog.is_committed(t, 123) is True
    assert commitlog.is_committed(t, 999) is False
    assert commitlog.n_committed(t) == 300
    commitlog.record_commit(t, 300)
    assert commitlog.is_committed(t, 300) is True
    assert commitlog.n_committed(t) == 301


def test_listing_stays_bounded_as_markers_grow(tmp_path):
    """The r12 verdict's done-criterion: after compaction the
    directory holds O(packs + since-pack markers) entries even after
    10^4 recordings — the listing no longer scales with stream
    lifetime."""
    d = str(tmp_path / "m")
    for i in range(10_000):
        _touch(d, f"{i:06d}")
    assert markerpack.compact(d, threshold=256) is True
    assert len(os.listdir(d)) == 2  # pack + ok, vs 10_000 before
    assert len(markerpack.list_markers(d)) == 10_000
    # steady state: a few new markers then another pack
    for i in range(10_000, 10_300):
        _touch(d, f"{i:06d}")
    assert markerpack.compact(d, threshold=256) is True
    assert len(os.listdir(d)) == 2
    assert len(markerpack.list_markers(d)) == 10_300
