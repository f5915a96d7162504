"""Bounded marker-set directories: pack compaction for name-encoded facts.

Two streaming bookkeeping sets encode immutable facts as empty-file
NAMES so that recording is one atomic create on every store
(:mod:`.commitlog` batch ids; :mod:`.ingest_dedup` ``_degen.d``
payload markers). The protocol is crash-proof but the per-batch
listing is O(markers ever recorded): a stream ten thousand batches in
pays a 10^4-entry LIST every micro-batch (r12 verdict #9 — guide §6,
small-files listing tax, the same failure mode the index LSM compacts
away).

This module bounds it with the same move as the index's generation
pointer: periodically roll every current marker NAME into one **pack
file** (one name per line) committed by creating an empty
``<pack>.ok`` marker, then delete the loose markers. Readers union
ok'd pack contents with the remaining loose names, so the steady-state
listing is O(packs + markers-since-last-pack), flat in stream length.

Crash safety, point by point (single-writer per directory — the
foreachBatch loop's existing contract):

- pack written but ``.ok`` missing → the pack is invisible (possibly
  torn content never read); every loose marker still present. Retried
  with a fresh sequence number.
- ``.ok`` created, loose-marker deletes incomplete → pack and
  leftover markers UNION; entries are immutable facts so the overlap
  is idempotent. Deletes resume at the next compaction.
- old packs not yet removed → each new pack contains the union of
  everything visible at pack time, so stale packs are redundant, not
  wrong; removed on the next pass.

Marker names must never collide with the pack namespace — packs live
under the reserved ``_pack-`` prefix (callers' names are md5 hexes or
decimal batch ids, which cannot).
"""

from __future__ import annotations

from .. import fs

#: reserved pack-file prefix inside a marker directory
PACK_PREFIX = "_pack-"
#: commit marker suffix — a pack without its ``.ok`` is invisible
PACK_OK_SUFFIX = ".ok"

#: default loose-marker count that triggers a pack (per compaction
#: call): low enough that steady-state listings stay small, high
#: enough that packing cost (one read-modify-write of the pack) is
#: paid rarely relative to batch cadence.
DEFAULT_PACK_THRESHOLD = 256


def _split(names: list[str]) -> tuple[list[str], list[str], list[str]]:
    """(ok'd pack names, all pack-namespace names, loose marker names)."""
    oks = {
        n[: -len(PACK_OK_SUFFIX)]
        for n in names
        if n.startswith(PACK_PREFIX) and n.endswith(PACK_OK_SUFFIX)
    }
    packs = [n for n in names if n.startswith(PACK_PREFIX)]
    committed = sorted(n for n in oks if n in set(names))
    loose = [n for n in names if not n.startswith(PACK_PREFIX)]
    return committed, packs, loose


def list_markers(dirpath: str) -> set[str]:
    """Every marker name ever recorded under ``dirpath`` — loose files
    plus the contents of committed packs. One directory listing plus
    one small read per pack (steady state: a single pack)."""
    try:
        names = fs.listdir(dirpath)
    except OSError:
        return set()
    committed, _, loose = _split(names)
    out: set[str] = set(loose)
    for p in committed:
        try:
            out.update(
                ln
                for ln in fs.read_text(fs.join(dirpath, p)).splitlines()
                if ln
            )
        except OSError:
            # pack vanished between listing and read (concurrent
            # compaction finished its GC) — its names are in the
            # newer pack picked up next listing; loose markers for
            # anything not yet packed are still present
            continue
    return out


def compact(dirpath: str, *, threshold: int = DEFAULT_PACK_THRESHOLD) -> bool:
    """Roll loose markers (and prior packs) into one new pack when the
    loose count reaches ``threshold``. Returns True when a pack was
    written. Crash-safe at every point (module docstring); call from
    the single writer's maintenance cadence — never on the per-record
    hot path."""
    try:
        names = fs.listdir(dirpath)
    except OSError:
        return False
    committed, packs, loose = _split(names)
    if len(loose) < threshold:
        return False
    entries = list_markers(dirpath)
    seqs = []
    for p in packs:
        try:
            seqs.append(int(p[len(PACK_PREFIX):].split(".")[0]))
        except ValueError:
            continue
    seq = (max(seqs) + 1) if seqs else 0
    pack_name = f"{PACK_PREFIX}{seq:08d}"
    fs.write_text(
        fs.join(dirpath, pack_name), "\n".join(sorted(entries)) + "\n"
    )
    # the commit point: an atomic empty create, same move as the index
    # generation pointer and the per-batch commit markers
    fs.touch(fs.join(dirpath, pack_name + PACK_OK_SUFFIX))
    # GC: loose markers first (the listing-tax payload), then every
    # superseded pack and its ok. Failures leave redundant state only.
    for n in loose:
        try:
            fs.remove(fs.join(dirpath, n))
        except OSError:
            pass
    for p in committed:
        for n in (p + PACK_OK_SUFFIX, p):
            try:
                fs.remove(fs.join(dirpath, n))
            except OSError:
                pass
    # uncommitted stray packs (a crashed earlier attempt): remove too
    for p in packs:
        if p.endswith(PACK_OK_SUFFIX) or p in committed or p == pack_name:
            continue
        if p + PACK_OK_SUFFIX in names:
            continue
        try:
            fs.remove(fs.join(dirpath, p))
        except OSError:
            pass
    return True
