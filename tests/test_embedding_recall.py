"""Planted θ-controlled recall measurement for embedding near-dup LSH
(r6 verdict ask #2): the registry twin's oracle green is on an EMPTY
result (testdata embeddings are near-random — max pairwise cosine
≈0.5), so the operator's positive path is proven here instead, against
a planted ground truth with exactly-controlled cosines.

Construction: for a unit base vector v and target cosine c, the
partner ``c·v + sqrt(1-c²)·u`` (u unit, u⊥v) has cosine EXACTLY c with
v — so recall can be measured per cosine level (.90/.95/.99) against a
driver-side numpy brute-force exact twin, and compared with the
closed-form SRP prediction ``1-(1-(1-θ/π)^p)^t``.
"""

from __future__ import annotations

import numpy as np
import pytest

from nursinghome_data_pipeline_spark.operators.similarity import (
    auto_lsh_planes,
    auto_lsh_tables,
    embedding_near_duplicate_pairs,
    srp_collision_prob,
)

#: disjoint base chunks per cosine level — partners planted on the
#: SAME base at two levels would be mutually similar (cosine ≈ c1·c2),
#: creating unplanned near-threshold pairs
_LEVELS = [(0.90, 0, 150), (0.95, 150, 300), (0.99, 300, 450)]
_DIM = 64


def _planted_corpus(spark, sf_dir):
    """Testdata embeddings (unit-normalized) + one planted partner per
    base vector in each level's chunk. Returns (spark DF, numpy ids,
    numpy float32 matrix, planted pair-set per level)."""
    import pandas as pd

    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    ids = base["vec_id"].to_numpy()
    vecs = np.array([np.array(v, dtype=np.float64) for v in base["embedding"]])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    rng = np.random.default_rng(20260815)
    all_ids = list(ids)
    all_vecs = list(vecs)
    planted: dict[float, set[tuple[int, int]]] = {}
    for li, (c, lo, hi) in enumerate(_LEVELS):
        pairs = set()
        for i in range(lo, min(hi, len(ids))):
            v = vecs[i]
            g = rng.standard_normal(_DIM)
            u = g - (g @ v) * v
            u = u / np.linalg.norm(u)
            partner = c * v + np.sqrt(1.0 - c * c) * u
            pid = int(ids[i]) + 1_000_000 * (li + 1)
            all_ids.append(pid)
            all_vecs.append(partner)
            pairs.add((min(int(ids[i]), pid), max(int(ids[i]), pid)))
        planted[c] = pairs
    mat = np.array(all_vecs, dtype=np.float32)
    pdf = pd.DataFrame(
        {"vec_id": all_ids, "embedding": [list(map(float, v)) for v in mat]}
    )
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    return df, np.array(all_ids), mat, planted


def _exact_pairs(ids: np.ndarray, mat: np.ndarray, threshold: float):
    """Driver-side brute-force cosine twin (float64 on the same
    float32-rounded values the operator reads)."""
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    out = set()
    n = len(ids)
    ii, jj = np.where(np.triu(sims >= threshold, k=1))
    for i, j in zip(ii, jj):
        a, b = int(ids[i]), int(ids[j])
        out.add((min(a, b), max(a, b)))
    return out


def _lsh_pairs(df, **kw):
    rows = embedding_near_duplicate_pairs(
        df, dim=_DIM, **kw
    ).collect()
    return {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in rows
    }


def test_auto_sizing_arithmetic_pinned():
    """The auto formulas are pure driver arithmetic — pin them."""
    # one plane per doubling past the target population, floor 4
    assert auto_lsh_planes(500) == 4
    assert auto_lsh_planes(2_000) == 5
    assert auto_lsh_planes(60_000) == 10
    assert auto_lsh_planes(64 * (1 << 20)) == 20
    assert auto_lsh_planes(0) == 4
    assert auto_lsh_planes(10**12) == 24  # hi cap
    assert auto_lsh_planes(2_000, target_bucket_pop=16) == 7
    # SRP collision identity at the threshold boundary
    assert srp_collision_prob(1.0, 8) == pytest.approx(1.0)
    assert srp_collision_prob(0.0, 1) == pytest.approx(0.5)
    r1 = srp_collision_prob(0.95, 10)
    assert r1 == pytest.approx((1 - np.arccos(0.95) / np.pi) ** 10)
    # OR-construction: smallest t with 1-(1-r1)^t >= target
    t = auto_lsh_tables(10, 0.95, recall_target=0.9)
    assert t == 6
    assert 1 - (1 - r1) ** t >= 0.9 > 1 - (1 - r1) ** (t - 1)
    # already above target -> single table; cap binds on hard settings
    assert auto_lsh_tables(2, 0.99) == 1  # r1 = 0.955^2 = 0.912 >= 0.9
    assert auto_lsh_tables(24, 0.90, recall_target=0.9) == 32


def test_auto_n_planes_matches_explicit(spark, sf_dir):
    """r6 verdict pin: n_planes='auto' must be bit-identical to the
    explicit call with the value auto resolves to — via the n_rows
    fast path AND via the internal count() fallback."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    p = auto_lsh_planes(n)
    explicit = embedding_near_duplicate_pairs(
        emb, dim=_DIM, threshold=0.5, n_planes=p
    ).collect()
    via_rows = embedding_near_duplicate_pairs(
        emb, dim=_DIM, threshold=0.5, n_planes="auto", n_rows=n
    ).collect()
    via_count = embedding_near_duplicate_pairs(
        emb, dim=_DIM, threshold=0.5, n_planes="auto"
    ).collect()
    key = lambda r: (r.id_a, r.id_b)  # noqa: E731
    assert sorted(via_rows, key=key) == sorted(explicit, key=key)
    assert sorted(via_count, key=key) == sorted(explicit, key=key)


def test_single_table_multi_table_and_exactness(spark, sf_dir):
    """Structural guarantees on the planted corpus: every returned
    pair is exactly verified (subset of the brute-force twin), more
    tables never lose pairs (OR-construction is monotone), and the
    multi-table row set equals the union over its per-seed single
    tables."""
    df, ids, mat, _pl = _planted_corpus(spark, sf_dir)
    thr = 0.898
    exact = _exact_pairs(ids, mat, thr)
    one = _lsh_pairs(df, threshold=thr, n_planes=6, n_tables=1)
    four = _lsh_pairs(df, threshold=thr, n_planes=6, n_tables=4)
    assert one <= four <= exact
    union = set()
    for j in range(4):
        union |= _lsh_pairs(df, threshold=thr, n_planes=6, seed=42 + j)
    assert four == union


def test_planted_recall_matches_srp_prediction(spark, sf_dir):
    """The headline measurement: per cosine level, recall over the
    planted pairs tracks the closed-form ``1-(1-(1-θ/π)^p)^t`` within
    sampling tolerance (150 Bernoulli trials/level → 3σ ≈ 0.12), and
    n_tables='auto' clears its recall_target. The exact twin must
    find every planted pair (the planted cosine sits above the query
    threshold by construction)."""
    df, ids, mat, planted = _planted_corpus(spark, sf_dir)
    n = int(df.count())
    p = auto_lsh_planes(n)  # 500+450 rows -> 4 planes
    for c, pairs in planted.items():
        thr = c - 0.002  # float32 rounding can nudge a planted cosine
        exact = _exact_pairs(ids, mat, thr)
        assert pairs <= exact, f"exact twin missed planted pairs at {c}"
        t_auto = auto_lsh_tables(p, thr, recall_target=0.9)
        for t in sorted({1, 2, t_auto}):
            got = _lsh_pairs(
                df, threshold=thr, n_planes=p, n_tables=t, n_rows=n
            )
            recall = len(got & pairs) / len(pairs)
            r1 = srp_collision_prob(c, p)
            predicted = 1 - (1 - r1) ** t
            assert abs(recall - predicted) < 0.12, (
                f"cosine {c}, t={t}: recall {recall:.3f} vs "
                f"predicted {predicted:.3f}"
            )
        got_auto = _lsh_pairs(
            df,
            threshold=thr,
            n_planes=p,
            n_tables="auto",
            recall_target=0.9,
            n_rows=n,
        )
        recall_auto = len(got_auto & pairs) / len(pairs)
        assert recall_auto >= 0.9 - 0.08, (
            f"cosine {c}: auto-table recall {recall_auto:.3f} "
            "misses its target beyond sampling tolerance"
        )
