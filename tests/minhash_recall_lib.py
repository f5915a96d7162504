"""Planted Jaccard-controlled corpus for minhash-banding recall
measurement (r7 verdict ask #1) — shared by the pinned floor test
(``tests/test_minhash_recall.py``) and the SCALE.md measurement script
(``scripts/minhash_recall_probe.py``).

Construction: a base document of ``M_TOKENS`` globally-unique tokens
has ``S = M_TOKENS − (k−1)`` distinct k-shingles. Substituting ``s``
well-separated tokens (positions ≥ k apart, ≥ k−1 from both ends)
replaces EXACTLY ``k·s`` shingles with ``k·s`` fresh ones, so the
(base, variant) shingle-set Jaccard is analytically exact:

    j(s) = (S − k·s) / (S + k·s)

With k=3, M=62 (S=60): s=1..4 → j = 0.9048 / 0.8182 / 0.7391 / 0.6667
— a grid straddling the banding curve's knee at the default
(n_hashes=16, bands=4). Unlike the r7 fixtures, the variants are
deliberately collision-UNVERIFIED: whether a pair shares a band is the
Bernoulli trial being measured, never pre-filtered. Tokens are unique
across documents, so non-planted pairs have Jaccard 0 and the exact
verify step removes any accidental band collision — the operator's
output is a SUBSET of the planted pairs by construction, and recall is
the only free variable.
"""

from __future__ import annotations

M_TOKENS = 62
SHINGLE_K = 3
#: token positions substituted, in order, for s = 1..4 — spaced 10
#: apart so the killed 3-shingle windows never overlap, and ≥ 2 from
#: both ends so each substitution kills exactly 3 shingles
REP_POSITIONS = (10, 20, 30, 40)
LEVEL_SUBS = (1, 2, 3, 4)


def exact_jaccard(s: int) -> float:
    """The analytically exact shingle-set Jaccard at s substitutions."""
    S = M_TOKENS - (SHINGLE_K - 1)
    return (S - SHINGLE_K * s) / (S + SHINGLE_K * s)


def planted_jaccard_corpus(spark, pairs_per_level: int):
    """(docs DF, {s: set[(base_id, variant_id)]}) — one variant per
    base, disjoint bases per level (pairs are independent Bernoulli
    trials for the banding measurement). Shipped via pandas/Arrow
    (a list-backed createDataFrame is pickled-RDD-backed — engine
    source lint forbids it; the same reasoning applies here)."""
    import pandas as pd

    ids: list[int] = []
    texts: list[str] = []
    planted: dict[int, set[tuple[int, int]]] = {}
    for li, s in enumerate(LEVEL_SUBS, start=1):
        pairs: set[tuple[int, int]] = set()
        for p in range(pairs_per_level):
            base_tokens = [f"b{li}p{p}t{i}" for i in range(M_TOKENS)]
            var_tokens = list(base_tokens)
            for kk in range(s):
                var_tokens[REP_POSITIONS[kk]] = f"r{li}p{p}s{kk}"
            bid = li * 1_000_000 + 2 * p
            vid = bid + 1
            ids += [bid, vid]
            texts += [" ".join(base_tokens), " ".join(var_tokens)]
            pairs.add((bid, vid))
        planted[s] = pairs
    pdf = pd.DataFrame({"doc_id": ids, "text": texts})
    return (
        spark.createDataFrame(pdf, "doc_id long, text string"),
        planted,
    )


def measured_recall(
    found_pairs: set[tuple[int, int]],
    planted: dict[int, set[tuple[int, int]]],
) -> dict[int, float]:
    """Per-level recall of ``found_pairs`` against the planted truth."""
    return {
        s: len(found_pairs & pairs) / len(pairs)
        for s, pairs in planted.items()
    }
