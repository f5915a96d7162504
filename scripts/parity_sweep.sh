#!/usr/bin/env bash
# Tri-scale + adversarial-config replay of the driver's correctness
# gate. The driver checks at sf0.01 under ITS session; these sweeps
# shake out what that single point cannot see:
#   - sf0.001: empty/degenerate group edge cases
#   - sf0.1:   tiny-data coincidences (r3: caught the ROUND(double,6)
#              engine-divergence in ema_user_values)
#   - foreign session: ANSI on, prime shuffle width, AQE off
# The sf0.1 run deselects the quadratic-ORACLE twins (engine side is
# blocked/bucketed; their naive DuckDB twins brute-force all pairs and
# take hours at 10x data) — list kept in tests/test_oracle_parity.py.
set -euo pipefail
cd "$(dirname "$0")/.."

QUADRATIC_ORACLES=(
  near_duplicate_pairs_docs ngram_jaccard_pairs_docs
  canonical_doc_selection dedup_components_docs fuzzy_match_customers
  simhash_near_dup_pairs embedding_near_dup_pairs geo_radius_join
  passage_dedup_docs
)
DESELECT=()
for q in "${QUADRATIC_ORACLES[@]}"; do
  DESELECT+=(--deselect "tests/test_oracle_parity.py::test_query_matches_oracle[$q]")
done

echo "== sweep 1/4: sf0.001 (full registry)"
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 \
  python -m pytest tests/test_oracle_parity.py -q

echo "== sweep 2/4: sf0.01 driver scale (full registry)"
python -m pytest tests/test_oracle_parity.py -q

echo "== sweep 3/4: sf0.1 (quadratic-oracle twins deselected)"
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 \
  python -m pytest tests/test_oracle_parity.py -q "${DESELECT[@]}"

echo "== sweep 4/4: foreign session (ANSI on, shuffle=7, AQE off) at sf0.01"
SPARK_GRAFT_TEST_EXTRA='{"spark.sql.ansi.enabled":"true","spark.sql.shuffle.partitions":"7","spark.sql.adaptive.enabled":"false"}' \
  python -m pytest tests/test_oracle_parity.py -q

echo "ALL SWEEPS GREEN"
