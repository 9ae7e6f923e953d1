#!/usr/bin/env bash
# Fast pre-ship gate (~3 min): import sanity, driver-contract smoke,
# oracle parity. Full suite: python -m pytest tests/ -q (~6 min).
set -euo pipefail
cd "$(dirname "$0")/.."
python - <<'PY'
import __spark_entry__ as e
qs, osql = e.queries(), e.oracle_sql()
missing = sorted(set(qs) - set(osql))
assert not missing, f"queries without oracles: {missing}"
print(f"contract ok: {len(qs)} queries, {len(osql)} oracles")
PY
python -m pytest tests/test_oracle_parity.py -q
