#!/bin/bash
# CI-style check tiers (VERDICT r3 next-step #6).
#
#   scripts/ci.sh smoke   — fast tier, target <2 min on the 1-CPU box:
#                           every test not listed in tests/slow_manifest.txt
#   scripts/ci.sh full    — the whole suite (~13-15 min on the 1-CPU box)
#   scripts/ci.sh slow    — only the slow tier (complement of smoke)
#
# Tests are tiered by measured duration (>=1s -> slow) via the manifest +
# the pytest_collection_modifyitems hook in tests/conftest.py; re-measure
# with `pytest --durations=0` after adding heavy tests and update the
# manifest.
set -e
cd "$(dirname "$0")/.."
case "${1:-smoke}" in
  smoke) exec python -m pytest tests/ -q -m "not slow" ;;
  slow)  exec python -m pytest tests/ -q -m slow ;;
  full)  exec python -m pytest tests/ -q ;;
  *) echo "usage: scripts/ci.sh [smoke|full|slow]" >&2; exit 2 ;;
esac
