#!/usr/bin/env bash
# Staged test runner (VERDICT r4 #9): the full suite exceeds a flat
# 10-minute budget because the slow tier compiles full closed-loop
# cycles; run it as budgeted tiers so regressions surface early and
# wall time is predictable.
#
#   tools/run_tests.sh quick   — unit + fast integration  (budget 5 min)
#   tools/run_tests.sh heavy   — compile-heavy unit tier   (budget 10 min)
#   tools/run_tests.sh slow    — closed-loop / golden tier (budget 25 min)
#   tools/run_tests.sh all     — all three, in that order
#
# Tier wall times measured 2026-08-20 on the 4-core CI box with a warm
# JAX persistent compile cache (first-ever run roughly doubles the slow
# tier):  quick 199 s, heavy 251 s, slow 1222 s.
# The persistent cache lives in JAX_COMPILATION_CACHE_DIR
# (default /tmp/qm_tpu_jax_cache) — keep it between runs.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/qm_tpu_jax_cache}"

tier="${1:-quick}"

run_tier() {
  local name="$1" budget="$2"; shift 2
  echo "=== tier: $name (budget ${budget}s) ==="
  local t0=$SECONDS
  timeout "$budget" python -m pytest tests/ -q "$@" || return $?
  echo "=== tier $name done in $((SECONDS - t0))s ==="
}

case "$tier" in
  quick) run_tier quick 480 -m "not slow and not heavy" ;;
  heavy) run_tier heavy 600 -m "heavy" ;;
  slow)  run_tier slow 1500 -m "slow" ;;
  all)
    run_tier quick 480 -m "not slow and not heavy"
    run_tier heavy 600 -m "heavy"
    run_tier slow 1500 -m "slow"
    ;;
  *) echo "usage: $0 [quick|heavy|slow|all]" >&2; exit 2 ;;
esac
