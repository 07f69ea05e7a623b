#!/bin/bash
# Session-3 pending hardware measurements — run ONE AT A TIME on the real
# TPU once the axon worker is back (see docs/ROUND3.md "Session 3").
# Each measurement is its own process (watchdog: long-lived single
# programs can crash the worker); everything logs to tools/hw_s3_results/.
#
# Pending decisions this script feeds:
#   1. bench.py with the banded circulant conv (auto)  -> new 512^3 headline?
#   2. MIL_REG_BATCH_LS=1 vs 0 on reg128/fusion1tp     -> flip default?
#   3. MIL_REG_PYRAMID_MID=1 on reg128/fusion1tp       -> flip default?
#   4. batch20tp with frame-grouped factored MIP (auto) + caches
#   5. full single-sweep bench_all = number-of-record for BASELINE.md
set -u
cd "$(dirname "$0")/.."
OUT=tools/hw_s3_results
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <env...> -- cmd...
  local name=$1 to=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name (env: ${envs[*]:-none}) $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
  env "${envs[@]}" timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- rc=$rc" | tee -a "$OUT/summary.log"
  sleep 5
}

# 0. ACCURACY GATE: the banded circulant rewrite was exactness-tested on
# CPU (Pallas interpret mode) only — confirm the Mosaic-compiled kernel
# agrees with the XLA-FFT oracle on real hardware before timing it.
run accuracy_gate 2400 -- python tools/check_sep_accuracy.py

# 1. North star: 512^3 RL with the banded separable conv (auto policy).
run bench_512 2400 -- python bench.py

# 2. Batched line search A/B (reg128 then fusion1tp).
run reg128_base    2400 MIL_REG_BATCH_LS=0 -- python bench_all.py reg128
run reg128_bls     2400 MIL_REG_BATCH_LS=1 -- python bench_all.py reg128
run fusion_base    3000 MIL_REG_BATCH_LS=0 -- python bench_all.py fusion1tp
run fusion_bls     3000 MIL_REG_BATCH_LS=1 -- python bench_all.py fusion1tp

# 3. Mid-pyramid schedule A/B.
run reg128_mid     2400 MIL_REG_PYRAMID_MID=1 -- python bench_all.py reg128
run fusion_mid     3000 MIL_REG_PYRAMID_MID=1 -- python bench_all.py fusion1tp

# 4. Batch with grouped MIP frames + OTF/plan caches (all auto/default).
run batch20        3600 -- python bench_all.py batch20tp

# 5. Number-of-record: one process, all configs in sequence.
run sweep_all      7200 -- python bench_all.py

echo "ALL DONE $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
