#!/bin/bash
# Round-5 hardware measurements — run ONE process at a time on the real
# TPU (worker crashes if two TPU processes overlap). Logs to
# tools/hw_r5_results/. Usage: hw_measure_r5.sh phase1|phase2
#
# phase1 (the perf record, VERDICT r4 #1/#2/#3-row half):
#   1. bench.py                       -> confirm/explain the 102.9 headline
#   2. full bench_all.py single sweep -> the Round-5 single-sweep record
#      (incl. batch20tp_reg2/reg3, *_realpsf, fusion_gt_truth)
# phase2 (model + capability + A/B, VERDICT r4 #3/#6/#7/#5):
#   3. conv roofline re-derivation (tools/conv_roofline.py)
#   4. MIL_REG_FINISH_LEVEL=mid A/B on fusion1tp + reg128
#   5. beyond-HBM streamed decon + lowmem registration (tools/hw_beyond_hbm.py)
#   6. real-data E2E surrogate through the batch CLI (tools/e2e_surrogate.py)
set -u
cd "$(dirname "$0")/.."
OUT=tools/hw_r5_results
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <env...> -- cmd...
  local name=$1 to=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name (env: ${envs[*]:-none}) $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
  env "${envs[@]}" timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  grep -h '^{' "$OUT/$name.log" | tail -12 | tee -a "$OUT/summary.log"
  echo "--- rc=$rc" | tee -a "$OUT/summary.log"
  sleep 5
}

case "${1:-phase1}" in
phase1)
  run bench_512     2400 -- python bench.py
  run sweep_all    14400 -- python bench_all.py
  ;;
phase2)
  run roofline      2400 -- python tools/conv_roofline.py
  run fusion_mid    3000 MIL_REG_FINISH_LEVEL=mid -- python bench_all.py fusion1tp
  run reg128_mid    2400 MIL_REG_FINISH_LEVEL=mid -- python bench_all.py reg128
  run beyond_hbm    5400 -- python tools/hw_beyond_hbm.py
  run e2e_surrogate 5400 -- python tools/e2e_surrogate.py
  ;;
phase3)
  # clean A/B arms + reruns after the phase-2 findings:
  #  - reg128 base standalone (same conditions as reg128_mid) to decide
  #    the MIL_REG_FINISH_LEVEL default
  #  - batch_reg2 with the warm-method collapse (new default) vs the
  #    round-4 behavior (MIL_BATCH_WARM_METHOD=0)
  #  - roofline rerun (pipe-copy kernel needed the conv's VMEM limit)
  #  - beyond-HBM rerun (hbm_budget_bytes now falls back to the chip's
  #    known HBM size on backends without memory_stats)
  run reg128_base   2400 -- python bench_all.py reg128
  run batch_reg2_new 3600 -- python bench_all.py batch20tp_reg2
  run batch_reg2_old 3600 MIL_BATCH_WARM_METHOD=0 -- python bench_all.py batch20tp_reg2
  run roofline2     2400 -- python tools/conv_roofline.py
  run beyond_hbm2   5400 -- python tools/hw_beyond_hbm.py
  ;;
phase4)
  # Clean arms under the round-5 defaults (mid finisher default flip +
  # warm-method collapse reverted after the phase-3 A/B; phase 3's
  # batch_reg2_old arm was contaminated by the mid-default edit landing
  # mid-phase), plus the L-BFGS-only warm-finisher candidates for the
  # regMode-2 >= 50 tp/min bar:
  run batch_reg2_base2     3600 -- python bench_all.py batch20tp_reg2
  run batch_reg2_collapse  3600 MIL_BATCH_WARM_METHOD=collapse -- python bench_all.py batch20tp_reg2
  run batch_reg2_nofinish  3600 MIL_REG_GRAD_FINISH=0 -- python bench_all.py batch20tp_reg2
  run batch_reg2_nf_p8     3600 MIL_REG_GRAD_FINISH=0 MIL_LBFGS_PATIENCE=8 -- python bench_all.py batch20tp_reg2
  run batch_reg3_defaults  3600 -- python bench_all.py batch20tp_reg3
  run fusion1tp_defaults   3000 -- python bench_all.py fusion1tp
  run reg128_defaults      2400 -- python bench_all.py reg128
  ;;
*)
  echo "usage: $0 phase1|phase2|phase3|phase4" >&2; exit 2;;
esac
echo "PHASE DONE $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
