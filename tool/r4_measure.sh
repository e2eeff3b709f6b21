#!/bin/bash
# Round-4 measurement batch (VERDICT r3 next-round items needing real TPU):
#   0. fail-fast Mosaic lowering check
#   1. train-step re-measure with the pruned frozen-encoder backward
#      (+ fwd/bwd split, memory analysis, bs=4 retry, device trace)
#   2. official bench (now wedge-resilient)
#   3. interleaved bs=16-vs-32 engine default A/B
#   4. alignment-solve profile (257 vs ~300 it/s SOL gap)
#   5. fused-site head_group A/B (site-level + whole decode program)
#   6. eval-tool TPU smokes (depth_test, pose_test, flow-variant scene)
# Only ONE process may use the chip: run this alone.
#
# Stages are RESUMABLE: each records a /tmp/r4_<name>.done sentinel on
# success and is skipped on re-runs, so a mid-batch tunnel wedge only costs
# the unfinished stages at the next healthy window (the watcher retries the
# whole script while any stage is missing). `reset` clears the sentinels.
set -x -o pipefail
cd "$(dirname "$0")/.."

if [ "$1" = reset ]; then rm -f /tmp/r4_*.done; fi

FAILED=0
stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -f "/tmp/r4_${name}.done" ]; then
    echo "stage ${name}: already done, skipping"
    return 0
  fi
  if timeout "$to" "$@" 2>&1 | tee "/tmp/r4_${name}.txt"; then
    touch "/tmp/r4_${name}.done"
  else
    echo "stage ${name}: FAILED (rc=$?)"
    FAILED=1
  fi
}

timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" \
  || { echo "TUNNEL WEDGED"; exit 1; }

stage kernels 900 python -u tool/check_kernels.py
[ -f /tmp/r4_kernels.done ] || { echo "KERNEL CHECK FAILED"; exit 1; }
# chunked edge kernel check is NON-gating (a lowering failure in the new
# n>256 path must not abort the train/bench stages)
stage kernels_chunked 900 python -u tool/check_kernels.py --only chunked_edge

stage train_bs2 2400 python -u tool/profile_train.py --bs 2 --reps 5 --split
stage train_remat 2400 python -u tool/profile_train.py --bs 2 --reps 5 --remat-ab
stage train_bs4 2400 python -u tool/profile_train.py --bs 4 --reps 5
stage train_trace 2400 python -u tool/profile_train.py --bs 2 --reps 3 --trace /tmp/r4_ttrace

# headroom >= bench BUDGET_S(1500) + probe(45) + inner(1500): a final
# attempt may legitimately start just inside the budget and run 1545s more.
# bench.py exits 0 even on a persistent wedge (structured last-good record),
# so gate its sentinel on an actual fresh measurement ("ok": true).
if [ ! -f /tmp/r4_bench.done ]; then
  timeout 3300 python -u bench.py 2>&1 | tee /tmp/r4_bench.txt
  if grep -q '"ok": true' /tmp/r4_bench.txt; then
    touch /tmp/r4_bench.done
  else
    echo "stage bench: no fresh measurement"; FAILED=1
  fi
else
  echo "stage bench: already done, skipping"
fi

stage ab_bs 2400 python -u tool/ab_bs.py --reps 4

stage align 1800 python -u tool/profile_align.py
stage align_breakdown 1800 python -u tool/profile_align.py --breakdown
# image-chunked fused kernel (n>256, new in r4): throughput + solution
# parity (fp32 XLA baseline skipped: its (E,A,3) fp32 intermediates at
# n=300 approach HBM)
stage align_chunked 1800 python -u tool/profile_align.py --frames 300 --hw 144 256 --niter 60 --impls xla-bf16,kernel-bf16,kernel-mixed

stage site 1800 python -u tool/profile_site.py --reps 30

# whole-decode-program A/B of the winning-looking head group vs default
stage decode_hg1 1800 python -u tool/profile_decode.py --which decode --reps 10
stage decode_hg2 1800 env ALIGN3R_HEAD_GROUP=2 python -u tool/profile_decode.py --which decode --reps 10
stage decode_hg4 1800 env ALIGN3R_HEAD_GROUP=4 python -u tool/profile_decode.py --which decode --reps 10
# device trace of the engine-default decode loop: the VPU-vs-MXU occupancy
# evidence for the per-site SOL-gap question (VERDICT r3 next #4)
stage decode_trace 1800 python -u tool/profile_decode.py --which none --trace /tmp/r4_dtrace

stage eval_smoke 5400 python -u tool/smoke_eval_tools.py --which all --niter 30

if [ "$FAILED" -ne 0 ]; then echo "R4 BATCH INCOMPLETE"; exit 1; fi
echo R4 BATCH DONE
