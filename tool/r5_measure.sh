#!/bin/bash
# Round-5 measurement batch (VERDICT r4 next-round items needing real TPU):
#   0. fail-fast Mosaic lowering check (+ non-gating chunked-edge check)
#   1. official bench with the adopted defaults (bs=32, head_group=4,
#      in-jit-scan RAFT metric) — target >= 150 pairs/s
#   2. chunked edge solve at n=300 with the STREAMED pack (the r4 OOM fix):
#      must complete and beat the 25.6 it/s XLA-bf16 baseline
#   3. profile_align --breakdown (the HTTP-413 fix) at default AND n=300
#   4. RAFT stage profile (reconcile the bench number with device time)
#   5. train step re-measure + device trace for bandwidth attribution
#   6. eval-tool TPU smokes (regression)
# Only ONE process may use the chip: run under the watcher (which holds
# /tmp/align3r_host.lock) or alone.
#
# Stages are RESUMABLE via /tmp/r5_<name>.done sentinels; `reset` clears.
set -x -o pipefail
cd "$(dirname "$0")/.."

if [ "$1" = reset ]; then rm -f /tmp/r5_*.done; fi

FAILED=0
stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -f "/tmp/r5_${name}.done" ]; then
    echo "stage ${name}: already done, skipping"
    return 0
  fi
  if timeout "$to" "$@" 2>&1 | tee "/tmp/r5_${name}.txt"; then
    touch "/tmp/r5_${name}.done"
  else
    echo "stage ${name}: FAILED (rc=$?)"
    FAILED=1
  fi
}

timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" \
  || { echo "TUNNEL WEDGED"; exit 1; }

stage kernels 900 python -u tool/check_kernels.py
[ -f /tmp/r5_kernels.done ] || { echo "KERNEL CHECK FAILED"; exit 1; }
stage kernels_chunked 900 python -u tool/check_kernels.py --only chunked_edge

# bench first: the headline number, while the window is freshest
if [ ! -f /tmp/r5_bench.done ]; then
  timeout 3300 python -u bench.py 2>&1 | tee /tmp/r5_bench.txt
  if grep -q '"ok": true' /tmp/r5_bench.txt; then
    touch /tmp/r5_bench.done
  else
    echo "stage bench: no fresh measurement"; FAILED=1
  fi
else
  echo "stage bench: already done, skipping"
fi

# the r4 OOM fix validation: n=300 chunked solve with the streamed pack
stage align_chunked 1800 python -u tool/profile_align.py --frames 300 --hw 144 256 --niter 60 --impls xla-bf16,kernel-bf16,kernel-mixed
# re-measure after the rb=32/eb=32/nc=16 chunked re-block (the rb=8/eb=8
# grid ran 26.6k steps and lost to XLA 7.8-vs-25.5 it/s, r5_align_chunked)
stage align_chunked2 1800 python -u tool/profile_align.py --frames 300 --hw 144 256 --niter 60 --impls xla-bf16,kernel-bf16,kernel-mixed
# the HTTP-413 fix validation: breakdown at default and chunked scales
stage align_breakdown 1800 python -u tool/profile_align.py --breakdown
stage align_breakdown_300 1800 python -u tool/profile_align.py --breakdown --frames 300 --hw 144 256 --niter 60
stage align 1800 python -u tool/profile_align.py

# RAFT drift reconcile: stage profile vs the new in-jit-scan bench metric
stage raft 1800 python -u tool/profile_raft.py --reps 10

# train re-measure (head_group=4 now also grips the fused train wrappers)
stage train_bs2 2400 python -u tool/profile_train.py --bs 2 --reps 5 --split
# device trace for the bandwidth attribution (VERDICT r4 next #5)
stage train_trace 2400 python -u tool/profile_train.py --bs 2 --reps 3 --trace /tmp/r5_ttrace
stage train_trace_parse 600 python -u tool/parse_trace.py /tmp/r5_ttrace

# bumped timeout: the tail-scan engine change adds one decode-scan compile
# per distinct tail length (bs=16 -> 8-scan + 6-scan, bs=32 -> 7-scan)
stage ab_bs 3600 python -u tool/ab_bs.py --reps 4

stage eval_smoke 5400 python -u tool/smoke_eval_tools.py --which all --niter 30

if [ "$FAILED" -ne 0 ]; then echo "R5 BATCH INCOMPLETE"; exit 1; fi
echo R5 BATCH DONE
