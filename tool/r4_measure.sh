#!/bin/bash
# Round-4 measurement batch (VERDICT r3 next-round items needing real TPU):
#   0. fail-fast Mosaic lowering check
#   1. train-step re-measure with the pruned frozen-encoder backward
#      (+ fwd/bwd split, memory analysis, bs=4 retry, device trace)
#   2. official bench (now wedge-resilient)
#   3. interleaved bs=16-vs-32 engine default A/B
#   4. alignment-solve profile (257 vs ~300 it/s SOL gap)
#   5. eval-tool TPU smokes (depth_test, pose_test, flow-variant scene)
# Only ONE process may use the chip: run this alone.
set -x -o pipefail
cd "$(dirname "$0")/.."

timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" \
  || { echo "TUNNEL WEDGED"; exit 1; }

timeout 900 python -u tool/check_kernels.py 2>&1 | tee /tmp/r4_kernels.txt \
  || { echo "KERNEL CHECK FAILED"; exit 1; }

timeout 2400 python -u tool/profile_train.py --bs 2 --reps 5 --split 2>&1 | tee /tmp/r4_train_bs2.txt
timeout 2400 python -u tool/profile_train.py --bs 4 --reps 5 2>&1 | tee /tmp/r4_train_bs4.txt
timeout 2400 python -u tool/profile_train.py --bs 2 --reps 3 --trace /tmp/r4_ttrace 2>&1 | tee /tmp/r4_train_trace.txt

timeout 2700 python -u bench.py 2>&1 | tee /tmp/r4_bench.txt

timeout 2400 python -u tool/ab_bs.py --reps 4 2>&1 | tee /tmp/r4_ab_bs.txt

timeout 1800 python -u tool/profile_align.py 2>&1 | tee /tmp/r4_align.txt
timeout 1800 python -u tool/profile_align.py --breakdown 2>&1 | tee /tmp/r4_align_breakdown.txt

timeout 1800 python -u tool/profile_site.py --reps 30 2>&1 | tee /tmp/r4_site.txt

# whole-decode-program A/B of the winning-looking head group vs default
timeout 1800 python -u tool/profile_decode.py --which decode --reps 10 2>&1 | tee /tmp/r4_decode_hg1.txt
ALIGN3R_HEAD_GROUP=4 timeout 1800 python -u tool/profile_decode.py --which decode --reps 10 2>&1 | tee /tmp/r4_decode_hg4.txt

timeout 5400 python -u tool/smoke_eval_tools.py --which all --niter 30 2>&1 | tee /tmp/r4_eval_smoke.txt

echo R4 BATCH DONE
