#!/bin/bash
# Round-5b measurement batch (post-container-restart continuation):
#   0. fail-fast Mosaic lowering check (now incl. the pack permute kernel
#      + chunked-edge section)
#   1. pack A/B: streamed gather pack vs the gather-free fast pack
#      (profile_align --pack-only) at bench and n=300 scales — the r5
#      streamed pack measured 0.87 s at n=300 (over half the end-to-end
#      time of a 60-iter chunked solve)
#   2. n=300 chunked solve end-to-end with the fast pack (compare 37.8
#      it/s r5 / XLA 25.5)
#   3. default-scene align profile (compare 312 it/s kernel-bf16)
#   4. official bench with shipped defaults (compare 151.0 pairs/s)
# Only ONE process may use the chip: run under the watcher (which holds
# /tmp/align3r_host.lock) or alone.
#
# Stages are RESUMABLE via /tmp/r5b_<name>.done sentinels; `reset` clears.
set -x -o pipefail
cd "$(dirname "$0")/.."

if [ "$1" = reset ]; then rm -f /tmp/r5b_*.done; fi

FAILED=0
stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -f "/tmp/r5b_${name}.done" ]; then
    echo "stage ${name}: already done, skipping"
    return 0
  fi
  if timeout "$to" "$@" 2>&1 | tee "/tmp/r5b_${name}.txt"; then
    touch "/tmp/r5b_${name}.done"
  else
    echo "stage ${name}: FAILED (rc=$?)"
    FAILED=1
  fi
}

timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" \
  || { echo "TUNNEL WEDGED"; exit 1; }

stage kernels 900 python -u tool/check_kernels.py
[ -f /tmp/r5b_kernels.done ] || { echo "KERNEL CHECK FAILED"; exit 1; }
stage kernels_chunked 900 python -u tool/check_kernels.py --only chunked_edge

stage pack_default 1200 python -u tool/profile_align.py --pack-only
stage pack_300 1800 python -u tool/profile_align.py --pack-only --frames 300 --hw 144 256

stage align_chunked 1800 python -u tool/profile_align.py --frames 300 --hw 144 256 --niter 60 --impls xla-bf16,kernel-bf16,kernel-mixed
stage align 1800 python -u tool/profile_align.py

# bench last: the headline number with everything else confirmed
if [ ! -f /tmp/r5b_bench.done ]; then
  timeout 3300 python -u bench.py 2>&1 | tee /tmp/r5b_bench.txt
  if grep -q '"ok": true' /tmp/r5b_bench.txt; then
    touch /tmp/r5b_bench.done
  else
    echo "stage bench: no fresh measurement"; FAILED=1
  fi
else
  echo "stage bench: already done, skipping"
fi

if [ "$FAILED" -ne 0 ]; then echo "R5B BATCH INCOMPLETE"; exit 1; fi
echo R5B BATCH DONE
