#!/bin/bash
# Round-5c measurement batch (runs AFTER r5b): head_group frontier past 4
# and the VERDICT-r4 "re-run tune_engine to confirm the combination" item.
#   1. decoder-site hg sweep incl. 6/12 (site-level, 12 decoder heads)
#   2. whole-decode-program A/B: hg=4 (default) vs 6 vs 12 (env knob; the
#      encoder falls back per-site for 6/12 but --which decode never runs it)
#   3. tune_engine --quick: end-to-end confirm of bs=32+fused+u3 and the
#      hg rows (incl. the new 6/12 rows with their encoder-fallback caveat)
# Only ONE process may use the chip: run under flock /tmp/align3r_host.lock.
# Stages are RESUMABLE via /tmp/r5c_<name>.done sentinels; `reset` clears.
set -x -o pipefail
cd "$(dirname "$0")/.."

if [ "$1" = reset ]; then rm -f /tmp/r5c_*.done; fi

FAILED=0
stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -f "/tmp/r5c_${name}.done" ]; then
    echo "stage ${name}: already done, skipping"
    return 0
  fi
  if timeout "$to" "$@" 2>&1 | tee "/tmp/r5c_${name}.txt"; then
    touch "/tmp/r5c_${name}.done"
  else
    echo "stage ${name}: FAILED (rc=$?)"
    FAILED=1
  fi
}

timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" \
  || { echo "TUNNEL WEDGED"; exit 1; }

stage site_hg 1200 python -u tool/profile_site.py --groups 1,4,6,12 --reps 30
stage decode_hg6 1800 env ALIGN3R_HEAD_GROUP=6 python -u tool/profile_decode.py --which decode --reps 10
stage decode_hg12 1800 env ALIGN3R_HEAD_GROUP=12 python -u tool/profile_decode.py --which decode --reps 10
stage tune_quick 3600 python -u tool/tune_engine.py --quick

if [ "$FAILED" -ne 0 ]; then echo "R5C BATCH INCOMPLETE"; exit 1; fi
echo R5C BATCH DONE
