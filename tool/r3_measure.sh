#!/bin/bash
# Round-3 TPU measurement batch: run everything queued for a healthy-tunnel
# window, one process at a time, results to /tmp/r3_*.txt.
# Usage: bash tool/r3_measure.sh [quick]
set -x -o pipefail
cd "$(dirname "$0")/.."

timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" \
  || { echo "TUNNEL WEDGED"; exit 1; }

# 0) fast Mosaic lowering check
timeout 900 python -u tool/check_kernels.py 2>&1 | tee /tmp/r3_kernels.txt || exit 1

# 1) DPT head A/B (xla vs pipeline, both dtypes)
timeout 1800 python -u tool/profile_decode.py --which heads --reps 20 \
  2>&1 | tee /tmp/r3_heads.txt

# 2) engine sweep incl. head_conv_impl
timeout 2400 python -u tool/tune_engine.py --quick 2>&1 | tee /tmp/r3_tune.txt

# 3) RAFT stage profile
timeout 1500 python -u tool/profile_raft.py 2>&1 | tee /tmp/r3_raft.txt

# 4) training MFU
timeout 2400 python -u tool/profile_train.py 2>&1 | tee /tmp/r3_train.txt

# 5) bench
timeout 2400 python -u bench.py 2>&1 | tee /tmp/r3_bench.txt
