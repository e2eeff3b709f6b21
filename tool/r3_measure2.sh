#!/bin/bash
# Round-3 follow-up TPU measurements (run in the next healthy window):
#   - decoder scan unroll A/B (profile_decode --which decode)
#   - batched RAFT stage profile (dispatch-floor-free)
set -x -o pipefail
cd "$(dirname "$0")/.."

timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" \
  || { echo "TUNNEL WEDGED"; exit 1; }

timeout 2400 python -u tool/profile_decode.py --which decode --reps 20 \
  2>&1 | tee /tmp/r3_decode.txt

timeout 1800 python -u tool/profile_raft.py 2>&1 | tee /tmp/r3_raft2.txt
