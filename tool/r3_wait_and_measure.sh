#!/bin/bash
# Poll the TPU tunnel; when healthy, run the round-3 follow-up measurement
# batch (decoder unroll A/B, RAFT fp32-vs-bf16 profile, bench).
# Results land in /tmp/r3_*.txt; exits after one successful batch.
cd "$(dirname "$0")/.."
for i in $(seq 1 200); do
  if timeout 60 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" >/dev/null 2>&1; then
    echo "tunnel healthy at $(date -u +%H:%M:%S), running batch" | tee /tmp/r3_watch.log
    timeout 2400 python -u tool/profile_decode.py --which decode --reps 20 \
      2>&1 | tee /tmp/r3_decode.txt
    timeout 1800 python -u tool/profile_raft.py 2>&1 | tee /tmp/r3_raft2.txt
    timeout 3600 python -u bench.py 2>&1 | tee /tmp/r3_bench.txt
    echo "batch done at $(date -u +%H:%M:%S)" | tee -a /tmp/r3_watch.log
    exit 0
  fi
  echo "wedged at $(date -u +%H:%M:%S) (try $i)" >> /tmp/r3_watch.log
  sleep 300
done
echo "gave up" | tee -a /tmp/r3_watch.log
exit 1
