#!/bin/bash
# Poll the TPU tunnel; when healthy, run bench twice (bs=32 default) and
# exit. Results in /tmp/r3_bench3.txt / r3_bench4.txt.
cd "$(dirname "$0")/.."
for i in $(seq 1 200); do
  if timeout 60 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" >/dev/null 2>&1; then
    echo "tunnel healthy at $(date -u +%H:%M:%S)" >> /tmp/r3_watch.log
    timeout 3600 python -u bench.py 2>&1 | tee /tmp/r3_bench3.txt
    timeout 3600 python -u bench.py 2>&1 | tee /tmp/r3_bench4.txt
    echo "bench done at $(date -u +%H:%M:%S)" >> /tmp/r3_watch.log
    exit 0
  fi
  echo "wedged at $(date -u +%H:%M:%S) (bench wait $i)" >> /tmp/r3_watch.log
  sleep 240
done
exit 1
