#!/bin/bash
# Poll the TPU tunnel; when healthy run: fast Mosaic lowering check (fail
# fast on the folded-softmax site change), bench x2 (bs=32 default), and
# the train profile (frozen-encoder backward now pruned).
cd "$(dirname "$0")/.."
for i in $(seq 1 300); do
  if timeout 60 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" >/dev/null 2>&1; then
    echo "tunnel healthy at $(date -u +%H:%M:%S)" >> /tmp/r3_watch.log
    timeout 1200 python -u tool/check_kernels.py 2>&1 | tee /tmp/r3_kernels.txt
    grep -q "ALL OK" /tmp/r3_kernels.txt || { echo "KERNEL CHECK FAILED" >> /tmp/r3_watch.log; exit 2; }
    timeout 3600 python -u bench.py 2>&1 | tee /tmp/r3_bench3.txt
    timeout 3600 python -u bench.py 2>&1 | tee /tmp/r3_bench4.txt
    timeout 2400 python -u tool/profile_train.py --bs 2 --reps 5 2>&1 | tee /tmp/r3_train_frozen.txt
    echo "bench+train done at $(date -u +%H:%M:%S)" >> /tmp/r3_watch.log
    exit 0
  fi
  echo "wedged at $(date -u +%H:%M:%S) (bench wait $i)" >> /tmp/r3_watch.log
  sleep 240
done
exit 1
