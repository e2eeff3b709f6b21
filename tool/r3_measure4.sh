#!/bin/bash
# Round-3 batch #4: engine sweep with the unroll knob (+bs=32), then a
# final bench with the winner (defaults already updated if the sweep
# changes the picture).
set -x -o pipefail
cd "$(dirname "$0")/.."

timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" \
  || { echo "TUNNEL WEDGED"; exit 1; }

timeout 3600 python -u tool/tune_engine.py --quick 2>&1 | tee /tmp/r3_sweep.txt
timeout 3600 python -u bench.py 2>&1 | tee /tmp/r3_bench2.txt
echo BATCH4 DONE
