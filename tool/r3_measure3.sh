#!/bin/bash
# Round-3 batch #3 (post code-review fixes):
#   1. fused edge-loss solve compile+run at n=64/200/256 (the raised
#      _VMEM_LIMIT must hold the scene gate's n<=256 promise on real TPU)
#   2. RAFT fp32-vs-bf16 A/B with the genuinely-bf16 corr pyramid
#   3. train-step MFU at bs=2 vs bs=4
set -x -o pipefail
cd "$(dirname "$0")/.."

timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" \
  || { echo "TUNNEL WEDGED"; exit 1; }

timeout 2400 python -u - 2>&1 <<'EOF' | tee /tmp/r3_edge_n.txt
import time
import numpy as np
import jax
from align3r_tpu.alignment.scene import (build_scene, default_masks,
                                         global_alignment_loop,
                                         resolve_fast_impl, fused_supported)

def fake_output(n, H=24, W=32):
    rng = np.random.default_rng(0)
    ei = np.arange(n - 1); ej = (ei + 1) % n
    E = len(ei)
    mk = lambda: rng.random((E, H, W, 3), np.float32) + 0.5
    cf = lambda: rng.random((E, H, W), np.float32) * 3 + 1.01
    return {"view1": {"idx": ei}, "view2": {"idx": ej},
            "pred1": {"pts3d": mk(), "conf": cf()},
            "pred2": {"pts3d_in_other_view": mk(), "conf": cf()}}

for n in (64, 200, 256):
    cfg, data, params = build_scene(fake_output(n))
    print(f"n={n}: fast_impl={resolve_fast_impl(cfg)} "
          f"fused_supported={fused_supported(cfg)}", flush=True)
    masks = default_masks(cfg, params)
    t0 = time.time()
    p, losses = global_alignment_loop(params, masks, data, cfg, niter=50)
    l = np.asarray(losses)
    print(f"n={n}: 50-iter solve ok in {time.time()-t0:.1f}s "
          f"(loss {l[0]:.4f} -> {l[-1]:.4f}, finite={np.isfinite(l).all()})",
          flush=True)
print("EDGE-N OK")
EOF

timeout 1800 python -u tool/profile_raft.py 2>&1 | tee /tmp/r3_raft3.txt

timeout 2400 python -u tool/profile_train.py --bs 2 --reps 5 2>&1 | tee /tmp/r3_train_bs2.txt
timeout 2400 python -u tool/profile_train.py --bs 4 --reps 5 2>&1 | tee /tmp/r3_train_bs4.txt
echo BATCH3 DONE
