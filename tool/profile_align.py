"""Alignment-solve profiler (real TPU): fused edge-residual kernel A/B.

Times the 300-iter Adam solve at the bench shapes (24 frames, 512x288,
swinstride-5 symmetrized => 220 edges) for the XLA fast path vs the Pallas
edge kernel, plus solution-quality cross-check against the fp32 polish.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--niter", type=int, default=300)
    ap.add_argument("--hw", type=int, nargs=2, default=(288, 512))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from align3r_tpu.alignment.scene import (build_scene, default_masks,
                                             global_alignment_loop)
    from align3r_tpu.inference.pairs import make_pairs

    n = args.frames
    H, W = args.hw
    pairs = make_pairs(n, "swinstride-5-noncyclic", symmetrize=True)
    E = len(pairs)
    key = jax.random.PRNGKey(0)
    output = {
        "view1": {"idx": np.array([p[0] for p in pairs])},
        "view2": {"idx": np.array([p[1] for p in pairs])},
        "pred1": {"pts3d": jax.random.normal(key, (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(key, (E, H, W))},
        "pred2": {"pts3d_in_other_view": jax.random.normal(key, (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(key, (E, H, W))},
    }
    cfg, data, params = build_scene(output)
    masks = default_masks(cfg, params)
    print(f"# frames={n} edges={E} A={H*W}")

    import dataclasses
    results = {}
    for name, precision, impl in [("xla fp32", "fp32", "xla"),
                                  ("xla bf16", "bf16", "xla"),
                                  ("kernel bf16", "bf16", "fused"),
                                  ("kernel mixed", "mixed", "fused")]:
        c = dataclasses.replace(cfg, fast_impl=impl)
        run = lambda: global_alignment_loop(params, masks, data, c, lr=0.01,
                                            niter=args.niter, precision=precision)
        p, losses = run()
        np.asarray(losses)
        t0 = time.perf_counter()
        p, losses = run()
        losses = np.asarray(losses)
        dt = time.perf_counter() - t0
        results[name] = (p, losses)
        print(f"{name:14s} {args.niter/dt:7.1f} it/s   final loss "
              f"{losses[-1]:.6f}")

    # solution quality: kernel-path pose params vs fp32 path
    ref = results["xla fp32"][0]
    for name in ("kernel bf16", "kernel mixed"):
        p = results[name][0]
        d = max(float(np.abs(np.asarray(p[k]) - np.asarray(ref[k])).max())
                for k in ("im_poses", "im_focals"))
        print(f"{name:14s} max |param - fp32| = {d:.5f}")


if __name__ == "__main__":
    main()
