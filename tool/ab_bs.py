"""Interleaved A/B of the inference-engine batch size (16 vs 32).

The r3 engine sweep committed BATCH=32 on a same-run 136.9-vs-135.1
pairs/s reading — ~1% apart under ~10% run-to-run tunnel variance
(VERDICT r3 Weak #4). This interleaves the two configs inside ONE process
and window (compile both first, then alternate timed reps) so tunnel drift
hits both equally, and prints per-rep + mean/std so the default is either
confirmed or reverted on evidence.

Usage: python tool/ab_bs.py [--reps 4] [--frames 24]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from align3r_tpu.models.config import VIT_L_512
    from align3r_tpu.models.align3r import init_align3r
    from align3r_tpu.inference.pairs import make_pairs
    from align3r_tpu.inference.engine import inference

    H, W = 288, 512
    cfg = VIT_L_512
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (args.frames, H, W, 3), jnp.float32)
    priors = jax.random.uniform(jax.random.PRNGKey(2),
                                (args.frames, H, W, 3))
    pairs = make_pairs(args.frames, "swinstride-5-noncyclic", symmetrize=True)
    print(f"{len(pairs)} pairs, interleaving bs={args.batches} x "
          f"{args.reps} reps", flush=True)

    def run(bs):
        out = inference(pairs, params, cfg, imgs, priors, batch_size=bs)
        np.asarray(jnp.sum(out["pred1"]["pts3d"])
                   + jnp.sum(out["pred2"]["conf"]))

    for bs in args.batches:   # compile everything before any timing
        run(bs)
        print(f"bs={bs} compiled", flush=True)

    times = {bs: [] for bs in args.batches}
    for rep in range(args.reps):
        for bs in args.batches:
            t0 = time.perf_counter()
            run(bs)
            dt = time.perf_counter() - t0
            times[bs].append(len(pairs) / dt)
            print(f"rep {rep} bs={bs}: {len(pairs)/dt:7.1f} pairs/s",
                  flush=True)

    for bs in args.batches:
        v = np.array(times[bs])
        print(f"bs={bs}: mean {v.mean():7.1f} pairs/s  std {v.std():5.1f}  "
              f"({list(np.round(v, 1))})")


if __name__ == "__main__":
    main()
