"""Engine configuration sweep (real TPU): find the fastest inference
settings (decode batch size, attention impl, head dtype, stacked heads).

Runs the same workload as bench.py (24 frames, swinstride-5 symmetrized,
512x288 ViT-L) once per configuration and prints a ranked table. Use the
winner to set bench/engine defaults.

Usage: python tool/tune_engine.py [--frames 24] [--quick]
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--quick", action="store_true",
                    help="only the most promising configs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from align3r_tpu.models.config import VIT_L_512
    from align3r_tpu.models.align3r import init_align3r
    from align3r_tpu.inference.pairs import make_pairs
    from align3r_tpu.inference.engine import inference

    cfg = VIT_L_512
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    H, W = 288, 512
    n = args.frames
    imgs = jax.random.normal(jax.random.PRNGKey(1), (n, H, W, 3), jnp.float32)
    priors = jax.random.uniform(jax.random.PRNGKey(2), (n, H, W, 3))
    pairs = make_pairs(n, "swinstride-5-noncyclic", symmetrize=True)
    print(f"# {len(pairs)} pairs, {n} frames @ {W}x{H}")

    if args.quick:
        grid = [
            (8, "fused", jnp.bfloat16, False, "xla", 3),
            (16, "fused", jnp.bfloat16, False, "xla", 1),
            (16, "fused", jnp.bfloat16, False, "xla", 3),
            (32, "fused", jnp.bfloat16, False, "xla", 3),
        ]
    else:
        grid = [g + (3,) for g in itertools.product(
            (8, 16, 32), ("auto", "fused"), (jnp.bfloat16, jnp.float32),
            (False,), ("xla", "pipeline"))] + [
            (16, "fused", jnp.bfloat16, False, "xla", 1),
            (16, "fused", jnp.bfloat16, False, "xla", 6),
            (8, "fused", jnp.bfloat16, True, "xla", 3),
            (16, "fused", jnp.bfloat16, True, "xla", 3)]

    # head_group sweep at the winning-shape config (the knob is a module
    # default, not an inference() arg): (bs, attn, hd, sh, hci, unroll, hg)
    # hg=6/12 divide the decoder's 12 heads but not the encoder's 16, so
    # the encoder falls back per-site (env-default path) — the rows isolate
    # whether grouping decode heads past 4 still pays.
    from align3r_tpu.ops import fused_site as fs
    grid = [g + (1,) for g in grid] + [
        (16, "fused", jnp.bfloat16, False, "xla", 3, 2),
        (16, "fused", jnp.bfloat16, False, "xla", 3, 4),
        (32, "fused", jnp.bfloat16, False, "xla", 3, 4),
        (32, "fused", jnp.bfloat16, False, "xla", 3, 6),
        (32, "fused", jnp.bfloat16, False, "xla", 3, 12)]

    results = []
    for bs, attn, hd, sh, hci, unroll, hg in grid:
        label = (f"bs={bs:2d} attn={attn:5s} heads="
                 f"{np.dtype(hd).name:8s} stacked={int(sh)} conv={hci} "
                 f"u={unroll} hg={hg}")
        # the engine keys every jit cache on the module default (static
        # head_group discriminator, engine.py), so flipping it here
        # retraces the decode/encode programs instead of silently re-running
        # the cached hg=1 executables
        fs._DEFAULT_HEAD_GROUP = hg
        try:
            def run():
                out = inference(pairs, params, cfg, imgs, priors,
                                batch_size=bs, head_dtype=hd,
                                attn_impl=attn, stacked_heads=sh,
                                head_conv_impl=hci, unroll=unroll)
                np.asarray(jnp.sum(out["pred1"]["pts3d"])
                           + jnp.sum(out["pred2"]["conf"]))

            run()  # compile
            t0 = time.perf_counter()
            run()
            run()
            dt = (time.perf_counter() - t0) / 2
            pps = len(pairs) / dt
            results.append((pps, label))
            print(f"{label}  {pps:7.1f} pairs/s")
        except Exception as e:  # noqa: BLE001
            print(f"{label}  FAILED: {repr(e)[:120]}")

    results.sort(reverse=True)
    print("\n# ranked:")
    for pps, label in results:
        print(f"{pps:7.1f} pairs/s  {label}")


if __name__ == "__main__":
    main()
