"""Per-stage RAFT cost profile on the real TPU (VERDICT r2 next #6).

Breaks the SEA-RAFT solve (bench's raft_flow_ms_per_img path,
models/raft.py) into its stages and times each pipelined, plus a
speed-of-light statement per stage:

  - fnet/cnet encoders (resnet_fpn)          — conv FLOP bound
  - corr pyramid build (one big matmul)      — MXU bound
  - corr lookup x iters (one-hot separable)  — MXU bound
  - update block (GRU/ConvNeXt) x iters      — conv FLOP bound
  - full solve                               — everything + scan overhead

Reference stage structure: third_party/RAFT/core/raft.py:207-291,
corr.py:63-111, update.py.

Usage: python tool/profile_raft.py [--size 512 288] [--iters 20] [--reps 10]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# shared pipelined-timing helper — ONE copy of the measurement-discipline
# logic (per-call syncs over the axon tunnel cost ~30 ms; see CLAUDE.md)
from profile_decode import timed_calls  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=(288, 512),
                    metavar=("H", "W"))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8,
                    help="images per call: amortizes the ~28 ms fixed "
                         "per-program dispatch cost (CLAUDE.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from align3r_tpu.models.raft import (init_raft, raft_forward, SPRING_M,
                                         resnet_fpn, build_corr_pyramid,
                                         lookup_corr, update_block,
                                         flow_head, conv, _coords_grid,
                                         pad_to_8)

    H, W = args.size
    B = args.batch
    cfg = SPRING_M
    key = jax.random.PRNGKey(0)
    params = init_raft(key, cfg)
    img1 = jax.random.uniform(key, (B, H, W, 3)) * 255
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W, 3)) * 255
    img1p, _ = pad_to_8(2 * (img1 / 255.0) - 1)
    img2p, _ = pad_to_8(2 * (img2 / 255.0) - 1)
    _, Hp, Wp, _ = img1p.shape
    h, w = Hp // 8, Wp // 8

    print(f"SEA-RAFT {cfg.__class__.__name__} {H}x{W} iters={args.iters} "
          f"batch={B} (grid {h}x{w}); per-img numbers in brackets")

    # ---- encoders (params passed as args, NOT closed over — closure
    # arrays embed as program constants and distort standalone timings).
    # Each stage is timed INSIDE a lax.scan of length --iters so the
    # per-dispatch tunnel floor amortizes (a single-dispatch fnet at
    # reps=10 read 54 ms where the whole 20-iter solve is 78 — the floor,
    # not the convs); the carry folds a scalar of the stage output back
    # into the input so XLA cannot CSE the repeated work.
    def scanned_stage(step_fn, n):
        def prog(p, x):
            def body(c, _):
                y = step_fn(p, c)
                s = sum(jnp.sum(t) for t in jax.tree.leaves(y))
                return c * (1.0 + 1e-20 * s.astype(c.dtype)), None
            c, _ = jax.lax.scan(body, x, None, length=n)
            return c
        return prog

    NS = args.iters
    fnet = lambda p, x: resnet_fpn(p["fnet"], x, cfg)
    cnet = lambda p, x: resnet_fpn(p["cnet"], jnp.concatenate([x, x], -1),
                                   cfg)
    dt_f = timed_calls(scanned_stage(fnet, NS), params, img1p,
                       reps=args.reps) / NS
    dt_c = timed_calls(scanned_stage(cnet, NS), params, img1p,
                       reps=args.reps) / NS
    print(f"fnet (x2 per pair)   {dt_f*1e3:8.3f} ms  [{dt_f/B*1e3:6.3f}]")
    print(f"cnet                 {dt_c*1e3:8.3f} ms  [{dt_c/B*1e3:6.3f}]")

    fmap1 = jax.jit(fnet)(params, img1p)
    fmap2 = jax.jit(fnet)(params, img2p)

    # ---- corr pyramid build (all levels are outputs so none is DCE'd;
    # fmap2 closed over, fmap1 is the perturbed carry)
    pyr_fn = lambda p, a: build_corr_pyramid(a, fmap2, cfg)
    dt_p = timed_calls(scanned_stage(pyr_fn, NS), params, fmap1,
                       reps=args.reps) / NS
    n = h * w
    flops_p = 2 * B * n * n * fmap1.shape[-1]
    print(f"corr pyramid         {dt_p*1e3:8.3f} ms  [{dt_p/B*1e3:6.3f}]  "
          f"({flops_p/dt_p/1e12:5.1f} TF/s)")

    pyramid = build_corr_pyramid(fmap1, fmap2, cfg)
    grid = _coords_grid(B, h, w)
    coords = grid + jax.random.normal(key, grid.shape) * 2

    # ---- corr lookup (scanned x iters, isolated)
    def lookups(coords):
        def body(c, _):
            corr = lookup_corr(pyramid, c, cfg)
            return c + 1e-3, jnp.sum(corr)
        c, s = jax.lax.scan(body, coords, None, length=args.iters)
        return s.sum()
    dt_l = timed_calls(lookups, coords, reps=args.reps)
    print(f"corr lookup x{args.iters:2d}     {dt_l*1e3:8.3f} ms  "
          f"({dt_l/args.iters/B*1e3:6.3f} ms/iter/img)")

    # ---- update block (scanned x iters, isolated)
    cn = jax.jit(cnet)(params, img1p)
    cn = conv(params["init_conv"], cn)
    net0, context = jnp.split(cn, 2, axis=-1)
    corr0 = lookup_corr(pyramid, coords, cfg)

    def updates(net):
        def body(nt, _):
            nt2 = update_block(params["update_block"], nt, context, corr0,
                               jnp.zeros_like(coords), cfg)
            fu = flow_head(params["flow_head"], nt2)
            return nt2, jnp.sum(fu)
        nt, s = jax.lax.scan(body, net, None, length=args.iters)
        return s.sum()
    dt_u = timed_calls(updates, net0, reps=args.reps)
    print(f"update block x{args.iters:2d}    {dt_u*1e3:8.3f} ms  "
          f"({dt_u/args.iters/B*1e3:6.3f} ms/iter/img)")

    # ---- full solve (fp32 vs bf16 compute)
    full = lambda p, a, b: raft_forward(p, a, b, cfg, iters=args.iters)
    dt_full = timed_calls(full, params, img1, img2, reps=args.reps)
    print(f"full solve           {dt_full*1e3:8.3f} ms  "
          f"[{dt_full/B*1e3:6.3f} ms/img]")
    full16 = lambda p, a, b: raft_forward(p, a, b, cfg, iters=args.iters,
                                          compute_dtype=jnp.bfloat16)
    dt_f16 = timed_calls(full16, params, img1, img2, reps=args.reps)
    print(f"full solve bf16      {dt_f16*1e3:8.3f} ms  "
          f"[{dt_f16/B*1e3:6.3f} ms/img]")
    acc = 2 * dt_f + dt_c + dt_p + dt_l + dt_u
    print(f"stage sum            {acc*1e3:8.3f} ms "
          f"(residual {max(dt_full-acc,0)*1e3:.3f} ms = upsample + scan glue)")


if __name__ == "__main__":
    main()
