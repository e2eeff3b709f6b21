"""Training-step MFU statement on the real TPU (VERDICT r2 next #8).

Times the full ViT-L train step (donated state, remat, adamw — the
training/train.py hot path) pipelined, pulls XLA's own FLOP count from the
compiled module (cost_analysis), and prints ms/step, achieved TF/s, and
MFU against the v5e bf16 peak. Also A/Bs attn_impl auto+remat vs
fused+no-remat so the "fused sites gain nothing in training" question
(VERDICT Weak #7) has numbers.

Usage: python tool/profile_train.py [--size 288 512] [--bs 2] [--reps 5]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_TFLOPS = 197.0  # bf16 peak per chip (public v5e spec)
V5E_HBM_GBPS = 819.0     # HBM bandwidth per chip (public v5e spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=(288, 512),
                    metavar=("H", "W"))
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config smoke (CPU-safe)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (must be set before any "
                         "backend touch; env overrides don't work here)")
    ap.add_argument("--no-cast-frozen", action="store_true",
                    help="keep frozen kernels in fp32 (default matches the "
                         "train driver: bf16 storage, bitwise-identical "
                         "forward, ~600 MB HBM back on ViT-L)")
    ap.add_argument("--head-ab", action="store_true",
                    help="add a bf16-DPT-heads row (conv pyramid bf16, "
                         "final conv+postprocess fp32): the bandwidth "
                         "lever on the HBM-bound step (r5 roofline)")
    ap.add_argument("--remat-ab", action="store_true",
                    help="add a remat='dots' row (save weight-matmul "
                         "outputs, recompute only elementwise/attention in "
                         "the backward) to the attn/remat A/B")
    ap.add_argument("--split", action="store_true",
                    help="also time fwd-only and fwd+bwd programs to split "
                         "the step into forward / backward / optimizer")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the full step "
                         "into DIR and print the device-time summary")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from align3r_tpu.models.config import VIT_L_512, TINY_TEST, Align3RConfig
    import dataclasses
    from align3r_tpu.models.align3r import init_align3r
    from align3r_tpu.training.step import (create_train_state, make_optimizer,
                                           make_lr_schedule, make_train_step)

    H, W = args.size
    if args.tiny:
        cfg = dataclasses.replace(TINY_TEST, img_size=(32, 48))
        H, W = 32, 48
    else:
        cfg = dataclasses.replace(VIT_L_512, img_size=(H, W))
    key = jax.random.PRNGKey(0)
    params = init_align3r(key, cfg)
    if not args.no_cast_frozen:
        from align3r_tpu.training.step import cast_frozen_kernels
        params = cast_frozen_kernels(params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    p_bytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize
                  for p in jax.tree.leaves(params))
    print(f"config {cfg.enc_embed_dim}x{cfg.enc_depth}/{cfg.dec_embed_dim}"
          f"x{cfg.dec_depth} {H}x{W} bs={args.bs}  params {n_params/1e6:.1f}M"
          f" ({p_bytes/2**30:.2f} GiB stored,"
          f" cast_frozen={'off' if args.no_cast_frozen else 'on'})")

    lr = make_lr_schedule(1e-5, 1e-7, warmup_epochs=0.5, total_epochs=10,
                          steps_per_epoch=100)
    tx = make_optimizer(params, lr)
    state = create_train_state(params, tx)
    B = args.bs
    mk = lambda k, s: jax.random.normal(jax.random.fold_in(key, k), s,
                                        jnp.float32) * 0.3
    view = lambda k: {
        "img": mk(k, (B, H, W, 3)),
        "pred_depth": jnp.abs(mk(k + 1, (B, H, W, 3))),
        "pts3d": mk(k + 2, (B, H, W, 3)),
        "camera_pose": jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
        "valid_mask": jnp.ones((B, H, W), bool),
    }
    batch = {"view1": view(10), "view2": view(20)}

    step_dt = {}
    rows = [("auto + remat   ", dict(attn_impl="auto", remat=True)),
            ("fused, no remat", dict(attn_impl="fused", remat=False))]
    if args.remat_ab:
        rows.append(("auto + dots    ", dict(attn_impl="auto",
                                             remat="dots")))
    if args.head_ab:
        rows.append(("bf16 heads     ", dict(attn_impl="auto", remat=True,
                                             head_dtype=jnp.bfloat16)))
    for label, kw in rows:
        step = make_train_step(tx, cfg, **kw)
        jstep = jax.jit(step, donate_argnums=(0,))
        lowered = jstep.lower(state, batch)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        try:
            ma = compiled.memory_analysis()
            print(f"  [{label}] memory: args "
                  f"{ma.argument_size_in_bytes/2**30:.2f} GiB, output "
                  f"{ma.output_size_in_bytes/2**30:.2f} GiB, temp "
                  f"{ma.temp_size_in_bytes/2**30:.2f} GiB")
        except Exception:  # noqa: BLE001 — backend-dependent API
            pass

        st = jax.tree.map(jnp.copy, state)
        st, m = jstep(st, batch)
        np.asarray(m["loss"])  # sync (block_until_ready lies on axon)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            st, m = jstep(st, batch)
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / args.reps
        step_dt[label.strip()] = dt
        tfs = flops / dt / 1e12
        print(f"train step [{label}]  {dt*1e3:8.1f} ms/step  "
              f"XLA-counted {flops/1e12:6.2f} TFLOP  ->  {tfs:6.1f} TF/s  "
              f"MFU {tfs/V5E_PEAK_TFLOPS*100:5.1f}% of v5e bf16 peak")
        # roofline statement (VERDICT r4 next #5): XLA's own bytes-accessed
        # count vs HBM bandwidth vs the MXU FLOP floor — which side of the
        # roofline binds this step, and how far from it we run
        byts = float(ca.get("bytes accessed", 0.0))
        if byts:
            t_bw = byts / (V5E_HBM_GBPS * 1e9)
            t_fl = flops / (V5E_PEAK_TFLOPS * 1e12)
            bound = "BANDWIDTH" if t_bw > t_fl else "FLOP"
            sol = max(t_bw, t_fl)
            print(f"  roofline [{label}]: {byts/2**30:.2f} GiB accessed -> "
                  f"bw floor {t_bw*1e3:.1f} ms, flop floor {t_fl*1e3:.1f} ms"
                  f" => {bound}-bound, SOL {sol*1e3:.1f} ms "
                  f"({sol/dt*100:.0f}% of SOL achieved)")

    if args.split:
        _split(args, cfg, state, batch, step_dt.get("auto + remat"))

    if args.trace:
        import jax
        step = make_train_step(tx, cfg, attn_impl="auto", remat=True)
        jstep = jax.jit(step, donate_argnums=(0,))
        st = jax.tree.map(jnp.copy, state)
        st, m = jstep(st, batch)
        np.asarray(m["loss"])
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                st, m = jstep(st, batch)
            np.asarray(m["loss"])
        from parse_trace import find_trace, summarize
        summarize(find_trace(args.trace), top=25)


def _split(args, cfg, state, batch, full_dt):
    """Pipelined timings of fwd-only and fwd+bwd programs: backward =
    grad - fwd, optimizer = full step - grad (VERDICT r3 next #1: the MFU
    statement needs a fwd/bwd split, not just a total)."""
    import jax
    import jax.numpy as jnp
    from align3r_tpu.training.step import loss_fn

    def fwd_only(params, batch):
        loss, _ = loss_fn(params, batch, cfg, remat=False)
        return loss

    def fwd_bwd(params, batch):
        # remat=False to MATCH fwd_only: the r4 split compared a no-remat
        # forward against a remat'd fwd+bwd and read a nonsensical negative
        # backward (-18 ms); with matching regimes backward = grad - fwd
        (loss, _), grads = jax.value_and_grad(
            lambda p, b: loss_fn(p, b, cfg, remat=False), has_aux=True)(
            params, batch)
        # reduce grads to a scalar so nothing is DCE'd but no tree returns
        return loss + sum(jnp.sum(jnp.abs(g) > 1e30)
                          for g in jax.tree.leaves(grads)).astype(loss.dtype)

    # INTERLEAVED reps (the ab_bs discipline): timing the two programs in
    # separate blocks minutes apart lets tunnel drift swamp an ~18 ms delta
    names = ("forward (no remat)", "forward+backward  ")
    jfns = {n: jax.jit(f) for n, f in zip(names, (fwd_only, fwd_bwd))}
    for n in names:                       # compile + warm both first
        np.asarray(jfns[n](state.params, batch))
    out = {}
    for n in names:
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.reps):
            v = jfns[n](state.params, batch)
            acc = v if acc is None else acc + v
        np.asarray(acc)
        out.setdefault(n, []).append((time.perf_counter() - t0) / args.reps)
    for n in reversed(names):             # second pass, REVERSED order —
        # same-order passes would pair an early-window fwd with a
        # later-window bwd under monotonic tunnel drift
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.reps):
            v = jfns[n](state.params, batch)
            acc = v if acc is None else acc + v
        np.asarray(acc)
        out[n].append((time.perf_counter() - t0) / args.reps)
    out = {n: min(ts) for n, ts in out.items()}
    for n in names:
        print(f"split [{n}]  {out[n]*1e3:8.1f} ms")
    fwd = out["forward (no remat)"]
    grad = out["forward+backward  "]
    print(f"split [backward - forward]  {(grad-fwd)*1e3:8.1f} ms")
    if full_dt:
        print(f"split [optimizer+remat overhead]  "
              f"{(full_dt-grad)*1e3:8.1f} ms  (full step {full_dt*1e3:.1f})")


if __name__ == "__main__":
    main()
