"""Decode-stage profiler (real TPU): where do the 15.9 ms/pair go?

Times jitted scan-chained loops (single-call timings over the axon tunnel
are unreliable; see CLAUDE.md). Each candidate runs K iterations inside one
jit with a data dependency between iterations so XLA cannot hoist the body.

Usage: python tool/profile_decode.py [--reps 20] [--which all]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np


def timed(fn, *args, reps):
    """Compile, then time reps iterations chained in one scan (for ~ms-scale
    ops where per-call tunnel dispatch would dominate)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0, args):
        def body(c, _):
            return fn(c, *args), None
        out, _ = jax.lax.scan(body, x0, None, length=reps)
        return out

    x0 = args[0]
    rest = args[1:]
    out = loop(x0, rest)
    np.asarray(jnp.sum(jax.tree.leaves(out)[0]))  # compile+run
    t0 = time.perf_counter()
    out = loop(x0, rest)
    np.asarray(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / reps


def timed_calls(fn, *args, reps):
    """Compile, then time reps PIPELINED dispatches with one final sync.

    Per-call sync over the axon tunnel costs ~30 ms of host round-trip
    (measured: decode program 73 ms synced-per-call vs 40 ms pipelined), so
    throughput-style timing must let dispatches queue; the engine runs the
    same way (no host sync between batches)."""
    import jax
    import jax.numpy as jnp
    jfn = jax.jit(fn)
    out = jfn(*args)
    np.asarray(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        out = jfn(*args)
        s = jnp.sum(jax.tree.leaves(out)[0])
        acc = s if acc is None else acc + s
    np.asarray(acc)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--which", default="all",
                    help="comma list: attn,decode,heads,matmul")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of the "
                         "engine-default decode loop (fused sites, u3) into "
                         "DIR and print the per-fusion summary — the "
                         "VPU-vs-MXU occupancy evidence for the per-site "
                         "SOL-gap question (VERDICT r3 next #4)")
    args = ap.parse_args()
    which = set(args.which.split(","))

    import jax
    import jax.numpy as jnp
    from align3r_tpu.models.config import VIT_L_512
    from align3r_tpu.models.align3r import (init_align3r, decode_pair,
                                            stack_decoder_params)
    from align3r_tpu.models.dpt_head import apply_dpt_head
    from align3r_tpu.models.rope import make_grid_positions
    from align3r_tpu.ops.attention import xla_attention

    cfg = VIT_L_512
    PB = 8                      # pairs per decode batch
    H, W = 288, 512
    gh, gw = H // 16, W // 16   # 18 x 32 = 576 tokens
    N = gh * gw
    key = jax.random.PRNGKey(0)

    print(f"# shapes: pairs={PB}, N={N}, dec_dim={cfg.dec_embed_dim}, "
          f"heads={cfg.dec_num_heads}, reps={args.reps}")

    if "attn" in which or "all" in which:
        # decoder attention shape: (B=2*PB, H=12, N, D=64) bf16
        B, Hh, D = 2 * PB, cfg.dec_num_heads, cfg.dec_embed_dim // cfg.dec_num_heads
        q = jax.random.normal(key, (B, Hh, N, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, Hh, N, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, Hh, N, D), jnp.bfloat16)
        flops = 2 * 2 * B * Hh * N * N * D

        dt = timed(lambda q, k, v: xla_attention(q, k, v), q, k, v, reps=args.reps)
        print(f"xla_attention      {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TF/s")

        def bf16_attn(q, k, v):
            scale = D ** -0.5
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.bfloat16) * scale
            m = jax.lax.stop_gradient(jnp.max(logits, -1, keepdims=True))
            p = jnp.exp((logits - m).astype(jnp.float32)).astype(jnp.bfloat16)
            s = jnp.sum(p.astype(jnp.float32), -1, keepdims=True)
            out = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                             preferred_element_type=jnp.float32)
            return (out / s).astype(q.dtype)

        dt = timed(bf16_attn, q, k, v, reps=args.reps)
        print(f"bf16-probs attn    {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TF/s")

        from align3r_tpu.ops.small_attention import small_attention
        for g in (2, 4, 8):
            for u in (False, True):
                try:
                    dt = timed(lambda q, k, v: small_attention(q, k, v, group=g,
                                                               unroll=u),
                               q, k, v, reps=args.reps)
                    print(f"small_attn g={g} u={int(u)} {dt*1e3:8.3f} ms  "
                          f"{flops/dt/1e12:6.1f} TF/s")
                except Exception as e:  # noqa
                    print(f"small_attn g={g} u={int(u)} failed:", repr(e)[:160])

        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as stock_fa, SegmentIds, BlockSizes)
            NP = 640  # pad 576 -> 5*128
            pad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, NP - N), (0, 0)))
            qp, kp, vp = pad(q), pad(k), pad(v)
            ids = (jnp.arange(NP) < N).astype(jnp.int32)[None].repeat(B, 0)
            seg = SegmentIds(q=ids, kv=ids)

            def stock(q, k, v):
                o = stock_fa(q, k, v, segment_ids=seg, sm_scale=D ** -0.5)
                return o

            dt = timed(stock, qp, kp, vp, reps=args.reps)
            print(f"stock flash (pad)  {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TF/s")
        except Exception as e:  # noqa
            print("stock flash failed:", repr(e)[:200])

    if "site" in which or "all" in which:
        # fused qkv+rope+attn+proj Pallas site vs the unfused XLA sequence
        from align3r_tpu.models import blocks as Bl
        from align3r_tpu.ops.fused_site import attention_site
        G2, Bb = 2, PB
        C = cfg.dec_embed_dim
        Hh = cfg.dec_num_heads
        x = jax.random.normal(key, (G2, Bb, N, C), jnp.bfloat16)
        pos_s = jnp.stack([make_grid_positions(gh, gw, batch=Bb)] * G2)
        attn_p = [Bl.init_attention(k, C)
                  for k in jax.random.split(jax.random.PRNGKey(3), G2)]
        pstack = jax.tree.map(lambda *xs: jnp.stack(xs), *attn_p)
        qk, qb = pstack["qkv"]["kernel"], pstack["qkv"]["bias"]
        wq, wk, wv = (qk[:, :, i * C:(i + 1) * C] for i in range(3))
        bq, bk, bv = (qb[:, i * C:(i + 1) * C] for i in range(3))
        wo, bo = pstack["proj"]["kernel"], pstack["proj"]["bias"]
        pos0 = pos_s[0, 0]
        sflops = 2 * G2 * Bb * (4 * N * C * C + 2 * Hh * N * N * (C // Hh))

        def fused(x, *w):
            return attention_site(x, x, *w, pos0, Hh, 100.0)

        dt = timed(fused, x, wq, wk, wv, wo, bq, bk, bv, bo, reps=args.reps)
        print(f"fused site         {dt*1e3:8.3f} ms  {sflops/dt/1e12:6.1f} TF/s")

        def xla_site(x, pst):
            flat = x.reshape(G2 * Bb, N, C)
            posf = pos_s.reshape(G2 * Bb, N, 2)
            # ungrouped equivalent (single stream's weights for timing only)
            out = Bl.apply_attention(jax.tree.map(lambda t: t[0], pst),
                                     flat, posf, Hh, 100.0, "auto")
            return out.reshape(G2, Bb, N, C)

        dt = timed(xla_site, x, pstack, reps=args.reps)
        print(f"xla site (small)   {dt*1e3:8.3f} ms  {sflops/dt/1e12:6.1f} TF/s")

    params = stack_decoder_params(init_align3r(jax.random.PRNGKey(0), cfg))
    feat = jax.random.normal(key, (PB, N, cfg.enc_embed_dim), jnp.float32)
    pcts = jax.random.normal(key, (2 * PB, N, cfg.dec_embed_dim), jnp.float32)
    pos = make_grid_positions(gh, gw, batch=PB)
    pc_pos = make_grid_positions(gh, gw, batch=2 * PB)

    if "decode" in which or "all" in which:
        for label, kw in [("stacked u1 ", dict(stacked=True)),
                          ("fused sites", dict(stacked=True, attn_impl="fused")),
                          ("fused u2   ", dict(stacked=True, attn_impl="fused",
                                               unroll=2)),
                          ("fused u3   ", dict(stacked=True, attn_impl="fused",
                                               unroll=3)),
                          ("separate   ", dict(stacked=False))]:
            def dec_only(params, feat, pcts, kw=kw):
                h1, h2 = decode_pair(params, feat, pos, feat, pos, pcts, pc_pos,
                                     cfg, jnp.bfloat16, **kw)
                return jnp.sum(h1[-1]) + jnp.sum(h2[-1])

            dt = timed_calls(dec_only, params, feat, pcts,
                             reps=max(args.reps // 2, 5))
            print(f"decoder {label}  {dt*1e3:8.3f} ms  ({dt/PB*1e3:.2f} ms/pair)")

    if "heads" in which or "all" in which:
        hooks = [jax.random.normal(key, (PB, N, cfg.enc_embed_dim), jnp.float32)] + \
            [jax.random.normal(key, (PB, N, cfg.dec_embed_dim), jnp.float32)
             for _ in range(3)]

        for hd, resize, ci, label in (
                (jnp.float32, "gather", "xla", "fp32 gather  "),
                (jnp.float32, "mxu", "xla", "fp32 mxu     "),
                (jnp.bfloat16, "gather", "xla", "bf16 gather  "),
                (jnp.bfloat16, "mxu", "xla", "bf16 mxu     "),
                (jnp.bfloat16, "mxu", "pipeline", "bf16 pipeline"),
                (jnp.float32, "mxu", "pipeline", "fp32 pipeline")):
            def heads_v(hp, h0, rest, hd=hd, resize=resize, ci=ci):
                r = apply_dpt_head(hp, [h0] + rest, (gh, gw), (H, W),
                                   cfg.depth_mode, cfg.conf_mode, dtype=hd,
                                   resize_impl=resize, conv_impl=ci)
                return jnp.sum(r["pts3d"])

            dt = timed_calls(heads_v, params["head1"], hooks[0], hooks[1:],
                             reps=max(args.reps // 2, 10))
            print(f"dpt-head {label}  {dt*1e3:8.3f} ms  ({dt/PB*1e3:.2f} ms/img)")

        from align3r_tpu.models.dpt_head import apply_dpt_heads_stacked

        def heads_both(p1, p2, h0, rest):
            r1, r2 = apply_dpt_heads_stacked(p1, p2, [h0] + rest, [h0] + rest,
                                             (gh, gw), (H, W), cfg.depth_mode,
                                             cfg.conf_mode)
            return jnp.sum(r1["pts3d"]) + jnp.sum(r2["pts3d"])

        dt = timed_calls(heads_both, params["head1"], params["head2"],
                         hooks[0], hooks[1:], reps=max(args.reps // 2, 10))
        print(f"both-heads stacked {dt*1e3:8.3f} ms  ({dt/PB*1e3:.2f} ms/pair both)")

    if args.trace:
        def dec_tr(params, feat, pcts):
            h1, h2 = decode_pair(params, feat, pos, feat, pos, pcts, pc_pos,
                                 cfg, jnp.bfloat16, stacked=True,
                                 attn_impl="fused", unroll=3)
            return jnp.sum(h1[-1]) + jnp.sum(h2[-1])

        jfn = jax.jit(dec_tr)
        np.asarray(jfn(params, feat, pcts))       # compile outside the trace
        with jax.profiler.trace(args.trace):
            acc = None
            for _ in range(5):
                s = jfn(params, feat, pcts)
                acc = s if acc is None else acc + s
            np.asarray(acc)
        from parse_trace import find_trace, summarize
        summarize(find_trace(args.trace), top=30)

    if "matmul" in which or "all" in which:
        # ceiling check: one big bf16 matmul at decoder MLP size
        M, Kd, Nd = 2 * PB * N, cfg.dec_embed_dim, 4 * cfg.dec_embed_dim
        a = jax.random.normal(key, (M, Kd), jnp.bfloat16)
        w = jax.random.normal(key, (Kd, Nd), jnp.bfloat16)

        def mm2(a, w):
            y = jnp.dot(a, w, preferred_element_type=jnp.bfloat16)
            return jnp.dot(y, w.T, preferred_element_type=jnp.bfloat16)

        dt = timed(mm2, a, w, reps=args.reps)
        flops = 2 * 2 * M * Kd * Nd
        print(f"mlp-pair matmul    {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
