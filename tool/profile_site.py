"""Fused-attention-site head_group A/B (real TPU): can grouping heads into
batched dot_generals + one batched softmax recover part of the 0.78 ms vs
~0.55 ms per-site SOL gap? (r3 verdict next #4 — the alternative to a
VPU-occupancy trace.)

Per-head schedule (head_group=1, the r2/r3 default) serializes
MXU-logits -> VPU-softmax -> MXU-pv chains per head; hg>1 issues hg
independent logit dots and one (hg, Nq, Nk) softmax per iteration, giving
Mosaic's scheduler larger units to overlap MXU and VPU across.

Timing: scan-chained reps inside ONE jit (per-call tunnel dispatch is
~30 ms; see CLAUDE.md measurement discipline). Output feeds the next
iteration's tokens so XLA cannot hoist the body.

Usage: python tool/profile_site.py [--reps 30] [--cpu]
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
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--groups", default="1,2,3,4,6")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from align3r_tpu.ops.fused_site import attention_site

    # ViT-L decoder site shape (the 24-sites-per-batch hot loop): two
    # stacked streams, 16 pairs, 576 tokens, C=768, 12 heads.
    G, B, N, C, H = 2, 16, 576, 768, 12
    gh, gw = 18, 32
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.05, s).astype(np.float32),
                                dtype=jnp.bfloat16)
    x = mk(G, B, N, C)
    y = mk(G, B, N, C)
    ws = [mk(G, C, C).astype(jnp.float32) for _ in range(4)]
    bs = [mk(G, C).astype(jnp.float32) for _ in range(4)]
    ln = (1.0 + mk(G, C).astype(jnp.float32) * 0.1,
          mk(G, C).astype(jnp.float32))
    pos = jnp.stack(jnp.meshgrid(jnp.arange(gh), jnp.arange(gw),
                                 indexing="ij"), -1).reshape(N, 2)
    pos = pos.astype(jnp.float32)

    def run(hg, cross, reps):
        def site(tok):
            return attention_site(
                tok, y if cross else tok, *ws, *bs, pos, H,
                ln_q=ln, ln_kv=(ln if cross else "same"),
                residual=True, head_group=hg)

        @jax.jit
        def loop(x0):
            def body(c, _):
                return site(c), None
            out, _ = jax.lax.scan(body, x0, None, length=reps)
            return out

        out = loop(x)
        ref = np.asarray(out.astype(jnp.float32))   # compile + force
        t0 = time.perf_counter()
        out = loop(x)
        np.asarray(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / reps
        return dt, ref

    groups = [int(g) for g in args.groups.split(",")]
    for cross in (False, True):
        name = "cross" if cross else "self"
        base_ref = None
        for hg in groups:
            try:
                dt, ref = run(hg, cross, args.reps)
            except Exception as e:  # Mosaic lowering failure -> report, go on
                print(f"{name} hg={hg}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
                continue
            if base_ref is None:
                base_ref = ref
                tag = ""
            else:
                d = float(np.abs(ref - base_ref).max())
                tag = f"  maxdiff-vs-hg{groups[0]} {d:.2e}"
                if d > 0.1:
                    tag += "  NUMERICS MISMATCH"
            print(f"{name} hg={hg}: {dt*1e3:7.3f} ms/site-call "
                  f"({dt*1e3/B:.4f} ms/pair){tag}")


if __name__ == "__main__":
    main()
