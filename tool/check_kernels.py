"""Fast Mosaic lowering + numerics check for the round-3 Pallas kernels at
real ViT-L head shapes. Run FIRST in a healthy-TPU window: interpret-mode
tests can't catch Mosaic-specific lowering failures (jnp.pad, scratch
aliasing, DMA patterns), and a failure here should surface in seconds, not
mid-benchmark.

Usage: python tool/check_kernels.py [--cpu]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma list of section names to run (e.g. "
                         "'chunked_edge'); default = the r3 kernel set + "
                         "head_group. The chunked edge kernel is its own "
                         "batch stage so a lowering failure there cannot "
                         "gate the whole measurement batch.")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    if only is not None and (bad := only - {"core", "chunked_edge", "pack"}):
        ap.error(f"unknown --only section(s) {sorted(bad)} — a typo here "
                 "would run ZERO checks and print ALL OK")

    def want(name, default=True):
        return (name in only) if only is not None else default

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from align3r_tpu.models.dpt_head import _residual_conv_unit
    from align3r_tpu.ops.dpt_pipeline import fused_res_unit, fused_head_final
    from align3r_tpu.ops import fused_site as fs

    key = jax.random.PRNGKey(0)
    ok = True

    def check(name, got, ref, tol):
        nonlocal ok
        d = float(np.abs(np.asarray(got, np.float32)
                         - np.asarray(ref, np.float32)).max())
        good = d < tol
        ok &= good
        print(f"{name:34s} maxdiff {d:.3e}  {'OK' if good else 'FAIL'}")

    if want("core"):
        # 1) res unit at the refinenet1 shape (72, 128, 256) bf16
        u = {"conv1": {"kernel": jax.random.normal(key, (3, 3, 256, 256)) * 0.01,
                       "bias": jax.random.normal(key, (256,)) * 0.05},
             "conv2": {"kernel": jax.random.normal(jax.random.fold_in(key, 1),
                                                   (3, 3, 256, 256)) * 0.01,
                       "bias": jax.random.normal(key, (256,)) * 0.05}}
        x = (jax.random.normal(jax.random.fold_in(key, 2), (2, 72, 128, 256))
             * 0.5).astype(jnp.bfloat16)
        t0 = time.perf_counter()
        got = fused_res_unit(x, u)
        np.asarray(jnp.sum(got.astype(jnp.float32)))
        print(f"res_unit (2,72,128,256) bf16 compiled+ran in "
              f"{time.perf_counter()-t0:.1f}s")
        ref = _residual_conv_unit(u, x)
        check("res_unit vs XLA (bf16)", got, ref, 0.25)

        # 2) final head trio at (144, 256, 256) -> (288, 512, 4)
        mk = lambda k, ci, co, ksz: {
            "kernel": jax.random.normal(k, (ksz, ksz, ci, co)) * 0.02,
            "bias": jax.random.normal(jax.random.fold_in(k, 9), (co,)) * 0.05}
        p1 = mk(jax.random.fold_in(key, 3), 256, 128, 3)
        p2 = mk(jax.random.fold_in(key, 4), 128, 128, 3)
        p3 = mk(jax.random.fold_in(key, 5), 128, 4, 1)
        xt = (jax.random.normal(jax.random.fold_in(key, 6), (2, 144, 256, 256))
              * 0.5).astype(jnp.bfloat16)
        t0 = time.perf_counter()
        got = fused_head_final(xt, p1, p2, p3)
        np.asarray(jnp.sum(got))
        print(f"head_trio (2,144,256,256) bf16 compiled+ran in "
              f"{time.perf_counter()-t0:.1f}s")
        from align3r_tpu.models import nn
        h = nn.conv2d(p1, xt)
        h = nn.bilinear_resize_mxu(h, 288, 512, align_corners=True)
        h = jax.nn.relu(nn.conv2d(p2, h))
        ref = nn.conv2d(p3, h.astype(jnp.float32))
        check("head_trio vs XLA (bf16)", got, ref, 0.25)

        # 3) F-blocked MLP site at ViT-L encoder shape (C=1024, F=4096, N=576)
        G, B, N, C, F = 1, 2, 576, 1024, 4096
        xm = (jax.random.normal(jax.random.fold_in(key, 7), (G, B, N, C))
              * 0.3).astype(jnp.bfloat16)
        w1 = jax.random.normal(jax.random.fold_in(key, 8), (G, C, F)) * 0.01
        b1 = jax.random.normal(jax.random.fold_in(key, 10), (G, F)) * 0.02
        w2 = jax.random.normal(jax.random.fold_in(key, 11), (G, F, C)) * 0.01
        b2 = jax.random.normal(jax.random.fold_in(key, 12), (G, C)) * 0.02
        nf = fs.mlp_fblocks(xm, F)
        print(f"encoder MLP gate: nf={nf} (0 = rejected)")
        t0 = time.perf_counter()
        got = fs.mlp_site(xm, w1, b1, w2, b2, residual=True)
        np.asarray(jnp.sum(got.astype(jnp.float32)))
        print(f"mlp_site F-blocked (nf={nf}) compiled+ran in "
              f"{time.perf_counter()-t0:.1f}s")
        lnp = jnp.zeros((G, 2, C), jnp.float32)
        ref = fs._mlp_xla(xm, w1, b1, w2, b2, lnp, False, True)
        check("mlp_site fblocked vs XLA (bf16)", got, ref, 0.5)

        # 4) fused attention site at decode shape (folded softmax scale path)
        G, B, N, C, Hh = 2, 4, 576, 768, 12
        xa = (jax.random.normal(jax.random.fold_in(key, 13), (G, B, N, C))
              * 0.3).astype(jnp.bfloat16)
        wmk = lambda k: jax.random.normal(k, (G, C, C)) * 0.02
        wq, wk, wv, wo = (wmk(jax.random.fold_in(key, 14 + i)) for i in range(4))
        bz = jnp.zeros((G, C), jnp.float32)
        from align3r_tpu.models.rope import make_grid_positions
        pos = make_grid_positions(18, 32, batch=1)[0]
        t0 = time.perf_counter()
        got = fs.attention_site(xa, xa, wq, wk, wv, wo, bz, bz, bz, bz, pos, Hh,
                                100.0, residual=True)
        np.asarray(jnp.sum(got.astype(jnp.float32)))
        print(f"attention_site (G2,B4,N576,C768) compiled+ran in "
              f"{time.perf_counter()-t0:.1f}s")
        D = C // Hh
        cos, sin = fs._rope_tables(pos, D, 100.0, xa.dtype)
        ref = fs._site_xla(xa, xa, wq, wk, wv, wo, bz, bz, bz, bz, cos, sin,
                           jnp.zeros((G, 2, C), jnp.float32),
                           jnp.zeros((G, 2, C), jnp.float32), Hh, False, False,
                           True, D ** -0.5)
        check("attention_site vs XLA twin (bf16)", got, ref, 0.5)

        # 5) head-grouped schedule (batched in-kernel dot_generals — the one
        # Mosaic-lowering risk of the r4 scheduling experiment)
        for hg in (2, 4):
            got_hg = fs.attention_site(xa, xa, wq, wk, wv, wo, bz, bz, bz, bz,
                                       pos, Hh, 100.0, residual=True,
                                       head_group=hg)
            check(f"attention_site head_group={hg}", got_hg, got, 1e-6)

    if want("chunked_edge", default=False):
        # 6) image-CHUNKED fused edge-loss kernel (n > 256 path): scalar-
        # prefetched block index maps + per-chunk d_proj zero-init are the
        # Mosaic-lowering risks interpret mode can't see
        from align3r_tpu.inference.pairs import make_pairs
        from align3r_tpu.alignment.scene import (build_scene, pack_scene,
                                                 pairwise_pts_loss, _edge_meta,
                                                 _pairwise_pts_loss_fused)
        pairs = make_pairs(300, "swin-1", symmetrize=True)
        E = len(pairs)
        He, We = 24, 32
        ke = jax.random.fold_in(key, 99)
        out = {"view1": {"idx": np.array([p[0] for p in pairs])},
               "view2": {"idx": np.array([p[1] for p in pairs])},
               "pred1": {"pts3d": jax.random.normal(ke, (E, He, We, 3)),
                         "conf": 1 + jax.random.uniform(ke, (E, He, We))},
               "pred2": {"pts3d_in_other_view":
                         jax.random.normal(jax.random.fold_in(ke, 1), (E, He, We, 3)),
                         "conf": 1 + jax.random.uniform(ke, (E, He, We))}}
        cfg, data, params = build_scene(out, {})
        meta = _edge_meta(cfg)
        print(f"edge_loss chunked: n={meta.n} nc={meta.nc} chunks={meta.n_chunks}")
        assert meta.nc, meta
        data_p = pack_scene(data, cfg, dtype=jnp.float32)
        t0 = time.perf_counter()
        lf = jax.jit(jax.value_and_grad(
            lambda p: _pairwise_pts_loss_fused(p, data_p, cfg)))
        lv, gv = lf(params)
        np.asarray(lv)
        print(f"edge_loss chunked (n=300) fwd+bwd compiled+ran in "
              f"{time.perf_counter()-t0:.1f}s")
        ref_l = pairwise_pts_loss(params, data, cfg)
        check("edge_loss chunked vs fp32 XLA", lv, ref_l, 1e-4)
        g_ref = jax.grad(pairwise_pts_loss)(params, data, cfg)
        check("edge_loss chunked grad(im_poses)", gv["im_poses"],
              g_ref["im_poses"],
              1e-4 * max(1.0, float(np.abs(np.asarray(g_ref["im_poses"])).max())))

    if want("pack"):
        # 7) Pallas row-permute pack (gather-free pack_scene default): the
        # Mosaic risks are the jnp.minimum/clip scalar-prefetch index maps
        # and the scalar-select between two prefetched blocks. Must be
        # BIT-identical to the streamed gather pack on device.
        from align3r_tpu.inference.pairs import make_pairs
        from align3r_tpu.alignment.scene import build_scene, pack_scene
        for n, graph, He, We in ((12, "swin-3", 36, 64), (300, "swin-1", 24, 32)):
            pairs = make_pairs(n, graph, symmetrize=True)
            E = len(pairs)
            kp = jax.random.fold_in(key, 1234 + n)
            out = {"view1": {"idx": np.array([p[0] for p in pairs])},
                   "view2": {"idx": np.array([p[1] for p in pairs])},
                   "pred1": {"pts3d": jax.random.normal(kp, (E, He, We, 3)),
                             "conf": 1 + jax.random.uniform(kp, (E, He, We))},
                   "pred2": {"pts3d_in_other_view":
                             jax.random.normal(jax.random.fold_in(kp, 1),
                                               (E, He, We, 3)),
                             "conf": 1 + jax.random.uniform(kp, (E, He, We))}}
            cfg, data, params = build_scene(out, {})
            for dt in (jnp.bfloat16, jnp.float32):
                t0 = time.perf_counter()
                b = pack_scene(data, cfg, dtype=dt, impl="fast")
                np.asarray(jnp.sum(b.packed_w.astype(jnp.float32)))
                dtn = jnp.dtype(dt).name
                print(f"pack fast n={n} {dtn} compiled+ran in "
                      f"{time.perf_counter()-t0:.1f}s")
                a = pack_scene(data, cfg, dtype=dt, impl="streamed")
                pa, pb = np.asarray(a.packed_pred), np.asarray(b.packed_pred)
                wa, wb = np.asarray(a.packed_w), np.asarray(b.packed_w)
                bit = np.array_equal(pa, pb) and np.array_equal(wa, wb)
                ok &= bit
                print(f"{f'pack fast==streamed n={n} {dtn}':34s} "
                      f"{'OK' if bit else 'FAIL'}")

    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
