"""Golden-parity runbook: reference torch stack vs the JAX stack, one command.

When real Align3R weights arrive (e.g. align3r_depthpro.pth), run

    python tool/golden_parity.py --weights align3r_depthpro.pth

and the script (1) converts the checkpoint with models/convert.py, (2) runs
the reference torch model (imported from /root/reference, CPU) and the JAX
model on the same bundled synthetic frame fixture, (3) prints per-stage
max-abs diffs (encoder tokens, final decoder tokens, head pts3d/conf) and a
depth-metric table (tool/metric.py: AbsRel/RMSE/delta1 of the JAX z-depth
against the torch z-depth as ground truth), and (4) exits non-zero if any
stage exceeds its fp32 tolerance.

Run WITHOUT --weights to self-check today: it writes a random-init .pth in
the reference checkpoint format ({'args': Namespace(model=<ctor string>),
'model': state_dict} — dust3r/model.py:27-43 load_model contract) and runs
the full procedure against it.

Reference behaviour exercised: dust3r/model.py:241-257 (forward),
151-174 (encode), 201-233 (decoder + prior injection, dec_norm at :232),
dust3r/heads/dpt_head.py:34-66; conversion contract models/convert.py.
"""
from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REF = "/root/reference"
INF = float("inf")

# reference_on_path scopes REF on sys.path and purges reference modules on
# exit — the ONLY sanctioned way to touch /root/reference (its top-level
# `tool` package shadows the repo's while it is on the path, so every
# reference-touching section below runs inside the context and our own
# `tool.*` imports happen before entering it)
sys.path.insert(0, os.path.join(REPO, "tests"))
from reference_import import reference_on_path  # noqa: E402


def import_reference_model_class():
    """Import the reference AsymmetricCroCo3DStereo for CPU use. Must be
    called inside a reference_on_path() scope.

    The only CPU blocker is the hardcoded .cuda() on the zero convs
    (dust3r/model.py:96), monkeypatched to a no-op."""
    import torch
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from dust3r.model import AsymmetricCroCo3DStereo
    return AsymmetricCroCo3DStereo


def build_reference_model(cfg):
    """Instantiate the reference model at our parsed config (same call the
    reference's eval()'d ctor string makes, dust3r/model.py:31-39)."""
    cls = import_reference_model_class()
    H, W = cfg.img_size
    return cls(
        output_mode=cfg.output_mode, head_type=cfg.head_type,
        depth_mode=tuple(cfg.depth_mode), conf_mode=tuple(cfg.conf_mode),
        enc_embed_dim=cfg.enc_embed_dim, enc_depth=cfg.enc_depth,
        enc_num_heads=cfg.enc_num_heads, dec_embed_dim=cfg.dec_embed_dim,
        dec_depth=cfg.dec_depth, dec_num_heads=cfg.dec_num_heads,
        img_size=(H, W), patch_size=cfg.patch_size, pos_embed=cfg.pos_embed,
        patch_embed_cls="PatchEmbedDust3R", landscape_only=False).eval()


def write_selfcheck_checkpoint(path: str, H: int, W: int, seed: int = 0):
    """Random-init reference-format checkpoint for the no-weights self-check."""
    import torch
    from align3r_tpu.models.config import Align3RConfig
    cfg = Align3RConfig(img_size=(H, W), patch_size=16, enc_embed_dim=64,
                        enc_depth=4, enc_num_heads=4, dec_embed_dim=48,
                        dec_depth=12, dec_num_heads=4)
    torch.manual_seed(seed)
    with reference_on_path():
        net = build_reference_model(cfg)
    # randomise the zero-init zero_convs so the prior branch is exercised,
    # and scale the final head convs (random-init DPT heads emit |xyz| big
    # enough to overflow expm1; trained checkpoints emit <= 10)
    g = torch.Generator().manual_seed(seed + 1)
    for zc in net.zero_convs:
        for p in zc.parameters():
            p.data = torch.randn(p.shape, generator=g) * 0.2
    for head in (net.downstream_head1, net.downstream_head2):
        head.dpt.head[4].weight.data *= 0.01
        head.dpt.head[4].bias.data *= 0.01
    model_str = (
        "AsymmetricCroCo3DStereo(output_mode='pts3d', head_type='dpt', "
        "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
        f"enc_embed_dim={cfg.enc_embed_dim}, enc_depth={cfg.enc_depth}, "
        f"enc_num_heads={cfg.enc_num_heads}, dec_embed_dim={cfg.dec_embed_dim}, "
        f"dec_depth={cfg.dec_depth}, dec_num_heads={cfg.dec_num_heads}, "
        f"img_size=({H}, {W}), patch_size={cfg.patch_size}, "
        "pos_embed='RoPE100', patch_embed_cls='PatchEmbedDust3R', "
        "landscape_only=False)")
    torch.save({"args": argparse.Namespace(model=model_str),
                "model": net.state_dict()}, path)
    return path


def make_fixture(n_frames: int, H: int, W: int, seed: int = 7):
    """Bundled synthetic sequence: smooth pseudo-images in [-1, 1] plus
    positive prior pointclouds (deterministic; no data download needed)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    imgs, priors = [], []
    for i in range(n_frames):
        base = np.stack([np.sin(xx / W * 6.28 + i * 0.3 + c)
                         * np.cos(yy / H * 3.14 + c) for c in range(3)], -1)
        imgs.append((0.6 * base + 0.15 * rng.standard_normal((H, W, 3))
                     ).astype(np.float32).clip(-1, 1))
        depth = 2.0 + 0.5 * np.sin(xx / W * 3.14 + i * 0.2)
        pr = np.stack([(xx - W / 2) / max(H, W) * depth,
                       (yy - H / 2) / max(H, W) * depth, depth], -1)
        priors.append((pr / np.abs(pr).max()).astype(np.float32))
    return np.stack(imgs), np.stack(priors)


def run_parity(weights: str, n_frames: int = 4, verbose: bool = True):
    import torch
    import jax.numpy as jnp
    from align3r_tpu.models.convert import load_torch_checkpoint
    from align3r_tpu.models.align3r import (encode_images, embed_point_cloud,
                                            decode_pair)
    from align3r_tpu.models.dpt_head import apply_dpt_head
    from align3r_tpu.models.rope import make_grid_positions
    from tool import metric as M

    params, cfg = load_torch_checkpoint(weights)
    H, W = cfg.img_size
    log = print if verbose else (lambda *a, **k: None)
    log(f"config: {cfg.enc_embed_dim}x{cfg.enc_depth} enc, "
        f"{cfg.dec_embed_dim}x{cfg.dec_depth} dec, img {H}x{W}")

    # the torch net's forwards run inside the loop below, so the reference
    # stays on sys.path for the whole loop; reference_on_path restores the
    # path and purges reference modules afterwards (nesting-safe)
    with reference_on_path():
        net = build_reference_model(cfg)
        ckpt = torch.load(weights, map_location="cpu", weights_only=False)
        missing = net.load_state_dict(ckpt["model"], strict=False)
        log(f"reference load_state_dict: {len(missing.missing_keys)} missing, "
            f"{len(missing.unexpected_keys)} unexpected")

        imgs, priors = make_fixture(n_frames, H, W)
        pairs = [(i, i + 1) for i in range(n_frames - 1)] + \
                [(i + 1, i) for i in range(n_frames - 1)]

        # capture per-stage intermediates from the torch side via module hooks
        captured = {"enc": [], "dec": []}
        net.enc_norm.register_forward_hook(
            lambda m, i, o: captured["enc"].append(o.detach()))
        net.dec_norm.register_forward_hook(
            lambda m, i, o: captured["dec"].append(o.detach()))

        # JAX stages (fp32, reference AMP boundary)
        feats, pos = encode_images(params, jnp.asarray(imgs), cfg,
                                   dtype=jnp.float32)
        pc_tok, _ = embed_point_cloud(params, jnp.asarray(priors), cfg,
                                      dtype=jnp.float32)
        grid = (H // cfg.patch_size, W // cfg.patch_size)

        stage_diffs = {"encoder_tokens": 0.0, "decoder_tokens": 0.0,
                       "pts3d": 0.0, "conf": 0.0}
        z_jax, z_ref = [], []
        for (i, j) in pairs:
            t = lambda a: torch.from_numpy(np.asarray(a))
            view1 = {"img": t(imgs[i][None]).permute(0, 3, 1, 2),
                     "pred_depth": t(priors[i][None]), "instance": [f"a{i}"]}
            view2 = {"img": t(imgs[j][None]).permute(0, 3, 1, 2),
                     "pred_depth": t(priors[j][None]), "instance": [f"b{j}"]}
            captured["enc"].clear()
            captured["dec"].clear()
            with torch.no_grad():
                r1t, r2t = net(view1, view2)
            # torch encodes both views in ONE batched enc_norm call
            enc_t = captured["enc"][0]          # (2, N, D_enc)
            dec_t = captured["dec"]             # [f1, f2] final decoder tokens

            f1, f2 = feats[i][None], feats[j][None]
            p1 = make_grid_positions(grid[0], grid[1], batch=1)
            pc = jnp.concatenate([pc_tok[i][None], pc_tok[j][None]], axis=0)
            pcp = make_grid_positions(grid[0], grid[1], batch=2)
            hooks1, hooks2 = decode_pair(params, f1, p1, f2, p1, pc, pcp, cfg,
                                         dtype=jnp.float32)
            res1 = apply_dpt_head(params["head1"], hooks1, grid, (H, W),
                                  cfg.depth_mode, cfg.conf_mode)
            res2 = apply_dpt_head(params["head2"], hooks2, grid, (H, W),
                                  cfg.depth_mode, cfg.conf_mode)

            d = lambda a, b: float(np.abs(np.asarray(a) - b.numpy()).max())
            stage_diffs["encoder_tokens"] = max(
                stage_diffs["encoder_tokens"],
                d(jnp.concatenate([f1, f2], axis=0), enc_t))
            stage_diffs["decoder_tokens"] = max(
                stage_diffs["decoder_tokens"],
                d(hooks1[-1], dec_t[0]), d(hooks2[-1], dec_t[1]))
            stage_diffs["pts3d"] = max(stage_diffs["pts3d"],
                                       d(res1["pts3d"], r1t["pts3d"]),
                                       d(res2["pts3d"], r2t["pts3d_in_other_view"]))
            stage_diffs["conf"] = max(stage_diffs["conf"],
                                      d(res1["conf"], r1t["conf"]),
                                      d(res2["conf"], r2t["conf"]))
            z_jax.append(np.asarray(res1["pts3d"])[0, ..., 2])
            z_ref.append(r1t["pts3d"].numpy()[0, ..., 2])

    log("\nper-stage max-abs diff over all pairs:")
    for k, v in stage_diffs.items():
        log(f"  {k:16s} {v:.3e}")

    # depth-metric table: JAX z-depth scored against the torch z-depth as GT
    # (the same metric set tool/depth_test.py prints, tool/metric.py)
    pred = np.abs(np.stack(z_jax)) + 1e-8
    gt = np.abs(np.stack(z_ref)) + 1e-8
    table = {
        "abs_rel": M.abs_relative_difference(pred, gt),
        "rmse": M.rmse_linear(pred, gt),
        "log10": M.log10(pred, gt),
        "delta1": M.delta1_acc(pred, gt),
    }
    log("\ndepth metrics (JAX vs torch-as-GT):")
    log("  " + "  ".join(f"{k}={float(v):.5f}" for k, v in table.items()))

    # fp32 tolerance scaled by depth (deep ViT-L accumulates ~2e-3)
    tol = 5e-4 if cfg.enc_embed_dim <= 256 else 5e-3
    ok = (stage_diffs["pts3d"] < tol and stage_diffs["conf"] < tol
          and float(table["abs_rel"]) < 1e-3 and float(table["delta1"]) > 0.999)
    log(f"\nGOLDEN PARITY {'PASS' if ok else 'FAIL'} (tol={tol})")
    return ok, stage_diffs, table


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default=None,
                    help="reference .pth checkpoint; omitted = random-init "
                         "self-check")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=48)
    args = ap.parse_args()

    # the torch oracle runs on CPU; keep both stacks on CPU for an
    # apples-to-apples fp32 comparison (the TPU engine has its own parity
    # tests). Must be set before ANY backend touch — even default_backend()
    # would initialise (and hang on) a wedged TPU tunnel.
    import jax
    jax.config.update("jax_platforms", "cpu")

    weights = args.weights
    if weights is None:
        weights = "/tmp/align3r_golden_selfcheck.pth"
        print(f"no --weights given: writing random-init self-check "
              f"checkpoint to {weights}")
        write_selfcheck_checkpoint(weights, args.height, args.width)

    ok, _, _ = run_parity(weights, n_frames=args.frames)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
