#!/usr/bin/env python
"""Generate cached monocular prior depths for a folder of frames.

Behavioural reference: /root/reference/tool/demo.py
generate_monocular_depth_maps:100-118 — per frame run Depth Pro (metric
depth + focallength_px) or Depth Anything V2 (relative depth, pseudo-focal
200) and save `<frame>_pred_depth_<prior>.npz {depth, focallength_px}`.

Here the prior model runs as a batched jitted JAX forward on TPU.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--depth_prior_name", default="depthanything",
                   choices=["depthanything", "depthpro"])
    p.add_argument("--model_path", default="depth-anything/Depth-Anything-V2-Large-hf",
                   help="HF name/path (depthanything) or .pt path (depthpro)")
    p.add_argument("--batch_size", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import PIL.Image

    frames = sorted(f for f in os.listdir(args.input_dir)
                    if f.lower().endswith((".jpg", ".jpeg", ".png")))
    assert frames, f"no frames in {args.input_dir}"

    if args.depth_prior_name == "depthanything":
        from align3r_tpu.models.depth_anything import (
            load_hf_depth_anything, depth_anything_forward, preprocess)
        params, cfg = load_hf_depth_anything(args.model_path)
        fwd = jax.jit(lambda x: depth_anything_forward(params, x, cfg))
        focal = 200.0  # pseudo-focal for relative depth (image_pose.py:300-302)
    else:  # depthpro: metric depth + per-image focal estimate
        from align3r_tpu.models.depth_pro import (
            load_hf_depth_pro, depth_pro_forward, postprocess_depth)
        dp_path = (args.model_path if args.model_path and
                   "Depth-Anything" not in args.model_path else "apple/DepthPro-hf")
        dp_params, dp_cfg = load_hf_depth_pro(dp_path)
        S = dp_cfg.image_size

        def _fwd(x01):
            x = jax.image.resize(x01, (x01.shape[0], S, S, 3), "bilinear")
            x = (x - 0.5) / 0.5
            inv_depth, fov = depth_pro_forward(dp_params, x, dp_cfg)
            return postprocess_depth(inv_depth, fov, S)
        fwd_dp = jax.jit(_fwd)
        preprocess = lambda b, cfg=None: jnp.asarray(b)  # noqa: E731
        cfg = None

        def fwd(x):
            depth, focal_px = fwd_dp(x)
            fwd.last_focal = focal_px
            return depth
        focal = None

    for s in range(0, len(frames), args.batch_size):
        chunk = frames[s:s + args.batch_size]
        imgs = []
        sizes = []
        for f in chunk:
            im = PIL.Image.open(os.path.join(args.input_dir, f)).convert("RGB")
            sizes.append(im.size)
            imgs.append(np.asarray(im, np.float32) / 255.0)
        H0, W0 = imgs[0].shape[:2]
        batch = np.stack([i if i.shape == imgs[0].shape else
                          np.asarray(PIL.Image.fromarray(
                              (i * 255).astype(np.uint8)).resize((W0, H0)),
                              np.float32) / 255.0 for i in imgs])
        x = preprocess(batch, cfg)
        depth = np.asarray(fwd(x))
        focals = getattr(fwd, "last_focal", None)
        for k, f in enumerate(chunk):
            W, H = sizes[k]
            d = np.asarray(jax.image.resize(jnp.asarray(depth[k]), (H, W),
                                            "bilinear"))
            if focal is not None:
                f_px = focal
            else:  # depthpro: scale the square-input focal to this width
                f_px = float(np.asarray(focals)[k]) * W / depth.shape[-1]
            out = os.path.join(
                args.input_dir,
                os.path.splitext(f)[0] + f"_pred_depth_{args.depth_prior_name}.npz")
            np.savez(out, depth=d.astype(np.float32),
                     focallength_px=np.float32(f_px))
            print("wrote", out)


if __name__ == "__main__":
    main()
