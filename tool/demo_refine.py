#!/usr/bin/env python
"""Demo + PromptDA full-resolution depth refinement.

Behavioural reference: /root/reference/tool/demo_refine.py — identical to
tool/demo.py but the optimised low-res depths are upsampled to the original
resolution with Prompt Depth Anything (rescale_depth_maps,
depth_test.py:535-549).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tool.demo import get_args_parser, load_model
    parser = get_args_parser()
    parser.add_argument("--promptda_model",
                        default="depth-anything/prompt-depth-anything-vitl-hf")
    args = parser.parse_args()
    out_dir = os.path.join(args.output_dir, args.seq_name)
    os.makedirs(out_dir, exist_ok=True)

    from align3r_tpu.inference.images import load_images, stack_views
    from align3r_tpu.pipeline import reconstruct_scene

    params, cfg = load_model(args.weights, args.image_size)
    views = load_images(args.input_dir, args.image_size, verbose=not args.silent,
                        fps=args.fps, interval=args.interval,
                        traj_format="default",
                        depth_prior_name=args.depth_prior_name)
    stacked = stack_views(views)

    raft_params, raft_kind = None, "raft2"
    flow_w = 0.0
    if os.path.exists(args.raft_weights):
        from align3r_tpu.models.raft1 import load_raft_auto
        raft_params, raft_kind = load_raft_auto(args.raft_weights)
        flow_w = 0.01

    scene = reconstruct_scene(
        stacked["imgs"], stacked["priors"], params, cfg,
        scene_graph="swinstride-5-noncyclic", variant="flow",
        raft_params=raft_params, raft_kind=raft_kind, use_self_mask=True,
        niter=args.niter, lr=0.01, schedule="linear",
        batch_size=args.batch_size,
        scene_kw=dict(shared_focal=True, temporal_smoothing_weight=0.01,
                      flow_loss_weight=flow_w, flow_loss_start_epoch=0.1,
                      flow_loss_thre=25, min_conf_thr=1.1))
    scene.save_tum_poses(os.path.join(out_dir, "pred_traj.txt"))
    scene.save_intrinsics(os.path.join(out_dir, "pred_intrinsics.txt"))
    depths = scene.save_depth_maps(out_dir)

    # PromptDA refinement at ORIGINAL input resolution: the reference
    # passes raw_imgs loaded at native res (tool/demo_refine.py:138) —
    # feeding the model-res scene.imgs would add compute with no
    # resolution gain. Video inputs have no on-disk frames; they refine
    # at model res.
    from align3r_tpu.models.prompt_da import load_hf_prompt_da, rescale_depth_maps
    from tool.depth_test import load_raw_images01
    pda_params, pda_cfg = load_hf_prompt_da(args.promptda_model)
    files = [v["instance"] for v in views]
    if all(os.path.isfile(f) for f in files):
        imgs01 = load_raw_images01(files)
    else:
        imgs01 = np.asarray(scene.imgs) * 0.5 + 0.5
    refined = rescale_depth_maps(pda_params, pda_cfg, imgs01, depths)
    for i, d in enumerate(refined):
        np.save(os.path.join(out_dir, f"frame_{i:04d}_refined.npy"), d)
    print(f"Refined {len(refined)} depth maps -> {out_dir}")


if __name__ == "__main__":
    main()
