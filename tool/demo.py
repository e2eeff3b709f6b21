#!/usr/bin/env python
"""Video -> depth + pose demo (TPU pipeline).

CLI surface mirrors /root/reference/tool/demo.py:30-57,468-535: load frames
(or a video) + cached monocular priors, run the sliding-window pair graph
through the Align3R network, solve the flow-variant global alignment, save
trajectory / intrinsics / depth maps / confidence / masks.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_size", type=int, default=512, choices=[512, 224])
    parser.add_argument("--weights", type=str, default="align3r_depthpro.pth",
                        help="path to the Align3R torch checkpoint")
    parser.add_argument("--output_dir", type=str, default="./demo_tmp")
    parser.add_argument("--input_dir", type=str, default="")
    parser.add_argument("--seq_name", type=str, default="bear")
    parser.add_argument("--depth_prior_name", type=str, default="depthpro",
                        choices=["depthpro", "depthanything"])
    parser.add_argument("--use_gt_davis_masks", action="store_true", default=False)
    parser.add_argument("--fps", type=int, default=0)
    parser.add_argument("--interval", type=int, default=30)
    parser.add_argument("--mode", type=str, default="eval_pose",
                        choices=["eval_pose", "eval_pose_h"])
    parser.add_argument("--raft_weights", type=str,
                        default="third_party/RAFT/models/Tartan-C-T432x960-M.pth")
    parser.add_argument("--niter", type=int, default=300)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--silent", action="store_true", default=False)
    parser.add_argument("--clip_size", type=int, default=10)
    return parser


def load_model(weights, image_size):
    from align3r_tpu.models.convert import load_torch_checkpoint
    from align3r_tpu.models.config import VIT_L_512
    if weights and os.path.exists(weights):
        return load_torch_checkpoint(weights)
    print(f"!! weights {weights!r} not found: using random ViT-L init "
          f"(structure demo only)")
    import jax
    from align3r_tpu.models.align3r import init_align3r
    cfg = VIT_L_512
    return init_align3r(jax.random.PRNGKey(0), cfg), cfg


def main():
    args = get_args_parser().parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    out_dir = os.path.join(args.output_dir, args.seq_name)
    os.makedirs(out_dir, exist_ok=True)

    from align3r_tpu.inference.images import load_images, stack_views
    from align3r_tpu.pipeline import (reconstruct_scene,
                                      reconstruct_scene_hierarchical)

    params, cfg = load_model(args.weights, args.image_size)

    views = load_images(args.input_dir, args.image_size, verbose=not args.silent,
                        fps=args.fps, interval=args.interval, traj_format="default",
                        depth_prior_name=args.depth_prior_name,
                        dynamic_mask_root=None)
    stacked = stack_views(views)

    raft_params, raft_kind = None, "raft2"
    flow_w = 0.0
    if os.path.exists(args.raft_weights):
        from align3r_tpu.models.raft1 import load_raft_auto
        raft_params, raft_kind = load_raft_auto(args.raft_weights)
        flow_w = 0.01

    scene_kw = dict(shared_focal=True, temporal_smoothing_weight=0.01,
                    translation_weight=1.0, flow_loss_weight=flow_w,
                    flow_loss_start_epoch=0.1, flow_loss_thre=25,
                    min_conf_thr=1.1)
    common = dict(variant="flow", raft_params=raft_params,
                  raft_kind=raft_kind,
                  use_self_mask=not args.use_gt_davis_masks,
                  dynamic_masks=(stacked["dynamic_masks"]
                                 if args.use_gt_davis_masks else None),
                  niter=args.niter, lr=0.01, schedule="linear",
                  batch_size=args.batch_size, scene_kw=scene_kw)

    if args.mode == "eval_pose_h" and len(views) > args.clip_size + 1:
        _, poses, depths = reconstruct_scene_hierarchical(
            stacked["imgs"], stacked["priors"], params, cfg,
            clip_size=args.clip_size, **common)
        from align3r_tpu.eval.trajectory import poses_to_traj, save_tum_trajectory
        save_tum_trajectory(poses_to_traj(poses), os.path.join(out_dir, "pred_traj.txt"))
        np.save(os.path.join(out_dir, "depth_maps.npy"), depths)
    else:
        scene = reconstruct_scene(stacked["imgs"], stacked["priors"],
                                  params, cfg,
                                  scene_graph="swinstride-5-noncyclic", **common)
        scene.save_tum_poses(os.path.join(out_dir, "pred_traj.txt"))
        scene.save_intrinsics(os.path.join(out_dir, "pred_intrinsics.txt"))
        scene.save_focals(os.path.join(out_dir, "pred_focals.txt"))
        scene.save_depth_maps(out_dir)
        scene.save_conf_maps(out_dir)
        scene.save_dynamic_masks(out_dir)
        scene.save_rgb_imgs(out_dir)
        # interactive standalone viewer (gradio-demo substitute,
        # reference dust3r/demo.py:1-283)
        from align3r_tpu.eval.html_viewer import export_scene_result_html
        export_scene_result_html(scene, os.path.join(out_dir, "scene.html"),
                                 title=args.seq_name)
        # self-contained .glb (reference demo.py:100-130 scene.glb export)
        from align3r_tpu.eval.glb import export_scene_result_glb
        export_scene_result_glb(scene, os.path.join(out_dir, "scene.glb"))
    print(f"Processing completed. Output saved in {out_dir}")


if __name__ == "__main__":
    main()
