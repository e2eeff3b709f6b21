#!/usr/bin/env python
"""Video depth evaluation (Sintel / Bonn / TUM / DAVIS / KITTI / ...).

Behavioural reference: /root/reference/tool/depth_test.py:551-835 — per
sequence: hierarchical keyframe-then-clip solves with the PRIOR-variant
aligner (mono scalemap parameterisation when --if_use_mono), per-sequence
scale&shift alignment to GT (LAD default), AbsRel/SqRel/RMSE/LogRMSE/δ
metrics, pixel-weighted dataset averages.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--eval_dataset", type=str, default="sintel")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--output_postfix", type=str, default="")
    p.add_argument("--weights", type=str, default="align3r_depthpro.pth")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--niter", type=int, default=300)
    p.add_argument("--schedule", type=str, default="cosine")
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--min_conf_thr", type=float, default=1.1)
    p.add_argument("--depth_prior_name", type=str, default="depthpro")
    p.add_argument("--if_use_mono", action="store_true", default=False,
                   help="optimise per-pixel log scalemaps + shifts on top of "
                        "the frozen monocular prior depths")
    p.add_argument("--depth_max", type=float, default=70.0)
    p.add_argument("--align", type=str, default="lad",
                   choices=["lad", "lad2", "lstsq", "scale", "median"])
    p.add_argument("--crop_size", type=int, default=50, help="clip size")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--full_seq", action="store_true", default=False)
    p.add_argument("--seq_list", nargs="+", default=None)
    p.add_argument("--n_proc", type=int, default=1)
    p.add_argument("--proc_id", type=int, default=0)
    p.add_argument("--overwrite", action="store_true", default=False)
    return p


def load_gt_depths(dataset, seq, n, meta):
    """Load ground-truth depths for supported datasets; None if unavailable."""
    if dataset == "sintel":
        depth_dir = os.path.join("./data/sintel/training/depth", seq)
        if not os.path.isdir(depth_dir):
            return None
        from align3r_tpu.utils.sintel_io import depth_read
        files = sorted(glob.glob(os.path.join(depth_dir, "*.dpt")))[:n]
        return np.stack([depth_read(f) for f in files]) if files else None
    if dataset in ("bonn", "tum"):
        base = meta.seq_dir(meta.img_path, seq).replace("rgb_110", "depth_110") \
            .replace("rgb_50", "depth_50")
        if not os.path.isdir(base):
            return None
        import PIL.Image
        files = sorted(glob.glob(os.path.join(base, "*.png")))[:n]
        scale = 5000.0
        return np.stack([np.asarray(PIL.Image.open(f), np.float32) / scale
                         for f in files]) if files else None
    return None


def main():
    args = get_args_parser().parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    from align3r_tpu.eval.metadata import dataset_metadata
    from align3r_tpu.eval.depth_metrics import evaluate_sequence_depth, average_metrics
    from align3r_tpu.inference.images import load_images, stack_views, crop_img
    from align3r_tpu.parallel.mesh import process_slice
    from align3r_tpu.pipeline import reconstruct_scene, reconstruct_scene_hierarchical
    from tool.demo import load_model

    meta = dataset_metadata[args.eval_dataset]
    seqs = args.seq_list or meta.sequences(args.full_seq or None)
    seqs = process_slice(seqs, args.n_proc, args.proc_id)

    params, cfg = load_model(args.weights, args.image_size)
    per_seq = []
    for seq in seqs:
        # resume interrupted sweeps (reference eval_metadata skip_condition)
        done = os.path.join(args.output_dir, f"{seq}_depths.npy")
        if not getattr(args, "overwrite", False) and os.path.exists(done):
            print(f"skip {seq} (done; --overwrite to redo)")
            continue
        img_dir = meta.seq_dir(meta.img_path, seq)
        views = load_images(img_dir, args.image_size,
                            traj_format=meta.traj_format or "sintel",
                            depth_prior_name=args.depth_prior_name)
        stacked = stack_views(views)
        n = stacked["imgs"].shape[0]
        mono = None
        if args.if_use_mono:
            # prior pointcloud z-channel (normalised) as frozen mono depth
            mono = stacked["priors"][..., 2].reshape(n, -1)
        common = dict(variant="prior", mono_depths=mono, niter=args.niter,
                      lr=args.lr, schedule=args.schedule,
                      batch_size=args.batch_size, conf_clamp=10.0,
                      scene_kw=dict(min_conf_thr=args.min_conf_thr))
        if n > args.crop_size + 1:
            _, poses, depths = reconstruct_scene_hierarchical(
                stacked["imgs"], stacked["priors"], params, cfg,
                clip_size=args.crop_size, **common)
            np.save(os.path.join(args.output_dir, f"{seq}_depths.npy"), depths)
        else:
            scene = reconstruct_scene(stacked["imgs"], stacked["priors"],
                                      params, cfg, scene_graph="complete",
                                      **common)
            depths = scene.get_depthmaps()
            np.save(os.path.join(args.output_dir, f"{seq}_depths.npy"), depths)

        gt = load_gt_depths(args.eval_dataset, seq, n, meta)
        if gt is not None and args.eval:
            # resize GT to prediction resolution via centre-crop protocol
            import cv2
            H, W = depths.shape[1:]
            gt_r = np.stack([cv2.resize(g, (W, H), interpolation=cv2.INTER_NEAREST)
                             for g in gt[:depths.shape[0]]])
            m = evaluate_sequence_depth(depths[:gt_r.shape[0]], gt_r,
                                        align=args.align,
                                        depth_max=args.depth_max)
            m["seq"] = seq
            per_seq.append(m)
            print(seq, {k: round(v, 4) for k, v in m.items()
                        if isinstance(v, float)})

    if per_seq:
        avg = average_metrics([{k: v for k, v in m.items() if k != "seq"}
                               for m in per_seq])
        print("Average depth evaluation metrics:", avg)
        with open(os.path.join(args.output_dir, f"_metrics_{args.proc_id}.txt"), "w") as f:
            for k, v in avg.items():
                f.write(f"{k}: {v}\n")


if __name__ == "__main__":
    main()
