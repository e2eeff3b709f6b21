#!/usr/bin/env python
"""Video depth evaluation (Sintel / Bonn / TUM / DAVIS / PointOdyssey /
FlyingThings3D).

Behavioural reference: /root/reference/tool/depth_test.py:551-835 — per
sequence: hierarchical keyframe-then-clip solves with the PRIOR-variant
aligner (mono scalemap parameterisation when --if_use_mono), PromptDA
full-resolution rescaling of the optimised depths (rescale_depth_maps,
ref 535-549, 690), per-sequence scale&shift alignment to GT (LAD default,
ref 724-726), AbsRel/SqRel/RMSE/LogRMSE/δ metrics computed at the GT's
native resolution (ref 690-823), pixel-weighted dataset averages.

Protocol notes mirrored from the reference loader (load_images_my:247-385):
frames are capped at 110 per sequence; PointOdyssey/FlyingThings3D use only
'*_rgb.jpg' frames with '*_depth.pfm' ground truth beside them; DAVIS has no
GT depth and scores against the monocular prior (ref 333: depth=pred_depth1);
FlyingThings3D evaluates every 20th TEST sequence (ref 606).
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MAX_FRAMES = 110  # reference load_images_my caps at 110 frames (ref 273)


def get_args_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--eval_dataset", type=str, default="sintel",
                   choices=["sintel", "bonn", "tum", "davis", "PointOdyssey",
                            "FlyingThings3D"])
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
    p.add_argument("--no_promptda", action="store_true", default=False,
                   help="skip PromptDA full-res refinement even if weights "
                        "are cached (bilinear upsampling instead)")
    p.add_argument("--promptda_model", type=str,
                   default="depth-anything/prompt-depth-anything-vitl-hf")
    p.add_argument("--full_seq", action="store_true", default=False)
    p.add_argument("--seq_list", nargs="+", default=None)
    p.add_argument("--n_proc", type=int, default=1)
    p.add_argument("--proc_id", type=int, default=0)
    p.add_argument("--overwrite", action="store_true", default=False)
    return p


def list_frames(dataset, img_dir):
    """Frame files for a sequence with the per-protocol filter
    (reference supported_images_extensions, depth_test.py:256-261)."""
    if dataset in ("PointOdyssey", "FlyingThings3D"):
        exts = ("rgb.jpg", ".jpeg", "rgb.png")
    else:
        exts = (".jpg", ".jpeg", ".png")
    files = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))
             if f.lower().endswith(exts)]
    return files[:MAX_FRAMES]


def load_gt_depths(dataset, img_files, depth_prior_name="depthpro"):
    """Ground-truth depths at their NATIVE resolution (the reference never
    downsizes GT; predictions are upsampled to it). None if unavailable."""
    first = img_files[0]
    if dataset == "sintel":
        from align3r_tpu.utils.sintel_io import depth_read
        paths = [f.replace("MPI-Sintel-training_images", "MPI-Sintel-depth-training")
                 .replace("clean/", "depth/").replace(".png", ".dpt")
                 for f in img_files]
        # plain layouts: training/clean -> training/depth
        paths = [p if os.path.exists(p) else
                 p.replace("/clean", "/depth").replace(".png", ".dpt")
                 for p in paths]
        if not os.path.exists(paths[0]):
            return None
        return np.stack([depth_read(p) for p in paths])
    if dataset in ("bonn", "tum"):
        tag = "rgb_110" if dataset == "bonn" else "rgb_50"
        dtag = tag.replace("rgb", "depth")
        ddir = os.path.dirname(first).replace(tag, dtag)
        if not os.path.isdir(ddir):
            return None
        import PIL.Image
        files = sorted(glob.glob(os.path.join(ddir, "*.png")))[:len(img_files)]
        # 16-bit depth PNG / 5000 (TUM convention; ref depth_read_bonn:197)
        return np.stack([np.asarray(PIL.Image.open(f), np.float32) / 5000.0
                         for f in files]) if files else None
    if dataset in ("PointOdyssey", "FlyingThings3D"):
        from align3r_tpu.training.data.datasets import read_pfm
        paths = [f.replace("_rgb.jpg", "_depth.pfm").replace("_rgb.png", "_depth.pfm")
                 for f in img_files]
        if not os.path.exists(paths[0]):
            return None
        return np.stack([np.ascontiguousarray(read_pfm(p)) for p in paths])
    if dataset == "davis":
        # no GT depth: the reference scores against the raw monocular prior
        # (depth_test.py:333 depth = pred_depth1)
        from align3r_tpu.inference.images import prior_depth_path
        fmt = "davis"
        out = []
        for f in img_files:
            p = prior_depth_path(f, fmt, depth_prior_name)
            if not os.path.exists(p):
                return None
            d = np.asarray(np.load(p, allow_pickle=True)["depth"])
            out.append(np.squeeze(d))
        return np.stack(out)
    return None


def load_raw_images01(img_files):
    """Original-resolution frames in [0, 1] for the PromptDA refinement."""
    import PIL.Image
    from PIL.ImageOps import exif_transpose
    return np.stack([np.asarray(exif_transpose(PIL.Image.open(f)).convert("RGB"),
                                np.float32) / 255.0 for f in img_files])


def upsample_predictions(depths, img_files, gt_hw, promptda=None):
    """Predicted depths (n, h, w) at model res -> (n, H, W) at GT res.

    With PromptDA weights: prompt-conditioned full-res refinement using the
    raw frames (reference rescale_depth_maps, depth_test.py:535-549) then
    bilinear to GT res. Without: plain bilinear upsampling (the reference's
    documented alternative, 692)."""
    H, W = gt_hw
    if promptda is not None:
        from align3r_tpu.models.prompt_da import rescale_depth_maps
        raw = load_raw_images01(img_files)
        if raw.shape[1:3] != (H, W):  # PromptDA targets the raw-frame res
            import cv2
            raw = np.stack([cv2.resize(r, (W, H)) for r in raw])
        return rescale_depth_maps(promptda[0], promptda[1], raw, depths)
    import cv2
    return np.stack([cv2.resize(d, (W, H), interpolation=cv2.INTER_LINEAR)
                     for d in depths])


def maybe_load_promptda(args):
    if args.no_promptda:
        return None
    try:
        import huggingface_hub
        huggingface_hub.snapshot_download(args.promptda_model,
                                          local_files_only=True)
        from align3r_tpu.models.prompt_da import load_hf_prompt_da
        return load_hf_prompt_da(args.promptda_model)
    except Exception as e:
        print(f"PromptDA unavailable ({type(e).__name__}); "
              "using bilinear upsampling to GT resolution")
        return None


def main():
    args = get_args_parser().parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    from align3r_tpu.eval.metadata import dataset_metadata
    from align3r_tpu.eval.depth_metrics import evaluate_sequence_depth, average_metrics
    from align3r_tpu.inference.images import load_images, stack_views
    from align3r_tpu.parallel.mesh import process_slice
    from align3r_tpu.pipeline import reconstruct_scene, reconstruct_scene_hierarchical
    from tool.demo import load_model

    meta = dataset_metadata[args.eval_dataset]
    seqs = args.seq_list or meta.sequences(args.full_seq or None)
    seqs = process_slice(seqs, args.n_proc, args.proc_id)

    params, cfg = load_model(args.weights, args.image_size)
    promptda = maybe_load_promptda(args)
    per_seq = []
    for seq in seqs:
        # resume interrupted sweeps (reference eval_metadata skip_condition)
        seq_tag = seq.replace("/", "_")
        done = os.path.join(args.output_dir, f"{seq_tag}_depths.npy")
        if not args.overwrite and os.path.exists(done):
            print(f"skip {seq} (done; --overwrite to redo)")
            continue
        img_dir = meta.seq_dir(meta.img_path, seq)
        img_files = list_frames(args.eval_dataset, img_dir)
        views = load_images(img_files, args.image_size,
                            traj_format=meta.traj_format or args.eval_dataset,
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
        else:
            scene = reconstruct_scene(stacked["imgs"], stacked["priors"],
                                      params, cfg, scene_graph="complete",
                                      **common)
            depths = scene.get_depthmaps()
        np.save(done, depths)

        gt = load_gt_depths(args.eval_dataset, img_files,
                            args.depth_prior_name)
        if gt is not None and args.eval:
            # evaluate at GT resolution: upsample predictions (PromptDA or
            # bilinear), never downsize GT (ref 690-763)
            gt = gt[:depths.shape[0]]
            pred_full = upsample_predictions(depths[:gt.shape[0]],
                                             img_files[:gt.shape[0]],
                                             gt.shape[1:3], promptda)
            m = evaluate_sequence_depth(pred_full, gt, align=args.align,
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
            f.write(f"valid_pixels: {sum(m['valid_pixels'] for m in per_seq)}\n")


if __name__ == "__main__":
    main()
