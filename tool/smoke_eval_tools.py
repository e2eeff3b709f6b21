"""Real-TPU smoke of the eval tools (VERDICT r3 next #6).

Builds tiny synthetic fixtures on disk and runs tool/depth_test.py and
tool/pose_test.py full-protocol at the REAL model size (random ViT-L init
— no weights in this container), so every Mosaic kernel the tools dispatch
is exercised on hardware, not just in the CPU-fixture tests. Also runs the
flow-variant reconstruct_scene with a random-init RAFT so the RAFT + motion
-mask path gets a TPU pass (pose_test without RAFT weights runs
flow_loss_weight=0).

Usage: python tool/smoke_eval_tools.py [--which depth|pose|flow|all]
       [--root /tmp/eval_smoke] [--niter 30]
CPU-fixture protocol equivalents live in tests/test_depth_tool.py and
tests/test_pose_tool.py; this script is the hardware pass.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_depth_fixture(root: str, n_frames: int = 6, gt_hw=(96, 128)):
    """PointOdyssey_proc val layout: *_rgb.jpg at 288x512, native-res GT
    pfm, depthpro prior npz (what tool/depth_test.py discovers)."""
    import PIL.Image
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "datasets_preprocess"))
    from datasets_preprocess.common import write_pfm

    seq_dir = os.path.join(root, "data", "PointOdyssey_proc", "val", "seqA")
    os.makedirs(seq_dir)
    rng = np.random.default_rng(0)
    H, W = gt_hw
    for i in range(n_frames):
        img = rng.uniform(0, 255, (288, 512, 3)).astype(np.uint8)
        PIL.Image.fromarray(img).save(os.path.join(seq_dir, f"{i:04d}_rgb.jpg"))
        depth = (2.0 + 0.5 * np.sin(np.arange(W) / 7)[None, :] + 0.1 * i
                 + np.zeros((H, W), np.float32))
        write_pfm(os.path.join(seq_dir, f"{i:04d}_depth.pfm"),
                  depth.astype(np.float32))
        np.savez(os.path.join(seq_dir, f"{i:04d}_rgb_pred_depth_depthpro.npz"),
                 depth=depth.astype(np.float32),
                 focallength_px=np.float32(300.0))


def make_pose_fixture(root: str, n_frames: int = 6):
    """scannetv2 layout: color_30/*.png + pose_30.txt replica rows."""
    import PIL.Image
    seq_dir = os.path.join(root, "data", "scannetv2", "scene0", "color_30")
    os.makedirs(seq_dir)
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (288, 512, 3))
    rows = []
    for i in range(n_frames):
        img = np.clip(base + 10 * np.sin(np.arange(512) / 5 + i)[None, :, None],
                      0, 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(os.path.join(seq_dir, f"{i:06d}.png"))
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0.02 * i, 0.01 * i * i]
        c, s = np.cos(0.05 * i), np.sin(0.05 * i)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        rows.append(T[:3].reshape(-1))
    np.savetxt(os.path.join(root, "data", "scannetv2", "scene0",
                            "pose_30.txt"), np.stack(rows))


def run_depth(root: str, niter: int, image_size: int = 512):
    make_depth_fixture(root)
    os.chdir(root)
    sys.argv = ["depth_test", "--eval_dataset", "PointOdyssey",
                "--output_dir", os.path.join(root, "out_depth"),
                "--image_size", str(image_size),
                "--niter", str(niter), "--crop_size", "4"]
    t0 = time.perf_counter()
    import tool.depth_test as DT
    DT.main()
    print(f"[smoke] depth_test OK in {time.perf_counter()-t0:.0f}s "
          f"(incl. compile)", flush=True)


def run_pose(root: str, niter: int, image_size: int = 512):
    make_pose_fixture(root)
    os.chdir(root)
    out = os.path.join(root, "out_pose")
    sys.argv = ["pose_test", "--eval_dataset", "scannet",
                "--output_dir", out, "--niter", str(niter),
                "--image_size", str(image_size),
                "--batch_size", "8", "--lr", "0.05"]
    t0 = time.perf_counter()
    import tool.pose_test as PT
    PT.main()
    res = os.path.join(out, "_results_0.txt")
    assert os.path.exists(res), "pose_test produced no metric table"
    print(open(res).read())
    err = os.path.join(out, "_error_log_0.txt")
    assert not os.path.exists(err), open(err).read()
    print(f"[smoke] pose_test OK in {time.perf_counter()-t0:.0f}s "
          f"(incl. compile)", flush=True)


def run_flow(niter: int):
    """flow-variant reconstruct_scene with random RAFT: exercises the RAFT
    solve + occlusion/motion masks + flow loss on TPU."""
    import jax
    from align3r_tpu.models.config import VIT_L_512
    from align3r_tpu.models.align3r import init_align3r
    from align3r_tpu.models.raft import init_raft, SPRING_M
    from align3r_tpu.pipeline import reconstruct_scene

    cfg = VIT_L_512
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    raft = init_raft(jax.random.PRNGKey(1), SPRING_M)
    rng = np.random.default_rng(0)
    n, H, W = 6, 288, 512
    imgs = rng.uniform(-1, 1, (n, H, W, 3)).astype(np.float32)
    priors = rng.uniform(0, 1, (n, H, W, 3)).astype(np.float32)
    t0 = time.perf_counter()
    scene = reconstruct_scene(imgs, priors, params, cfg,
                              scene_graph="swin-2-noncyclic", variant="flow",
                              raft_params=raft, use_self_mask=True,
                              niter=niter, lr=0.01)
    poses = np.asarray(scene.get_im_poses())
    depths = np.stack([np.asarray(d) for d in scene.get_depthmaps()])
    ok = np.isfinite(poses).all() and np.isfinite(depths).all()
    print(f"[smoke] flow-variant scene OK in {time.perf_counter()-t0:.0f}s: "
          f"poses {poses.shape}, depths {depths.shape}, finite={ok}",
          flush=True)
    assert ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all",
                    choices=("depth", "pose", "flow", "all"))
    ap.add_argument("--root", default="/tmp/eval_smoke")
    ap.add_argument("--niter", type=int, default=30)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + CPU backend (script self-check; the "
                         "real smoke runs ViT-L on TPU)")
    args = ap.parse_args()
    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")
        from align3r_tpu.models.config import TINY_TEST
        from align3r_tpu.models.align3r import init_align3r
        import tool.demo as D

        def _tiny(*_a, **_k):
            cfg = TINY_TEST
            params = init_align3r(jax.random.PRNGKey(0), cfg)
            for h in ("head1", "head2"):
                hc = dict(params[h])
                hc["head_conv3"] = {
                    "kernel": params[h]["head_conv3"]["kernel"] * 0.01,
                    "bias": params[h]["head_conv3"]["bias"] * 0.0}
                params = dict(params, **{h: hc})
            return params, cfg

        D.load_model = _tiny
    if args.which in ("depth", "pose", "all"):
        shutil.rmtree(args.root, ignore_errors=True)
        os.makedirs(args.root)
    cwd = os.getcwd()
    image_size = 64 if args.tiny else 512
    if args.which in ("depth", "all"):
        run_depth(args.root, args.niter, image_size)
        os.chdir(cwd)
    if args.which in ("pose", "all"):
        run_pose(args.root, args.niter, image_size)
        os.chdir(cwd)
    if args.which in ("flow", "all"):
        if args.tiny:
            print("[smoke] flow skipped under --tiny (uses ViT-L directly)")
        else:
            run_flow(args.niter)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
