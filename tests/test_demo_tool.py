"""End-to-end CLI smoke for tool/demo.py (reference tool/demo.py flow):
tiny reference-format checkpoint + synthetic frames with depth priors ->
full reconstruct -> the artifact set of cloud_opt_flow/base_opt.py:332-427
(poses, intrinsics, depth/conf/mask maps, WebGL scene.html)."""
import os
import sys

import numpy as np
import PIL.Image
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tool"))


@pytest.fixture(scope="module")
def demo_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("demo_in")
    rng = np.random.default_rng(0)
    H, W = 48, 64
    for i in range(4):
        arr = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(root / f"frame_{i:04d}.png")
        d = 2 + rng.random((H, W)).astype(np.float32)
        np.savez(root / f"frame_{i:04d}_pred_depth_depthpro.npz",
                 depth=d, focallength_px=np.float32(40.0))
    from golden_parity import write_selfcheck_checkpoint
    write_selfcheck_checkpoint(str(root / "tiny.pth"), H, W)
    return root


def test_demo_cli_end_to_end(demo_fixture, tmp_path):
    from tool.demo import main
    out = tmp_path / "out"
    argv = ["demo.py", "--weights", str(demo_fixture / "tiny.pth"),
            "--input_dir", str(demo_fixture), "--output_dir", str(out),
            "--seq_name", "smoke", "--image_size", "224", "--niter", "5"]
    old = sys.argv
    sys.argv = argv
    try:
        main()
    finally:
        sys.argv = old
    seq = out / "smoke"
    names = sorted(os.listdir(seq))
    for want in ("pred_traj.txt", "pred_intrinsics.txt", "scene.html",
                 "scene.glb", "frame_0000.npy", "conf_0.npy",
                 "dynamic_mask_0.png"):
        assert want in names, (want, names)
    # the .glb is a valid binary-glTF container (reference demo.py:100-130)
    import struct as _struct
    raw = (seq / "scene.glb").read_bytes()
    magic, ver, total = _struct.unpack_from("<4sII", raw, 0)
    assert magic == b"glTF" and ver == 2 and total == len(raw)
    traj = np.loadtxt(seq / "pred_traj.txt")
    assert traj.shape == (4, 8) and np.isfinite(traj).all()
    html = (seq / "scene.html").read_text()
    # the fixed lookAt z-row (+tz): a regression re-inverting the sign
    # renders every exported scene blank (r3 review finding)
    assert "[-f[0], -f[1], -f[2], tz]" in html
    depths = np.stack([np.load(seq / f"frame_{i:04d}.npy") for i in range(4)])
    assert np.isfinite(depths).all() and (depths > 0).all()


def test_demo_cli_video_input(demo_fixture, tmp_path):
    """demo.py on a VIDEO file (reference demo accepts videos through the
    same load_images entry): fps-strided decode, zero priors for frames,
    full reconstruct to the artifact set."""
    import cv2
    from tool.demo import main
    H, W, n_frames = 48, 64, 8
    vid = str(tmp_path / "clip.avi")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 12.0, (W, H))
    assert wr.isOpened()
    rng = np.random.default_rng(7)
    for _ in range(n_frames):
        wr.write(rng.integers(0, 255, (H, W, 3), np.uint8))
    wr.release()

    out = tmp_path / "vout"
    argv = ["demo.py", "--weights", str(demo_fixture / "tiny.pth"),
            "--input_dir", vid, "--output_dir", str(out),
            "--seq_name", "vid", "--image_size", "224", "--niter", "5",
            "--fps", "6"]   # every 2nd frame -> 4 views
    old = sys.argv
    sys.argv = argv
    try:
        main()
    finally:
        sys.argv = old
    seq = out / "vid"
    names = sorted(os.listdir(seq))
    assert "scene.html" in names and "pred_traj.txt" in names
    traj = np.loadtxt(seq / "pred_traj.txt")
    assert traj.shape == (4, 8) and np.isfinite(traj).all()


def test_demo_refine_cli_end_to_end(demo_fixture, tmp_path):
    """tool/demo_refine.py e2e: reconstruct then PromptDA full-resolution
    refinement, with a tiny random PromptDepthAnything saved locally (the
    HF loader path demo_refine uses, no downloads)."""
    import torch
    from transformers import PromptDepthAnythingConfig, Dinov2Config
    from transformers.models.prompt_depth_anything.modeling_prompt_depth_anything \
        import PromptDepthAnythingForDepthEstimation
    torch.manual_seed(0)
    bc = Dinov2Config(hidden_size=32, num_hidden_layers=4,
                      num_attention_heads=4, intermediate_size=64,
                      patch_size=14, image_size=70,
                      out_features=["stage1", "stage2", "stage3", "stage4"],
                      apply_layernorm=True, reshape_hidden_states=False)
    cfg = PromptDepthAnythingConfig(
        backbone_config=bc, patch_size=14, reassemble_factors=[4, 2, 1, 0.5],
        neck_hidden_sizes=[16, 24, 32, 32], fusion_hidden_size=16,
        head_hidden_size=8, reassemble_hidden_size=32,
        depth_estimation_type="metric", max_depth=1.0)
    pda_dir = str(tmp_path / "pda_tiny")
    PromptDepthAnythingForDepthEstimation(cfg).eval().save_pretrained(pda_dir)

    from tool.demo_refine import main
    out = tmp_path / "rout"
    argv = ["demo_refine.py", "--weights", str(demo_fixture / "tiny.pth"),
            "--input_dir", str(demo_fixture), "--output_dir", str(out),
            "--seq_name", "ref", "--image_size", "224", "--niter", "5",
            "--promptda_model", pda_dir]
    old = sys.argv
    sys.argv = argv
    try:
        main()
    finally:
        sys.argv = old
    seq = out / "ref"
    refined = sorted(p for p in os.listdir(seq) if p.endswith("_refined.npy"))
    assert len(refined) == 4
    # refinement runs at the ORIGINAL on-disk resolution (48x64 fixtures),
    # not the model resolution
    d = np.load(seq / refined[0])
    assert d.shape == (48, 64) and np.isfinite(d).all()
