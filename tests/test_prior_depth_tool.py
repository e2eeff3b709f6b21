"""E2E for tool/prior_depth.py (reference demo.py
generate_monocular_depth_maps:100-118): tiny local Depth Anything ->
cached `<frame>_pred_depth_depthanything.npz` files that round-trip
through load_images' prior convention."""
import os
import sys

import numpy as np
import PIL.Image
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tool"))


def test_prior_depth_cli_and_roundtrip(tmp_path):
    from transformers import DepthAnythingConfig, Dinov2Config
    from transformers.models.depth_anything.modeling_depth_anything import (
        DepthAnythingForDepthEstimation)
    torch.manual_seed(0)
    bc = Dinov2Config(hidden_size=32, num_hidden_layers=4,
                      num_attention_heads=4, intermediate_size=64,
                      patch_size=14, image_size=70,
                      out_features=["stage1", "stage2", "stage3", "stage4"],
                      apply_layernorm=True, reshape_hidden_states=False)
    cfg = DepthAnythingConfig(backbone_config=bc, patch_size=14,
                              reassemble_factors=[4, 2, 1, 0.5],
                              neck_hidden_sizes=[16, 24, 32, 32],
                              fusion_hidden_size=16, head_hidden_size=8,
                              reassemble_hidden_size=32,
                              depth_estimation_type="relative", max_depth=1.0)
    da_dir = str(tmp_path / "da_tiny")
    DepthAnythingForDepthEstimation(cfg).eval().save_pretrained(da_dir)

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    H, W = 42, 56
    for i in range(3):
        PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            frames / f"frame_{i:03d}.png")

    from tool.prior_depth import main
    old = sys.argv
    sys.argv = ["prior_depth.py", "--input_dir", str(frames),
                "--depth_prior_name", "depthanything",
                "--model_path", da_dir, "--batch_size", "2"]
    try:
        main()
    finally:
        sys.argv = old

    for i in range(3):
        f = frames / f"frame_{i:03d}_pred_depth_depthanything.npz"
        assert f.exists()
        z = np.load(f)
        assert z["depth"].shape == (H, W) and np.isfinite(z["depth"]).all()
        assert float(z["focallength_px"]) == 200.0   # relative-depth pseudo-focal

    # the demo entry finds and consumes the cached priors
    from align3r_tpu.inference.images import load_images
    views = load_images(str(frames), size=56, traj_format="other", crop=False,
                        depth_prior_name="depthanything")
    assert len(views) == 3
    assert float(np.abs(views[0]["pred_depth"][..., 2]).max()) > 0
