"""Depth Pro JAX vs the local HF torch implementation (tiny random config)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch


@pytest.fixture(scope="module")
def hf_tiny():
    from transformers import DepthProConfig, Dinov2Config
    from transformers.models.depth_pro.modeling_depth_pro import (
        DepthProForDepthEstimation)
    torch.manual_seed(0)
    vit = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
               intermediate_size=64, patch_size=8, image_size=32)
    cfg = DepthProConfig(
        patch_model_config=Dinov2Config(**vit),
        image_model_config=Dinov2Config(**vit),
        fov_model_config=Dinov2Config(**vit),
        patch_size=32, image_size=128,
        scaled_images_ratios=[0.25, 0.5, 1.0],
        scaled_images_overlap_ratios=[0.0, 0.5, 0.25],
        scaled_images_feature_dims=[32, 32, 16],
        intermediate_hook_ids=[1, 0],
        intermediate_feature_dims=[16, 16],
        fusion_hidden_size=16,
        merge_padding_value=3,
        num_fov_head_layers=2,
        use_fov_model=True,
    )
    model = DepthProForDepthEstimation(cfg, use_fov_model=True).eval()
    return model, cfg


def test_depth_pro_matches_hf(hf_tiny):
    model, hf_cfg = hf_tiny
    from align3r_tpu.models.depth_pro import (
        convert_hf_depth_pro, depth_pro_forward, config_from_hf_depth_pro)
    cfg = config_from_hf_depth_pro(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_depth_pro(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2))
        expect_depth = out.predicted_depth.numpy()
        expect_fov = out.field_of_view.numpy()
    depth, fov = depth_pro_forward(params, jnp.asarray(x), cfg)
    assert depth.shape == expect_depth.shape
    np.testing.assert_allclose(np.asarray(depth), expect_depth,
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fov), expect_fov, atol=5e-3)


def test_fov_to_focal():
    from align3r_tpu.models.depth_pro import fov_to_focal_px
    # 90 degree fov: focal = W/2
    np.testing.assert_allclose(float(fov_to_focal_px(jnp.asarray(90.0), 512)),
                               256.0, rtol=1e-6)
