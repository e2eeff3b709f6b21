"""Depth Anything V2 JAX vs the local HF torch implementation (tiny random
config — the HF model is the numeric oracle, no downloads)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch


@pytest.fixture(scope="module")
def hf_tiny():
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
    model = DepthAnythingForDepthEstimation(cfg).eval()
    # make layer-scales non-trivial so the test exercises them
    with torch.no_grad():
        for layer in model.backbone.encoder.layer:
            layer.layer_scale1.lambda1.fill_(0.7)
            layer.layer_scale2.lambda1.fill_(1.3)
    return model, cfg


def test_depth_anything_matches_hf(hf_tiny):
    model, hf_cfg = hf_tiny
    from align3r_tpu.models.depth_anything import (
        convert_hf_depth_anything, depth_anything_forward, config_from_hf)
    cfg = config_from_hf(hf_cfg)
    assert cfg.out_indices == (1, 2, 3, 4)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_depth_anything(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 70, 84, 3)).astype(np.float32)
    with torch.no_grad():
        ours_in = torch.from_numpy(x).permute(0, 3, 1, 2)
        expect = model(pixel_values=ours_in).predicted_depth.numpy()
    got = np.asarray(depth_anything_forward(params, jnp.asarray(x), cfg))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=2e-3, rtol=1e-3)


def test_depth_anything_pos_interp(hf_tiny):
    """Non-native grid exercises position-embedding interpolation."""
    model, hf_cfg = hf_tiny
    from align3r_tpu.models.depth_anything import (
        convert_hf_depth_anything, depth_anything_forward, config_from_hf)
    cfg = config_from_hf(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_depth_anything(sd, cfg)
    x = np.random.default_rng(1).standard_normal((1, 56, 112, 3)).astype(np.float32)
    got = np.asarray(depth_anything_forward(params, jnp.asarray(x), cfg))
    assert got.shape == (1, 56, 112)
    assert np.isfinite(got).all() and got.min() >= 0  # relu'd relative depth
