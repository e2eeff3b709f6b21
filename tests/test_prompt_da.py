"""PromptDA JAX vs the local HF torch implementation (tiny random config)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch


@pytest.fixture(scope="module")
def hf_tiny():
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
    return PromptDepthAnythingForDepthEstimation(cfg).eval(), cfg


def test_prompt_da_matches_hf(hf_tiny):
    model, hf_cfg = hf_tiny
    from align3r_tpu.models.prompt_da import convert_hf_prompt_da, prompt_da_forward
    from align3r_tpu.models.depth_anything import config_from_hf
    cfg = config_from_hf(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_prompt_da(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 70, 84, 3)).astype(np.float32)
    prompt = rng.uniform(0.5, 4.0, (2, 24, 32, 1)).astype(np.float32)
    with torch.no_grad():
        expect = model(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2),
                       prompt_depth=torch.from_numpy(prompt).permute(0, 3, 1, 2)
                       ).predicted_depth.numpy()
    got = np.asarray(prompt_da_forward(params, jnp.asarray(x),
                                       jnp.asarray(prompt), cfg))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=5e-3, rtol=1e-3)


def test_prompt_da_no_prompt(hf_tiny):
    model, hf_cfg = hf_tiny
    from align3r_tpu.models.prompt_da import convert_hf_prompt_da, prompt_da_forward
    from align3r_tpu.models.depth_anything import config_from_hf
    cfg = config_from_hf(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_prompt_da(sd, cfg)
    x = np.random.default_rng(1).standard_normal((1, 70, 70, 3)).astype(np.float32)
    with torch.no_grad():
        expect = model(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2)
                       ).predicted_depth.numpy()
    got = np.asarray(prompt_da_forward(params, jnp.asarray(x), None, cfg))
    np.testing.assert_allclose(got, expect, atol=5e-3, rtol=1e-3)
