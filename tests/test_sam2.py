"""SAM2 image model JAX vs the local HF torch implementation (tiny config)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch


@pytest.fixture(scope="module")
def hf_tiny():
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig, Sam2VisionConfig, Sam2PromptEncoderConfig,
        Sam2MaskDecoderConfig, Sam2Config)
    from transformers.models.sam2.modeling_sam2 import Sam2Model
    torch.manual_seed(0)
    hiera = Sam2HieraDetConfig(
        hidden_size=16, num_attention_heads=1, image_size=128,
        patch_kernel_size=7, patch_stride=4, patch_padding=3,
        query_stride=[2, 2], window_positional_embedding_background_size=[4, 4],
        num_query_pool_stages=3, blocks_per_stage=[1, 2, 1, 1],
        embed_dim_per_stage=[16, 32, 64, 128],
        num_attention_heads_per_stage=[1, 2, 4, 8],
        window_size_per_stage=[4, 2, 4, 2], global_attention_blocks=[2],
        mlp_ratio=2.0)
    vision = Sam2VisionConfig(
        backbone_config=hiera, backbone_channel_list=[128, 64, 32, 16],
        fpn_hidden_size=32, fpn_top_down_levels=[2, 3], num_feature_levels=3,
        backbone_feature_sizes=[[32, 32], [16, 16], [8, 8]])
    prompt = Sam2PromptEncoderConfig(hidden_size=32, image_size=128,
                                     patch_size=16, mask_input_channels=8)
    decoder = Sam2MaskDecoderConfig(hidden_size=32, mlp_dim=64,
                                    num_hidden_layers=2, num_attention_heads=2,
                                    iou_head_depth=3, iou_head_hidden_dim=32,
                                    dynamic_multimask_via_stability=True)
    cfg = Sam2Config(vision_config=vision, prompt_encoder_config=prompt,
                     mask_decoder_config=decoder)
    model = Sam2Model(cfg).eval()
    # make learned embeddings non-trivial
    with torch.no_grad():
        for emb in (model.no_memory_embedding,):
            emb.normal_(0, 0.1)
        model.vision_encoder.backbone.pos_embed.normal_(0, 0.02)
        model.vision_encoder.backbone.pos_embed_window.normal_(0, 0.02)
    return model, cfg


def _convert(model, cfg):
    from align3r_tpu.models.sam2 import convert_hf_sam2, config_from_hf_sam2
    jcfg = config_from_hf_sam2(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_hf_sam2(sd, jcfg), jcfg


def test_sam2_no_prompt_matches_hf(hf_tiny):
    model, cfg = hf_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2 import sam2_image_forward
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2),
                    multimask_output=False)
    masks, iou, obj = sam2_image_forward(params, jnp.asarray(x), None, jcfg,
                                         multimask_output=False)
    expect = out.pred_masks.numpy()
    assert np.asarray(masks).shape == expect.shape
    np.testing.assert_allclose(np.asarray(masks), expect, atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(iou), out.iou_scores.numpy(),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(obj), out.object_score_logits.numpy(),
                               atol=5e-3)


def test_sam2_mask_prompt_matches_hf(hf_tiny):
    model, cfg = hf_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2 import sam2_image_forward
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    # mask prompt at the model's mask input size (4 * 128/16 = 32)
    m = (rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32) * 8 - 4
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2),
                    input_masks=torch.from_numpy(m).permute(0, 3, 1, 2),
                    multimask_output=False)
    masks, iou, obj = sam2_image_forward(params, jnp.asarray(x),
                                         jnp.asarray(m), jcfg,
                                         multimask_output=False)
    np.testing.assert_allclose(np.asarray(masks), out.pred_masks.numpy(),
                               atol=5e-3, rtol=1e-2)


def test_sam2_point_prompt_matches_hf(hf_tiny):
    model, cfg = hf_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2 import sam2_image_forward
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    pts = np.array([[[[40.0, 60.0], [90.0, 30.0]]]], np.float32)  # (1,1,2,2)
    lab = np.array([[[1, 0]]], np.int64)
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2),
                    input_points=torch.from_numpy(pts),
                    input_labels=torch.from_numpy(lab),
                    multimask_output=True)
    masks, iou, obj = sam2_image_forward(
        params, jnp.asarray(x), None, jcfg, multimask_output=True,
        input_points=jnp.asarray(pts), input_labels=jnp.asarray(lab))
    np.testing.assert_allclose(np.asarray(masks), out.pred_masks.numpy(),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(iou), out.iou_scores.numpy(),
                               atol=5e-3)


def test_sam2_box_prompt_matches_hf(hf_tiny):
    model, cfg = hf_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2 import sam2_image_forward
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    boxes = np.array([[[20.0, 30.0, 90.0, 100.0]]], np.float32)  # (1,1,4)
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2),
                    input_boxes=torch.from_numpy(boxes),
                    multimask_output=False)
    masks, iou, obj = sam2_image_forward(
        params, jnp.asarray(x), None, jcfg, multimask_output=False,
        input_boxes=jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(masks), out.pred_masks.numpy(),
                               atol=5e-3, rtol=1e-2)
