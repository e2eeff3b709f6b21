"""SAM2 VIDEO memory components vs the local HF torch implementation."""
import types

import numpy as np
import jax.numpy as jnp
import pytest
import torch


@pytest.fixture(scope="module")
def hf_video_tiny():
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig, Sam2VisionConfig)
    from transformers.models.sam2_video.configuration_sam2_video import (
        Sam2VideoPromptEncoderConfig, Sam2VideoMaskDecoderConfig,
        Sam2VideoConfig)
    from transformers.models.sam2_video.modeling_sam2_video import (
        Sam2VideoModel)
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
        fpn_hidden_size=64, fpn_top_down_levels=[2, 3], num_feature_levels=3,
        backbone_feature_sizes=[[32, 32], [16, 16], [8, 8]])
    prompt = Sam2VideoPromptEncoderConfig(hidden_size=64, image_size=128,
                                          patch_size=16, mask_input_channels=8)
    decoder = Sam2VideoMaskDecoderConfig(
        hidden_size=64, mlp_dim=128, num_hidden_layers=2,
        num_attention_heads=2, iou_head_depth=3, iou_head_hidden_dim=32,
        dynamic_multimask_via_stability=True)
    cfg = Sam2VideoConfig(
        vision_config=vision.to_dict(), prompt_encoder_config=prompt,
        mask_decoder_config=decoder, image_size=128, num_maskmem=3,
        max_object_pointers_in_encoder=4,
        memory_attention_hidden_size=64, memory_attention_num_layers=2,
        memory_attention_num_attention_heads=2,
        memory_attention_downsample_rate=1,
        memory_attention_feed_forward_hidden_size=128,
        memory_attention_rope_feat_sizes=[8, 8],
        memory_encoder_hidden_size=64, memory_encoder_output_channels=64,
        mask_downsampler_embed_dim=64, memory_fuser_num_layers=2,
        memory_fuser_embed_dim=64, memory_fuser_intermediate_dim=128)
    model = Sam2VideoModel(cfg).eval()
    with torch.no_grad():
        # zero-initialised learned embeddings -> make them non-trivial
        model.no_memory_embedding.normal_(0, 0.1)
        model.no_object_pointer.normal_(0, 0.1)
        model.memory_temporal_positional_encoding.normal_(0, 0.1)
        model.occlusion_spatial_embedding_parameter.normal_(0, 0.1)
        model.vision_encoder.backbone.pos_embed.normal_(0, 0.02)
        model.vision_encoder.backbone.pos_embed_window.normal_(0, 0.02)
    return model, cfg


def _convert(model, cfg):
    from align3r_tpu.models.sam2_video import (convert_hf_sam2_video,
                                               config_from_hf_sam2_video)
    jcfg = config_from_hf_sam2_video(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_hf_sam2_video(sd, jcfg), jcfg


def test_memory_encoder_matches_hf(hf_video_tiny):
    model, cfg = hf_video_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2_video import memory_encoder
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((1, 8, 8, 64)).astype(np.float32)
    mask = rng.standard_normal((1, 128, 128, 1)).astype(np.float32)
    with torch.no_grad():
        tf, tp = model.memory_encoder(
            torch.from_numpy(feat).permute(0, 3, 1, 2),
            torch.from_numpy(mask).permute(0, 3, 1, 2))
    jf, jp = memory_encoder(params["memory_encoder"], jnp.asarray(feat),
                            jnp.asarray(mask), jcfg)
    np.testing.assert_allclose(np.asarray(jf).transpose(0, 3, 1, 2),
                               tf.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jp),
                               tp[0].permute(1, 2, 0).numpy(), atol=1e-5)


def test_memory_attention_matches_hf(hf_video_tiny):
    model, cfg = hf_video_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2_video import memory_attention
    rng = np.random.default_rng(1)
    HW, B, C, D = 64, 1, 64, 64
    cur = rng.standard_normal((HW, B, C)).astype(np.float32)
    pos = rng.standard_normal((HW, B, C)).astype(np.float32)
    mem = rng.standard_normal((2 * HW + 3, B, D)).astype(np.float32)
    mpos = rng.standard_normal((2 * HW + 3, B, D)).astype(np.float32)
    with torch.no_grad():
        out = model.memory_attention(
            current_vision_features=torch.from_numpy(cur),
            memory=torch.from_numpy(mem),
            current_vision_position_embeddings=torch.from_numpy(pos),
            memory_posision_embeddings=torch.from_numpy(mpos),
            num_object_pointer_tokens=3)
    j = memory_attention(
        params["memory_attention"],
        jnp.asarray(cur.transpose(1, 0, 2)), jnp.asarray(pos.transpose(1, 0, 2)),
        jnp.asarray(mem.transpose(1, 0, 2)), jnp.asarray(mpos.transpose(1, 0, 2)),
        jcfg, num_obj_ptr_tokens=3)
    np.testing.assert_allclose(np.asarray(j)[0],
                               out.numpy().reshape(HW, C), atol=2e-4,
                               rtol=1e-3)


def test_encode_new_memory_matches_hf(hf_video_tiny):
    model, cfg = hf_video_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2_video import encode_new_memory
    rng = np.random.default_rng(2)
    feat = rng.standard_normal((64, 1, 64)).astype(np.float32)  # (HW, B, C)
    mask = (rng.standard_normal((1, 1, 128, 128)) * 4).astype(np.float32)
    obj = np.array([[2.0]], np.float32)
    with torch.no_grad():
        tm, _tp = model._encode_new_memory(
            torch.from_numpy(feat), torch.from_numpy(mask),
            torch.from_numpy(obj), is_mask_from_pts=False)
    jm = encode_new_memory(
        params, jcfg,
        jnp.asarray(feat.transpose(1, 0, 2).reshape(1, 8, 8, 64)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)), jnp.asarray(obj),
        is_mask_from_pts=False)
    np.testing.assert_allclose(np.asarray(jm).transpose(1, 0, 2),
                               tm.float().numpy(), atol=1e-2, rtol=1e-2)
    # occluded frame mixes in the occlusion embedding
    with torch.no_grad():
        tm2, _ = model._encode_new_memory(
            torch.from_numpy(feat), torch.from_numpy(mask),
            torch.from_numpy(-obj), is_mask_from_pts=False)
    jm2 = encode_new_memory(
        params, jcfg,
        jnp.asarray(feat.transpose(1, 0, 2).reshape(1, 8, 8, 64)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)), jnp.asarray(-obj),
        is_mask_from_pts=False)
    np.testing.assert_allclose(np.asarray(jm2).transpose(1, 0, 2),
                               tm2.float().numpy(), atol=1e-2, rtol=1e-2)


def test_prepare_memory_conditioned_matches_hf(hf_video_tiny):
    """Full memory-conditioning path (temporal PEs, pointer splits/temporal
    encoding, masked fixed-capacity bank) vs HF's variable-length concat,
    driven through a fake inference session."""
    model, cfg = hf_video_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2_video import (
        init_memory_bank, update_memory_bank,
        prepare_memory_conditioned_features)
    rng = np.random.default_rng(3)
    HW, B, C, D = 64, 1, 64, 64
    frame_idx, num_frames = 3, 5

    def mem(seed):
        r = np.random.default_rng(seed)
        feats = r.standard_normal((1, D, 8, 8)).astype(np.float32)
        with torch.no_grad():
            pos = model.memory_encoder.position_encoding(
                torch.Size((1, D, 8, 8)), "cpu", torch.float32).numpy()
        return feats.reshape(1, D, HW).transpose(2, 0, 1), \
            pos.reshape(1, D, HW).transpose(2, 0, 1)

    outs = {}
    for f in (0, 1, 2):
        mf, mp = mem(10 + f)
        outs[f] = {"maskmem_features": torch.from_numpy(mf),
                   "maskmem_pos_enc": torch.from_numpy(mp),
                   "object_pointer": torch.from_numpy(
                       rng.standard_normal((B, C)).astype(np.float32))}
    session = types.SimpleNamespace(output_dict_per_obj={
        0: {"cond_frame_outputs": {0: outs[0]},
            "non_cond_frame_outputs": {1: outs[1], 2: outs[2]}}})

    cur = rng.standard_normal((HW, B, C)).astype(np.float32)
    pos = rng.standard_normal((HW, B, C)).astype(np.float32)
    with torch.no_grad():
        t = model._prepare_memory_conditioned_features(
            session, frame_idx, 0, False, torch.from_numpy(cur),
            torch.from_numpy(pos), num_frames)

    bank = init_memory_bank(jcfg, B, HW)
    for f in (0, 1, 2):
        mf = jnp.asarray(outs[f]["maskmem_features"].numpy().transpose(1, 0, 2))
        ptr = jnp.asarray(outs[f]["object_pointer"].numpy())
        bank = update_memory_bank(bank, mf, ptr, f, is_cond=(f == 0))
    j = prepare_memory_conditioned_features(
        params, jcfg, jnp.asarray(cur.transpose(1, 0, 2)),
        jnp.asarray(pos.transpose(1, 0, 2)), bank, jnp.int32(frame_idx),
        jnp.int32(min(num_frames, jcfg.max_object_pointers)))
    expect = t.reshape(B, C, HW).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(j), expect, atol=5e-4, rtol=1e-2)


def test_propagate_video_smoke(hf_video_tiny):
    """End-to-end tracking loop: finite logits, conditioning frame
    reproduces the prompt mask."""
    model, cfg = hf_video_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2_video import propagate_video
    rng = np.random.default_rng(4)
    frames = rng.standard_normal((3, 128, 128, 3)).astype(np.float32)
    init = np.zeros((128, 128, 1), np.float32)
    init[40:90, 30:80] = 1.0
    out = propagate_video(params, jcfg, jnp.asarray(frames),
                          jnp.asarray(init))
    assert out.shape == (3, 32, 32)
    assert np.isfinite(out).all()
    # frame 0 logits binarize back to the (downsampled) prompt
    ref = init[::4, ::4, 0]
    agree = ((out[0] > 0) == (ref > 0.5)).mean()
    assert agree > 0.95


def test_refine_motion_masks_parity_swap(hf_video_tiny):
    """Odd/even seed-swap refinement: output is a superset (OR) of the
    input masks and stays boolean at the input resolution."""
    model, cfg = hf_video_tiny
    params, jcfg = _convert(model, cfg)
    from align3r_tpu.models.sam2_video import refine_motion_masks
    rng = np.random.default_rng(5)
    T, H, W = 4, 64, 48
    images = rng.random((T, H, W, 3)).astype(np.float32)
    masks = np.zeros((T, H, W), bool)
    masks[:, 20:40, 10:30] = True
    refined = refine_motion_masks(params, jcfg, images, masks,
                                  num_cond_slots=2)
    assert refined.shape == (T, H, W) and refined.dtype == bool
    assert (refined | masks).sum() == refined.sum()  # superset of input


def test_point_conditioned_tracking(hf_video_tiny):
    """Point-prompt conditioning frame then tracked frame runs end to end."""
    model, cfg = hf_video_tiny
    params, jcfg = _convert(model, cfg)
    import jax.numpy as jnp
    from align3r_tpu.models.sam2_video import (init_memory_bank,
                                               sam2_video_frame)
    rng = np.random.default_rng(6)
    frames = jnp.asarray(rng.standard_normal((2, 1, 128, 128, 3)),
                         jnp.float32)
    bank = init_memory_bank(jcfg, 1, 64)
    pts = jnp.asarray([[[[64.0, 64.0]]]])   # one positive click
    lab = jnp.asarray([[[1]]], jnp.int32)
    low0, obj0, bank = sam2_video_frame(params, jcfg, frames[0], bank,
                                        jnp.int32(0), 2, init_points=pts,
                                        init_labels=lab)
    low1, obj1, bank = sam2_video_frame(params, jcfg, frames[1], bank,
                                        jnp.int32(1), 2)
    assert low0.shape == (1, 1, 32, 32) and low1.shape == (1, 1, 32, 32)
    assert np.isfinite(np.asarray(low0)).all()
    assert np.isfinite(np.asarray(low1)).all()
    assert bool(np.asarray(bank.cond_valid[0])) and \
        bool(np.asarray(bank.recent_valid[0]))
