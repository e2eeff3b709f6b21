"""End-to-end conversion + forward parity: torch oracle -> convert_state_dict
-> JAX forward must match the torch forward at fp32 tolerance.

This is the round-1 stand-in for the checkpoint golden test (no real weights
in this environment): it exercises the full name mapping, every layout
transform, RoPE, the decoder injection schedule and the DPT head jointly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from align3r_tpu.models.config import Align3RConfig
from align3r_tpu.models.convert import convert_state_dict
from align3r_tpu.models.align3r import apply_align3r
from torch_oracle import TorchAlign3R

CFG = Align3RConfig(img_size=(32, 48), patch_size=16, enc_embed_dim=32,
                    enc_depth=3, enc_num_heads=2, dec_embed_dim=24,
                    dec_depth=12, dec_num_heads=2)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    return TorchAlign3R(CFG).eval()


def test_full_model_conversion_forward_parity(oracle):
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_state_dict(sd, CFG)

    rng = np.random.default_rng(0)
    H, W = 32, 48
    img1 = rng.standard_normal((2, H, W, 3)).astype(np.float32) * 0.5
    img2 = rng.standard_normal((2, H, W, 3)).astype(np.float32) * 0.5
    pc1 = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    pc2 = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        t = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
        r1t, r2t = oracle(t(img1), t(img2), t(pc1), t(pc2))
    v1 = {"img": jnp.asarray(img1), "pred_depth": jnp.asarray(pc1)}
    v2 = {"img": jnp.asarray(img2), "pred_depth": jnp.asarray(pc2)}
    # raw head comparison: strip the postprocess by inverting it is lossy, so
    # compare through the postprocess on both sides instead
    from align3r_tpu.models.postprocess import postprocess
    r1 = apply_align3r(params, v1, v2, CFG, dtype=jnp.float32)[0]
    exp1 = postprocess(torch.permute(r1t, (0, 2, 3, 1)).numpy(),
                       CFG.depth_mode, CFG.conf_mode)
    np.testing.assert_allclose(np.asarray(r1["pts3d"]),
                               np.asarray(exp1["pts3d"]),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r1["conf"]),
                               np.asarray(exp1["conf"]),
                               atol=5e-4, rtol=1e-3)


def test_bench_default_engine_config_parity(oracle):
    """Pin the EXACT bench/engine default configuration (bs=32 decode
    batches, fused Pallas sites, unroll=3, head_group=4) against the torch
    oracle THROUGH the inference engine, so the perf defaults and the
    parity gate can never diverge (VERDICT r4 next #7). Runs the fused
    sites in interpret mode on CPU."""
    from align3r_tpu.inference.engine import inference
    from align3r_tpu.inference.pairs import make_pairs
    from align3r_tpu.models.postprocess import postprocess
    from align3r_tpu.ops import fused_site as fs

    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_state_dict(sd, CFG)
    rng = np.random.default_rng(1)
    n, H, W = 3, 32, 48
    imgs = rng.standard_normal((n, H, W, 3)).astype(np.float32) * 0.5
    priors = rng.uniform(0, 1, (n, H, W, 3)).astype(np.float32)
    pairs = make_pairs(n, "complete", symmetrize=True)     # 6 edges
    # pin hg=4 explicitly (the shipped default) rather than asserting the
    # module default, which the documented ALIGN3R_HEAD_GROUP env knob can
    # legitimately override in A/B shells
    old_hg = fs._DEFAULT_HEAD_GROUP
    fs._DEFAULT_HEAD_GROUP = 4
    try:
        out = inference(pairs, params, CFG, jnp.asarray(imgs),
                        jnp.asarray(priors), batch_size=32,
                        dtype=jnp.float32, head_dtype=jnp.float32,
                        attn_impl="fused", encode_attn_impl="fused",
                        unroll=3)
    finally:
        fs._DEFAULT_HEAD_GROUP = old_hg

    t = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
    for e, (i, j) in enumerate(pairs):
        with torch.no_grad():
            r1t, _ = oracle(t(imgs[i:i + 1]), t(imgs[j:j + 1]),
                            t(priors[i:i + 1]), t(priors[j:j + 1]))
        exp1 = postprocess(torch.permute(r1t, (0, 2, 3, 1)).numpy(),
                           CFG.depth_mode, CFG.conf_mode)
        np.testing.assert_allclose(
            np.asarray(out["pred1"]["pts3d"][e]),
            np.asarray(exp1["pts3d"][0]), atol=5e-4, rtol=1e-3,
            err_msg=f"edge {e} = ({i},{j})")


def test_parity_is_sensitive(oracle):
    """Sanity: perturbing one converted weight breaks parity (the test above
    cannot pass vacuously)."""
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_state_dict(sd, CFG)
    # random perturbation (a constant shift would be invisible: the input is
    # LayerNorm output with zero feature-mean)
    noise = jax.random.normal(jax.random.PRNGKey(0),
                              params["decoder_embed"]["kernel"].shape) * 0.05
    params["decoder_embed"]["kernel"] = params["decoder_embed"]["kernel"] + noise

    rng = np.random.default_rng(0)
    H, W = 32, 48
    img = rng.standard_normal((1, H, W, 3)).astype(np.float32) * 0.5
    pc = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        t = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
        r1t, _ = oracle(t(img), t(img), t(pc), t(pc))
    v = {"img": jnp.asarray(img), "pred_depth": jnp.asarray(pc)}
    r1 = apply_align3r(params, v, v, CFG, dtype=jnp.float32)[0]
    from align3r_tpu.models.postprocess import postprocess
    exp1 = postprocess(torch.permute(r1t, (0, 2, 3, 1)).numpy(),
                       CFG.depth_mode, CFG.conf_mode)
    assert not np.allclose(np.asarray(r1["pts3d"]), np.asarray(exp1["pts3d"]),
                           atol=5e-4)
