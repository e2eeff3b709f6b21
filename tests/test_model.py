import jax
import jax.numpy as jnp
import numpy as np
import pytest

from align3r_tpu.models.config import Align3RConfig, TINY_TEST, parse_model_string
from align3r_tpu.models.align3r import init_align3r, apply_align3r, encode_images
from align3r_tpu.models.dpt_head import init_dpt_head, apply_dpt_head


def make_views(cfg, B=1, H=None, W=None, seed=0):
    H = H or cfg.img_size[0]
    W = W or cfg.img_size[1]
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    v1 = {"img": jax.random.normal(k1, (B, H, W, 3)),
          "pred_depth": jax.random.uniform(k2, (B, H, W, 3))}
    v2 = {"img": jax.random.normal(k3, (B, H, W, 3)),
          "pred_depth": jax.random.uniform(k4, (B, H, W, 3))}
    return v1, v2


def test_forward_shapes_tiny():
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    v1, v2 = make_views(cfg)
    res1, res2 = apply_align3r(params, v1, v2, cfg, dtype=jnp.float32)
    H, W = cfg.img_size
    assert res1["pts3d"].shape == (1, H, W, 3)
    assert res1["conf"].shape == (1, H, W)
    assert res2["pts3d_in_other_view"].shape == (1, H, W, 3)
    assert np.isfinite(np.asarray(res1["pts3d"])).all()
    # conf mode ('exp', 1, inf): conf >= 1 everywhere
    assert float(res1["conf"].min()) >= 1.0


def test_forward_jit_and_nonsquare():
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    # landscape non-square, odd patch grid height (superset of 512x336 case)
    v1, v2 = make_views(cfg, H=48, W=80)
    f = jax.jit(lambda p, a, b: apply_align3r(p, a, b, cfg, dtype=jnp.float32))
    res1, res2 = f(params, v1, v2)
    assert res1["pts3d"].shape == (1, 48, 80, 3)
    assert np.isfinite(np.asarray(res1["pts3d"])).all()


def test_zero_convs_make_prior_inert_at_init():
    """At init the zero convs are zero, so the prior pointcloud must have NO
    effect on the output (the ControlNet-style guarantee; model.py:94-97)."""
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(1), cfg)
    v1, v2 = make_views(cfg, H=32, W=48)
    r1a, _ = apply_align3r(params, v1, v2, cfg, dtype=jnp.float32)
    v1b = dict(v1, pred_depth=v1["pred_depth"] * 0 + 0.7)
    v2b = dict(v2, pred_depth=jnp.ones_like(v2["pred_depth"]) * 0.1)
    r1b, _ = apply_align3r(params, v1b, v2b, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(r1a["pts3d"]), np.asarray(r1b["pts3d"]),
                               atol=1e-5)


def test_view_asymmetry():
    """Swapping the two views must change res1 (heads are asymmetric)."""
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(2), cfg)
    v1, v2 = make_views(cfg, H=32, W=48)
    r1, _ = apply_align3r(params, v1, v2, cfg, dtype=jnp.float32)
    r1s, _ = apply_align3r(params, v2, v1, cfg, dtype=jnp.float32)
    assert not np.allclose(np.asarray(r1["pts3d"]), np.asarray(r1s["pts3d"]))


def test_encoder_batch_consistency():
    """Encoding images jointly vs separately gives identical features."""
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(3), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 48, 3))
    f_joint, _ = encode_images(params, imgs, cfg, dtype=jnp.float32)
    f0, _ = encode_images(params, imgs[:1], cfg, dtype=jnp.float32)
    f1, _ = encode_images(params, imgs[1:], cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(f_joint[0]), np.asarray(f0[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f_joint[1]), np.asarray(f1[0]), atol=2e-5)


def test_dpt_head_odd_grid_crop():
    """Odd patch-grid heights exercise the refinenet4 crop path
    (reference dpt_head.py:57)."""
    key = jax.random.PRNGKey(5)
    p = init_dpt_head(key, [64, 48, 48, 48], 4)
    nh, nw = 21, 32  # 512x336-like grid
    toks = [jax.random.normal(key, (1, nh * nw, c)) for c in [64, 48, 48, 48]]
    out = apply_dpt_head(p, toks, (nh, nw), (nh * 16, nw * 16),
                         ("exp", -np.inf, np.inf), ("exp", 1.0, np.inf))
    assert out["pts3d"].shape == (1, 336, 512, 3)


def test_parse_model_string():
    s = ("AsymmetricCroCo3DStereo(pos_embed='RoPE100', img_size=(512, 512), "
         "head_type='dpt', output_mode='pts3d', depth_mode=('exp', -inf, inf), "
         "conf_mode=('exp', 1, inf), enc_embed_dim=1024, enc_depth=24, "
         "enc_num_heads=16, dec_embed_dim=768, dec_depth=12, dec_num_heads=12, "
         "patch_embed_cls='ManyAR_PatchEmbed', landscape_only=False)")
    cfg = parse_model_string(s)
    assert cfg.enc_embed_dim == 1024 and cfg.enc_depth == 24
    assert cfg.dec_embed_dim == 768 and cfg.dec_depth == 12
    assert cfg.rope_base == 100.0
    assert cfg.head_type == "dpt"
    assert cfg.n_pc_blocks == 4 and cfg.n_zero_convs == 5
    assert cfg.dpt_hooks() == [0, 6, 9, 12]
    # tuple-valued fields (commas inside parens broke the old regex parser)
    assert cfg.img_size == (512, 512)
    assert cfg.depth_mode == ("exp", -np.inf, np.inf)
    assert cfg.conf_mode == ("exp", 1, np.inf)
    assert cfg.landscape_only is False
    cfg2 = parse_model_string(s.replace("img_size=(512, 512)",
                                        "img_size=(512, 288)"))
    assert cfg2.img_size == (512, 288)
