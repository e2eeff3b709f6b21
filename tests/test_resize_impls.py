"""bilinear_resize (gather) vs bilinear_resize_mxu (constant-matrix matmul).

Both must match torch F.interpolate semantics; the mxu variant is the
MXU-friendly A/B candidate for the DPT-head upsamples (reference behaviour
/root/reference/croco/models/dpt_block.py:186-196 interpolate align_corners).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from align3r_tpu.models import nn
from align3r_tpu.models.dpt_head import init_dpt_head, apply_dpt_head


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape,out", [((2, 9, 16, 5), (18, 32)),
                                       ((1, 4, 4, 3), (9, 7)),
                                       ((2, 9, 16, 5), (5, 7))])
def test_resize_mxu_matches_gather(align_corners, shape, out):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    a = nn.bilinear_resize(x, *out, align_corners=align_corners)
    b = nn.bilinear_resize_mxu(x, *out, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_resize_mxu_matches_torch():
    import torch
    import torch.nn.functional as F
    x = np.random.RandomState(0).randn(2, 5, 6, 3).astype(np.float32)
    for ac in (True, False):
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            size=(10, 12), mode="bilinear", align_corners=ac)
        ref = ref.permute(0, 2, 3, 1).numpy()
        got = np.asarray(nn.bilinear_resize_mxu(jnp.asarray(x), 10, 12,
                                                align_corners=ac))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_dpt_head_resize_impl_parity():
    p = init_dpt_head(jax.random.PRNGKey(0), [64, 48, 48, 48], 4)
    hooks = [jax.random.normal(jax.random.PRNGKey(i), (2, 6, d))
             for i, d in enumerate([64, 48, 48, 48])]
    a = apply_dpt_head(p, hooks, (2, 3), (32, 48))
    b = apply_dpt_head(p, hooks, (2, 3), (32, 48), resize_impl="mxu")
    assert float(jnp.abs(a - b).max()) < 1e-4 * max(float(jnp.abs(a).max()), 1)
