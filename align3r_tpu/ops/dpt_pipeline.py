"""Pallas TPU fused residual conv units for the DPT refinenet levels.

The DPT head's FLOPs are dominated by the refinenet residual conv units
(reference croco/models/dpt_block.py:80-139 ResidualConvUnit_custom,
144-229 FeatureFusionBlock_custom): per fusion level

    y = res2(x + res1(skip))            # res1 only when a skip map exists
    res(v) = v + conv3x3(relu(conv3x3(relu(v))))

XLA runs each 3x3 conv as its own HBM round trip with the relu/add glue
only partially fused; this kernel computes one full residual unit

    y = base + conv2(relu(conv1(relu(v))))

as ONE fused program (relu -> conv -> relu -> conv -> bias/add all
VMEM-resident), so each unit's activations make a single HBM round trip
and the elementwise ops ride along for free.

TPU-first design:
- Layout (B, H, W, C) bf16 with C a multiple of 128 (lane dim).  A 3x3
  conv is 9 shifted (rows, C) @ (C, C) matmuls (dot_general contracting
  C) — the same implicit GEMM XLA's conv emitter uses; M = strip*W is a
  few thousand so the MXU stays saturated at C=256.
- Grid (B, H/TH): H strips.  Strips overlap by the unit's halo (2 rows),
  so activations stay in HBM (memory_space ANY) and each step DMAs its
  haloed strip into VMEM scratch manually (BlockSpec blocks cannot
  overlap).  The caller pre-pads H by the halo so every DMA has a static
  size; W padding lives in the scratch (written once, never overwritten).
- Both conv kernels + biases stay VMEM-resident across the whole grid
  (~2.4 MB at C=256).
- SAME zero-padding is re-established after the interior conv by masking
  out-of-image rows/cols to zero (absolute coordinates via iota), so pad
  positions hold exact zeros — bias would otherwise leak into them — and
  interior positions read exactly the zero-padding the reference conv
  sees.  fp32 accumulation, storage dtype between stages.

The resize (align_corners bilinear, a dense-matmul pair in
nn.bilinear_resize_mxu) and the 1x1 convs stay in XLA: together they are
<10% of head FLOPs and XLA fuses them well.

Inference-only: the training path keeps apply_dpt_head's XLA graph.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 2  # halo rows/cols each side: two chained 3x3 convs per unit


def _pick_th(H: int, W: int, C: int, dtype_bytes: int = 2,
             vmem_budget: int = 12 * 2 ** 20) -> int:
    """Largest strip height dividing H whose working set fits VMEM."""
    weights = 2 * 9 * C * C * dtype_bytes
    for th in sorted({d for d in range(1, H + 1) if H % d == 0},
                     reverse=True):
        rp, wp = th + 2 * P, W + 2 * P
        stages = 3 * rp * wp * C * dtype_bytes      # v, base, live temp
        acc = (rp - 2) * (wp - 2) * C * 4           # fp32 accumulator
        out = th * W * C * dtype_bytes
        if weights + stages + acc + out <= vmem_budget:
            return th
    return 1


def supported(x) -> bool:
    B, H, W, C = x.shape
    return C % 128 == 0 and W >= 8 and H >= 2


def _mask_outside(buf, row0_abs, H: int, W: int):
    """Zero positions of buf (R, WP, C) whose absolute image coordinate
    (rows row0_abs+i, cols j-P) is outside [0, H) x [0, W)."""
    R, WP, _ = buf.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, WP, 1), 0) + row0_abs
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, WP, 1), 1) - P
    ok = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
    return jnp.where(ok, buf, jnp.zeros_like(buf))


def _res_unit_kernel(H: int, W: int, TH: int, same_base: bool,
                     v_hbm, base_hbm, w_ref, b_ref, out_ref,
                     v_vmem, base_vmem, sem):
    """One (b, strip) step: out = base + conv2(relu(conv1(relu(v)))).

    v_hbm/base_hbm: (B, H+2P, W, C) host-padded activations in HBM.
    w_ref: (2, 9, C, C) taps; b_ref: (2, 1, C) f32.
    v_vmem/base_vmem: (TH+2P, W+2P, C) scratch; W-pad columns are zeroed
    on the first step and never written after.
    """
    b = pl.program_id(0)
    s = pl.program_id(1)
    C = v_vmem.shape[-1]
    RP, WP = TH + 2 * P, W + 2 * P
    h0 = s * TH - P                     # absolute row of scratch row 0
    f32 = jnp.float32

    @pl.when((b == 0) & (s == 0))
    def _init_pads():
        v_vmem[:] = jnp.zeros((RP, WP, C), v_vmem.dtype)
        base_vmem[:] = jnp.zeros((RP, WP, C), base_vmem.dtype)

    def load(hbm, vmem, slot):
        # padded-H source: rows [s*TH, s*TH + RP) are always in range
        cp = pltpu.make_async_copy(
            hbm.at[b, pl.ds(s * TH, RP), :, :],
            vmem.at[:, pl.ds(P, W), :],
            sem.at[slot])
        cp.start()
        return cp

    cp_v = load(v_hbm, v_vmem, 0)
    cp_b = load(base_hbm, base_vmem, 1) if not same_base else None
    cp_v.wait()
    if cp_b is not None:
        cp_b.wait()

    def conv(src, ci, mask):
        acc = jnp.zeros((RP - 2, WP - 2, C), f32)
        for dh in range(3):
            for dw in range(3):
                acc = acc + jax.lax.dot_general(
                    src[dh:dh + RP - 2, dw:dw + WP - 2, :],
                    w_ref[ci, dh * 3 + dw],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=f32)
        acc = acc + b_ref[ci][None].astype(f32)
        out = jnp.pad(acc, ((1, 1), (1, 1), (0, 0)))
        if mask:
            # re-establish SAME zero padding (bias leaked into pad rows)
            out = _mask_outside(out, h0, H, W)
        return out.astype(src.dtype)

    a = jnp.maximum(v_vmem[:], 0)
    a = conv(a, 0, mask=True)
    a = jnp.maximum(a, 0)
    a = conv(a, 1, mask=False)     # only the interior of the last conv
    y = v_vmem[:] + a              # is kept, so no re-masking needed
    if not same_base:
        y = y + base_vmem[:]
    out_ref[:] = y[None, P:P + TH, P:P + W, :]


@functools.partial(jax.jit, static_argnames=("same_base", "interpret"))
def _res_unit_call(v, base, w, bias, *, same_base, interpret=False):
    B, H, W, C = v.shape
    TH = _pick_th(H, W, C, dtype_bytes=v.dtype.itemsize)
    SH = H // TH
    pad = [(0, 0), (P, P), (0, 0), (0, 0)]
    vp = jnp.pad(v, pad)
    bp = vp if same_base else jnp.pad(base, pad)
    kern = functools.partial(_res_unit_kernel, H, W, TH, same_base)
    return pl.pallas_call(
        kern,
        grid=(B, SH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, 9, C, C), lambda b, s: (0, 0, 0, 0)),
            pl.BlockSpec((2, 1, C), lambda b, s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda b, s: (b, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * P, W + 2 * P, C), v.dtype),
            pltpu.VMEM((TH + 2 * P, W + 2 * P, C), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(vp, bp, w, bias)


# ------------------------------------------------------- differentiability
#
# r2 lesson (CLAUDE.md): the PRIMAL body of a custom_vjp runs in plain
# evaluation, so it must BE the kernel (putting the XLA twin there silently
# drops the kernel from inference). The backward is XLA-recompute: replay
# the cheap twin under jax.vjp.

def _xla_twin(v, base, w, bias, same_base):
    """Reference-math twin of the fused unit, built from the packed
    (2, 9, Cin, C) taps so gradients flow to the same leaves."""
    def conv(src, ci):
        k = w[ci].reshape(3, 3, w.shape[2], w.shape[3]).astype(src.dtype)
        out = jax.lax.conv_general_dilated(
            src, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (out + bias[ci][None].astype(jnp.float32)).astype(src.dtype)

    a = jnp.maximum(v, 0)
    a = conv(a, 0)
    a = jnp.maximum(a, 0)
    a = conv(a, 1)
    y = v + a
    return y if same_base else y + base


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _res_unit_diff(v, base, w, bias, same_base, interpret):
    return _res_unit_call(v, base, w, bias, same_base=same_base,
                          interpret=interpret)


def _res_unit_fwd(v, base, w, bias, same_base, interpret):
    return (_res_unit_call(v, base, w, bias, same_base=same_base,
                           interpret=interpret), (v, base, w, bias))


def _res_unit_bwd(same_base, interpret, res, g):
    v, base, w, bias = res
    _, vjp = jax.vjp(lambda *a: _xla_twin(*a, same_base), v, base, w, bias)
    dv, dbase, dw, dbias = vjp(g.astype(v.dtype))
    if same_base:
        dbase = jnp.zeros_like(base)
    return dv, dbase, dw, dbias


_res_unit_diff.defvjp(_res_unit_fwd, _res_unit_bwd)


def _unit_weights(unit, dtype):
    """unit: {'conv1': {'kernel' (3,3,C,C) HWIO, 'bias'}, 'conv2': ...}
    -> ((2, 9, Cin, C) taps, (2, 1, C) f32 biases)."""
    ws, bs = [], []
    for cname in ("conv1", "conv2"):
        k = unit[cname]["kernel"]
        ws.append(k.reshape(9, k.shape[2], k.shape[3]))
        bs.append(unit[cname]["bias"].reshape(1, -1))
    return (jnp.stack(ws).astype(dtype), jnp.stack(bs).astype(jnp.float32))


def fused_res_unit(v, unit, base=None, *, interpret=None):
    """The DPT ResidualConvUnit (croco/models/dpt_block.py:80-139):
    v + conv2(relu(conv1(relu(v)))), plus `base` when given (the fusion
    block's `x + res1(skip)`, dpt_block.py:186-188). Matches
    dpt_head._residual_conv_unit numerics at the storage dtype (fp32
    accumulation in-kernel)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    w, b = _unit_weights(unit, v.dtype)
    same = base is None
    return _res_unit_diff(v, v if same else base, w, b, same, interpret)


def fused_fusion_pre(x, refinenet, skip=None, *, interpret=None):
    """The conv-heavy prefix of dpt_head._fusion:
    res2(x + res1(skip)) (or res2(x) when skip is None); the caller then
    applies resize + out_conv (XLA). refinenet: {'res1': unit, 'res2':
    unit, 'out_conv': ...}."""
    if skip is not None:
        x = fused_res_unit(skip, refinenet["res1"], base=x,
                           interpret=interpret)
    return fused_res_unit(x, refinenet["res2"], interpret=interpret)
