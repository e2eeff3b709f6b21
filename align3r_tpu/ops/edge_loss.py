"""Pallas TPU fused edge-residual kernel for the global-alignment solve.

Computes the pairwise alignment loss (reference hot loop:
/root/reference/dust3r/cloud_opt/optimizer.py:223-241,
base_opt.py:344-371) in ONE fused kernel with a custom VJP:

    loss = sum_e sum_a w[e,a] * || proj[idx[e], a] - (R[e] @ pred[e, a] + t[e]) ||

without ever materialising the (E, A, 3) aligned/residual intermediates in
HBM that bound the pure-XLA path (scene.py `_pairwise_pts_loss_bf16`).

TPU-first design:
- Observations are packed once per solve into a lane-friendly layout
  (E2, 3, La, 128) where E2 = 2E stacks the i- and j-terms of every edge
  into one flat edge list and A (=H*W) is padded and folded into
  (La, 128) so the hardware tiles the (sublane, lane) dims with zero
  padding waste (a trailing dim of 3 would pad 3 -> 8/16 sublanes).
- Grid (A_tiles, E2/EB) with edges innermost: the per-A-tile `proj` block
  (n, 3, RB, 128) and the backward's `d_proj` accumulator block keep the
  SAME block index for the whole inner edge loop, so Mosaic keeps them
  VMEM-resident (matmul-accumulator pattern) and per-iteration HBM traffic
  collapses to ~one streaming read of the packed observations.
- The pose application is 9 scalar multiplies + adds on (RB, 128) vector
  registers (pure VPU; a (3,4) "matmul" would waste the MXU), with the
  per-edge Sim(3) matrix and xyz adaptors pre-folded into one (3, 4)
  matrix per edge term.
- All in-kernel arithmetic is fp32 regardless of the storage dtype, so a
  bf16-packed solve only quantises the frozen observations, not the
  residual pipeline (better-conditioned than the all-bf16 XLA fast path).

Gradients flow to `proj` (dense (n, 3, La, 128) accumulator) and to the
folded (E2, 3, 4) pose matrices; the chain rule through pose decode /
adaptors runs in plain JAX on those tiny arrays.  Observations and weights
are frozen buffers (reference optimizer.py:55-71) and get zero cotangents.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-12  # must match geometry.core.safe_norm


@dataclasses.dataclass(frozen=True)
class EdgeMeta:
    """Static kernel geometry (hashable: used as nondiff custom_vjp arg)."""
    n: int          # number of images (padded to a multiple of nc)
    e2: int         # padded flat edge-term count (multiple of eb)
    la: int         # padded A // 128 (multiple of rb)
    rb: int         # sublane rows per A tile
    eb: int         # edge terms per grid step
    nc: int = 0     # images per VMEM-resident chunk (0 = all n: legacy
    #                 single-chunk kernel; >0 = image-chunked kernel for
    #                 scenes too large to keep (n, 3, rb, 128) resident)
    interpret: bool = False

    @property
    def a_tiles(self) -> int:
        return self.la // self.rb

    @property
    def e_tiles(self) -> int:
        return self.e2 // self.eb

    @property
    def n_chunks(self) -> int:
        return 1 if self.nc == 0 else self.n // self.nc

    @property
    def chunk_rows(self) -> int:
        """Image rows per resident proj/d_proj block."""
        return self.n if self.nc == 0 else self.nc


# Scoped-VMEM cap for the pallas_calls. The 16 MB Mosaic default is too
# tight for the rb=8 fallback at the scene gate's n ~ 256 bound: the
# backward keeps (n, 3, 8, 128) fp32 proj + d_proj blocks resident
# (~3.1 MB each at n=256) and Mosaic double-buffers them, ~12.6 MB before
# the streamed pred/w blocks and the (e2, 128) dpw accumulator.
_VMEM_LIMIT = 48 * 1024 * 1024


def choose_blocks(n: int, la0: int | None = None,
                  vmem_budget: int = 9 * 2 ** 20):
    """Pick (rb, eb, nc) so the resident proj + d_proj blocks fit VMEM.

    The resident set is the (n', 3, rb, 128) proj + d_proj blocks (n' = n
    for the single-chunk kernel, nc for the image-chunked one); the
    streamed pred/w blocks scale with eb. Backward VMEM ~= 2 buffers *
    n'*3*rb*128 * (4 + 4) bytes (fp32 proj + fp32 accumulator) + streamed
    blocks.

    nc = 0 keeps the whole scene resident (legacy kernel); when even rb=8
    busts the budget (n beyond ~256) the scene is split into nc-image
    chunks instead of falling back to the XLA path — edge terms are sorted
    by image at pack time so each inner-loop step touches exactly one
    resident chunk and total HBM traffic is unchanged.

    For the CHUNKED case the per-grid-step work must amortize Mosaic's
    per-step overhead: the r4 config (rb=8, eb=8) put a 26.6k-step grid on
    the n=300 bench scene and ran 3.3x SLOWER than the XLA one-hot path
    (7.8 vs 25.5 it/s, /tmp/r5_align_chunked.txt) even though its HBM
    traffic is far lower. Tall row blocks (rb=32) and wide edge tiles
    (eb=32) cut the same scene to a ~1.8k-step grid at identical total
    traffic, trading resident images (nc 128 -> 16) inside the budget.
    la0 (= ceil(A/128)) caps rb so tiny-area scenes don't pad la to rb.
    """
    eb = 8

    def fits(nn, rr, ee=eb):
        return (2 * nn * 3 * rr * 128 * 8
                + 2 * ee * 4 * rr * 128 * 4) <= vmem_budget

    # prefer tall row blocks; fall back to rb=8 for image-heavy scenes
    # (fp32 min sublane tile is 8, so rb=8 stays tile-aligned)
    if fits(n, 8):
        rb = 8
        for cand in (16, 32, 64):
            if fits(n, cand):
                rb = cand
        return rb, eb, 0
    # image-chunked: big tiles first, then as many resident images as fit
    eb = 32
    rb = 32
    if la0 is not None:
        rb = max(8, min(rb, -(-la0 // 8) * 8))
    while rb > 8 and not fits(8, rb, eb):       # degenerate tiny budgets
        # keep rb a multiple of 8: fp32 sublane tiles are 8-aligned
        rb = max(8, rb // 2 // 8 * 8)
    nc = 128
    while nc > 8 and not fits(nc, rb, eb):
        nc //= 2
    return rb, eb, nc


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def pack_points(pts, la: int, dtype):
    """(..., A, 3) -> (..., 3, la, 128) padded with zeros."""
    moved = jnp.moveaxis(pts, -1, -2)                      # (..., 3, A)
    moved = _pad_to(moved, la * 128, -1)
    return moved.reshape(*moved.shape[:-1], la, 128).astype(dtype)


def unpack_points(packed, a: int):
    """(..., 3, la, 128) -> (..., A, 3)."""
    flat = packed.reshape(*packed.shape[:-2], -1)[..., :a]  # (..., 3, A)
    return jnp.moveaxis(flat, -2, -1)


def pack_scalars(x, la: int, dtype):
    """(..., A) -> (..., la, 128) padded with zeros."""
    x = _pad_to(x, la * 128, -1)
    return x.reshape(*x.shape[:-1], la, 128).astype(dtype)


# ------------------------------------------------------------------ kernels

def _fwd_kernel(idx_ref, pw_ref, proj_ref, pred_ref, w_ref, out_ref, *, eb):
    a, e = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(a == 0, e == 0))
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    acc = jnp.float32(0.0)
    for k in range(eb):  # unrolled: eb is small and static
        i = idx_ref[e * eb + k]
        pv = proj_ref[pl.ds(i, 1)][0].astype(jnp.float32)   # (3, RB, 128)
        pd = pred_ref[k].astype(jnp.float32)                # (3, RB, 128)
        w = w_ref[k].astype(jnp.float32)                    # (RB, 128)
        m = [pw_ref[k, j] for j in range(12)]               # SMEM scalar loads
        sq = jnp.float32(0.0)
        for c in range(3):
            aligned = (m[4 * c] * pd[0] + m[4 * c + 1] * pd[1]
                       + m[4 * c + 2] * pd[2] + m[4 * c + 3])
            r = pv[c] - aligned
            sq = sq + r * r
        d = jnp.where(sq > 0, jnp.sqrt(jnp.maximum(sq, EPS)), 0.0)  # safe_norm
        acc = acc + jnp.sum(w * d)
    out_ref[0, 0] += acc


def _fwd_kernel_chunked(idx_ref, chunk_ref, first_ref, pw_ref, proj_ref,
                        pred_ref, w_ref, out_ref, *, eb):
    """Image-chunked forward: proj_ref is the (nc, 3, RB, 128) block of the
    chunk every term in this e-tile belongs to (selected by the scalar-
    prefetched chunk_ref in the BlockSpec index map); idx values are local
    to the chunk. The body is the single-chunk kernel unchanged."""
    del chunk_ref, first_ref  # consumed by the index maps
    _fwd_kernel(idx_ref, pw_ref, proj_ref, pred_ref, w_ref, out_ref, eb=eb)


def _bwd_kernel(idx_ref, g_ref, pw_ref, proj_ref, pred_ref, w_ref,
                dproj_ref, dpw_ref, *, eb):
    a, e = pl.program_id(0), pl.program_id(1)
    _bwd_body(e == 0, idx_ref, g_ref, pw_ref, proj_ref, pred_ref, w_ref,
              dproj_ref, dpw_ref, eb)


def _bwd_kernel_chunked(idx_ref, chunk_ref, first_ref, g_ref, pw_ref,
                        proj_ref, pred_ref, w_ref, dproj_ref, dpw_ref, *, eb):
    """Chunked backward: the resident d_proj accumulator block belongs to
    chunk_ref[e]; it must be zeroed on the FIRST e-tile of each chunk
    (per a-row), which the pack-time first_ref marks — with terms sorted
    by image, each (chunk, a) block is visited in one contiguous run, so
    Mosaic keeps it VMEM-resident for the run and writes it back once."""
    del chunk_ref
    e = pl.program_id(1)
    _bwd_body(first_ref[e] == 1, idx_ref, g_ref, pw_ref, proj_ref, pred_ref,
              w_ref, dproj_ref, dpw_ref, eb)


def _bwd_body(init_dproj, idx_ref, g_ref, pw_ref, proj_ref, pred_ref, w_ref,
              dproj_ref, dpw_ref, eb):
    a, e = pl.program_id(0), pl.program_id(1)

    @pl.when(init_dproj)
    def _():
        dproj_ref[...] = jnp.zeros_like(dproj_ref)

    @pl.when(jnp.logical_and(a == 0, e == 0))
    def _():
        dpw_ref[...] = jnp.zeros_like(dpw_ref)

    g = g_ref[0, 0]
    # dpw rows live in lanes: row e*eb+k holds the 12 dL/dm values in lanes
    # 0..11 (Mosaic forbids narrow SMEM output blocks; a VMEM-resident
    # (e2, 128) accumulator with constant index map satisfies tiling and
    # persists across the whole grid).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for k in range(eb):
        i = idx_ref[e * eb + k]
        pv = proj_ref[pl.ds(i, 1)][0].astype(jnp.float32)
        pd = pred_ref[k].astype(jnp.float32)
        w = w_ref[k].astype(jnp.float32)
        m = [pw_ref[k, j] for j in range(12)]               # SMEM scalar loads
        al = [m[4 * c] * pd[0] + m[4 * c + 1] * pd[1]
              + m[4 * c + 2] * pd[2] + m[4 * c + 3] for c in range(3)]
        r = [pv[c] - al[c] for c in range(3)]
        sq = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
        # d(w * safe_norm(r)) / dr = w * r / sqrt(sq) where sq > eps else 0
        scale = jnp.where(sq > EPS, g * w * jax.lax.rsqrt(sq), 0.0)
        u = [scale * r[c] for c in range(3)]                # = d loss / d pv[c]
        cur = dproj_ref[pl.ds(i, 1)][0]
        dproj_ref[pl.ds(i, 1)] = (cur + jnp.stack(u))[None]
        # d loss / d m[4c + j] = sum(-u_c * pd_j); / d t_c = sum(-u_c)
        vec = jnp.zeros((1, 128), jnp.float32)
        for c in range(3):
            vals = (jnp.sum(-u[c] * pd[0]), jnp.sum(-u[c] * pd[1]),
                    jnp.sum(-u[c] * pd[2]), jnp.sum(-u[c]))
            for j, v in enumerate(vals):
                vec = vec + jnp.where(lane == 4 * c + j, v, 0.0)
        row = e * eb + k
        dpw_ref[pl.ds(row, 1)] = dpw_ref[pl.ds(row, 1)] + vec


# ------------------------------------------------------------- pallas calls

def _proj_map(meta: EdgeMeta):
    """proj / d_proj block index: the whole scene for the single-chunk
    kernel; the e-tile's image chunk (scalar-prefetched) when chunked."""
    if meta.nc:
        return lambda a, e, idx, chunk, first: (chunk[e], 0, a, 0)
    return lambda a, e, *_s: (0, 0, a, 0)


def _common_in_specs(meta: EdgeMeta):
    rb, eb = meta.rb, meta.eb
    return [
        pl.BlockSpec((eb, 12), lambda a, e, *_s: (e, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((meta.chunk_rows, 3, rb, 128), _proj_map(meta),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((eb, 3, rb, 128), lambda a, e, *_s: (e, 0, a, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((eb, rb, 128), lambda a, e, *_s: (e, a, 0),
                     memory_space=pltpu.VMEM),
    ]


def _cost(meta: EdgeMeta, itemsize: int, factor: int):
    elems = meta.e2 * meta.la * 128
    return pl.CostEstimate(
        flops=factor * 30 * elems,
        bytes_accessed=4 * elems * itemsize,
        transcendentals=elems,
    )


def _fwd_call(meta: EdgeMeta, proj_p, pw34, pred_p, w_p, idx, chunk, first):
    chunked = bool(meta.nc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if chunked else 1,
        grid=(meta.a_tiles, meta.e_tiles),
        in_specs=_common_in_specs(meta),
        out_specs=pl.BlockSpec((1, 1), lambda a, e, *_s: (0, 0),
                               memory_space=pltpu.SMEM),
    )
    kern = _fwd_kernel_chunked if chunked else _fwd_kernel
    scalars = (idx, chunk, first) if chunked else (idx,)
    out = pl.pallas_call(
        functools.partial(kern, eb=meta.eb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=_cost(meta, pred_p.dtype.itemsize, 1),
        interpret=meta.interpret,
    )(*scalars, pw34.reshape(meta.e2, 12), proj_p, pred_p, w_p)
    return out[0, 0]


def _bwd_call(meta: EdgeMeta, g, proj_p, pw34, pred_p, w_p, idx, chunk, first):
    chunked = bool(meta.nc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if chunked else 1,
        grid=(meta.a_tiles, meta.e_tiles),
        in_specs=[pl.BlockSpec((1, 1), lambda a, e, *_s: (0, 0),
                               memory_space=pltpu.SMEM)] + _common_in_specs(meta),
        out_specs=[
            pl.BlockSpec((meta.chunk_rows, 3, meta.rb, 128), _proj_map(meta),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((meta.e2, 128), lambda a, e, *_s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kern = _bwd_kernel_chunked if chunked else _bwd_kernel
    scalars = (idx, chunk, first) if chunked else (idx,)
    dproj, dpw_rows = pl.pallas_call(
        functools.partial(kern, eb=meta.eb),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((meta.n, 3, meta.la, 128), jnp.float32),
            jax.ShapeDtypeStruct((meta.e2, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=_cost(meta, pred_p.dtype.itemsize, 2),
        interpret=meta.interpret,
    )(*scalars, jnp.reshape(g, (1, 1)).astype(jnp.float32),
      pw34.reshape(meta.e2, 12), proj_p, pred_p, w_p)
    return dproj, dpw_rows[:, :12].reshape(meta.e2, 3, 4)


def permute_packed(pred_i_p, pred_j_p, w_i_p, w_j_p, perm, valid,
                   e2: int, e_split: int | None = None,
                   interpret: bool = False):
    """Assemble the solve's packed edge-term buffers from the two
    naturally-ordered per-edge packs in ONE pass of row DMAs.

    Packed slot s takes term `perm[s]` of the flat [i-terms; j-terms] list:
    rows < E read pred_i_p/w_i_p, rows >= E read pred_j_p/w_j_p (both
    blocks are prefetched per step and selected in-register — the 2x read
    amplification is a few ms at HBM rate and beats any branchy DMA).
    Dummy slots (valid == 0) copy term 0's points (bit-compatible with the
    dense pack oracle) with their weight forced to exactly 0.

    Why a kernel: XLA lowers `take`-style row gathers fused with the
    lane-pack transpose to elementwise gathers (~6-10 GB/s measured —
    0.87 s once per solve at the n=300 bench scale, over half the
    end-to-end time of a 60-iter chunked solve). Block index maps driven
    by a scalar-prefetched permutation move the same rows as plain DMAs.

    pred_*_p: (E', 3, la, 128), w_*_p: (E', la, 128) with E' >= E = e_split
    (the true i/j boundary; trailing rows are pack padding and never read);
    perm/valid: (e2,) int32.  Returns ((e2, 3, la, 128), (e2, la, 128)).
    """
    _, _, la, _ = pred_i_p.shape
    E = e_split if e_split is not None else pred_i_p.shape[0]

    def _i_row(s, perm, valid):
        return jnp.minimum(perm[s], E - 1)

    def _j_row(s, perm, valid):
        return jnp.clip(perm[s] - E, 0, E - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e2,),
        in_specs=[
            pl.BlockSpec((1, 3, la, 128),
                         lambda s, p, v: (_i_row(s, p, v), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, la, 128),
                         lambda s, p, v: (_j_row(s, p, v), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, la, 128),
                         lambda s, p, v: (_i_row(s, p, v), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, la, 128),
                         lambda s, p, v: (_j_row(s, p, v), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, la, 128), lambda s, *_s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, la, 128), lambda s, *_s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def kern(perm_ref, valid_ref, pi_ref, pj_ref, wi_ref, wj_ref,
             pout_ref, wout_ref):
        s = pl.program_id(0)
        from_i = perm_ref[s] < E
        pout_ref[...] = jnp.where(from_i, pi_ref[...], pj_ref[...])
        w = jnp.where(from_i, wi_ref[...], wj_ref[...])
        wout_ref[...] = w * valid_ref[s].astype(w.dtype)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e2,) + pred_i_p.shape[1:], pred_i_p.dtype),
            jax.ShapeDtypeStruct((e2,) + w_i_p.shape[1:], w_i_p.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=e2 * 4 * la * 128,
            bytes_accessed=5 * e2 * 4 * la * 128 * pred_i_p.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(perm, valid, pred_i_p, pred_j_p, w_i_p, w_j_p)


def fold_pose_adaptors(pw_poses_44, adaptors):
    """(E, 4, 4) Sim(3) matrices + (E, 3) xyz scale adaptors -> (E, 3, 4)
    with R @ diag(adapt) folded in (aligned = fold @ [pred; 1])."""
    R = pw_poses_44[:, :3, :3] * adaptors[:, None, :]
    return jnp.concatenate([R, pw_poses_44[:, :3, 3:4]], axis=-1)


# ---------------------------------------------------------------- custom_vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def edge_loss(meta: EdgeMeta, proj_p, pw34, pred_p, w_p, idx,
              chunk=None, first=None):
    """Fused sum_e sum_a w * safe_norm(proj[idx[e]] - pw34[e] @ [pred; 1]).

    proj_p: (n, 3, la, 128) packed world points (differentiated; n padded
            to a multiple of meta.nc when chunked)
    pw34:   (e2, 3, 4) folded pose (+adaptor) matrices (differentiated;
            in pack order — sorted by image when chunked)
    pred_p: (e2, 3, la, 128) packed frozen predictions
    w_p:    (e2, la, 128) frozen weights (normalisation pre-folded, 0 padding)
    idx:    (e2,) int32 image index per edge term (chunk-local when chunked)
    chunk:  (e_tiles,) int32 image-chunk id per e-tile (chunked kernel only)
    first:  (e_tiles,) int32 1 on the first e-tile of each chunk (ditto)
    """
    return _fwd_call(meta, proj_p, pw34, pred_p, w_p, idx, chunk, first)


def _edge_loss_fwd(meta, proj_p, pw34, pred_p, w_p, idx, chunk, first):
    loss = _fwd_call(meta, proj_p, pw34, pred_p, w_p, idx, chunk, first)
    return loss, (proj_p, pw34, pred_p, w_p, idx, chunk, first)


def _edge_loss_bwd(meta, res, g):
    proj_p, pw34, pred_p, w_p, idx, chunk, first = res
    dproj, dpw = _bwd_call(meta, g, proj_p, pw34, pred_p, w_p, idx,
                           chunk, first)
    zero_pred = jnp.zeros_like(pred_p)
    zero_w = jnp.zeros_like(w_p)
    f0 = lambda x: (None if x is None
                    else np.zeros(x.shape, dtype=jax.dtypes.float0))
    return (dproj.astype(proj_p.dtype), dpw, zero_pred, zero_w, f0(idx),
            f0(chunk), f0(first))


edge_loss.defvjp(_edge_loss_fwd, _edge_loss_bwd)
