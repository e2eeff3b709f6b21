"""Global alignment scene: parameters, loss, and the jitted Adam scan loop.

Behavioural reference:
- /root/reference/dust3r/cloud_opt/base_opt.py (pose decode 184-229, forward
  344-371, global_alignment_loop 424-464)
- /root/reference/dust3r/cloud_opt/optimizer.py (PointCloudOptimizer: params
  29-54, precomputed buffers 55-71, depth param 165-187, depth_to_pts3d
  189-199, forward 223-241, _fast_depthmap_to_pts3d 244-251)

TPU-first redesign (SURVEY.md §7.5): the whole niter-step Adam loop compiles
to ONE XLA program (`lax.scan` over a precomputed LR schedule); parameters
live in a flat dict; per-row freezing (preset poses/focals, init_priors
anchoring) is a gradient mask, so frozen entries keep exactly their initial
values (zero Adam moments -> zero updates).

All images in a scene share one (H, W) — the video tools resize a sequence
uniformly, so no per-image max_area padding is needed (the reference pads
because it mixes aspect ratios in one optimizer; we keep shapes static).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import warnings
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from align3r_tpu.geometry import (
    xy_grid, geotrf, pose_vec_to_matrix, matrix_to_pose_vec, sim3_vec_to_matrix,
)
from align3r_tpu.geometry.core import closed_form_pose_inverse, safe_norm
from align3r_tpu.alignment.schedules import schedule_array


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    imshape: Tuple[int, int]           # (H, W), shared by all frames
    n_imgs: int
    n_edges: int
    if_use_mono: bool = False          # depth = mono*exp(scalemap)+shift vs exp(logdepth)
    focal_break: float = 20.0
    pw_break: float = 20.0
    base_scale: float = 0.5
    norm_pw_scale: bool = True
    conf: str = "log"                  # conf transform for pixel weights
    min_conf_thr: float = 3.0
    optimize_pp: bool = False
    shared_focal: bool = False         # flow-variant option (one focal for all)
    allow_pw_adaptors: bool = False
    # flow-variant loss terms (0 = disabled; used by flow_forward)
    temporal_smoothing_weight: float = 0.0
    translation_weight: float = 1.0
    flow_loss_weight: float = 0.0
    depth_regularize_weight: float = 0.0
    flow_loss_start_epoch: float = 0.15
    flow_loss_thre: float = 50.0
    pxl_thre: float = 50.0
    num_total_iter: int = 300
    # bf16 fast path for the pairwise term (see _pairwise_pts_loss_bf16);
    # toggled per-scan by global_alignment_loop's precision schedule
    fast_solve: bool = False
    # which fast-path implementation to use when fast_solve is set:
    # 'fused' = Pallas fused edge-residual kernel (ops/edge_loss.py),
    # 'xla' = one-hot bf16 einsum path, 'auto' = fused on TPU else xla
    fast_impl: str = "auto"

    @property
    def n_focals(self) -> int:
        return 1 if self.shared_focal else self.n_imgs


def conf_transform(conf, mode: str):
    if mode == "log":
        return jnp.log(conf)
    if mode == "sqrt":
        return jnp.sqrt(conf)
    if mode == "m1":
        return conf - 1
    if mode in ("id", "none"):
        return conf
    raise ValueError(mode)


@functools.partial(jax.tree_util.register_dataclass, drop_fields=[])
@dataclasses.dataclass
class SceneData:
    """Frozen per-edge observations (device arrays)."""
    ei: jnp.ndarray                    # (E,) int32 view-1 image index per edge
    ej: jnp.ndarray                    # (E,)
    pred_i: jnp.ndarray                # (E, A, 3) pts3d in cam i
    pred_j: jnp.ndarray                # (E, A, 3) pts3d of j in cam i
    weight_i: jnp.ndarray              # (E, A) conf-transformed weights
    weight_j: jnp.ndarray              # (E, A)
    grid: jnp.ndarray                  # (A, 2) pixel coords
    base_pp: jnp.ndarray               # (2,) = (W/2, H/2)
    mono_depths: Optional[jnp.ndarray] = None  # (n, A) frozen monocular depths
    im_conf: Optional[jnp.ndarray] = None      # (n, A) max conf per image pixel
    dynamic_masks: Optional[jnp.ndarray] = None  # (n, H, W) 1=dynamic
    flow_ij: Optional[jnp.ndarray] = None      # (E, H, W, 2) RAFT flow i->j
    flow_ji: Optional[jnp.ndarray] = None      # (E, H, W, 2) RAFT flow j->i
    init_depth: Optional[jnp.ndarray] = None   # (n, A) depths at init (regulariser)
    # lane-packed observations for the fused Pallas edge kernel (pack_scene)
    packed_pred: Optional[jnp.ndarray] = None  # (E2, 3, La, 128)
    packed_w: Optional[jnp.ndarray] = None     # (E2, La, 128), 1/(E*A) folded in
    packed_idx: Optional[jnp.ndarray] = None   # (E2,) int32 (chunk-local
    #                                            when the kernel is chunked)
    packed_perm: Optional[jnp.ndarray] = None  # (E2,) int32: original term
    #                                            slot per packed slot (pw34 order)
    packed_chunk: Optional[jnp.ndarray] = None  # (e_tiles,) int32 chunk per
    #                                             e-tile (chunked kernel only)
    packed_first: Optional[jnp.ndarray] = None  # (e_tiles,) int32 1 = first
    #                                             e-tile of its chunk


def build_scene(output: Dict, cfg_kw: Dict | None = None,
                mono_depths=None) -> Tuple[SceneConfig, SceneData, Dict]:
    """From the inference-engine output dict, build (config, data, params).

    output: {'view1': {'idx'}, 'view2': {'idx'}, 'pred1': {...}, 'pred2': {...}}
    (reference cloud_opt/__init__.py:26-40 global_aligner factory).
    """
    cfg_kw = dict(cfg_kw or {})
    idx_i = np.asarray(output["view1"]["idx"])
    idx_j = np.asarray(output["view2"]["idx"])
    pred1 = output["pred1"]
    pred2 = output["pred2"]
    E, H, W, _ = pred1["pts3d"].shape
    A = H * W
    n_imgs = int(max(idx_i.max(), idx_j.max())) + 1

    cfg = SceneConfig(imshape=(H, W), n_imgs=n_imgs, n_edges=E,
                      if_use_mono=mono_depths is not None, **cfg_kw)

    conf_i = jnp.asarray(pred1["conf"]).reshape(E, A)
    conf_j = jnp.asarray(pred2["conf"]).reshape(E, A)
    # per-image conf = max over incident edges (base_opt.py:169-175)
    im_conf = jnp.zeros((n_imgs, A))
    im_conf = im_conf.at[idx_i].max(conf_i)
    im_conf = im_conf.at[idx_j].max(conf_j)

    data = SceneData(
        ei=jnp.asarray(idx_i, jnp.int32),
        ej=jnp.asarray(idx_j, jnp.int32),
        pred_i=jnp.asarray(pred1["pts3d"]).reshape(E, A, 3),
        pred_j=jnp.asarray(pred2["pts3d_in_other_view"]).reshape(E, A, 3),
        weight_i=conf_transform(conf_i, cfg.conf),
        weight_j=conf_transform(conf_j, cfg.conf),
        grid=xy_grid(W, H).reshape(A, 2),
        base_pp=jnp.array([W / 2, H / 2], jnp.float32),
        mono_depths=(jnp.asarray(mono_depths).reshape(n_imgs, A)
                     if mono_depths is not None else None),
        im_conf=im_conf,
    )
    params = init_params(cfg, seed=0)
    return cfg, data, params


def init_params(cfg: SceneConfig, seed: int = 0) -> Dict:
    """Random pose init (reference rand_pose=torch.randn, optimizer.py:35-39)."""
    H, W = cfg.imshape
    A = H * W
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    params = {
        "pw_poses": jax.random.normal(k1, (cfg.n_edges, 8)),
        # slight per-edge xy/z scale adaptors (base_opt.py:117-118,174-182;
        # frozen unless allow_pw_adaptors)
        "pw_adaptors": jnp.zeros((cfg.n_edges, 2)),
        "im_poses": jax.random.normal(k2, (cfg.n_imgs, 7)),
        "im_focals": jnp.full((cfg.n_focals,), cfg.focal_break * np.log(max(H, W)),
                              jnp.float32),
        "im_pp": jnp.zeros((cfg.n_imgs, 2)),
    }
    if cfg.if_use_mono:
        params["scalemaps"] = jnp.zeros((cfg.n_imgs, A))
        params["shifts"] = jnp.zeros((cfg.n_imgs,))
    else:
        params["im_depthmaps"] = jax.random.normal(
            jax.random.PRNGKey(seed + 1), (cfg.n_imgs, A)) / 10 - 3
    return params


def default_masks(cfg: SceneConfig, params: Dict) -> Dict:
    masks = {k: jnp.ones_like(v) for k, v in params.items()}
    if not cfg.optimize_pp:
        masks["im_pp"] = jnp.zeros_like(params["im_pp"])
    if not cfg.allow_pw_adaptors:
        masks["pw_adaptors"] = jnp.zeros_like(params["pw_adaptors"])
    return masks


def get_adaptors(params, cfg: SceneConfig):
    """Per-edge (x, y, z) scale adaptors, product-normalised
    (base_opt.py:174-182): exp((adapt - mean)/pw_break), xy shared."""
    a = params["pw_adaptors"]
    a = jnp.concatenate([a[:, 0:1], a], axis=-1)  # (sxy, sxy, sz)
    if cfg.norm_pw_scale:
        a = a - a.mean(axis=1, keepdims=True)
    return jnp.exp(a / cfg.pw_break)


# ---------------------------------------------------------------- decoding

def get_focals(params, cfg: SceneConfig):
    f = jnp.exp(params["im_focals"] / cfg.focal_break)
    if cfg.shared_focal:
        f = jnp.broadcast_to(f, (cfg.n_imgs,))
    return f


def get_principal_points(params, data: SceneData):
    return data.base_pp[None] + 10 * params["im_pp"]


def get_im_poses(params):
    """(n, 4, 4) cam2world matrices."""
    return pose_vec_to_matrix(params["im_poses"])


def get_pw_poses(params, cfg: SceneConfig):
    return sim3_vec_to_matrix(params["pw_poses"], norm_scale=cfg.norm_pw_scale,
                              base_scale=cfg.base_scale)


def get_depthmaps_raw(params, data: SceneData, cfg: SceneConfig):
    if cfg.if_use_mono:
        return data.mono_depths * jnp.exp(params["scalemaps"]) + params["shifts"][:, None]
    return jnp.exp(params["im_depthmaps"])


def depth_to_pts3d(params, data: SceneData, cfg: SceneConfig):
    """(n, A, 3) world-frame points from per-pixel depths + poses
    (optimizer.py:189-199, 244-251)."""
    depth = get_depthmaps_raw(params, data, cfg)            # (n, A)
    focals = get_focals(params, cfg)[:, None, None]          # (n, 1, 1)
    pp = get_principal_points(params, data)[:, None, :]      # (n, 1, 2)
    rel = jnp.concatenate(
        [depth[..., None] * (data.grid[None] - pp) / focals, depth[..., None]],
        axis=-1)
    return geotrf(get_im_poses(params), rel)


def get_intrinsics(params, data: SceneData, cfg: SceneConfig):
    """(n, 3, 3) K matrices (reference optimizer.py:153-160).

    Built with stack (not .at[] scatters): scattered construction inside a
    differentiated function compiles pathologically on the TPU backend.
    """
    f = get_focals(params, cfg)
    pp = get_principal_points(params, data)
    z = jnp.zeros_like(f)
    o = jnp.ones_like(f)
    row0 = jnp.stack([f, z, pp[:, 0]], -1)
    row1 = jnp.stack([z, f, pp[:, 1]], -1)
    row2 = jnp.stack([z, z, o], -1)
    return jnp.stack([row0, row1, row2], -2)


# ------------------------------------------------------------------- loss

def pairwise_pts_loss(params, data: SceneData, cfg: SceneConfig, step=0):
    """The core per-edge L1 alignment loss (optimizer.py:223-241)."""
    if cfg.fast_solve:
        if resolve_fast_impl(cfg) == "fused" and data.packed_pred is not None:
            return _pairwise_pts_loss_fused(params, data, cfg)
        return _pairwise_pts_loss_bf16(params, data, cfg)
    pw = get_pw_poses(params, cfg)                           # (E, 4, 4)
    adapt = get_adaptors(params, cfg)[:, None, :]            # (E, 1, 3)
    proj = depth_to_pts3d(params, data, cfg)                 # (n, A, 3)
    aligned_i = geotrf(pw, adapt * data.pred_i)
    aligned_j = geotrf(pw, adapt * data.pred_j)
    di = safe_norm(jnp.take(proj, data.ei, axis=0) - aligned_i, axis=-1)
    dj = safe_norm(jnp.take(proj, data.ej, axis=0) - aligned_j, axis=-1)
    A = data.grid.shape[0]
    total_i = data.ei.shape[0] * A
    total_j = data.ej.shape[0] * A
    return (di * data.weight_i).sum() / total_i + (dj * data.weight_j).sum() / total_j


def _pairwise_pts_loss_bf16(params, data: SceneData, cfg: SceneConfig):
    """bf16 fast path for the same loss: one-hot MXU matmuls replace the
    image->edge gather (and its backward scatter-add), and the (E, A, 3)
    residual pipeline runs in bf16 with an fp32 reduction.  Measured 2.17x
    over the fp32 path on v5e (49 -> 106 it/s at 190 edges, 512x288); the
    default mixed schedule (bf16 then fp32 polish, see
    global_alignment_loop) matches the fp32 solution to ~4 decimal places
    on synthetic recovery scenes."""
    bf = jnp.bfloat16
    pw = get_pw_poses(params, cfg).astype(bf)
    adapt = get_adaptors(params, cfg)[:, None, :].astype(bf)
    proj = depth_to_pts3d(params, data, cfg).astype(bf)
    onei = jax.nn.one_hot(data.ei, proj.shape[0], dtype=bf)
    onej = jax.nn.one_hot(data.ej, proj.shape[0], dtype=bf)
    proj_i = jnp.einsum("en,nac->eac", onei, proj)
    proj_j = jnp.einsum("en,nac->eac", onej, proj)
    aligned_i = geotrf(pw, adapt * data.pred_i.astype(bf))
    aligned_j = geotrf(pw, adapt * data.pred_j.astype(bf))
    di = safe_norm((proj_i - aligned_i).astype(jnp.float32), axis=-1)
    dj = safe_norm((proj_j - aligned_j).astype(jnp.float32), axis=-1)
    A = data.grid.shape[0]
    return (di * data.weight_i).sum() / (data.ei.shape[0] * A) \
        + (dj * data.weight_j).sum() / (data.ej.shape[0] * A)


def _edge_meta(cfg: SceneConfig, n_imgs=None):
    """Static kernel geometry for the fused edge kernel (ops/edge_loss.py).

    Derivable from cfg ALONE (not the edge graph): pack_scene and the
    per-iteration loss must agree on every static shape. For the chunked
    kernel the flat term count uses the worst-case per-chunk padding
    eb*(ceil(2E/eb) + n_chunks) — pack_scene fills the slack with
    zero-weight dummy tiles on the last chunk."""
    from align3r_tpu.ops import edge_loss as el
    H, W = cfg.imshape
    A = H * W
    la0 = -(-A // 128)
    e2 = 2 * cfg.n_edges
    n = n_imgs or cfg.n_imgs
    rb, eb, nc = el.choose_blocks(n, la0)
    la = -(-la0 // rb) * rb
    if nc:
        n_chunks = -(-n // nc)
        n = n_chunks * nc
        e2 = (-(-e2 // eb) + n_chunks) * eb
    else:
        e2 = -(-e2 // eb) * eb
    import jax as _jax
    interpret = _jax.default_backend() not in ("tpu", "axon")
    return el.EdgeMeta(n=n, e2=e2, la=la, rb=rb, eb=eb, nc=nc,
                       interpret=interpret)


def _chunk_layout(idx_np: np.ndarray, meta) -> tuple:
    """Static chunked term layout: terms sorted by image, each chunk's list
    padded to an eb boundary (so no e-tile straddles two resident blocks),
    worst-case slack appended as last-chunk dummy tiles.

    Returns (slots (e2,) original term slot with -1 = dummy, perm (e2,) =
             slots with dummies -> 0 (the pw34 gather order),
             idx_local (e2,), chunk_of_tile (e_tiles,), first (e_tiles,))."""
    eb, nc, C = meta.eb, meta.nc, meta.n_chunks
    order = np.argsort(idx_np, kind="stable")
    slots, chunks, first = [], [], []
    start = 0
    for c in range(C):
        stop = int(np.searchsorted(idx_np[order], (c + 1) * nc, side="left"))
        sel = order[start:stop]
        start = stop
        cnt = max(-(-len(sel) // eb), 1) * eb     # >=1 tile even when empty
        slots.extend(sel.tolist())
        slots.extend([-1] * (cnt - len(sel)))
        tiles = cnt // eb
        chunks.extend([c] * tiles)
        first.extend([1] + [0] * (tiles - 1))
    rem = meta.e2 - len(slots)
    assert rem >= 0 and rem % eb == 0, (meta, len(slots))
    slots.extend([-1] * rem)
    chunks.extend([C - 1] * (rem // eb))
    first.extend([0] * (rem // eb))
    slots = np.asarray(slots, np.int32)
    perm = np.where(slots >= 0, slots, 0).astype(np.int32)
    idx_local = np.where(slots >= 0, idx_np[perm] % nc, 0).astype(np.int32)
    return (slots, perm, idx_local, np.asarray(chunks, np.int32),
            np.asarray(first, np.int32))


@functools.partial(jax.jit, static_argnames=("e2", "la", "dtype", "cs"))
def _pack_terms_streamed(pred_i, pred_j, w_i, w_j, perm, valid,
                         e2: int, la: int, dtype, cs: int):
    """Gather + lane-pack the 2E edge terms into (e2, 3, la, 128) /
    (e2, la, 128) buffers CHUNK BY CHUNK via a lax.scan carry.

    The one-shot pack (concat -> moveaxis -> pad -> reshape -> take) peaks
    at ~5 full-scene fp32 transients; at r4's n=300 validation scale
    (2,950 edges, A=36,864) that blows 16 GB HBM inside pack_scene
    (VERDICT r4 weak #3). The packed blocks come out as scan OUTPUTS
    (ys stacking — XLA writes each step's slice into the preallocated
    result; the (ncs, cs, ...) -> (e2, ...) reshape is a free view), NOT
    as a scan carry: a carried buffer + dynamic_update_slice measured
    0.88 s at n=300 on v5e — XLA copied the full carry every step."""
    from align3r_tpu.ops import edge_loss as el
    E, A, _ = pred_i.shape
    norm = float(E * A)     # divide (not multiply-by-reciprocal): bit-parity
    ncs = e2 // cs
    perm2 = perm.reshape(ncs, cs)
    valid2 = valid.reshape(ncs, cs)
    pi, pj = pred_i, pred_j

    def gather(rows, a, b):
        from_i = rows < E
        ga = jnp.take(a, jnp.where(from_i, rows, 0), axis=0)
        gb = jnp.take(b, jnp.where(from_i, 0, rows - E), axis=0)
        cond = from_i.reshape((cs,) + (1,) * (ga.ndim - 1))
        return jnp.where(cond, ga, gb)

    def body(_, xs):
        rows, val = xs
        pred = gather(rows, pi, pj)                         # (cs, A, 3)
        w = gather(rows, w_i, w_j) / norm                   # (cs, A)
        w = w * val[:, None].astype(w.dtype)
        pp = el.pack_points(pred, la, dtype)                # (cs, 3, la, 128)
        wp = el.pack_scalars(w, la, dtype)                  # (cs, la, 128)
        return None, (pp, wp)

    _, (pb, wb) = jax.lax.scan(body, None, (perm2, valid2))
    return (pb.reshape(e2, 3, la, 128), wb.reshape(e2, la, 128))


@functools.partial(jax.jit, static_argnames=("e2", "la", "dtype", "cs",
                                             "interpret"))
def _pack_terms_fast(pred_i, pred_j, w_i, w_j, perm, valid,
                     e2: int, la: int, dtype, cs: int, interpret: bool):
    """Gather-free pack: lane-pack each per-edge buffer in its NATURAL row
    order (a pure streaming transpose XLA runs near HBM rate), then
    assemble the packed term order with the Pallas row-permute kernel
    (ops/edge_loss.py permute_packed — scalar-prefetched block index maps,
    pure DMA).

    The streamed gather pack (`_pack_terms_streamed`) fuses the
    data-dependent row gather INTO the lane-pack transpose, which XLA
    lowers to elementwise gathers at ~6-10 GB/s — 0.87 s once per solve at
    the n=300 bench scale, over half the end-to-end time of a 60-iter
    chunked solve. Splitting the layout transform (contiguous, fused,
    bandwidth-rate) from the reorder (block DMAs in a kernel) removes the
    gather entirely. Output is bit-identical to the streamed pack
    (valid-row contents AND dummy-slot convention: points of term 0,
    weight exactly 0)."""
    from align3r_tpu.ops import edge_loss as el
    E, A, _ = pred_i.shape
    norm = float(E * A)
    ep = -(-E // cs) * cs

    def natural(src_p, src_w):
        sp = jnp.pad(src_p, [(0, ep - E), (0, 0), (0, 0)])
        sw = jnp.pad(src_w, [(0, ep - E), (0, 0)])

        def body(_, xs):
            p, w = xs
            return None, (el.pack_points(p, la, dtype),
                          el.pack_scalars(w / norm, la, dtype))

        _, (pb, wb) = jax.lax.scan(
            body, None,
            (sp.reshape(ep // cs, cs, A, 3), sw.reshape(ep // cs, cs, A)))
        return pb.reshape(ep, 3, la, 128), wb.reshape(ep, la, 128)

    pi, wi = natural(pred_i, w_i)
    pj, wj = natural(pred_j, w_j)
    return el.permute_packed(pi, pj, wi, wj, perm, valid, e2=e2,
                             e_split=E, interpret=interpret)


_PACK_IMPL_DEFAULT = "fast"


def _resolve_pack_impl(impl: str | None) -> str:
    if impl in (None, "auto"):
        impl = os.environ.get("ALIGN3R_PACK_IMPL", _PACK_IMPL_DEFAULT)
    if impl not in ("fast", "streamed"):
        raise ValueError(f"pack impl {impl!r} (want 'fast'|'streamed')")
    return impl


def pack_scene(data: SceneData, cfg: SceneConfig,
               dtype=jnp.bfloat16, impl: str = "auto") -> SceneData:
    """One-time packing of the frozen observations into the fused kernel's
    lane layout (done before the solve; ~1 pass over the data, streamed in
    chunks so no full-scene fp32 transient is ever materialised). For
    scenes beyond the single-chunk VMEM residency bound, edge terms are
    sorted by image into nc-image chunks (ops/edge_loss.py chunked
    kernel)."""
    meta = _edge_meta(cfg)
    E = data.ei.shape[0]
    idx_np = np.concatenate([np.asarray(data.ei, np.int64),
                             np.asarray(data.ej, np.int64)])
    if meta.nc:
        slots, perm, idx_local, chunk, first = _chunk_layout(idx_np, meta)
        valid = (slots >= 0)
        packed_idx, extra = jnp.asarray(idx_local), dict(
            packed_chunk=jnp.asarray(chunk), packed_first=jnp.asarray(first))
    else:
        pad_e = meta.e2 - 2 * E
        perm = np.concatenate([np.arange(2 * E, dtype=np.int32),
                               np.zeros(pad_e, np.int32)])
        valid = np.concatenate([np.ones(2 * E, bool), np.zeros(pad_e, bool)])
        packed_idx = jnp.asarray(
            np.concatenate([idx_np, np.zeros(pad_e)]).astype(np.int32))
        extra = {}
    cs = 64 if meta.e2 % 64 == 0 else meta.eb      # e2 is a multiple of eb
    if _resolve_pack_impl(impl) == "fast":
        # gather-free: natural-order lane pack + Pallas row permute (see
        # _pack_terms_fast; bit-identical to the streamed pack)
        pred_p, w_p = _pack_terms_fast(
            data.pred_i, data.pred_j, data.weight_i, data.weight_j,
            jnp.asarray(perm, jnp.int32), jnp.asarray(valid, jnp.int32),
            e2=meta.e2, la=meta.la, dtype=jnp.dtype(dtype).name, cs=cs,
            interpret=meta.interpret)
    else:
        # legacy gather pack: dominant cost is the scan-internal fp32 row
        # gathers FUSED with the lane-pack transpose (~6-10 GB/s XLA
        # elementwise-gather rate; 0.87 s once per solve at n=300).
        # Pre-casting the sources to bf16 to halve gather bytes measured
        # SLOWER (1.33 s): TPU gathers of 16-bit rows pay more in relayout
        # than the bytes save, the same negative as the RAFT bf16 corr
        # pyramid (CLAUDE.md r3).
        pred_p, w_p = _pack_terms_streamed(
            data.pred_i, data.pred_j, data.weight_i, data.weight_j,
            jnp.asarray(perm, jnp.int32), jnp.asarray(valid),
            e2=meta.e2, la=meta.la, dtype=jnp.dtype(dtype).name, cs=cs)
    return dataclasses.replace(data, packed_pred=pred_p, packed_w=w_p,
                               packed_idx=packed_idx,
                               packed_perm=jnp.asarray(perm, jnp.int32),
                               **extra)


def depth_to_pts3d_packed(params, data: SceneData, cfg: SceneConfig,
                          la: int, dtype=jnp.float32):
    """World-frame points directly in the edge kernel's packed layout
    (n, 3, la, 128) — same math as `depth_to_pts3d` but built channel-major
    so no (n, A, 3) <-> (n, 3, A) relayout ever reaches HBM (the moveaxis
    in pack_points costs a 2·n·A·3·4-byte transpose fwd + bwd PER solve
    iteration at bench shapes ~42 MB each way)."""
    depth = get_depthmaps_raw(params, data, cfg)                 # (n, A)
    f = get_focals(params, cfg)[:, None]                         # (n, 1)
    pp = get_principal_points(params, data)                      # (n, 2)
    g = data.grid                                                # (A, 2)
    relx = depth * (g[None, :, 0] - pp[:, 0:1]) / f
    rely = depth * (g[None, :, 1] - pp[:, 1:2]) / f
    P = get_im_poses(params)                                     # (n, 4, 4)
    R, t = P[:, :3, :3], P[:, :3, 3]
    # rotation applied elementwise over (n, A) (not a (n,3,3)x(n,3,A)
    # batched matmul): the whole depth->world chain then fuses into the
    # single packed output write
    world = jnp.stack(
        [R[:, i, 0, None] * relx + R[:, i, 1, None] * rely
         + R[:, i, 2, None] * depth + t[:, i, None] for i in range(3)],
        axis=1)                                                  # (n, 3, A)
    from align3r_tpu.ops.edge_loss import _pad_to
    world = _pad_to(world, la * 128, -1)
    n = world.shape[0]
    return world.reshape(n, 3, la, 128).astype(dtype)


def _pairwise_pts_loss_fused(params, data: SceneData, cfg: SceneConfig):
    """Same loss as `pairwise_pts_loss` via the fused Pallas edge-residual
    kernel: no (E, A, 3) intermediates reach HBM, observations stream in
    bf16, and all in-kernel arithmetic is fp32 (see ops/edge_loss.py)."""
    from align3r_tpu.ops import edge_loss as el
    meta = _edge_meta(cfg)
    pw = get_pw_poses(params, cfg)                               # (E, 4, 4)
    adapt = get_adaptors(params, cfg)                            # (E, 3)
    pw34 = el.fold_pose_adaptors(pw, adapt)                      # (E, 3, 4)
    pw34 = jnp.concatenate([pw34, pw34], axis=0)                 # (2E, 3, 4)
    # pack order: sorted-by-image + per-chunk padding when chunked, padded
    # identity otherwise; dummy slots read row 0 (their weight is 0, so
    # both the loss contribution and the scattered-back gradient are 0)
    pw34 = jnp.take(pw34, data.packed_perm, axis=0)              # (e2, 3, 4)
    proj_p = depth_to_pts3d_packed(params, data, cfg, meta.la)
    if meta.nc and proj_p.shape[0] < meta.n:                     # pad images
        proj_p = jnp.pad(proj_p, [(0, meta.n - proj_p.shape[0]),
                                  (0, 0), (0, 0), (0, 0)])
    return el.edge_loss(meta, proj_p, pw34.astype(jnp.float32),
                        data.packed_pred, data.packed_w, data.packed_idx,
                        data.packed_chunk, data.packed_first)


def fused_supported(cfg: SceneConfig) -> bool:
    """Image count no longer bounds the fused kernel (scenes beyond the
    single-chunk VMEM residency switch to the image-chunked kernel,
    ops/edge_loss.py); the remaining bound is the backward's VMEM-resident
    (e2, 128) per-term pose-gradient accumulator — edge-count, not
    image-count."""
    return 2 * cfg.n_edges * 128 * 4 <= 12 * 2 ** 20   # e2 <~ 24.5k terms

def resolve_fast_impl(cfg: SceneConfig) -> str:
    impl = cfg.fast_impl
    if impl == "auto":
        impl = "fused" if jax.default_backend() in ("tpu", "axon") else "xla"
    if impl == "fused" and not fused_supported(cfg):
        # Silent 2-3x solve-speed cliff otherwise (VERDICT r2 Weak #5).
        warnings.warn(
            f"fused edge-residual solve disabled: n_edges={cfg.n_edges} "
            "exceeds the VMEM bound on the per-term pose-gradient "
            "accumulator (~12k edges); falling back to the 2-3x slower XLA "
            "one-hot path. Consider hierarchical clips "
            "(tool/pose_test.py --hierarchical).", stacklevel=2)
        impl = "xla"
    return impl


# --------------------------------------------------------------- the loop

def solve_scan_body(params, masks, data: SceneData, lrs, cfg: SceneConfig,
                    loss_fn=pairwise_pts_loss, step0=0, opt_state=None):
    """Un-jitted Adam scan — the ONE copy of the optimizer step (also
    vmapped by batched._batched_scan). step0 offsets the step index passed
    to loss_fn so step-gated terms (flow_forward's flow-loss start epoch)
    see the global iteration count when the solve runs in phases;
    opt_state=None initialises fresh Adam moments, else continues them.
    Returns (params, losses, opt_state)."""
    adam = optax.scale_by_adam(b1=0.9, b2=0.9)   # Adam betas (0.9, 0.9), base_opt.py:437
    if opt_state is None:
        opt_state = adam.init(params)

    def step(carry, lr_i):
        p, st = carry
        lr, i = lr_i
        loss, grads = jax.value_and_grad(loss_fn)(p, data, cfg, i)
        grads = jax.tree.map(lambda g, m: g * m, grads, masks)
        updates, st = adam.update(grads, st)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        p = optax.apply_updates(p, updates)
        return (p, st), loss

    steps = step0 + jnp.arange(lrs.shape[0])
    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                               (lrs, steps))
    return params, losses, opt_state


@functools.partial(jax.jit, static_argnames=("cfg", "loss_fn"))
def _alignment_scan(params, masks, data: SceneData, lrs, cfg: SceneConfig,
                    loss_fn=pairwise_pts_loss, step0=0, opt_state=None):
    return solve_scan_body(params, masks, data, lrs, cfg, loss_fn,
                           step0, opt_state)


def global_alignment_loop(params, masks, data: SceneData, cfg: SceneConfig,
                          lr: float = 0.01, niter: int = 300,
                          schedule: str = "cosine", lr_min: float = 1e-6,
                          loss_fn=pairwise_pts_loss,
                          precision: str = "mixed"):
    """Run the full Adam solve on device. Returns (params, losses (niter,)).

    precision: 'mixed' (default) runs the first 80% of iterations with the
    bf16 fast pairwise term and polishes the rest in fp32 — the polish
    continues the SAME Adam moments and step index (step-gated terms like
    flow_forward's flow-loss epoch see the global iteration count). On the
    fused kernel path the polish repacks the frozen observations in fp32
    and stays in-kernel (fp32 arithmetic throughout, so it is fp32-exact up
    to reduction order) instead of falling back to the slow XLA gather
    path; 'bf16' runs everything fast; 'fp32' is the reference-exact path
    (it overrides cfg.fast_solve).
    """
    if precision not in ("mixed", "bf16", "fp32"):
        raise ValueError(precision)
    lrs = jnp.asarray(schedule_array(schedule, niter, lr, lr_min))
    fused = resolve_fast_impl(cfg) == "fused"
    if precision == "fp32":
        exact_cfg = (dataclasses.replace(cfg, fast_solve=False)
                     if cfg.fast_solve else cfg)
        p, losses, _ = _alignment_scan(params, masks, data, lrs, exact_cfg,
                                       loss_fn)
        return p, losses
    fast_cfg = dataclasses.replace(cfg, fast_solve=True)
    if fused and data.packed_pred is None:
        data = pack_scene(data, cfg)  # one-time; used by the pairwise term
    if precision == "bf16" or cfg.fast_solve:
        p, losses, _ = _alignment_scan(params, masks, data, lrs, fast_cfg,
                                       loss_fn)
        return p, losses
    k = int(niter * 0.8)
    if k == 0 or k == niter:
        p, losses, _ = _alignment_scan(params, masks, data, lrs, cfg, loss_fn)
        return p, losses
    params, l1, st = _alignment_scan(params, masks, data, lrs[:k], fast_cfg,
                                     loss_fn)
    if fused:
        # free the bf16 pack BEFORE building the fp32 one — at large scenes
        # both coexisting during the repack costs ~1.5x the packed footprint
        data = dataclasses.replace(data, packed_pred=None, packed_w=None)
        data = pack_scene(data, cfg, dtype=jnp.float32)
        params, l2, _ = _alignment_scan(params, masks, data, lrs[k:],
                                        fast_cfg, loss_fn, step0=k,
                                        opt_state=st)
    else:
        params, l2, _ = _alignment_scan(params, masks, data, lrs[k:], cfg,
                                        loss_fn, step0=k, opt_state=st)
    return params, jnp.concatenate([l1, l2])


# ---------------------------------------------------- setting params (init)

def set_pose_vec(vec_arr, idx, T, scale=None):
    v = matrix_to_pose_vec(jnp.asarray(T, jnp.float32), scale=scale)
    return vec_arr.at[idx].set(v)


def set_focal(params, cfg: SceneConfig, idx, focal):
    f = jnp.clip(jnp.asarray(focal, jnp.float32), 1e-4)
    return dict(params, im_focals=params["im_focals"].at[idx].set(
        cfg.focal_break * jnp.log(f)))


def set_depthmap(params, idx, depth):
    """depth: (A,) for scalar idx, or (len(idx), A) for index arrays."""
    logd = jnp.log(jnp.clip(jnp.asarray(depth, jnp.float32), 1e-8))
    return dict(params, im_depthmaps=params["im_depthmaps"].at[idx].set(logd))


# ------------------------------------------- preset / freeze (known values)

def preset_pose(params, masks, idx, poses_c2w):
    """Set known cam2world poses and freeze them (reference optimizer.py
    preset_pose:79-96; row-level mask freeze replaces requires_grad_)."""
    vecs = matrix_to_pose_vec(jnp.asarray(poses_c2w, jnp.float32))
    params = dict(params, im_poses=params["im_poses"].at[idx].set(vecs))
    masks = dict(masks, im_poses=masks["im_poses"].at[idx].set(0.0))
    return params, masks


def preset_focal(params, masks, cfg: SceneConfig, idx, focals):
    params = set_focal(params, cfg, idx, focals)
    masks = dict(masks, im_focals=masks["im_focals"].at[idx].set(0.0))
    return params, masks


def preset_principal_point(params, masks, data: SceneData, idx, pps):
    v = (jnp.asarray(pps, jnp.float32) - data.base_pp) / 10.0
    params = dict(params, im_pp=params["im_pp"].at[idx].set(v))
    masks = dict(masks, im_pp=masks["im_pp"].at[idx].set(0.0))
    return params, masks


def preset_depthmap(params, masks, idx, depths):
    """Known depths (reference flow optimizer preset_depthmap:438-450)."""
    params = set_depthmap(params, idx, depths)
    masks = dict(masks, im_depthmaps=masks["im_depthmaps"].at[idx].set(0.0))
    return params, masks
