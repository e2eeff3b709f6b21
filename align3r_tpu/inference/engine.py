"""Batched, jitted pairwise inference engine.

Behavioural reference: /root/reference/dust3r/inference.py:32-78 (inference,
loss_of_one_batch) and dust3r/model.py:176-196 (symmetrised encode sharing).

TPU-first redesign (SURVEY.md §7.4): instead of running the full two-view
network once per pair (re-encoding every image each time it appears in a
window), we
  1. encode every unique image ONCE, batched (the ViT-L encoder dominates
     FLOPs; sliding-window graphs reuse each image in ~2·winsize pairs, so
     this alone is a ~10x encoder saving over the reference loop);
  2. patch-embed every prior pointcloud once;
  3. gather per-pair features and run the decoder+heads in fixed-size jitted
     batches (last batch padded — static shapes, one compiled program).

Everything stays on device; results are returned as stacked arrays per edge,
ready for the global aligner (no CPU round-trip; cf. reference
inference.py:68 which moves every batch to CPU and re-uploads later).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from align3r_tpu.models.align3r import (encode_images, embed_point_cloud,
                                        decode_pair, stack_decoder_params)
from align3r_tpu.models.config import Align3RConfig
from align3r_tpu.models.dpt_head import apply_dpt_head, apply_dpt_heads_stacked
from align3r_tpu.models.rope import make_grid_positions


def _decode_batch(params, feat1, feat2, pc1, pc2, cfg: Align3RConfig,
                  img_hw: Tuple[int, int], dtype=jnp.bfloat16,
                  head_dtype=jnp.float32, attn_impl: str = "auto",
                  stacked_heads: bool = False, head_conv_impl: str = "xla",
                  unroll: int = 1):
    """Decoder + heads for a batch of pairs with precomputed features.
    head_dtype=jnp.bfloat16 opts the DPT conv pyramid into bf16 (fp32 is
    the reference AMP behaviour and the default); attn_impl="fused" routes
    decoder layers through the fused Pallas sites (ops/fused_site.py);
    stacked_heads runs both DPT heads as one vmapped grouped-conv program;
    unroll unrolls the decoder layer scans (u3 measured 3.98 vs 4.38
    ms/pair at u1 with fused sites — tool/profile_decode.py)."""
    H, W = img_hw
    grid = (H // cfg.patch_size, W // cfg.patch_size)
    Bp = feat1.shape[0]
    pos = make_grid_positions(grid[0], grid[1], batch=Bp)
    pc_pos = make_grid_positions(grid[0], grid[1], batch=2 * Bp)
    pc_tokens = jnp.concatenate([pc1, pc2], axis=0)
    hooks1, hooks2 = decode_pair(params, feat1, pos, feat2, pos,
                                 pc_tokens, pc_pos, cfg, dtype, attn_impl,
                                 unroll=unroll)
    if stacked_heads:
        return apply_dpt_heads_stacked(params["head1"], params["head2"],
                                       hooks1, hooks2, grid, (H, W),
                                       cfg.depth_mode, cfg.conf_mode,
                                       dtype=head_dtype)
    res1 = apply_dpt_head(params["head1"], hooks1, grid, (H, W),
                          cfg.depth_mode, cfg.conf_mode, dtype=head_dtype,
                          conv_impl=head_conv_impl)
    res2 = apply_dpt_head(params["head2"], hooks2, grid, (H, W),
                          cfg.depth_mode, cfg.conf_mode, dtype=head_dtype,
                          conv_impl=head_conv_impl)
    return res1, res2


@functools.partial(jax.jit,
                   static_argnames=("cfg", "img_hw", "dtype", "head_dtype",
                                    "attn_impl", "stacked_heads",
                                    "head_conv_impl", "unroll",
                                    "head_group"))
def _decode_batch_jit(params, feat1, feat2, pc1, pc2, cfg, img_hw,
                      dtype=jnp.bfloat16, head_dtype=jnp.float32,
                      attn_impl: str = "auto", stacked_heads: bool = False,
                      head_conv_impl: str = "xla", unroll: int = 1,
                      head_group: int = 1):
    del head_group               # cache-key discriminator, see _decode_all_jit
    return _decode_batch(params, feat1, feat2, pc1, pc2, cfg, img_hw, dtype,
                         head_dtype, attn_impl, stacked_heads, head_conv_impl,
                         unroll)


def _decode_all_scan(params, feats, pc_tok, bi, bj, cfg, img_hw,
                     dtype=jnp.bfloat16, head_dtype=jnp.float32,
                     attn_impl: str = "auto", stacked_heads: bool = False,
                     head_conv_impl: str = "xla", unroll: int = 1):
    """Whole decode phase as ONE dispatch: lax.scan over padded pair
    batches (bi/bj: (n_batches, batch) image indices). A per-batch host
    loop costs ~11 dispatches per batch, and when the TPU tunnel enters a
    slow-dispatch phase that overhead leaks straight into throughput
    (measured 130 -> 85 pairs/s with identical programs); one scan makes
    the decode phase latency-immune like the alignment solve.
    Returns (n_batches, batch, ...) pytrees (the un-flattened shape is what
    the multi-chip shard_map wrapper splits along axis 1)."""
    def body(_, idx):
        i, j = idx
        r1, r2 = _decode_batch(params, jnp.take(feats, i, axis=0),
                               jnp.take(feats, j, axis=0),
                               jnp.take(pc_tok, i, axis=0),
                               jnp.take(pc_tok, j, axis=0),
                               cfg, img_hw, dtype, head_dtype, attn_impl,
                               stacked_heads, head_conv_impl, unroll)
        return None, (r1, r2)

    _, (outs1, outs2) = jax.lax.scan(body, None, (bi, bj))
    return outs1, outs2


def _flat_batches(tree):
    # (n_batches, batch, ...) -> (n_batches*batch, ...)
    return jax.tree.map(lambda t: t.reshape((-1,) + t.shape[2:]), tree)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "img_hw", "dtype", "head_dtype",
                                    "attn_impl", "stacked_heads",
                                    "head_conv_impl", "unroll",
                                    "head_group"))
def _decode_all_jit(params, feats, pc_tok, bi, bj, cfg, img_hw,
                    dtype=jnp.bfloat16, head_dtype=jnp.float32,
                    attn_impl: str = "auto", stacked_heads: bool = False,
                    head_conv_impl: str = "xla", unroll: int = 1,
                    head_group: int = 1):
    # head_group is a TRACE-TIME module default inside the fused sites
    # (fused_site._DEFAULT_HEAD_GROUP), invisible to jit's cache keys —
    # it is passed here purely as a static cache-key discriminator so a
    # changed knob retraces instead of silently reusing a stale executable
    del head_group
    outs1, outs2 = _decode_all_scan(params, feats, pc_tok, bi, bj, cfg,
                                    img_hw, dtype, head_dtype, attn_impl,
                                    stacked_heads, head_conv_impl, unroll)
    return _flat_batches(outs1), _flat_batches(outs2)


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "attn_impl",
                                             "head_group"))
def _encode_all_jit(params, imgs, priors, cfg, dtype=jnp.bfloat16,
                    attn_impl: str = "auto", head_group: int = 1):
    del head_group               # cache-key discriminator, see _decode_all_jit
    feats, _ = encode_images(params, imgs, cfg, dtype, attn_impl)
    pc_tok, _ = embed_point_cloud(params, priors, cfg, dtype)
    return feats, pc_tok


# --------------------------------------------------------- multi-chip (dp)
#
# A pallas_call is an opaque custom call to GSPMD: jit-with-sharded-inputs
# would all-gather around the fused site kernels instead of partitioning
# them. shard_map splits the batch across the 'data' mesh axis BEFORE
# tracing, so every chip runs its own kernels on its slice — per-image
# encode and per-pair decode are embarrassingly parallel (zero collectives
# on the hot path; only the replicated feats/params are broadcast once).

_SHARDED_CACHE: dict = {}


def sharded_engine_fns(mesh, cfg, img_hw, dtype, head_dtype, attn_impl,
                       stacked_heads, head_conv_impl, unroll,
                       encode_attn_impl):
    """(encode_fn, decode_fn) dp-sharded over mesh axis 'data', cached per
    (mesh, statics) so repeated inference() calls reuse the compiled
    programs. encode_fn(params, imgs, priors) shards images; decode_fn
    (params, feats, pc_tok, bi, bj) shards each scan step's pair batch."""
    from align3r_tpu.ops import fused_site as _fs
    key = (mesh, cfg, img_hw, jnp.dtype(dtype).name,
           jnp.dtype(head_dtype).name, attn_impl, stacked_heads,
           head_conv_impl, unroll, encode_attn_impl,
           _fs._DEFAULT_HEAD_GROUP)  # trace-time knob -> must key the cache
    hit = _SHARDED_CACHE.get(key)
    if hit is not None:
        return hit
    from jax.sharding import PartitionSpec as P
    try:
        shard_map = jax.shard_map
    except AttributeError:   # older jax
        from jax.experimental.shard_map import shard_map
    rep = P()

    def enc(params, im, pr):
        feats, _ = encode_images(params, im, cfg, dtype, encode_attn_impl)
        pc_tok, _ = embed_point_cloud(params, pr, cfg, dtype)
        return feats, pc_tok

    enc_sh = jax.jit(shard_map(
        enc, mesh=mesh, in_specs=(rep, P("data"), P("data")),
        out_specs=P("data")))

    def dec(params, feats, pc_tok, bi, bj):
        return _decode_all_scan(params, feats, pc_tok, bi, bj, cfg, img_hw,
                                dtype, head_dtype, attn_impl, stacked_heads,
                                head_conv_impl, unroll)

    dec_sh_scan = jax.jit(shard_map(
        dec, mesh=mesh,
        in_specs=(rep, rep, rep, P(None, "data"), P(None, "data")),
        out_specs=P(None, "data")))

    def dec_sh(params, feats, pc_tok, bi, bj):
        o1, o2 = dec_sh_scan(params, feats, pc_tok, bi, bj)
        return _flat_batches(o1), _flat_batches(o2)

    _SHARDED_CACHE[key] = (enc_sh, dec_sh)
    return enc_sh, dec_sh


# ---------------------------------------------------- multi-chip (dp x tp)
#
# With a 2-D ('data', 'model') mesh the engine adds Megatron-style tensor
# parallelism: qkv/fc1 column-sharded, proj/fc2 row-sharded over 'model'
# (parallel/shardings.py), batch over 'data'. This path goes through jit +
# GSPMD in_shardings — XLA inserts the one all-reduce per sublayer — and
# therefore runs the XLA attention path: a pallas_call is an opaque custom
# call the partitioner cannot split over heads, while the einsum graph it
# replaces partitions cleanly. Use dp-only meshes for peak throughput
# (fused kernels); use tp when per-chip HBM or per-request latency binds.


def tp_engine_fns(mesh, params, cfg, img_hw, dtype, head_dtype,
                  stacked_heads, head_conv_impl, unroll):
    """(encode_fn, decode_fn) for a mesh whose 'model' axis is > 1. Cached
    like sharded_engine_fns. `params` is only used for its pytree
    structure (specs must match the stream-stacked engine params)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from align3r_tpu.parallel.shardings import engine_param_shardings
    key = ("tp", mesh, cfg, img_hw, jnp.dtype(dtype).name,
           jnp.dtype(head_dtype).name, stacked_heads, head_conv_impl,
           unroll)
    hit = _SHARDED_CACHE.get(key)
    if hit is not None:
        return hit
    pshard = engine_param_shardings(params, mesh)
    dsh = NamedSharding(mesh, P("data"))
    bsh = NamedSharding(mesh, P(None, "data"))
    rep = NamedSharding(mesh, P())

    def enc(params, im, pr):
        feats, _ = encode_images(params, im, cfg, dtype, "xla")
        pc_tok, _ = embed_point_cloud(params, pr, cfg, dtype)
        return feats, pc_tok

    enc_sh = jax.jit(enc, in_shardings=(pshard, dsh, dsh),
                     out_shardings=dsh)

    def dec(params, feats, pc_tok, bi, bj):
        return _decode_all_scan(params, feats, pc_tok, bi, bj, cfg, img_hw,
                                dtype, head_dtype, "xla", stacked_heads,
                                head_conv_impl, unroll)

    dec_scan = jax.jit(dec, in_shardings=(pshard, rep, rep, bsh, bsh),
                       out_shardings=bsh)

    def dec_sh(params, feats, pc_tok, bi, bj):
        o1, o2 = dec_scan(params, feats, pc_tok, bi, bj)
        return _flat_batches(o1), _flat_batches(o2)

    _SHARDED_CACHE[key] = (enc_sh, dec_sh)
    return enc_sh, dec_sh


def inference(pairs: Sequence[Tuple[int, int]], params, cfg: Align3RConfig,
              imgs: jnp.ndarray, priors: jnp.ndarray,
              batch_size: int = 16, dtype=jnp.bfloat16,
              encode_chunk: int = 16, head_dtype=jnp.bfloat16,
              attn_impl: str | None = None, stacked_heads: bool = False,
              encode_attn_impl: str | None = None,
              head_conv_impl: str = "xla", unroll: int = 3,
              mesh=None) -> Dict:
    """Run the two-view network over a frame graph.

    mesh: optional jax.sharding.Mesh with a 'data' axis — encode and decode
    run dp-sharded over it via shard_map (each chip runs the Pallas site
    kernels on its slice of images / pairs; params and feats are
    replicated). batch_size and encode_chunk must divide the 'data' size.
    If the mesh also has a 'model' axis > 1, the engine switches to 2-D
    dp x tp serving: params Megatron-sharded over 'model' (GSPMD inserts
    the per-sublayer all-reduces), batch over 'data', XLA attention path
    (Pallas kernels cannot be compiler-partitioned). 'model' must divide
    both head counts. Use tp when per-chip HBM or latency binds; dp-only
    keeps the fused kernels and peak throughput.

    pairs: list of (i, j) index edges; imgs: (n, H, W, 3) normalised,
    landscape; priors: (n, H, W, 3) normalised prior pointclouds.

    head_dtype defaults to bf16 — a documented deviation from the
    reference's AMP rule (heads forced fp32, dust3r/model.py:252): our head
    path pins the final regression conv and the exp/conf postprocess to
    fp32 explicitly, so only intermediate conv features are bf16 (same
    trust level as the bf16 backbone) and the head runs ~3.7x faster on
    v5e. Pass head_dtype=jnp.float32 for the reference-exact AMP boundary.

    Returns dict mirroring the reference output contract
    (dust3r/inference.py:55-72):
      view1/view2: {'idx': (E,) int}
      pred1: {'pts3d': (E,H,W,3), 'conf': (E,H,W)}
      pred2: {'pts3d_in_other_view': ..., 'conf': ...}
    All arrays on-device fp32.
    """
    n, H, W, _ = imgs.shape
    assert W >= H, "engine expects landscape images (pre-transpose portraits)"

    explicit_attn, explicit_enc_attn = attn_impl, encode_attn_impl
    if attn_impl is None:
        # fused Pallas sites win on TPU (engine sweep: 128.9 vs 104.5
        # pairs/s at bs=16, tool/tune_engine.py); interpret-mode Pallas on
        # CPU would only slow tests down, so default to the XLA path there
        attn_impl = ("fused" if jax.default_backend() in ("tpu", "axon")
                     else "auto")
    if encode_attn_impl is None:
        # encoder: fused attention site (XLA MLP — its weights exceed the
        # site's VMEM gate at C=1024): 4.30 vs 5.10 ms/img measured
        encode_attn_impl = attn_impl if attn_impl == "fused" else "auto"
    if stacked_heads and head_conv_impl == "pipeline":
        # the stacked-head path vmaps apply_dpt_head, which the pipeline
        # kernels' manual DMA does not support — refuse silently-wrong A/Bs
        import warnings
        warnings.warn("stacked_heads=True does not support "
                      "head_conv_impl='pipeline'; using the XLA head",
                      stacklevel=2)
        head_conv_impl = "xla"

    # one-time decode prep: stream-stacked, bf16-kernel decoder weights
    # (otherwise every decode program re-copies ~900 MB of fp32 weights)
    params = stack_decoder_params(params, dtype)

    # the fused sites read their head_group from a module default at TRACE
    # time; thread it into every jit below as a static cache-key
    # discriminator so a changed ALIGN3R_HEAD_GROUP (or a sweep flipping
    # the module default) retraces instead of reusing stale executables
    from align3r_tpu.ops import fused_site as _fs
    _hg = _fs._DEFAULT_HEAD_GROUP

    enc_sh = dec_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        nd = mesh.shape["data"]
        if batch_size % nd or encode_chunk % nd:
            raise ValueError(
                f"batch_size={batch_size} and encode_chunk={encode_chunk} "
                f"must divide the mesh 'data' size {nd}")
        if dict(mesh.shape).get("model", 1) > 1:
            # 2-D mesh: tensor parallelism over 'model' (GSPMD, XLA
            # attention path — see tp_engine_fns) + batch over 'data'
            from align3r_tpu.parallel.shardings import engine_param_shardings
            m = mesh.shape["model"]
            # BOTH head counts must divide, or the sharding silently stops
            # being the documented head-aligned Megatron layout (GSPMD pads
            # and communicates instead) — check each (ADVICE r4 #1)
            if cfg.enc_num_heads % m or cfg.dec_num_heads % m:
                raise ValueError(
                    f"mesh 'model' size {m} must divide "
                    f"the head counts ({cfg.enc_num_heads} enc / "
                    f"{cfg.dec_num_heads} dec)")
            # the tp path runs XLA attention (Pallas kernels are opaque to
            # the GSPMD partitioner); an explicitly requested fused impl
            # must not be silently swapped (ADVICE r4 #4)
            import warnings
            for knob, val in (("attn_impl", explicit_attn),
                              ("encode_attn_impl", explicit_enc_attn)):
                # 'auto' delegates to the engine (XLA IS the auto choice
                # here) — only warn on an explicit fused-kernel request
                if val not in (None, "xla", "auto"):
                    warnings.warn(
                        f"{knob}={val!r} is ignored on a mesh with "
                        f"'model' axis {m} > 1: tensor parallelism runs "
                        "the XLA attention path (Pallas kernels cannot be "
                        "compiler-partitioned)", stacklevel=2)
            enc_sh, dec_sh = tp_engine_fns(
                mesh, params, cfg, (H, W), dtype, head_dtype,
                stacked_heads, head_conv_impl, unroll)
            params = jax.device_put(params,
                                    engine_param_shardings(params, mesh))
        else:
            enc_sh, dec_sh = sharded_engine_fns(
                mesh, cfg, (H, W), dtype, head_dtype, attn_impl,
                stacked_heads, head_conv_impl, unroll, encode_attn_impl)
            params = jax.device_put(params, NamedSharding(mesh, P()))

    # 1-2) per-image encoder + prior embed, chunked to bound memory
    feats_l, pc_l = [], []
    for s in range(0, n, encode_chunk):
        e = min(s + encode_chunk, n)
        # pad the last chunk so every call shares one compiled shape
        pad = encode_chunk - (e - s)
        im = imgs[s:e]
        pr = priors[s:e]
        if pad:
            im = jnp.concatenate([im, jnp.zeros((pad, H, W, 3), im.dtype)], axis=0)
            pr = jnp.concatenate([pr, jnp.zeros((pad, H, W, 3), pr.dtype)], axis=0)
        if enc_sh is not None:
            f, pc = enc_sh(params, im, pr)
        else:
            f, pc = _encode_all_jit(params, im, pr, cfg, dtype,
                                    encode_attn_impl, head_group=_hg)
        feats_l.append(f[: e - s])
        pc_l.append(pc[: e - s])
    feats = jnp.concatenate(feats_l, axis=0)
    pc_tok = jnp.concatenate(pc_l, axis=0)

    # 3) decoder over pair batches. Full groups of SCAN_NB batches run as
    # ONE scan dispatch (fixed scan length); a >1-batch ragged tail runs
    # as one scan too (one cached compile per distinct tail length), and a
    # single-batch tail reuses the single-batch program. This keeps
    # dispatch count ~1/8th of a pure per-batch loop, which matters
    # because tunnel slow-dispatch phases otherwise leak host latency into
    # throughput (measured 130 -> 85 pairs/s with identical device code).
    SCAN_NB = 8
    idx_i = np.array([p[0] for p in pairs], np.int32)
    idx_j = np.array([p[1] for p in pairs], np.int32)
    E = len(pairs)
    n_batches = -(-E // batch_size)
    pad = n_batches * batch_size - E
    bi = np.concatenate([idx_i, np.zeros(pad, np.int32)]).reshape(
        n_batches, batch_size)
    bj = np.concatenate([idx_j, np.zeros(pad, np.int32)]).reshape(
        n_batches, batch_size)
    outs1, outs2 = [], []
    n_full = (n_batches // SCAN_NB) * SCAN_NB
    rem = n_batches - n_full
    # the ragged tail runs as ONE scan too when it spans >1 batch (one
    # compile per distinct tail length, cached in-process): a bs=32
    # swinstride bench graph is 7 batches — all tail — and per-batch
    # dispatch is exactly the host-latency leak the scan design exists to
    # avoid. A single tail batch reuses the single-batch program instead
    # of compiling a length-1 scan.
    groups = [(s, SCAN_NB) for s in range(0, n_full, SCAN_NB)]
    if rem > 1:
        groups.append((n_full, rem))
    for s, ln in groups:
        ib = jnp.asarray(bi[s:s + ln])
        jb = jnp.asarray(bj[s:s + ln])
        if dec_sh is not None:
            r1, r2 = dec_sh(params, feats, pc_tok, ib, jb)
        else:
            r1, r2 = _decode_all_jit(params, feats, pc_tok, ib, jb,
                                     cfg, (H, W), dtype, head_dtype,
                                     attn_impl, stacked_heads,
                                     head_conv_impl, unroll, head_group=_hg)
        outs1.append(r1)
        outs2.append(r2)
    if rem == 1:
        s = n_full
        if dec_sh is not None:
            r1, r2 = dec_sh(params, feats, pc_tok,
                            jnp.asarray(bi[s:s + 1]),
                            jnp.asarray(bj[s:s + 1]))
        else:
            i = jnp.asarray(bi[s])
            j = jnp.asarray(bj[s])
            r1, r2 = _decode_batch_jit(params, jnp.take(feats, i, axis=0),
                                       jnp.take(feats, j, axis=0),
                                       jnp.take(pc_tok, i, axis=0),
                                       jnp.take(pc_tok, j, axis=0),
                                       cfg, (H, W), dtype, head_dtype,
                                       attn_impl, stacked_heads,
                                       head_conv_impl, unroll, head_group=_hg)
        outs1.append(r1)
        outs2.append(r2)
    cat = lambda outs: jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[:E],
                                    *outs)
    res1, res2 = cat(outs1), cat(outs2)
    res2["pts3d_in_other_view"] = res2.pop("pts3d")
    return {
        "view1": {"idx": idx_i},
        "view2": {"idx": idx_j},
        "pred1": res1,
        "pred2": res2,
    }
