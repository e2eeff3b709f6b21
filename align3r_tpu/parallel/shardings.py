"""Parameter sharding specs: data + tensor parallelism for the Align3R net.

The reference's only gradient parallelism is single-node DDP (SURVEY.md
§2.7); the TPU rebuild scales further with a 2-D ('data', 'model') mesh:

- batch axis sharded over 'data' (gradient psum inserted by XLA),
- Megatron-style tensor parallelism over 'model' for every transformer
  block: qkv/fc1 kernels column-sharded (output features), proj/fc2
  kernels row-sharded (input features) so each block needs exactly one
  all-reduce per sublayer — the layout the scaling-book recipe prescribes.
  LayerNorms, patch embeds, zero convs and the fp32 DPT heads are small
  and stay replicated.

Stacked layer params carry a leading layer axis, so kernel specs are
shifted by one dim.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _dense_col(stacked: bool):  # shard output features
    return P(None, None, "model") if stacked else P(None, "model")


def _dense_row(stacked: bool):  # shard input features
    return P(None, "model", None) if stacked else P("model", None)


def _block_spec(stacked: bool = True):
    return {
        "norm1": P(), "norm2": P(),
        "attn": {"qkv": {"kernel": _dense_col(stacked),
                         "bias": P(None, "model") if stacked else P("model")},
                 "proj": {"kernel": _dense_row(stacked), "bias": P()}},
        "mlp": {"fc1": {"kernel": _dense_col(stacked),
                        "bias": P(None, "model") if stacked else P("model")},
                "fc2": {"kernel": _dense_row(stacked), "bias": P()}},
    }


def _dec_block_spec(stacked: bool = True):
    s = _block_spec(stacked)
    s.update({
        "norm3": P(), "norm_y": P(),
        "cross_attn": {
            "projq": {"kernel": _dense_col(stacked),
                      "bias": P(None, "model") if stacked else P("model")},
            "projk": {"kernel": _dense_col(stacked),
                      "bias": P(None, "model") if stacked else P("model")},
            "projv": {"kernel": _dense_col(stacked),
                      "bias": P(None, "model") if stacked else P("model")},
            "proj": {"kernel": _dense_row(stacked), "bias": P()},
        },
    })
    return s


def align3r_param_specs(params: Dict) -> Dict:
    """PartitionSpec pytree matching an Align3R param pytree."""
    def repl(tree):
        return jax.tree.map(lambda _: P(), tree)

    specs = {k: repl(v) for k, v in params.items()}
    specs["enc_blocks"] = _block_spec(True)
    specs["dec_blocks"] = _dec_block_spec(True)
    specs["dec_blocks2"] = _dec_block_spec(True)
    specs["dec_blocks_pc"] = _block_spec(True)
    return specs


def _insert_stream_axis(spec_tree, axis: int = 1):
    """Shift specs for params that gained an extra stacking axis at `axis`
    (the engine's dec_blocks_lg stream stacking: (L, ...) -> (L, 2, ...)).
    Fully-replicated P() stays P() (rank-agnostic)."""
    def shift(s):
        parts = list(s)
        if not parts:
            return s
        while len(parts) < axis:
            parts.append(None)
        parts.insert(axis, None)
        return P(*parts)
    return jax.tree.map(shift, spec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def engine_param_specs(params: Dict) -> Dict:
    """PartitionSpec pytree for the inference engine's param dict (i.e.
    after models.align3r.stack_decoder_params): align3r_param_specs plus
    the 'dec_blocks_lg' stream-stacked decoder twin, whose (L, 2, ...)
    leaves take the dec-block specs shifted by the stream axis."""
    base = {k: v for k, v in params.items() if k != "dec_blocks_lg"}
    specs = align3r_param_specs(base)
    if "dec_blocks_lg" in params:
        specs["dec_blocks_lg"] = _insert_stream_axis(_dec_block_spec(True))
    return specs


def engine_param_shardings(params: Dict, mesh: Mesh):
    """NamedSharding pytree matching an engine param dict exactly."""
    specs = engine_param_specs(params)
    return _map_with_prefix(lambda _, s: NamedSharding(mesh, s), params,
                            specs)


def _map_with_prefix(fn, params, specs):
    """Apply fn(leaf, spec); a PartitionSpec in `specs` covers the whole
    matching param subtree (prefix semantics)."""
    if isinstance(specs, P):
        return jax.tree.map(lambda x: fn(x, specs), params)
    assert isinstance(specs, dict) and isinstance(params, dict), (
        type(specs), type(params))
    out = {}
    for k, v in params.items():
        out[k] = _map_with_prefix(fn, v, specs[k]) if k in specs else \
            jax.tree.map(lambda x: fn(x, P()), v)
    return out


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """Place params on the mesh per align3r_param_specs."""
    specs = align3r_param_specs(params)
    return _map_with_prefix(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def param_shardings(params: Dict, mesh: Mesh):
    specs = align3r_param_specs(params)
    return _map_with_prefix(lambda _, s: NamedSharding(mesh, s), params, specs)
