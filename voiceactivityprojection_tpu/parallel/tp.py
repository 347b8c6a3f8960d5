"""Tensor-parallel param shardings over the mesh "model" axis.

The VAP model is small (~5-10 M params) and data parallelism is the right
production strategy (SURVEY.md §2.14); this module exists to exercise and
validate the framework's second mesh axis: Megatron-style shardings where

  attention q/k/v project to head-sharded activations (rows over "model"),
  the output projection contracts them back (columns over "model"),
  FFN w_in rows / w_out columns likewise,

so XLA's GSPMD partitioner inserts exactly one all-reduce per attention
and per FFN block. Everything else (norms, heads, encoder, combinator)
stays replicated. Applied via `shard_params_tp(params, mesh)`; computation
code is unchanged — sharding propagation does the rest.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _layer_specs(layer: dict) -> dict:
    specs: dict = {
        "ln_self_attn": {"w": P(), "b": P()},
        "ln_ffnetwork": {"w": P(), "b": P()},
        "mha": {
            # row-parallel qkv (out_features first: (dim, dim) applied x @ W.T)
            "query": {"w": P("model", None)},
            "key": {"w": P("model", None)},
            "value": {"w": P("model", None)},
            # column-parallel output projection -> all-reduce after
            "proj": {"w": P(None, "model")},
            "m": P(),
        },
        "ffn": {
            "w_in": {"w": P("model", None)},   # (dff, dim) row-parallel
            "w_out": {"w": P(None, "model")},  # (dim, dff) column-parallel
        },
    }
    if "mha_cross" in layer:
        specs["ln_src_attn"] = {"w": P(), "b": P()}
        specs["mha_cross"] = specs["mha"]
    return specs


def tp_param_specs(params: dict) -> Any:
    """PartitionSpec pytree matching a VapModel param tree."""

    def stack_specs(stack: dict) -> dict:
        out: dict = {"layers": [_layer_specs(l) for l in stack["layers"]]}
        if "combinator" in stack:
            out["combinator"] = jax.tree.map(lambda _: P(), stack["combinator"])
        return out

    specs: dict = {}
    for k, v in params.items():
        if k in ("ar", "ar_channel"):
            specs[k] = stack_specs(v)
        else:
            specs[k] = jax.tree.map(lambda _: P(), v)
    return specs


def shard_params_tp(params: dict, mesh: Mesh) -> dict:
    """Place params with Megatron-style shardings over mesh axis "model"."""
    specs = tp_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
