"""Tensor-parallel sharding rules over a jax.sharding Mesh.

The reference's only first-class parallelism is the vLLM TP plugin, which
hand-slices rotation params per rank (plugin.py:33-76) and relies on NCCL
all-reduce. Here TP is declarative: every parameter gets a NamedSharding and
pjit/GSPMD inserts the all-gather/reduce-scatter/psum collectives over ICI
(SURVEY.md §2.6, §5.8).

Rules (mesh axes: "data" for batch DP, "model" for TP):
- column-parallel (q/k/v/gate/up, lm_head): weight [I, O] sharded on O;
  for QuantizedLinear, qweight [I//2, O] + scales/zeros [G, O] shard on the
  last axis; rotation (input-side) replicates.
- row-parallel (o_proj/down): weight sharded on I; quantized scales/zeros
  shard on the G axis and the rotation matrices [G, S, S] shard on G — valid
  because rotations never cross a 128-group boundary (the same contiguous
  group-slice property the reference exploits, plugin.py:33-50).
- KV cache [L, B, S, Hkv, D]: batch on "data", kv heads on "model".
- MoE experts: expert dim on "model" (weights-sharded EP; cheap for W4).
- everything else (norms, embeddings) replicated; activations batch-sharded.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.decoder import DenseLinear, KVCache
from ..ops.moe import QuantizedMoEExperts
from ..ops.qlinear import QuantizedLinear


def make_mesh(n_data: int = 1, n_model: int | None = None) -> Mesh:
    devices = np.array(jax.devices())
    if n_model is None:
        n_model = len(devices) // n_data
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    return Mesh(devices[: n_data * n_model].reshape(n_data, n_model), ("data", "model"))


def _linear_spec(lin: Any, kind: str):
    """PartitionSpec pytree for one linear. kind: 'col' | 'row' | 'rep'."""
    if isinstance(lin, DenseLinear):
        if kind == "col":
            return DenseLinear(P(None, "model"), None if lin.b is None else P("model"))
        if kind == "row":
            return DenseLinear(P("model", None), None if lin.b is None else P())
        return DenseLinear(P(), None if lin.b is None else P())
    if isinstance(lin, QuantizedLinear):
        b = None if lin.bias is None else (P("model") if kind == "col" else P())
        if kind == "col":
            return QuantizedLinear(
                qweight=P(None, "model"), scales=P(None, "model"),
                zeros=P(None, "model"), rot=P(), bias=b,
            )
        if kind == "row":
            return QuantizedLinear(
                qweight=P("model", None), scales=P("model", None),
                zeros=P("model", None), rot=P("model", None, None), bias=b,
            )
        return QuantizedLinear(qweight=P(), scales=P(), zeros=P(), rot=P(), bias=b)
    raise TypeError(type(lin))


def _experts_spec(experts: Any):
    if isinstance(experts, QuantizedMoEExperts):
        e = P("model", None, None)
        return QuantizedMoEExperts(
            gate_qweight=e, gate_scales=e, gate_zeros=e,
            up_qweight=e, up_scales=e, up_zeros=e,
            down_qweight=e, down_scales=e, down_zeros=e,
            gate_up_rot=P(), down_rot=P(),
        )
    return {k: P("model", None, None) for k in experts}


def _merged_col_spec(lin: Any):
    """MergedQuantizedLinear (QKV / gate-up): column-parallel on the
    concatenated O axis. Correct under GSPMD for any split_points (sharding
    is layout, the static splits stay global); rotations are input-side and
    replicate."""
    from ..ops.qlinear import MergedQuantizedLinear

    return MergedQuantizedLinear(
        qweight=P(None, "model"), scales=P(None, "model"),
        zeros=P(None, "model"), rot=P(),
        bias=None if lin.bias is None else P("model"),
        out_splits=lin.out_splits,
    )


def param_specs(params: dict[str, Any], config: ModelConfig) -> dict[str, Any]:
    """PartitionSpec pytree matching the model params pytree.

    Keys without a TP rule (norms, altup/laurel/per-layer-input modules,
    vision tower, delta-net params) replicate — always correct, just not
    model-sharded."""
    from ..ops.qlinear import MergedQuantizedLinear

    specs: dict[str, Any] = {}
    for name, val in params.items():
        if name == "lm_head":
            specs[name] = _linear_spec(val, "col")
        elif name != "layers":
            specs[name] = jax.tree.map(lambda _: P(), val)
    specs["layers"] = []
    for lp in params["layers"]:
        ls: dict[str, Any] = {}
        for name, val in lp.items():
            if name in ("q_proj", "k_proj", "v_proj"):
                ls[name] = _linear_spec(val, "col")
            elif name == "qkv_proj" and isinstance(val, MergedQuantizedLinear):
                ls[name] = _merged_col_spec(val)
            elif name == "o_proj":
                ls[name] = _linear_spec(val, "row")
            elif name == "mlp":
                ms: dict[str, Any] = {}
                for mn, mv in val.items():
                    if mn in ("gate_proj", "up_proj"):
                        ms[mn] = _linear_spec(mv, "col")
                    elif mn == "gate_up_proj" and isinstance(mv, MergedQuantizedLinear):
                        ms[mn] = _merged_col_spec(mv)
                    elif mn == "down_proj":
                        ms[mn] = _linear_spec(mv, "row")
                    elif mn == "experts":
                        ms[mn] = _experts_spec(mv)
                    elif mn == "shared_expert":
                        # always-on GLU beside the routed experts: shard like
                        # the dense MLP (col/col/row); its sigmoid gate (a
                        # [H,1] DenseLinear) falls to the replicate default
                        ms[mn] = {
                            "gate_proj": _linear_spec(mv["gate_proj"], "col"),
                            "up_proj": _linear_spec(mv["up_proj"], "col"),
                            "down_proj": _linear_spec(mv["down_proj"], "row"),
                        }
                    elif mn == "router":
                        ms[mn] = _linear_spec(mv, "rep")
                    else:
                        ms[mn] = jax.tree.map(lambda _: P(), mv)
                ls[name] = ms
            else:
                ls[name] = jax.tree.map(lambda _: P(), val)
        specs["layers"].append(ls)
    return specs


def cache_specs(config: ModelConfig) -> KVCache:
    # per-layer head-major cache leaves [B, Hkv, S, D]: batch on "data",
    # kv heads on "model" (one spec applied to every tuple leaf)
    kv = P("data", "model", None, None)
    return KVCache(k=kv, v=kv, length=P())


def shard_params(params: dict[str, Any], config: ModelConfig, mesh: Mesh,
                 tp_fused: bool = False) -> dict[str, Any]:
    """device_put every param with its TP sharding (head-count permitting).

    tp_fused=True additionally (a) permutes TP-eligible merged projections
    into device-blocked column order BEFORE placement and (b) wraps eligible
    quantized layers in parallel.tp TP dataclasses, so the model forward runs
    the fused Pallas kernels per device inside shard_map instead of falling
    back to GSPMD-replicated pallas_call (round-3 VERDICT item 1)."""
    n_model = mesh.shape["model"]
    if config.num_key_value_heads % n_model != 0:
        raise ValueError(
            f"num_key_value_heads={config.num_key_value_heads} not divisible by"
            f" model-axis size {n_model}"
        )
    if tp_fused and n_model > 1:
        from .tp import MergedQuantizedLinear, tp_permute_merged

        def permute(v):
            if (isinstance(v, MergedQuantizedLinear)
                    and not any(w % n_model for w in v.out_splits)):
                return tp_permute_merged(v, n_model)
            return v

        params = jax.tree.map(
            permute, params,
            is_leaf=lambda v: isinstance(v, MergedQuantizedLinear),
        )
    specs = param_specs(params, config)
    placed = jax.tree.map(
        lambda a, s: None if a is None else jax.device_put(a, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: x is None,
    )
    if tp_fused and n_model > 1:
        from .tp import tp_wrap_params

        placed = tp_wrap_params(placed, config, mesh)
    return placed


def shard_paged_cache(cache: Any, mesh: Mesh) -> Any:
    """Shard a serve.paged.PagedKVCache [L, P, ps, Hkv, D] on kv heads.

    Pages are replicated across the data axis (every rank serves every
    request's pages — request-level DP happens at the engine/process level),
    kv heads split on "model" like the contiguous cache.
    """
    spec = NamedSharding(mesh, P(None, None, None, "model", None))
    # int8-KV dequant scales [L, P, Hkv, ps] shard on the same kv-head axis
    sspec = NamedSharding(mesh, P(None, None, "model", None))
    rep = NamedSharding(mesh, P())
    return type(cache)(
        k=jax.device_put(cache.k, spec), v=jax.device_put(cache.v, spec),
        conv=None if cache.conv is None else jax.device_put(cache.conv, rep),
        rec=None if cache.rec is None else jax.device_put(cache.rec, rep),
        k_scale=None if cache.k_scale is None
        else jax.device_put(cache.k_scale, sspec),
        v_scale=None if cache.v_scale is None
        else jax.device_put(cache.v_scale, sspec),
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = cache_specs(None)
    return KVCache(
        k=jax.device_put(cache.k, NamedSharding(mesh, specs.k)),
        v=jax.device_put(cache.v, NamedSharding(mesh, specs.v)),
        length=jax.device_put(cache.length, NamedSharding(mesh, P())),
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), tree
    )
