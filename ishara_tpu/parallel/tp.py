"""Tensor-parallel sharding rules over a 2-D (data, model) mesh.

The reference never needs TP (17.9 MB model — SURVEY.md §2.4), but the mesh
axes are designed so TP is a config flip, not a rewrite: attention QKV /
FFN-expand kernels shard their output feature axis over ``model``; the
projection / FFN-contract kernels shard their input feature axis, so each
block needs exactly one psum (emitted by GSPMD at the contract boundary).
Everything else (LN/BN/conv/small heads) replicates.

Rules are name-pattern based on the flax param tree, applied as
NamedSharding trees for ``jax.jit(in_shardings=...)`` / ``device_put``.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex on the flattened param path, PartitionSpec factory by leaf ndim)
_TP_RULES: list[tuple[str, dict[int, P]]] = [
    # column-parallel: output features sharded
    (r"(^|/)(qkv|sa_q|sa_k|sa_v|ca_q|ca_k|ca_v|q|k|v)/kernel",
     {2: P(None, "model")}),
    (r"(ffn\d?|ff1|ff2)/fc1/kernel", {2: P(None, "model")}),
    (r"(ffn\d?|ff1|ff2)/fc1/bias", {1: P("model")}),
    # row-parallel: input features sharded (psum at output)
    (r"(^|/)(proj|sa_out|ca_out|out)/kernel", {2: P("model", None)}),
    (r"(ffn\d?|ff1|ff2)/fc2/kernel", {2: P("model", None)}),
]


def _path_str(path) -> str:
    return "/".join(
        getattr(k, "key", getattr(k, "name", str(k))) for k in path
    )


def tp_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings: TP rules where they match, replicated
    elsewhere."""

    def spec_for(path, leaf):
        s = _path_str(path)
        for pat, by_ndim in _TP_RULES:
            if re.search(pat, s):
                spec = by_ndim.get(leaf.ndim)
                if spec is not None:
                    # feature dim must divide the model-axis size
                    ax = [i for i, a in enumerate(spec) if a == "model"]
                    if all(leaf.shape[i] % mesh.shape["model"] == 0
                           for i in ax):
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_state_tp(state, mesh: Mesh):
    """Place a TrainState on a (data, model) mesh: params and Lookahead slow
    params sharded by the TP rules, everything else replicated. GSPMD
    propagates shardings through the jitted step (optimizer moments pick up
    the param layout at the first update)."""
    rep = NamedSharding(mesh, P())
    pshard = tp_param_shardings(state.params, mesh)
    placed = jax.device_put(state, rep)
    return placed.replace(
        params=jax.device_put(state.params, pshard),
        slow_params=jax.device_put(state.slow_params, pshard),
    )


def make_2d_mesh(data: int, model: int) -> Mesh:
    import numpy as np

    devices = jax.devices()[: data * model]
    return Mesh(np.asarray(devices).reshape(data, model), ("data", "model"))
