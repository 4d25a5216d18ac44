"""Weight import from reference-format artifacts (Keras .h5 / TFLite).

The SURVEY.md §7 watch list calls for "a weight-import tool (h5/tflite ->
pytree) and tolerance-based layer-by-layer diffing" so trained reference
checkpoints can be carried over. Strategy:

* ``load_h5_weights`` / ``load_tflite_weights`` flatten the source artifact
  into an ordered [(name, array)] list (h5py traversal order for h5; tensor
  index order for tflite — both match Keras build order for the reference's
  sequential-functional models);
* ``import_by_structure`` walks THIS framework's param tree in definition
  order and greedily consumes source arrays whose (transformed) shape
  matches, applying the Keras->flax layout transforms (DepthwiseConv kernel
  reshape, BatchNorm quadruple naming);
* ``diff_variables`` reports per-leaf max deviation for the tolerance-based
  layer diffing.

Import is best-effort by design: the return includes every unmatched source
array and every unfilled target leaf, so a human (or test) can verify
coverage is total before trusting the result.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


# Keras 3 .weights.h5 stores anonymous "<layer>/vars/<i>" datasets; the role
# is positional per layer type (Keras build order).
_KERAS3_VAR_ROLES = {
    "batch_normalization": ("gamma", "beta", "moving_mean", "moving_variance"),
    "layer_normalization": ("gamma", "beta"),
    "dense": ("kernel", "bias"),
    "conv": ("kernel", "bias"),
    "depthwise_conv": ("depthwise_kernel", "bias"),
    "embedding": ("embeddings",),
}


def _annotate(name: str) -> str:
    """Append a role token to Keras-3 anonymous var names when the layer
    type is recognizable from the path."""
    parts = name.split("/")
    if len(parts) >= 3 and parts[-2] == "vars" and parts[-1].isdigit():
        layer = parts[-3]
        base = layer.rstrip("0123456789").rstrip("_")
        for key, roles in _KERAS3_VAR_ROLES.items():
            if base == key or base.startswith(key) or key in base:
                i = int(parts[-1])
                if i < len(roles):
                    return f"{name}/{roles[i]}"
    return name


def load_h5_weights(path: str | Path) -> list[tuple[str, np.ndarray]]:
    import h5py

    out: list[tuple[str, np.ndarray]] = []

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out.append((_annotate(name), np.asarray(obj)))

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        root.visititems(visit)
    return out


def load_tflite_weights(path: str | Path) -> list[tuple[str, np.ndarray]]:
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=str(path))
    interp.allocate_tensors()
    out = []
    for det in interp.get_tensor_details():
        try:
            arr = interp.get_tensor(det["index"])
        except ValueError:
            continue
        if isinstance(arr, np.ndarray) and arr.ndim >= 1 and arr.size > 1:
            out.append((det["name"], np.asarray(arr)))
    return out


def _candidate_transforms(src: np.ndarray, dst_shape: tuple,
                          prefer_transposed_2d: bool = False):
    """Yield layout transforms from Keras/TFLite arrays to a flax leaf.

    ``prefer_transposed_2d`` puts the transpose first for 2-D kernels —
    TFLite fully_connected stores [out, in], so square kernels would
    otherwise silently import untransposed."""
    if prefer_transposed_2d and src.ndim == 2 and src.T.shape == dst_shape:
        yield src.T
    if src.shape == dst_shape:
        yield src
    # Dense kernel transposed (TFLite fully_connected stores [out, in])
    if (not prefer_transposed_2d and src.ndim == 2
            and src.T.shape == dst_shape):
        yield src.T
    # Keras DepthwiseConv1D kernel [k, C, 1] -> flax grouped conv [k, 1, C]
    if src.ndim == 3 and src.shape[-1] == 1 \
            and (src.shape[0], 1, src.shape[1]) == dst_shape:
        yield np.transpose(src, (0, 2, 1))
    # flax grouped conv [k, 1, C] <- keras [k, C] squeezed variants
    if src.ndim == 2 and (src.shape[0], 1, src.shape[1]) == dst_shape:
        yield src[:, None, :]


# flax leaf name -> Keras/TF weight-name tokens that play the same role
_ROLE_TOKENS = {
    "kernel": ("kernel", "depthwise_kernel", "weight"),
    "bias": ("bias", "beta"),
    "scale": ("gamma",),
    "mean": ("moving_mean",),
    "var": ("moving_variance", "moving_var"),
    "embedding": ("embeddings", "embedding"),
}


def _score(path_str: str, leaf_name: str, src_name: str) -> int:
    """Match quality between a flax leaf and a source array name."""
    score = 0
    roles = _ROLE_TOKENS.get(leaf_name, (leaf_name,))
    src_last = src_name.rsplit("/", 1)[-1].split(":")[0]
    if any(src_last.startswith(r) or r in src_last for r in roles):
        score += 4
    # BN stats must never cross into affine params and vice versa
    if leaf_name in ("mean", "var") and "moving" not in src_name:
        score -= 10
    if leaf_name in ("scale", "bias") and "moving" in src_name:
        score -= 10
    # shared layer-name tokens (e.g. 'stem_bn', 'conformer_0')
    for token in path_str.replace("'", "").split("]"):
        token = token.strip("[ .")
        if len(token) > 2 and token in src_name:
            score += 2
    return score


def import_by_structure(
    sources: list[tuple[str, np.ndarray]], variables: dict,
    source_format: str = "keras",
) -> tuple[dict, dict]:
    """Name/role-aware greedy matching of source arrays onto the param tree.

    For every target leaf (framework traversal order) pick the best-scoring
    remaining source whose (transformed) shape fits; ties resolve to source
    order. ``source_format="tflite"`` prefers the transposed layout for 2-D
    kernels (fully_connected stores [out, in] — square kernels would
    otherwise import untransposed). Returns (new_variables, report) with
    ``matched``, ``unmatched_sources`` and ``unfilled_targets``.
    """
    prefer_t = source_format == "tflite"
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    remaining = list(sources)
    new_leaves = []
    matched, unfilled = [], []
    for path, leaf in flat:
        leaf_shape = tuple(np.shape(leaf))
        path_str = jax.tree_util.keystr(path)
        leaf_name = path_str.replace("'", "").rstrip("]").rsplit("[", 1)[-1]
        best = None  # (score, index, name, transformed)
        for i, (name, arr) in enumerate(remaining):
            for cand in _candidate_transforms(arr, leaf_shape, prefer_t):
                s = _score(path_str, leaf_name, name)
                if best is None or s > best[0]:
                    best = (s, i, name, cand)
                break
        if best is not None and best[0] >= 0:
            _, i, name, cand = best
            remaining.pop(i)
            new_leaves.append(np.asarray(cand, np.float32))
            matched.append((path_str, name))
        else:
            new_leaves.append(leaf)
            unfilled.append(path_str)
    new_vars = jax.tree_util.tree_unflatten(treedef, new_leaves)
    report = {
        "matched": matched,
        "unmatched_sources": [n for n, _ in remaining],
        "unfilled_targets": unfilled,
    }
    return new_vars, report


def diff_variables(a: dict, b: dict) -> dict[str, float]:
    """Per-leaf max abs deviation — the layer-by-layer diff tool."""
    fa, _ = jax.tree_util.tree_flatten_with_path(a)
    fb, _ = jax.tree_util.tree_flatten_with_path(b)
    out = {}
    for (pa, la), (_, lb) in zip(fa, fb):
        out[jax.tree_util.keystr(pa)] = float(
            np.max(np.abs(np.asarray(la) - np.asarray(lb))))
    return out
