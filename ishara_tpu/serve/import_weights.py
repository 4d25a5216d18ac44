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


def _decode(s) -> str:
    return s if isinstance(s, str) else s.decode()


def load_h5_weights(path: str | Path) -> list[tuple[str, np.ndarray]]:
    """Ordered [(name, array)] from a Keras h5 artifact.

    The *legacy* HDF5 layout (Keras-2-era ``model.save_weights("model.h5")``
    and any-era ``model.save("model.h5")`` — the format the reference's
    ``CallbackEval`` checkpoints use, nb cell 9) carries exact ordering in the
    ``layer_names``/``weight_names`` attrs: model layers in topological/call
    order, and within each layer the trainable weights in creation order
    followed by the non-trainable ones (BN moving stats). That ordering is
    the contract :func:`import_reference_h5` consumes.

    Keras-3 ``.weights.h5`` files have no order attrs; they fall back to
    h5py traversal (alphabetical) and suit :func:`import_by_structure` only.
    """
    import h5py

    out: list[tuple[str, np.ndarray]] = []

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        if "layer_names" in root.attrs:  # legacy ordered layout
            for lname in root.attrs["layer_names"]:
                g = root[_decode(lname)]
                for wname in g.attrs.get("weight_names", []):
                    wname = _decode(wname)
                    out.append((wname.split(":")[0], np.asarray(g[wname])))
            return out

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out.append((_annotate(name), np.asarray(obj)))

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


# ---------------------------------------------------------------------------
# Deterministic full-model import for the reference ``get_model`` families.
# ---------------------------------------------------------------------------

# transform tags: how a Keras array maps onto the flax leaf layout
_T_ID = "id"            # same layout (dense [in,out], conv1d [k,in,out], ...)
_T_DW = "dwconv"        # Keras DepthwiseConv1D [k, C, 1] -> flax grouped [k, 1, C]


def keras_weight_spec(cfg) -> list[tuple[str, tuple[str, ...], str]]:
    """Ordered (collection, flax_path, transform) records matching the legacy
    h5 weight order of the reference ``get_model`` (nb cell 7 / the
    conv-hybrid-model.ipynb parameterization) for the given
    :class:`~ishara_tpu.config.EncoderConfig`.

    Order contract (verified empirically against Keras legacy saving):
    model-level = functional call order; within each top-level layer =
    sublayer *creation* order for trainable weights, then every contained
    BatchNorm's (moving_mean, moving_variance) appended at the end of that
    layer's group. Reference creation orders (nb cell 5):

    * ``SqueezeformerBlock``: norm1, ffn1, norm2, mha, conv(norm, pw1, dw,
      pw2, se), norm3, ffn2 — no BN.
    * ``ConformerBlock``: ffn1, mha, conv(pw1, dw, pw2, bn, ln), ffn2,
      layer_norm1, layer_norm2 — norms created *last*; one BN tail.
    * ``Conv1DBlock`` is functional — expand/dwconv/bn/eca/project are five
      separate top-level layers, so the bn stats sit directly after its
      gamma/beta.
    """
    P, S = "params", "batch_stats"
    recs: list[tuple[str, tuple[str, ...], str]] = []

    def dense(p, bias=True):
        recs.append((P, p + ("kernel",), _T_ID))
        if bias:
            recs.append((P, p + ("bias",), _T_ID))

    def norm(p):
        recs.append((P, p + ("scale",), _T_ID))
        recs.append((P, p + ("bias",), _T_ID))

    def bn_stats(p):
        recs.append((S, p + ("mean",), _T_ID))
        recs.append((S, p + ("var",), _T_ID))

    def ffn(p):
        dense(p + ("fc1",))
        dense(p + ("fc2",))

    def mha(p):
        dense(p + ("qkv",), bias=False)
        dense(p + ("proj",), bias=False)

    def squeezeformer_block(name):
        p = (name,)
        norm(p + ("norm1",))
        ffn(p + ("ffn1",))
        norm(p + ("norm2",))
        mha(p + ("mha",))
        norm(p + ("conv", "norm"))
        dense(p + ("conv", "pw1"))
        recs.append((P, p + ("conv", "dw", "dwconv", "kernel"), _T_DW))
        dense(p + ("conv", "pw2"))
        dense(p + ("conv", "se", "fc1"))
        dense(p + ("conv", "se", "fc2"))
        norm(p + ("norm3",))
        ffn(p + ("ffn2",))

    def conformer_block(name):
        p = (name,)
        ffn(p + ("ffn1",))
        mha(p + ("mha",))
        dense(p + ("conv", "pw1"))
        dense(p + ("conv", "dw"))       # grouped Conv1D: [k,1,C] both sides
        dense(p + ("conv", "pw2"))      # ConvolutionModule creates pw2 BEFORE bn
        norm(p + ("conv", "bn"))
        norm(p + ("conv", "ln"))
        ffn(p + ("ffn2",))
        norm(p + ("ln1",))
        norm(p + ("ln2",))
        bn_stats(p + ("conv", "bn"))

    def transformer_block(name):
        p = (name,)
        norm(p + ("ln1",))
        mha(p + ("mha",))
        norm(p + ("ln2",))
        dense(p + ("fc1",), bias=False)
        dense(p + ("fc2",), bias=False)

    def conv1d_block(name):
        p = (name,)
        dense(p + ("expand",))
        recs.append((P, p + ("dw", "dwconv", "kernel"), _T_DW))
        norm(p + ("bn",))
        bn_stats(p + ("bn",))
        recs.append((P, p + ("eca", "conv", "kernel"), _T_ID))
        dense(p + ("project",))

    # stem (nb cell 7): Masking (no weights) -> stem_conv -> +pe -> stem_bn
    dense(("stem_conv",), bias=False)
    norm(("stem_bn",))
    bn_stats(("stem_bn",))

    v = cfg.variant
    if v in ("squeezeformer", "hybrid"):
        for i in range(cfg.num_squeeze_blocks):
            squeezeformer_block(f"squeezeformer_{i}")
    if v in ("conformer", "hybrid"):
        for i in range(cfg.num_conform_blocks):
            conformer_block(f"conformer_{i}")
    if v == "conv_hybrid":
        for i in range(cfg.num_squeeze_blocks):
            for j in range(cfg.num_conv_per_block):
                conv1d_block(f"conv_squeeze{i}_{j}")
            squeezeformer_block(f"squeezeformer_{i}")
        for i in range(cfg.num_conform_blocks):
            for j in range(cfg.num_conv_per_block):
                conv1d_block(f"conv_conform{i}_{j}")
            conformer_block(f"conformer_{i}")
    if v == "conv_transformer":
        for i in range(cfg.num_squeeze_blocks):
            for j in range(cfg.num_conv_per_block):
                conv1d_block(f"conv_t{i}_{j}")
            transformer_block(f"transformer_{i}")

    dense(("top_conv",))
    dense(("classifier",))
    return recs


def _transform(arr: np.ndarray, dst_shape: tuple, tag: str,
               src_name: str) -> np.ndarray:
    if tag == _T_DW and arr.ndim == 3 and arr.shape[-1] == 1:
        arr = np.transpose(arr, (0, 2, 1))
    if arr.shape != tuple(dst_shape):
        raise ValueError(
            f"shape mismatch importing {src_name!r}: source {arr.shape} vs "
            f"target {tuple(dst_shape)} (transform={tag})")
    return np.asarray(arr, np.float32)


def import_reference_h5(path: str | Path, variables: dict, cfg) -> tuple[dict, dict]:
    """Import a reference-architecture legacy-h5 checkpoint by exact order.

    Unlike the best-effort :func:`import_by_structure`, this uses the
    deterministic :func:`keras_weight_spec` ordering, verifies every shape,
    and fails loudly on any misalignment — the "bit-for-fidelity against
    TF/TFLite checkpoints" path. Returns (new_variables, report); the report's
    ``unfilled_targets`` lists variable leaves the spec does not cover
    (must be empty for a complete import).
    """
    sources = load_h5_weights(path)
    spec = keras_weight_spec(cfg)
    if len(sources) != len(spec):
        raise ValueError(
            f"weight count mismatch: h5 has {len(sources)} arrays, spec "
            f"expects {len(spec)} — first sources: {[n for n, _ in sources[:6]]}")

    # deep-copy into plain nested dicts we can assign into
    def to_dict(t):
        return {k: to_dict(v) for k, v in t.items()} if isinstance(t, dict) \
            else np.asarray(t)

    new_vars = {k: to_dict(v) for k, v in variables.items()}
    matched = []
    for (src_name, arr), (coll, p, tag) in zip(sources, spec):
        node = new_vars[coll]
        for key in p[:-1]:
            if key not in node:
                raise KeyError(
                    f"spec path {coll}/{'/'.join(p)} not in variables "
                    f"(source {src_name!r})")
            node = node[key]
        node[p[-1]] = _transform(arr, np.shape(node[p[-1]]), tag, src_name)
        matched.append((coll + "/" + "/".join(p), src_name))

    covered = {(coll, p) for coll, p, _ in spec}
    unfilled = []
    for coll, tree in variables.items():
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        for kpath, _leaf in flat:
            p = tuple(k.key for k in kpath)
            if (coll, p) not in covered:
                unfilled.append(coll + "/" + "/".join(p))
    report = {"matched": matched, "unmatched_sources": [],
              "unfilled_targets": unfilled}
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
