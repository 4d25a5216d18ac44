"""Model export/import — the TPU-native analogue of the reference's TFLite
deployment artifact (nb cells 13-14).

An export bundle is a directory containing:

* ``config.json`` — the full typed IsharaConfig;
* ``params.msgpack`` — flax-serialized variables (params + batch_stats),
  optionally cast to bf16 (the reference exports fp16);
* ``inference_args.json`` — ``{"selected_columns": SEL_COLS}``, byte-for-byte
  the contract the reference's serving scripts consume
  (``inference tests/image_inference.py:11-12``);
* ``stats.npz`` — per-group normalization statistics.

``load_engine`` rebuilds the compiled batch-1 InferenceEngine from a bundle;
the XLA executable is (re)compiled on load and cached by the persistent
compilation cache — the runtime analogue of shipping a .tflite flatbuffer.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..config import IsharaConfig
from ..data.landmarks import SEL_COLS
from ..models.encoder import IsharaEncoder, build_model
from ..preprocess.pipeline import GroupStats


def export_model(
    directory: str | Path,
    config: IsharaConfig,
    variables: dict,
    stats: GroupStats | None = None,
    half_precision: bool = True,
    quantize_int8: bool = False,
) -> Path:
    """``half_precision`` stores floats as bf16 (the reference exports fp16);
    ``quantize_int8`` stores >=2-D kernels as int8 with per-output-channel
    symmetric scales (smaller artifact than the reference's 17.9 MB TFLite;
    dequantized to f32 on load)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    config.to_json(directory / "config.json")
    (directory / "inference_args.json").write_text(
        json.dumps({"selected_columns": SEL_COLS})
    )
    if quantize_int8:
        variables = _quantize_tree(variables)
        (directory / "quantized.json").write_text(json.dumps({"mode": "int8"}))
    elif half_precision:
        variables = _cast_floats(variables, jnp.bfloat16)
    (directory / "params.msgpack").write_bytes(
        serialization.to_bytes(variables)
    )
    stats = stats or GroupStats.identity()
    np.savez(
        directory / "stats.npz",
        **{f"mean_{g}": np.asarray(v) for g, v in stats.mean.items()},
        **{f"std_{g}": np.asarray(v) for g, v in stats.std.items()},
    )
    return directory


def _cast_floats(tree, dtype):
    import jax

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def _quantize_tree(tree):
    """Symmetric per-output-channel int8 for float leaves with ndim >= 2
    (kernels); 1-D leaves (biases, norms) stay f32. Each quantized leaf
    becomes {"q": int8, "scale": f32[out]}."""
    import jax

    def q(x):
        if not (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                and np.ndim(x) >= 2):
            return x
        arr = np.asarray(x, np.float32)
        axes = tuple(range(arr.ndim - 1))
        scale = np.maximum(np.abs(arr).max(axis=axes), 1e-8) / 127.0
        qv = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
        return {"q": qv, "scale": scale.astype(np.float32)}

    return jax.tree_util.tree_map(q, tree)


def _dequantize_tree(tree):
    """Traceable: works on host numpy trees (bundle load) and on tracers
    inside a jitted program (int8-resident serving)."""
    import jax

    def is_q(x):
        return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}

    def dq(x):
        if is_q(x):
            return jnp.asarray(x["q"]).astype(jnp.float32) * jnp.asarray(
                x["scale"])
        return x

    return jax.tree_util.tree_map(dq, tree, is_leaf=is_q)


def build_task_model(config: IsharaConfig):
    """Model factory covering BOTH reference families: ``config.task`` "ctc"
    -> encoder zoo (build_model); "translation" -> ASLTranslationModel
    (integration.py path). Returns (model, init_template_fn)."""
    import jax

    mcfg = config.model
    if config.task == "translation":
        from ..data.landmarks import N_LANDMARKS
        from ..models.seq2seq import ASLTranslationModel

        model = ASLTranslationModel(
            num_classes=mcfg.num_classes,
            feature_dim=mcfg.dim,
            num_heads=mcfg.num_heads,
            dropout=mcfg.dropout,
            encoder_type=("conformer" if mcfg.variant == "conformer"
                          else "squeezeformer"),
        )

        def init(key):
            x = jnp.zeros((1, mcfg.frame_len, N_LANDMARKS, 3), jnp.float32)
            mask = jnp.ones((1, mcfg.frame_len), bool)
            tgt = jnp.zeros((1, 4), jnp.int32)
            return model.init(key, x, mask, tgt)

        return model, init

    model = build_model(mcfg)

    def init(key):
        sample = jnp.zeros((1, mcfg.frame_len, mcfg.input_dim), jnp.float32)
        return model.init(key, sample)

    return model, init


def load_bundle(directory: str | Path):
    """-> (config, variables, stats)."""
    directory = Path(directory)
    config = IsharaConfig.from_json(directory / "config.json")
    model, init = build_task_model(config)
    import jax

    blob = (directory / "params.msgpack").read_bytes()
    if (directory / "quantized.json").exists():
        variables = _dequantize_tree(serialization.msgpack_restore(blob))
    else:
        template = init(jax.random.key(0))
        variables = serialization.from_bytes(template, blob)
    # params are used in fp32 compute; cast back up
    variables = _cast_floats(variables, jnp.float32)
    z = np.load(directory / "stats.npz")
    groups = sorted({k[5:] for k in z.files if k.startswith("mean_")})
    stats = GroupStats(
        mean={g: jnp.asarray(z[f"mean_{g}"]) for g in groups},
        std={g: jnp.asarray(z[f"std_{g}"]) for g in groups},
    )
    return config, variables, stats


def load_engine(directory: str | Path, **engine_kwargs):
    """Rebuild the compiled batch-1 serving engine from an export bundle —
    InferenceEngine for the CTC family, TranslationEngine for the
    encoder-decoder family (both fuse preprocess+model+decode into one
    executable)."""
    config, variables, stats = load_bundle(directory)
    model, _ = build_task_model(config)
    if config.task == "translation":
        from .translation_engine import TranslationEngine

        return TranslationEngine(model, variables, stats=stats,
                                 frame_len=config.model.frame_len,
                                 **engine_kwargs)
    from .engine import InferenceEngine

    return InferenceEngine(model, variables, stats=stats, **engine_kwargs)


def export_serving_program(directory: str | Path, engine) -> Path:
    """Serialize the fused serving program as a StableHLO artifact
    (jax.export) — the true analogue of the reference's .tflite flatbuffer:
    a self-contained program that reloads without retracing Python. The
    artifact is platform-tagged; loading on a different platform falls back
    to ``load_engine`` recompilation."""
    import jax
    from jax import export as jexport

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    from ..data import landmarks as lm

    shape = jax.ShapeDtypeStruct(
        (engine.max_raw_frames, lm.N_COLS), jnp.float32)
    lshape = jax.ShapeDtypeStruct((), jnp.int32)
    exported = jexport.export(jax.jit(engine.program_fn()))(
        engine.variables, shape, lshape)
    (directory / "serving_program.bin").write_bytes(exported.serialize())
    (directory / "serving_program.json").write_text(json.dumps({
        "platforms": list(exported.platforms),
        "max_raw_frames": engine.max_raw_frames,
    }))
    return directory


def load_serving_program(directory: str | Path):
    """-> callable(variables, raw [max_raw_frames, 276], length) from the
    serialized StableHLO artifact; raises if the current platform doesn't
    match (caller should fall back to load_engine)."""
    import jax
    from jax import export as jexport

    directory = Path(directory)
    meta = json.loads((directory / "serving_program.json").read_text())
    plat = jax.devices()[0].platform
    canon = {"axon": "tpu"}.get(plat, plat)
    if canon not in meta["platforms"]:
        raise RuntimeError(
            f"serialized for {meta['platforms']}, running on {canon}")
    exported = jexport.deserialize(
        (directory / "serving_program.bin").read_bytes())
    return exported.call
