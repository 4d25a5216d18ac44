"""Quantization-aware training: int8 fake-quant with a straight-through
estimator (ROADMAP #7).

The post-training int8 export (serve/export.py:_quantize_tree) stores every
>=2-D kernel as symmetric per-output-channel int8. QAT closes whatever
accuracy gap that rounding opens by training THROUGH the quantizer: the
forward pass sees exactly the dequantized-int8 weights the serving bundle
will contain, while the backward pass treats rounding as identity (STE) and
clipping as a pass-zero gate (clipped STE — ``jnp.clip``'s natural VJP).

TPU-native design note: rather than swapping every Dense/Conv for a QDense
(a torch-style module rewrite), the fake-quant is a pure tree transform
applied to ``params`` inside the jitted train step — it composes with every
model family, costs one elementwise pass that XLA fuses into the step, and
leaves checkpoints/export untouched (the stored params stay f32 master
weights, exactly like the AMP master-weight convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _ste_quant(w, scale):
    q = jnp.clip(jnp.round(w / scale), -127, 127)
    return (q * scale).astype(w.dtype)


def _ste_quant_fwd(w, scale):
    return _ste_quant(w, scale), None


def _ste_quant_bwd(_, g):
    # exact pass-through: the scale choice (amax/127) keeps every value in
    # range, so no clip masking is needed (and jnp.clip's tie-splitting VJP
    # would halve the gradient of the max-magnitude element per channel)
    return (g, None)


_ste_quant.defvjp(_ste_quant_fwd, _ste_quant_bwd)


def fake_quant(w: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-output-channel int8 fake-quantization of one kernel.

    Bit-matches serve/export.py:_quantize_tree followed by its dequantize:
    scale = amax/127 over all-but-last axes (stop-gradient), round-to-even,
    clip to [-127, 127], rescale. Backward is a straight-through identity."""
    axes = tuple(range(w.ndim - 1))
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=axes), 1e-8) / 127.0
    return _ste_quant(w, jax.lax.stop_gradient(scale))


def fake_quant_tree(params):
    """Fake-quantize every >=2-D floating leaf (kernels); 1-D leaves
    (biases, norm scales) stay untouched — the exact set the int8 export
    quantizes."""
    def f(v):
        if (hasattr(v, "ndim") and v.ndim >= 2
                and jnp.issubdtype(v.dtype, jnp.floating)):
            return fake_quant(v)
        return v

    return jax.tree_util.tree_map(f, params)
