"""Fused multi-head attention as a Pallas TPU kernel.

The encoder's hot op. XLA's einsum attention materializes the [B, H, T, T]
probability tensor to HBM (and saves it for backward); at B=64, H=8, T=176
that is ~63 MB of traffic per direction per layer. This kernel keeps scores,
softmax and the value contraction in VMEM — grid over the batch, heads
statically unrolled inside the cell (2-D MXU matmuls per head; T<=384 fits a
single block so no online-softmax tiling is needed) — and a custom VJP
recomputes probabilities from the saved row logsumexp instead of storing them
(flash-attention backward).

Semantics match ``models.layers.MultiHeadSelfAttention``'s einsum path
(including the reference's full-dim ``dim**-0.5`` scaling, passed in as
``scale``); padding is an additive [B, T] key bias. Falls back to interpret
mode off-TPU so the CPU test mesh exercises identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _qkT(a, b):  # [T, D] x [S, D] -> [T, S]
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _aTb(a, b):  # [T, S] x [T, D] -> [S, D]
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _keep_mask(seed_ref, b, h, shape, rate):
    """Deterministic per-(batch, head) dropout keep-mask from the TPU PRNG —
    regenerated identically in the backward kernel."""
    from jax.experimental.pallas import tpu as _pltpu

    _pltpu.prng_seed(seed_ref[0] + b * 131071 + h * 8191)
    bits = _pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(int(rate * (2 ** 32)))
    return (pltpu.bitcast(bits, jnp.uint32) >= threshold).astype(jnp.float32)


def _fwd_kernel(scale, H, dropout_rate, q_ref, k_ref, v_ref, bias_ref,
                seed_ref, o_ref, lse_ref):
    bias = bias_ref[0]  # [1, T] -> broadcasts over score rows
    b = pl.program_id(0)
    for h in range(H):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        s = _qkT(q, k) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            # dropout on the normalized weights (reference semantics):
            # o = (M ∘ P/l) v / keep, with l from the undropped weights
            keep = _keep_mask(seed_ref, b, h, p.shape, dropout_rate)
            p_used = p * keep / (1.0 - dropout_rate)
        else:
            p_used = p
        o = jnp.dot(p_used, v, preferred_element_type=jnp.float32) / l
        o_ref[0, h] = o.astype(o_ref.dtype)
        lse_ref[0, h] = (m + jnp.log(l))[:, 0]


def _bwd_kernel(scale, H, dropout_rate, q_ref, k_ref, v_ref, bias_ref,
                seed_ref, o_ref, do_ref, lse_ref, dq_ref, dk_ref, dv_ref):
    bias = bias_ref[0]
    b = pl.program_id(0)
    for h in range(H):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        o = o_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        lse = lse_ref[0, h]
        s = _qkT(q, k) * scale + bias
        p = jnp.exp(s - lse[:, None])  # normalized probabilities P̂
        dp = _qkT(do, v)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref, b, h, p.shape, dropout_rate)
            scale_keep = keep / (1.0 - dropout_rate)
            dv = _aTb(p * scale_keep, do)
            dp = dp * scale_keep
        else:
            dv = _aTb(p, do)
        # delta_i = dO_i · O_i = Σ_k P̂_ik M_ik (dO_i·V_k) — holds with or
        # without the dropout mask, so the softmax backward is unchanged:
        # dS = P̂ ∘ (M∘dP − delta)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = _aTb(ds, q) * scale
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _specs(B, H, T, Dh):
    qkv = pl.BlockSpec((1, H, T, Dh), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((1, H, T), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qkv, bias, lse, seed


def _fwd_call(q, k, v, bias, seed, scale, interpret, dropout_rate):
    B, H, T, Dh = q.shape
    qkv, bspec, lspec, sspec = _specs(B, H, T, Dh)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale, H, dropout_rate),
        grid=(B,),
        in_specs=[qkv, qkv, qkv, bspec, sspec],
        out_specs=[qkv, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias[:, None, :], seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_mhsa(q, k, v, bias, seed=None, scale=1.0, interpret=False,
               dropout_rate=0.0):
    """q, k, v: [B, H, T, Dh]; bias: [B, T] additive key bias (0 or -1e30);
    ``seed``: int32 [1] array driving in-kernel attention dropout when
    ``dropout_rate`` > 0 (regenerated identically in the backward pass).
    Returns [B, H, T, Dh]."""
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    o, _ = _fwd_call(q, k, v, bias, seed, scale, interpret, dropout_rate)
    return o


def _vjp_fwd(q, k, v, bias, seed, scale, interpret, dropout_rate):
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    o, lse = _fwd_call(q, k, v, bias, seed, scale, interpret, dropout_rate)
    return o, (q, k, v, bias, seed, o, lse)


def _vjp_bwd(scale, interpret, dropout_rate, res, do):
    q, k, v, bias, seed, o, lse = res
    B, H, T, Dh = q.shape
    qkv, bspec, lspec, sspec = _specs(B, H, T, Dh)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale, H, dropout_rate),
        grid=(B,),
        in_specs=[qkv, qkv, qkv, bspec, sspec, qkv, qkv, lspec],
        out_specs=[qkv, qkv, qkv],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
        ],
        interpret=interpret,
    )(q, k, v, bias[:, None, :], seed, o, do, lse)
    return dq, dk, dv, None, None


flash_mhsa.defvjp(_vjp_fwd, _vjp_bwd)


def reference_mhsa(q, k, v, bias, scale):
    """Plain einsum attention — the numerical oracle for the kernel."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def mask_to_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, T] bool -> additive float32 bias (0 valid / NEG masked)."""
    return jnp.where(mask, 0.0, NEG).astype(jnp.float32)
