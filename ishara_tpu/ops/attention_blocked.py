"""Blockwise flash attention for long sequences.

The single-block kernel in :mod:`ishara_tpu.ops.attention` holds the full
[T, T] score matrix in VMEM — fine for the reference's FRAME_LEN<=384, but
the SURVEY long-context requirement ("implement attention blockwise so longer
FRAME_LEN and context-parallel sharding are incremental") needs tiling. This
kernel tiles queries across the grid and streams key/value chunks with the
online-softmax recurrence, so VMEM holds O(Bq*T_chunk) scores and O(T*Dh)
k/v — linear in sequence length.

Backward is the standard two-pass flash scheme: a dq pass tiled like the
forward, and a dk/dv pass tiled over kv chunks, both recomputing
probabilities from the saved row logsumexp; ``delta = rowsum(do*o)`` is
precomputed outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import math

from .attention import NEG


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dotT(a, b):  # a [M, D], b [N, D] -> [M, N]
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _aTb(a, b):  # [M, N] x [M, D] -> [N, D]
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _fwd_kernel(scale, block_k, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref):
    q = q_ref[0, 0].astype(jnp.float32)          # [Bq, Dh]
    T = k_ref.shape[2]
    Bq, Dh = q.shape
    nk = T // block_k

    def body(j, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = _dotT(q, k) * scale + b[None, :]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_i - m_new)
        acc = acc * corr + jnp.dot(p, v, preferred_element_type=jnp.float32)
        l_i = l_i * corr + jnp.sum(p, axis=-1, keepdims=True)
        return acc, m_new, l_i

    acc0 = jnp.zeros((Bq, Dh), jnp.float32)
    m0 = jnp.full((Bq, 1), NEG, jnp.float32)
    l0 = jnp.zeros((Bq, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / l_i).astype(o_ref.dtype)
    lse_ref[0, 0] = m_i + jnp.log(l_i)


def _dq_kernel(scale, block_k, q_ref, k_ref, v_ref, bias_ref, do_ref,
               lse_ref, delta_ref, dq_ref):
    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    T = k_ref.shape[2]
    nk = T // block_k

    def body(j, dq):
        k = k_ref[0, 0, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = _dotT(q, k) * scale + b[None, :]
        p = jnp.exp(s - lse)
        dp = _dotT(do, v)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros_like(q))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(scale, block_q, q_ref, k_ref, v_ref, bias_ref, do_ref,
                lse_ref, delta_ref, dk_ref, dv_ref):
    k = k_ref[0, 0].astype(jnp.float32)          # [Bk, Dh]
    v = v_ref[0, 0].astype(jnp.float32)
    b = bias_ref[0, 0]                            # [Bk]
    T = q_ref.shape[2]
    nq = T // block_q
    Bk, Dh = k.shape

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)]
        s = _dotT(q, k) * scale + b[None, :]
        p = jnp.exp(s - lse)
        dv = dv + _aTb(p, do)
        dp = _dotT(do, v)
        ds = p * (dp - delta)
        dk = dk + _aTb(ds, q) * scale
        return dk, dv

    dk0 = jnp.zeros((Bk, Dh), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dk0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    B, H, T, Dh = q.shape
    nq = T // block_q
    qspec = pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, T, Dh), lambda b, h, i: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, T), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale, block_k),
        grid=(B, H, nq),
        in_specs=[qspec, kvspec, kvspec, bspec],
        out_specs=[qspec, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_mhsa_blocked(q, k, v, bias, scale, block_q=128, block_k=128,
                       interpret=False):
    """Tiled flash attention. q/k/v [B, H, T, Dh] (T padded internally to the
    block size), bias [B, T] additive key bias. Returns [B, H, T, Dh]."""
    o, _ = _padded_fwd(q, k, v, bias, scale, block_q, block_k, interpret)
    return o


def _padded_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    T = q.shape[2]
    mult = math.lcm(block_q, block_k)
    qp = _pad_to(q, 2, mult)
    kp = _pad_to(k, 2, mult)
    vp = _pad_to(v, 2, mult)
    biasp = _pad_to(bias, 1, mult)
    if biasp.shape[1] != bias.shape[1]:
        biasp = biasp.at[:, T:].set(NEG)  # padded keys masked out
    o, lse = _fwd(qp, kp, vp, biasp, scale, block_q, block_k, interpret)
    return o[:, :, :T], lse[:, :, :T]


def _vjp_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    o, lse = _padded_fwd(q, k, v, bias, scale, block_q, block_k, interpret)
    return o, (q, k, v, bias, o, lse)


def _vjp_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, bias, o, lse = res
    B, H, T, Dh = q.shape
    mult = math.lcm(block_q, block_k)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    qp, kp, vp = (_pad_to(t, 2, mult) for t in (q, k, v))
    dop = _pad_to(do, 2, mult)
    lsep = _pad_to(lse, 2, mult)
    deltap = _pad_to(delta, 2, mult)
    biasp = _pad_to(bias, 1, mult)
    if biasp.shape[1] != T:
        biasp = biasp.at[:, T:].set(NEG)
    Tp = qp.shape[2]

    qspec_q = pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, i: (b, h, i, 0),
                           memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, 1, Tp, Dh), lambda b, h, i: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, Tp), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    lq = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0),
                      memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale, block_k),
        grid=(B, H, Tp // block_q),
        in_specs=[qspec_q, full, full, bspec, qspec_q, lq, lq],
        out_specs=qspec_q,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, biasp[:, None, :], dop, lsep, deltap)

    kspec = pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM)
    bk = pl.BlockSpec((1, 1, block_k), lambda b, h, j: (b, 0, j),
                      memory_space=pltpu.VMEM)
    lfull = pl.BlockSpec((1, 1, Tp, 1), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale, block_q),
        grid=(B, H, Tp // block_k),
        in_specs=[full, kspec, kspec, bk, full, lfull, lfull],
        out_specs=[kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, Dh), q.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, biasp[:, None, :], dop, lsep, deltap)
    return dq[:, :, :T], dk[:, :, :T], dv[:, :, :T], None


flash_mhsa_blocked.defvjp(_vjp_fwd, _vjp_bwd)
