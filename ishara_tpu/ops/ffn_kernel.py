"""Fused FFN training kernel: Dense -> swish -> dropout -> Dense ->
[residual dropout] -> +res as ONE Pallas kernel, forward and backward.

Why: the FFN is the train step's biggest HBM-traffic source after the
round-3 CTC/dropout work. Unfused, each of the 16 flagship FFN sites
materializes the [B*T, 2*dim] hidden twice (matmul out + dropout out) plus
the projected branch and the residual sum — ~230 MB of fwd traffic per
site at batch 256 — and the backward stores/replays the same tensors. The
kernel streams only the row chunks of x/res/dy and keeps the hidden, the
activations and both dropout masks in VMEM; weights (0.4 MB bf16) load
once via a constant-index BlockSpec and stay resident across the row grid.

Backward: recomputes the hidden from x (MXU flops are cheap, ~12 GFLOP per
FFN vs ~340 MB of saved-tensor traffic), regenerates the dropout masks
from the hardware PRNG (same (seed, program_id) contract as
ops/dropout.py), and accumulates dW/db in f32 output blocks revisited at a
constant grid index (flushed to HBM once).

Semantics = models.layers.FeedForwardModule followed by the residual
dropout-add (reference SqueezeformerBlock ffn1/ffn2, nb cell 5; the
Conformer FFNs use res_rate=0). Used only for training-mode forwards on
TPU; eval/serving and the CPU mesh keep the XLA composition.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _on_tpu


def _keep(seed_ref, which, rate, shape):
    pltpu.prng_seed(seed_ref[which], pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return (bits >= jnp.uint32(int(rate * (2 ** 32)))).astype(jnp.float32)


def _swish(h):
    return h * jax.nn.sigmoid(h)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_tn(a, b):  # a [R, X] , b [R, Y] -> [X, Y]
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_nt(a, b):  # a [R, X] , b [Y, X] -> [R, Y]
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _fwd_kernel(rate1, rate2, seed_ref, x_ref, res_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, o_ref):
    # bf16 operands, f32 accumulation: measured fastest at the batch-256
    # training geometry (f32 operands cost +6 ms/step — the MXU's f32
    # decomposition dominates here, unlike the latency-bound serving
    # kernels where relayout dominates and f32 operands win)
    x = x_ref[:]
    h = _dot(x, w1_ref[:]) + b1_ref[:]
    a = _swish(h)
    if rate1 > 0.0:
        a = a * _keep(seed_ref, 0, rate1, a.shape) * (1.0 / (1.0 - rate1))
    y = _dot(a.astype(x.dtype), w2_ref[:]) + b2_ref[:]
    if rate2 > 0.0:
        y = y * _keep(seed_ref, 1, rate2, y.shape) * (1.0 / (1.0 - rate2))
    o_ref[:] = (res_ref[:].astype(jnp.float32) + y).astype(o_ref.dtype)


def _bwd_kernel(rate1, rate2, seed_ref, x_ref, dy_ref, w1_ref, b1_ref,
                w2_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    i = pl.program_id(0)
    x = x_ref[:]
    g = dy_ref[:].astype(jnp.float32)
    if rate2 > 0.0:
        g = g * _keep(seed_ref, 1, rate2, g.shape) * (1.0 / (1.0 - rate2))
    # recompute the hidden path
    h = _dot(x, w1_ref[:]) + b1_ref[:]
    sig = jax.nn.sigmoid(h)
    a = h * sig
    if rate1 > 0.0:
        k1 = _keep(seed_ref, 0, rate1, a.shape) * (1.0 / (1.0 - rate1))
        d = a * k1
    else:
        k1 = None
        d = a
    gb = g.astype(x.dtype)
    dw2 = _dot_tn(d.astype(x.dtype), gb)
    db2 = jnp.sum(g, axis=0, keepdims=True)
    dd = _dot_nt(gb, w2_ref[:])  # [R, M]
    da = dd * k1 if rate1 > 0.0 else dd
    dh = da * (sig + h * sig * (1.0 - sig))  # swish'
    dhb = dh.astype(x.dtype)
    dw1 = _dot_tn(x, dhb)
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    dx_ref[:] = _dot_nt(dhb, w1_ref[:]).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw1_ref[:] += dw1
    db1_ref[:] += db1
    dw2_ref[:] += dw2
    db2_ref[:] += db2


def _rows(shape):
    n = 1
    for d in shape[:-1]:
        n *= d
    return n


def _row_chunk(n, m):
    """Rows per grid step. The backward holds ~4 [rc, m] f32 intermediates
    (hidden, swish partials, mask, grad chains) in scoped VMEM at once, so
    rc must shrink as the hidden width m grows. Measured boundary (v5e,
    round-4 geometry probe): rc=1024 at m=512 (the flagship, expansion 2)
    compiles and is fastest; rc=1024 at m=1024 needs 17.06M > the 16M
    scoped limit. Hence rc*m <= 2^19, rounded down to a power of two.
    fwd/bwd/debug_masks must agree on rc — the dropout masks are
    regenerated per (seed, program_id) and a different grid would
    re-slice them."""
    cap = 1 << (max(128, (1 << 19) // max(m, 1)).bit_length() - 1)
    return math.gcd(n, min(1024, cap))


def _specs(rc, feat_in, feat_hid):
    row = lambda i: (i, 0)  # noqa: E731
    const = lambda i: (0, 0)  # noqa: E731
    return row, const


def _fwd_call(x2, res2, w1, b1, w2, b2, seeds, rate1, rate2, interpret):
    n, k = x2.shape
    m = w1.shape[1]
    rc = _row_chunk(n, m)
    row, const = _specs(rc, k, m)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate1, rate2),
        grid=(n // rc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rc, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rc, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rc, k), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k), x2.dtype),
        interpret=interpret,
    )(seeds, x2, res2, w1, b1, w2, b2)


def _bwd_call(x2, dy2, w1, b1, w2, seeds, rate1, rate2, interpret):
    n, k = x2.shape
    m = w1.shape[1]
    rc = _row_chunk(n, m)
    row, const = _specs(rc, k, m)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rate1, rate2),
        grid=(n // rc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rc, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rc, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rc, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), x2.dtype),
            jax.ShapeDtypeStruct((k, m), f32),
            jax.ShapeDtypeStruct((1, m), f32),
            jax.ShapeDtypeStruct((m, k), f32),
            jax.ShapeDtypeStruct((1, k), f32),
        ],
        interpret=interpret,
    )(seeds, x2, dy2, w1, b1, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def ffn_residual(x, res, w1, b1, w2, b2, seeds, rate1: float, rate2: float,
                 interpret: bool = False):
    """``res + drop2(Dense2(drop1(swish(Dense1(x)))))`` as one kernel.

    x/res: [..., K]; w1 [K, M], w2 [M, K]; biases f32 [M]/[K]; seeds int32
    [2] (one per dropout site). Gradient flows to x, res and the four
    parameter arrays; masks are regenerated in the backward kernel.
    """
    out, _ = _ffn_fwd(x, res, w1, b1, w2, b2, seeds, rate1, rate2, interpret)
    return out


def _ffn_fwd(x, res, w1, b1, w2, b2, seeds, rate1, rate2, interpret):
    shape = x.shape
    k = shape[-1]
    n = _rows(shape)
    cd = x.dtype
    x2 = x.reshape(n, k)
    res2 = res.reshape(n, k)
    w1c = w1.astype(cd)
    w2c = w2.astype(cd)
    b1r = b1.astype(jnp.float32).reshape(1, -1)
    b2r = b2.astype(jnp.float32).reshape(1, -1)
    out = _fwd_call(x2, res2, w1c, b1r, w2c, b2r, seeds, rate1, rate2,
                    interpret)
    return out.reshape(shape), (x, w1, b1, w2, b2, seeds)


def _ffn_vjp_fwd(x, res, w1, b1, w2, b2, seeds, rate1, rate2, interpret):
    return _ffn_fwd(x, res, w1, b1, w2, b2, seeds, rate1, rate2, interpret)


def _ffn_vjp_bwd(rate1, rate2, interpret, resids, dy):
    x, w1, b1, w2, b2, seeds = resids
    shape = x.shape
    k = shape[-1]
    n = _rows(shape)
    cd = x.dtype
    x2 = x.reshape(n, k)
    dy2 = dy.reshape(n, k)
    dx2, dw1, db1, dw2, db2 = _bwd_call(
        x2, dy2, w1.astype(cd), b1.astype(jnp.float32).reshape(1, -1),
        w2.astype(cd), seeds, rate1, rate2, interpret)
    return (dx2.reshape(shape), dy, dw1.astype(w1.dtype),
            db1[0].astype(b1.dtype), dw2.astype(w2.dtype),
            db2[0].astype(b2.dtype), None)


ffn_residual.defvjp(_ffn_vjp_fwd, _ffn_vjp_bwd)


def debug_masks(n, m, k, seeds, rate1, rate2, interpret=False):
    """Expose the exact keep-masks the kernels would draw for an [n, k]
    input with hidden width m (test oracle support)."""
    rc = _row_chunk(n, m)

    def kern(seed_ref, k1_ref, k2_ref):
        k1_ref[:] = _keep(seed_ref, 0, rate1, (rc, m))
        k2_ref[:] = _keep(seed_ref, 1, rate2, (rc, k))

    row = lambda i: (i, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(n // rc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((rc, m), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((rc, k), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
        ],
        interpret=interpret,
    )(seeds)
