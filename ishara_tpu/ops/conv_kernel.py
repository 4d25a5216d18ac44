"""Fused Squeezeformer conv-module training kernel: LayerNorm -> pointwise
Dense -> swish -> causal depthwise conv -> swish -> pointwise Dense ->
SqueezeExcite -> +residual as ONE Pallas kernel, forward and backward.

Why: after the round-3 FFN/CTC fusions, the conv-module branch is the
largest remaining HBM-traffic source in the train step. Unfused, each of
the flagship's 4 Squeezeformer conv sites materializes the LN output, the
[B, T, 2*dim] expanded hidden twice (pw1 out + dwconv out), the projected
branch, the SE gate product and the residual sum — ~10 round trips of
sequence-sized tensors per site — and the backward stores/replays the same
set. This kernel streams x once per direction, keeps every intermediate in
VMEM, and (like ops/ffn_kernel.py) the backward recomputes the branch from
x instead of saving it.

Grid: over batch (``bb`` sequences per step) because the depthwise conv
couples time within a sequence and the SE gate pools the whole sequence —
a full [T, C] slab per sequence must be resident. Weights load once via
constant-index BlockSpecs and stay resident; weight grads accumulate in
f32 blocks revisited at a constant grid index (flushed to HBM once).

Semantics = models.layers.SqueezeformerConvModule (reference ``ConvModule``,
conv-squeezeformer-conformer-test.ipynb cell 5): no dropout inside the
branch, masked global-average SE pool, plain residual add. Used only for
training-mode forwards on TPU; eval/serving and the CPU mesh keep the XLA
composition (and the serving engines their own fused block stacks).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6


def _swish(h):
    return h * jax.nn.sigmoid(h)


def _dswish(h, sig):
    # d/dh [h * sigmoid(h)] given sig = sigmoid(h)
    return sig + h * sig * (1.0 - sig)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_tn(a, b):  # a [R, X], b [R, Y] -> [X, Y]
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_nt(a, b):  # a [R, X], b [Y, X] -> [R, Y]
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _causal_dw(a, wdw_ref, K):
    """a [bb, T, E] f32, wdw [K, E]: c[t] = sum_k w[k] * a[t - (K-1) + k]
    (left-zero-padded VALID conv — models.layers.CausalDWConv1D)."""
    T = a.shape[1]
    pad = jnp.pad(a, ((0, 0), (K - 1, 0), (0, 0)))
    c = pad[:, 0:T, :] * wdw_ref[0:1, :][:, None, :]
    for k in range(1, K):
        c = c + pad[:, k:k + T, :] * wdw_ref[k:k + 1, :][:, None, :]
    return c


def _anticausal_dw(dc, wdw_ref, K):
    """Gradient of _causal_dw wrt a: da[t] = sum_k w[k] * dc[t + (K-1) - k]."""
    T = dc.shape[1]
    pad = jnp.pad(dc, ((0, 0), (0, K - 1), (0, 0)))
    da = pad[:, K - 1:K - 1 + T, :] * wdw_ref[0:1, :][:, None, :]
    for k in range(1, K):
        s = K - 1 - k
        da = da + pad[:, s:s + T, :] * wdw_ref[k:k + 1, :][:, None, :]
    return da


def _ln_fwd(xf, g_ref, b_ref):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xh = (xf - mu) * rstd
    xn = xh * g_ref[:][None] + b_ref[:][None]
    return xh, rstd, xn


def _branch(xn, mask, cd, w1_ref, b1_ref, wdw_ref, w2_ref, b2_ref,
            wf1_ref, bf1_ref, wf2_ref, bf2_ref, K):
    """Shared forward recompute: pw1 -> swish -> dwconv -> swish -> pw2 ->
    SE. Returns every intermediate the backward needs."""
    bb, T, D = xn.shape
    E = w1_ref.shape[1]
    u = (_dot(xn.reshape(bb * T, D).astype(cd), w1_ref[:])
         + b1_ref[:]).reshape(bb, T, E)
    sig_u = jax.nn.sigmoid(u)
    a = u * sig_u
    c = _causal_dw(a, wdw_ref, K)
    sig_c = jax.nn.sigmoid(c)
    s = c * sig_c
    p = (_dot(s.reshape(bb * T, E).astype(cd), w2_ref[:])
         + b2_ref[:]).reshape(bb, T, D)
    m = mask                                              # [bb, T, 1]
    msum = jnp.maximum(jnp.sum(m, axis=1), 1.0)           # [bb, 1]
    pool = jnp.sum(p * m, axis=1) / msum                  # [bb, D]
    z1 = _dot(pool, wf1_ref[:]) + bf1_ref[:]              # [bb, r]
    sig_z1 = jax.nn.sigmoid(z1)
    g1 = z1 * sig_z1
    z2 = _dot(g1, wf2_ref[:]) + bf2_ref[:]                # [bb, D]
    g = jax.nn.sigmoid(z2)
    return u, sig_u, a, c, sig_c, s, p, m, msum, pool, z1, sig_z1, g1, g


def _fwd_kernel(K, x_ref, mask_ref, g_ref, b_ref, w1_ref, b1_ref, wdw_ref,
                w2_ref, b2_ref, wf1_ref, bf1_ref, wf2_ref, bf2_ref, o_ref):
    cd = x_ref.dtype
    xf = x_ref[:].astype(jnp.float32)
    _, _, xn = _ln_fwd(xf, g_ref, b_ref)
    mask = mask_ref[:].astype(jnp.float32)
    (_, _, _, _, _, _, p, _, _, _, _, _, _, g) = _branch(
        xn, mask, cd, w1_ref, b1_ref, wdw_ref, w2_ref, b2_ref,
        wf1_ref, bf1_ref, wf2_ref, bf2_ref, K)
    o_ref[:] = (p * g[:, None, :] + xf).astype(o_ref.dtype)


def _bwd_kernel(K, x_ref, mask_ref, dy_ref, g_ref, b_ref, w1_ref, b1_ref,
                wdw_ref, w2_ref, b2_ref, wf1_ref, bf1_ref, wf2_ref, bf2_ref,
                dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dwdw_ref, dw2_ref,
                db2_ref, dwf1_ref, dbf1_ref, dwf2_ref, dbf2_ref):
    i = pl.program_id(0)
    cd = x_ref.dtype
    xf = x_ref[:].astype(jnp.float32)
    xh, rstd, xn = _ln_fwd(xf, g_ref, b_ref)
    mask = mask_ref[:].astype(jnp.float32)
    (u, sig_u, a, c, sig_c, s, p, m, msum, pool, z1, sig_z1, g1, g) = _branch(
        xn, mask, cd, w1_ref, b1_ref, wdw_ref, w2_ref, b2_ref,
        wf1_ref, bf1_ref, wf2_ref, bf2_ref, K)

    bb, T, D = xf.shape
    E = w1_ref.shape[1]
    do = dy_ref[:].astype(jnp.float32)

    # out = p * g + x: SE gate product
    dp = do * g[:, None, :]                               # direct term
    dgate = jnp.sum(do * p, axis=1)                       # [bb, D]
    dz2 = dgate * g * (1.0 - g)
    dwf2 = _dot_tn(g1, dz2)                               # [r, D]
    dbf2 = jnp.sum(dz2, axis=0, keepdims=True)
    dg1 = _dot_nt(dz2, wf2_ref[:])                        # [bb, r]
    dz1 = dg1 * _dswish(z1, sig_z1)
    dwf1 = _dot_tn(pool, dz1)                             # [D, r]
    dbf1 = jnp.sum(dz1, axis=0, keepdims=True)
    dpool = _dot_nt(dz1, wf1_ref[:])                      # [bb, D]
    dp = dp + dpool[:, None, :] * (m / msum[:, None, :])

    # pw2
    dp2 = dp.reshape(bb * T, D)
    dw2 = _dot_tn(s.reshape(bb * T, E).astype(cd), dp2.astype(cd))
    db2 = jnp.sum(dp2, axis=0, keepdims=True)
    ds = _dot_nt(dp2.astype(cd), w2_ref[:]).reshape(bb, T, E)

    # dwconv
    dc = ds * _dswish(c, sig_c)
    da = _anticausal_dw(dc, wdw_ref, K)
    apad = jnp.pad(a, ((0, 0), (K - 1, 0), (0, 0)))
    dwdw_rows = [
        jnp.sum(apad[:, k:k + T, :] * dc, axis=(0, 1), keepdims=True)[0]
        for k in range(K)
    ]
    dwdw = jnp.concatenate(dwdw_rows, axis=0)             # [K, E]

    # pw1
    du = (da * _dswish(u, sig_u)).reshape(bb * T, E)
    dw1 = _dot_tn(xn.reshape(bb * T, D).astype(cd), du.astype(cd))
    db1 = jnp.sum(du, axis=0, keepdims=True)
    dxn = _dot_nt(du.astype(cd), w1_ref[:]).reshape(bb, T, D)

    # LayerNorm backward
    dgam = jnp.sum((dxn * xh).reshape(bb * T, D), axis=0, keepdims=True)
    dbet = jnp.sum(dxn.reshape(bb * T, D), axis=0, keepdims=True)
    dxh = dxn * g_ref[:][None]
    mean_dxh = jnp.mean(dxh, axis=-1, keepdims=True)
    mean_dxh_xh = jnp.mean(dxh * xh, axis=-1, keepdims=True)
    dx_ln = (dxh - mean_dxh - xh * mean_dxh_xh) * rstd

    dx_ref[:] = (do + dx_ln).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dwdw_ref[:] = jnp.zeros_like(dwdw_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dwf1_ref[:] = jnp.zeros_like(dwf1_ref)
        dbf1_ref[:] = jnp.zeros_like(dbf1_ref)
        dwf2_ref[:] = jnp.zeros_like(dwf2_ref)
        dbf2_ref[:] = jnp.zeros_like(dbf2_ref)

    dg_ref[:] += dgam
    db_ref[:] += dbet
    dw1_ref[:] += dw1
    db1_ref[:] += db1
    dwdw_ref[:] += dwdw
    dw2_ref[:] += dw2
    db2_ref[:] += db2
    dwf1_ref[:] += dwf1
    dbf1_ref[:] += dbf1
    dwf2_ref[:] += dwf2
    dbf2_ref[:] += dbf2


def _bb(B, cap=4):
    """Largest divisor of B that is <= cap (sequences per grid step —
    bounded so the backward's recomputed [bb, T, 2*dim] slabs fit VMEM)."""
    best = 1
    for d in range(2, cap + 1):
        if B % d == 0:
            best = d
    return best


def _const(*_):
    return (0, 0)


def _wspecs(D, E, K, r):
    const2 = lambda i: (0, 0)  # noqa: E731
    return [
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),   # gamma
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),   # beta
        pl.BlockSpec((D, E), const2, memory_space=pltpu.VMEM),   # w1
        pl.BlockSpec((1, E), const2, memory_space=pltpu.VMEM),   # b1
        pl.BlockSpec((K, E), const2, memory_space=pltpu.VMEM),   # wdw
        pl.BlockSpec((E, D), const2, memory_space=pltpu.VMEM),   # w2
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),   # b2
        pl.BlockSpec((D, r), const2, memory_space=pltpu.VMEM),   # wf1
        pl.BlockSpec((1, r), const2, memory_space=pltpu.VMEM),   # bf1
        pl.BlockSpec((r, D), const2, memory_space=pltpu.VMEM),   # wf2
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),   # bf2
    ]


def _prep(x, mask, gamma, beta, w1, b1, wdw, w2, b2, wf1, bf1, wf2, bf2):
    cd = x.dtype
    f32 = jnp.float32
    return (
        # [B, T, 1]: a (bb, T) block would violate the Mosaic tiling rule
        # (last two block dims must divide (8, 128) or equal the array's);
        # with the trailing singleton the block equals the array's last dims
        mask.astype(f32)[..., None],
        gamma.astype(f32).reshape(1, -1), beta.astype(f32).reshape(1, -1),
        w1.astype(cd), b1.astype(f32).reshape(1, -1),
        wdw.astype(f32), w2.astype(cd), b2.astype(f32).reshape(1, -1),
        wf1.astype(f32), bf1.astype(f32).reshape(1, -1),
        wf2.astype(f32), bf2.astype(f32).reshape(1, -1),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def conv_module_residual(x, mask, gamma, beta, w1, b1, wdw, w2, b2,
                         wf1, bf1, wf2, bf2, interpret: bool = False):
    """``x + SE(pw2(swish(dwconv(swish(pw1(LN(x)))))))`` as one kernel.

    x [B, T, D]; mask [B, T] (float/bool, 1 = valid frame) feeds the SE
    pool only (models.layers.masked_global_average_pool contract); gamma/
    beta [D] LN affine; w1 [D, E], b1 [E]; wdw [K, E] depthwise taps
    (CausalDWConv1D kernel squeezed); w2 [E, D], b2 [D]; wf1 [D, r],
    bf1 [r], wf2 [r, D], bf2 [D] the SqueezeExcite Denses. Gradients flow
    to x and every parameter; the backward recomputes the branch from x.
    """
    out, _ = _conv_fwd(x, mask, gamma, beta, w1, b1, wdw, w2, b2,
                       wf1, bf1, wf2, bf2, interpret)
    return out


def _conv_fwd(x, mask, gamma, beta, w1, b1, wdw, w2, b2, wf1, bf1, wf2, bf2,
              interpret):
    B, T, D = x.shape
    E = w1.shape[1]
    K = wdw.shape[0]
    r = wf1.shape[1]
    bb = _bb(B)
    row3 = lambda i: (i, 0, 0)  # noqa: E731
    args = _prep(x, mask, gamma, beta, w1, b1, wdw, w2, b2, wf1, bf1,
                 wf2, bf2)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, K),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, T, D), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, 1), row3, memory_space=pltpu.VMEM),
            *_wspecs(D, E, K, r),
        ],
        out_specs=pl.BlockSpec((bb, T, D), row3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        interpret=interpret,
    )(x, *args)
    return out, (x, mask, gamma, beta, w1, b1, wdw, w2, b2, wf1, bf1,
                 wf2, bf2)


def _conv_vjp_fwd(x, mask, gamma, beta, w1, b1, wdw, w2, b2, wf1, bf1,
                  wf2, bf2, interpret):
    return _conv_fwd(x, mask, gamma, beta, w1, b1, wdw, w2, b2, wf1, bf1,
                     wf2, bf2, interpret)


def _conv_vjp_bwd(interpret, resids, dy):
    (x, mask, gamma, beta, w1, b1, wdw, w2, b2, wf1, bf1, wf2, bf2) = resids
    B, T, D = x.shape
    E = w1.shape[1]
    K = wdw.shape[0]
    r = wf1.shape[1]
    bb = _bb(B)
    row3 = lambda i: (i, 0, 0)  # noqa: E731
    const2 = lambda i: (0, 0)  # noqa: E731
    f32 = jnp.float32
    args = _prep(x, mask, gamma, beta, w1, b1, wdw, w2, b2, wf1, bf1,
                 wf2, bf2)
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, K),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, T, D), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, 1), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, D), row3, memory_space=pltpu.VMEM),
            *_wspecs(D, E, K, r),
        ],
        out_specs=[
            pl.BlockSpec((bb, T, D), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, E), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, E), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, r), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, E), f32),
            jax.ShapeDtypeStruct((1, E), f32),
            jax.ShapeDtypeStruct((K, E), f32),
            jax.ShapeDtypeStruct((E, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, r), f32),
            jax.ShapeDtypeStruct((1, r), f32),
            jax.ShapeDtypeStruct((r, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        interpret=interpret,
    )(x, args[0], dy, *args[1:])
    (dx, dgam, dbet, dw1, db1, dwdw, dw2, db2, dwf1, dbf1, dwf2,
     dbf2) = grads
    return (dx, jnp.zeros_like(mask), dgam[0].astype(gamma.dtype),
            dbet[0].astype(beta.dtype), dw1.astype(w1.dtype),
            db1[0].astype(b1.dtype), dwdw.astype(wdw.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            dwf1.astype(wf1.dtype), dbf1[0].astype(bf1.dtype),
            dwf2.astype(wf2.dtype), dbf2[0].astype(bf2.dtype))


conv_module_residual.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)
