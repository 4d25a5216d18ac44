"""Fused dropout via the TPU Mosaic PRNG.

Measured motivation (RESULTS.md round 2): the flagship train step at batch
256 generates ~1e9 dropout mask elements per step (attention probabilities
[B, H, T, T] in 8 blocks plus FFN hiddens [B, T, 4*dim] at ~12 sites).
jax.random's counter-based threefry costs ~20 ALU rounds per 32-bit word on
the VPU, which measured 82 ms of the 154 ms step — more than the entire
fwd+bwd math. The hardware PRNG (`pltpu.prng_random_bits`) produces bits at
near-VPU-move speed.

Design:
* One kernel, grid over row-blocks of the flattened [R, C] input; each
  program seeds the hardware PRNG with (site_seed, program_id) so blocks are
  decorrelated and the stream is independent of the grid's execution order.
* The keep-mask is NEVER stored: the backward pass re-seeds the same PRNG
  and regenerates it (same trick as the in-kernel attention dropout,
  ops/attention.py:49). dx = dy * mask / (1-rate) is the same computation as
  the forward, so fwd and bwd share one kernel.
* Off-TPU (the CPU test mesh) falls back to jax.random.bernoulli with an
  ordinary threefry key — identical semantics, different (but equally valid)
  mask stream. Interpret mode can't host the kernel: Mosaic's `prng_seed`
  has no CPU lowering (verified on jax 0.9).

Reference contract: torch ``nn.Dropout`` / Keras ``Dropout`` as used by the
reference blocks (integration.py:203-278, nb cell 5) — inverted dropout,
keep-probability scaling at train time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _on_tpu


def _row_block(R, C):
    """Rows per grid step for a flattened [R, C] mask kernel.

    Budget ~2 MB f32 per block buffer, computed against the LANE-PADDED
    width: Mosaic pads the last dim to 128 lanes, so a [br, C] block
    occupies br * ceil(C/128)*128 words of VMEM regardless of C. Budgeting
    by the logical C let narrow tails through — decoder self-attention
    probs at S=63 picked br=8328, whose padded block (4.26 MB) times
    double-buffered in/out plus the PRNG-bits intermediate blew the 16 MB
    scoped-VMEM limit by 272 KB (the translation-family train step died at
    compile). At every lane-aligned width (256, 512, 1024 — all measured
    anchors) this law is byte-identical to the old one.
    """
    cp = -(-max(C, 1) // 128) * 128
    br = max(8, min(R, (1 << 19) // cp))
    return min(R, (br + 7) // 8 * 8)


def _kernel(rate, seed_ref, x_ref, o_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    threshold = jnp.uint32(int(rate * (2 ** 32)))
    keep = (bits >= threshold).astype(jnp.float32)
    scale = 1.0 / (1.0 - rate)
    o_ref[:] = (x_ref[:].astype(jnp.float32) * keep * scale).astype(o_ref.dtype)


def _apply(x, seed, rate):
    """Run the mask kernel over x (any shape, flattened to [R, C])."""
    shape = x.shape
    C = shape[-1]
    R = 1
    for d in shape[:-1]:
        R *= d
    x2 = x.reshape(R, C)
    br = _row_block(R, C)
    grid = (R + br - 1) // br
    out = pl.pallas_call(
        functools.partial(_kernel, rate),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), x.dtype),
    )(seed, x2)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tpu_dropout(x, seed, rate: float):
    """Inverted dropout with a hardware-PRNG mask.

    x: any-shape array; seed: int32 [1] (one fresh value per site per step);
    rate: static drop probability in [0, 1). The mask is a pure function of
    (seed, block index), so the backward pass regenerates it exactly.
    """
    if rate <= 0.0:
        return x
    return _apply(x, seed, rate)


def _vjp_fwd(x, seed, rate):
    return tpu_dropout(x, seed, rate), seed


def _vjp_bwd(rate, seed, dy):
    # d/dx [x * m / (1-r)] = m / (1-r): same masked scaling applied to dy.
    return (_apply(dy, seed, rate) if rate > 0.0 else dy), None


tpu_dropout.defvjp(_vjp_fwd, _vjp_bwd)


def _add_kernel(rate, seed_ref, res_ref, x_ref, o_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    threshold = jnp.uint32(int(rate * (2 ** 32)))
    keep = (bits >= threshold).astype(jnp.float32)
    scale = 1.0 / (1.0 - rate)
    o_ref[:] = (res_ref[:].astype(jnp.float32)
                + x_ref[:].astype(jnp.float32) * keep * scale
                ).astype(o_ref.dtype)


def _apply_add(res, x, seed, rate):
    shape = x.shape
    C = shape[-1]
    R = 1
    for d in shape[:-1]:
        R *= d
    x2 = x.reshape(R, C)
    r2 = res.reshape(R, C)
    br = _row_block(R, C)
    grid = (R + br - 1) // br
    out = pl.pallas_call(
        functools.partial(_add_kernel, rate),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), x.dtype),
    )(seed, r2, x2)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tpu_dropout_add(res, x, seed, rate: float):
    """Fused ``res + dropout(x)`` — the residual-site pattern in every
    encoder block (reference SqueezeformerBlock residual dropout,
    nb cell 5). One kernel pass instead of dropout-write + XLA add-read:
    saves a full round-trip of the branch tensor per site.

    Backward: d/dres = dy (identity, no kernel); d/dx regenerates the same
    PRNG mask — exactly `tpu_dropout`'s backward.
    """
    if rate <= 0.0:
        return res + x
    return _apply_add(res, x, seed, rate)


def _vjp_add_fwd(res, x, seed, rate):
    return tpu_dropout_add(res, x, seed, rate), seed


def _vjp_add_bwd(rate, seed, dy):
    dx = _apply(dy, seed, rate) if rate > 0.0 else dy
    return dy, dx, None


tpu_dropout_add.defvjp(_vjp_add_fwd, _vjp_add_bwd)


def site_seeds(rng, n: int = 1):
    """Derive ``n`` int32 kernel seeds from a flax rng key WITHOUT a
    threefry bits call.

    The key handed out by ``make_rng`` is already the output of a threefry
    fold-in chain over the module path — its key data IS uniformly
    distributed PRNG output, so reinterpreting those words as the hardware
    PRNG's 32-bit site seeds is statistically equivalent to
    ``jax.random.randint`` while skipping the extra ~20 scalar threefry
    rounds per site (~24 seed sites per flagship train step). Measured
    perf-NEUTRAL at flagship scale (perf_probe section 11: 67.6/67.7 ms
    vs 67.5/67.7 ms over two interleaved repeats — the scalar threefry
    work was already hidden by XLA scheduling); kept because it
    centralizes the three seed-derivation call sites behind one tested
    helper, not as an optimization.

    Works for any key impl with >= n 32-bit words (threefry: 2, rbg: 4);
    falls back to one fold_in when more words are needed.
    """
    def _data(key):
        # raw uint32 [2] keys (old-style PRNGKey) are already key data
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            return jax.random.key_data(key).reshape(-1)
        return key.reshape(-1)

    data = _data(rng)[::-1]  # low word first: raw PRNGKey(x) has data [0, x]
    while data.shape[0] < n:
        data = jnp.concatenate(
            [data, _data(jax.random.fold_in(rng, data.shape[0]))])
    return jax.lax.bitcast_convert_type(
        data[:n], jnp.int32) & jnp.int32(0x7FFFFFFF)


def fast_dropout_add(res, x, rng, rate: float):
    """`res + dropout(x)` dispatcher: fused hardware-PRNG kernel on TPU,
    jax.random elsewhere (identical semantics, different mask stream)."""
    if rate <= 0.0:
        return res + x
    if _on_tpu():
        return tpu_dropout_add(res, x, site_seeds(rng, 1), rate)
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return res + jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def fast_dropout(x, rng, rate: float):
    """Dropout dispatcher: hardware-PRNG kernel on TPU, jax.random elsewhere.

    ``rng`` is an ordinary threefry key; the TPU path derives the kernel's
    32-bit site seed from its key data (:func:`site_seeds` — no extra
    threefry rounds beyond make_rng's fold-in chain).
    """
    if rate <= 0.0:
        return x
    if _on_tpu():
        return tpu_dropout(x, site_seeds(rng, 1), rate)
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
