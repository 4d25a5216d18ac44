"""Hardware-PRNG dropout kernel (ops/dropout.py) — statistical + VJP checks.

TPU-only: the Mosaic PRNG has no interpret-mode lowering, so these skip on
the CPU CI mesh and run when the suite executes on a chip. The CPU fallback
path (jax.random) is exercised by every training test via FastDropout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.ops.dropout import tpu_dropout

if jax.devices()[0].platform not in ("tpu", "axon"):
    pytest.skip("Mosaic PRNG requires a TPU", allow_module_level=True)

RATE = 0.25
SEED = jnp.asarray([1234], jnp.int32)


def test_keep_fraction_and_scaling():
    x = jnp.ones((512, 1024), jnp.float32)
    y = np.asarray(jax.jit(lambda x: tpu_dropout(x, SEED, RATE))(x))
    kept = y != 0.0
    # surviving elements are scaled by 1/(1-rate)
    np.testing.assert_allclose(y[kept], 1.0 / (1 - RATE), rtol=1e-6)
    # keep fraction within 5 sigma of (1-rate)
    n = y.size
    sigma = np.sqrt(RATE * (1 - RATE) / n)
    assert abs(kept.mean() - (1 - RATE)) < 5 * sigma


def test_deterministic_and_seed_sensitive():
    x = jnp.ones((64, 256), jnp.float32)
    f = jax.jit(lambda s: tpu_dropout(x, s, RATE))
    a, b = np.asarray(f(SEED)), np.asarray(f(SEED))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(f(jnp.asarray([99], jnp.int32)))
    assert (a != c).any()


def test_vjp_regenerates_the_same_mask():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((40, 176, 128)).astype(np.float32))
    y, grad = jax.jit(jax.value_and_grad(
        lambda x: jnp.sum(tpu_dropout(x, SEED, RATE)), allow_int=False
    ))(x)
    g = np.asarray(grad)
    yv = np.asarray(jax.jit(lambda x: tpu_dropout(x, SEED, RATE))(x))
    # d(sum)/dx is exactly mask/(1-rate): nonzero iff the fwd kept the element
    np.testing.assert_allclose(
        g, np.where(yv != 0.0, 1.0 / (1 - RATE), 0.0), rtol=1e-6)
    assert np.isfinite(y)


def test_bfloat16_and_odd_shapes():
    x = jnp.ones((3, 7, 176), jnp.bfloat16)  # R=21 rows, unaligned C
    y = np.asarray(jax.jit(
        lambda x: tpu_dropout(x, SEED, RATE))(x)).astype(np.float32)
    kept = y != 0.0
    np.testing.assert_allclose(y[kept], 1.0 / (1 - RATE), rtol=2e-2)
    assert 0.5 < kept.mean() < 0.95


def test_dropout_add_matches_unfused_pair():
    """tpu_dropout_add(res, x) == res + tpu_dropout(x): same grid/block
    decomposition => identical PRNG mask, and f32 adds are exact."""
    from ishara_tpu.ops.dropout import tpu_dropout_add

    r = np.random.default_rng(1)
    res = jnp.asarray(r.standard_normal((40, 176, 128)).astype(np.float32))
    x = jnp.asarray(r.standard_normal((40, 176, 128)).astype(np.float32))
    fused = np.asarray(jax.jit(
        lambda r_, x_: tpu_dropout_add(r_, x_, SEED, RATE))(res, x))
    unfused = np.asarray(jax.jit(
        lambda r_, x_: r_ + tpu_dropout(x_, SEED, RATE))(res, x))
    np.testing.assert_array_equal(fused, unfused)


def test_dropout_add_vjp():
    """d/dres is the identity; d/dx regenerates the forward mask."""
    from ishara_tpu.ops.dropout import tpu_dropout_add

    r = np.random.default_rng(2)
    res = jnp.asarray(r.standard_normal((16, 256)).astype(np.float32))
    x = jnp.asarray(r.standard_normal((16, 256)).astype(np.float32))
    gr, gx = jax.jit(jax.grad(
        lambda r_, x_: jnp.sum(tpu_dropout_add(r_, x_, SEED, RATE)),
        argnums=(0, 1)))(res, x)
    np.testing.assert_allclose(np.asarray(gr), 1.0, rtol=1e-6)
    dropped = np.asarray(jax.jit(
        lambda x_: tpu_dropout(x_, SEED, RATE))(x))
    np.testing.assert_allclose(
        np.asarray(gx),
        np.where(dropped != 0.0, 1.0 / (1 - RATE), 0.0), rtol=1e-6)
