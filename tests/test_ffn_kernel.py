"""Fused FFN training kernel (ops/ffn_kernel.py) vs the XLA composition.

Rate-0 cases run the REAL kernel code in interpret mode on CPU (no PRNG
draw sites), checking forward AND every gradient of the custom VJP against
jax autodiff of the reference composition. Dropout cases need the TPU PRNG
and live in tests/test_ffn_kernel_tpu.py (masks extracted via
debug_masks and replayed through a pure-JAX oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.ops.ffn_kernel import ffn_residual


def make_case(rng, n=32, k=16, m=24, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((n, k)), dtype)
    res = jnp.asarray(rng.standard_normal((n, k)), dtype)
    w1 = jnp.asarray(rng.standard_normal((k, m)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(m) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, k)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(k) * 0.1, jnp.float32)
    return x, res, w1, b1, w2, b2


def reference(x, res, w1, b1, w2, b2, keep1=None, keep2=None,
              rate1=0.0, rate2=0.0):
    cd = x.dtype
    h = x @ w1.astype(cd) + b1.astype(jnp.float32)
    a = jax.nn.swish(h)
    if keep1 is not None:
        a = a * keep1 / (1.0 - rate1)
    y = a.astype(cd) @ w2.astype(cd) + b2.astype(jnp.float32)
    if keep2 is not None:
        y = y * keep2 / (1.0 - rate2)
    return (res.astype(jnp.float32) + y).astype(cd)


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_rate0_forward_and_all_grads(dtype):
    rng = np.random.default_rng(0)
    x, res, w1, b1, w2, b2 = make_case(rng, dtype=dtype)
    seeds = jnp.zeros((2,), jnp.int32)

    def f_kernel(x, res, w1, b1, w2, b2):
        return jnp.sum(jnp.square(ffn_residual(
            x, res, w1, b1, w2, b2, seeds, 0.0, 0.0, True)))

    def f_ref(x, res, w1, b1, w2, b2):
        return jnp.sum(jnp.square(reference(x, res, w1, b1, w2, b2)))

    args = (x, res, w1, b1, w2, b2)
    vk, gk = jax.value_and_grad(f_kernel, argnums=(0, 1, 2, 3, 4, 5))(*args)
    vr, gr = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-5)
    for a, b, name in zip(gk, gr, ["x", "res", "w1", "b1", "w2", "b2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5, err_msg=name)


def test_rate0_3d_shape_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    _, _, w1, b1, w2, b2 = make_case(rng, k=16, m=24)
    seeds = jnp.zeros((2,), jnp.int32)
    out = ffn_residual(x, res, w1, b1, w2, b2, seeds, 0.0, 0.0, True)
    ref = reference(x, res, w1, b1, w2, b2)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_module_unfused_path_matches_previous_composition():
    """On CPU (and in eval mode) FusedFFN must reproduce the original
    FeedForwardModule + residual-dropout-add composition exactly, and keep
    the fc1/fc2 param tree (checkpoint + serving-kernel compatibility)."""
    from ishara_tpu.models.layers import FusedFFN

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    mod = FusedFFN(dim=16, expansion_factor=2, dropout=0.2, res_rate=0.2)
    v = mod.init(jax.random.key(0), res, x)
    assert set(v["params"].keys()) == {"fc1", "fc2"}
    assert v["params"]["fc1"]["kernel"].shape == (16, 32)

    # eval: res + fc2(swish(fc1(x)))
    out = mod.apply(v, res, x, deterministic=True)
    p = v["params"]
    ref = reference(x, res, p["fc1"]["kernel"], p["fc1"]["bias"],
                    p["fc2"]["kernel"], p["fc2"]["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    # training on CPU: unfused path, grads flow to both Dense layers
    def loss(params):
        o = mod.apply({"params": params}, res, x, deterministic=False,
                      rngs={"dropout": jax.random.key(3)})
        return jnp.mean(jnp.square(o))

    g = jax.grad(loss)(v["params"])
    for layer in ("fc1", "fc2"):
        assert float(jnp.abs(g[layer]["kernel"]).max()) > 0
