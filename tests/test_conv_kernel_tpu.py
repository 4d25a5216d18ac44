"""Fused conv-module kernel ON THE REAL CHIP: Mosaic lowering + the module
wiring. The branch has no dropout, so training=True (kernel path) and
training=False (XLA composition) compute identical math — value and grads
must agree to bf16/f32 accumulation tolerance at the flagship geometry.

Run: ``ISHARA_TEST_TPU=1 pytest tests/test_conv_kernel_tpu.py``."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.devices()[0].platform not in ("tpu", "axon"):
    pytest.skip("needs the real chip", allow_module_level=True)

from ishara_tpu.models.layers import SqueezeformerConvModule  # noqa: E402


def _setup(dtype):
    B, T, D, K, exp = 8, 176, 256, 15, 2
    mod = SqueezeformerConvModule(D, K, exp, dtype=dtype, fused=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    mask = jnp.asarray(
        np.arange(T)[None, :] < rng.integers(T // 2, T + 1, size=(B, 1)),
        jnp.float32)
    variables = mod.init(jax.random.key(0), x, mask=mask)
    return mod, variables, x, mask


# f32 tolerance reflects MXU matmul passes (default-precision f32 dots run
# as bf16 passes on TPU; kernel and XLA composition order them differently),
# not kernel math — exact parity is proven in interpret mode on CPU
# (tests/test_conv_kernel.py)
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-2),
                                       (jnp.bfloat16, 4e-2)])
def test_kernel_path_matches_xla_path(dtype, tol):
    mod, variables, x, mask = _setup(dtype)

    @functools.partial(jax.jit, static_argnums=1)
    def f(x, training):
        return mod.apply(variables, x, mask=mask, training=training)

    ref = np.asarray(f(x, False), np.float32)
    out = np.asarray(f(x, True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=tol, atol=tol)


def test_kernel_grads_match_xla_grads():
    mod, variables, x, mask = _setup(jnp.float32)

    def loss(params, x, training):
        out = mod.apply({"params": params}, x, mask=mask, training=training)
        return jnp.sum(jnp.square(out))

    gp_ref, gx_ref = jax.jit(jax.grad(loss, argnums=(0, 1)),
                             static_argnums=2)(variables["params"], x, False)
    gp_k, gx_k = jax.jit(jax.grad(loss, argnums=(0, 1)),
                         static_argnums=2)(variables["params"], x, True)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_ref),
                               rtol=2e-2, atol=2e-2)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp_k),
            jax.tree_util.tree_leaves_with_path(gp_ref)):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-2,
                                   atol=2e-2, err_msg=name)
