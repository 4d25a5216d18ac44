"""Fused FFN kernel ON THE REAL CHIP: Mosaic lowering, dropout numerics
and the full custom VJP with active PRNG masks.

Strategy: `debug_masks` draws the exact keep-masks the kernels generate
for a given (seeds, geometry); a pure-JAX oracle replays the same masks,
so value AND all six gradients can be compared with dropout active.

Run: ``ISHARA_TEST_TPU=1 pytest tests/test_ffn_kernel_tpu.py``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.ops.ffn_kernel import debug_masks, ffn_residual

if jax.devices()[0].platform not in ("tpu", "axon"):
    pytest.skip("needs the real chip", allow_module_level=True)

from tests.test_ffn_kernel import make_case, reference  # noqa: E402

R1, R2 = 0.2, 0.1


def test_dropout_forward_and_grads_vs_mask_oracle():
    rng = np.random.default_rng(0)
    n, k, m = 256, 128, 256
    x, res, w1, b1, w2, b2 = make_case(rng, n=n, k=k, m=m)
    seeds = jnp.asarray([17, 91], jnp.int32)
    keep1, keep2 = jax.jit(
        lambda: debug_masks(n, m, k, seeds, R1, R2))()

    def f_kernel(x, res, w1, b1, w2, b2):
        return jnp.sum(jnp.square(ffn_residual(
            x, res, w1, b1, w2, b2, seeds, R1, R2, False)))

    def f_ref(x, res, w1, b1, w2, b2):
        return jnp.sum(jnp.square(reference(
            x, res, w1, b1, w2, b2, keep1=keep1, keep2=keep2,
            rate1=R1, rate2=R2)))

    args = (x, res, w1, b1, w2, b2)
    vk, gk = jax.jit(jax.value_and_grad(
        f_kernel, argnums=(0, 1, 2, 3, 4, 5)))(*args)
    vr, gr = jax.jit(jax.value_and_grad(
        f_ref, argnums=(0, 1, 2, 3, 4, 5)))(*args)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-4)
    # MXU dot reductions differ slightly between Mosaic and XLA (f32 dots
    # are internally decomposed — RESULTS.md round 2), so near-zero
    # elements carry a few % relative noise; compare on the tensor scale
    # (formula errors would be O(1) of the scale).
    for a, b, name in zip(gk, gr, ["x", "res", "w1", "b1", "w2", "b2"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        assert np.abs(a - b).max() <= 2e-3 * scale + 1e-6, (
            name, np.abs(a - b).max(), scale)


def test_bf16_flagship_geometry_runs_and_matches_loosely():
    """bf16 activations at the flagship FFN geometry (45056 x 256 x 512):
    lowering works, output within bf16 tolerance of the mask oracle."""
    rng = np.random.default_rng(1)
    n, k, m = 256 * 176, 256, 512
    x = jnp.asarray(rng.standard_normal((n, k)) * 0.5, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((n, k)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((k, m)) * 0.05, jnp.float32)
    b1 = jnp.zeros((m,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, k)) * 0.05, jnp.float32)
    b2 = jnp.zeros((k,), jnp.float32)
    seeds = jnp.asarray([5, 6], jnp.int32)
    out = jax.jit(lambda *a: ffn_residual(*a, seeds, R1, R2, False))(
        x, res, w1, b1, w2, b2)
    keep1, keep2 = jax.jit(lambda: debug_masks(n, m, k, seeds, R1, R2))()
    ref = reference(x, res, w1, b1, w2, b2, keep1=keep1, keep2=keep2,
                    rate1=R1, rate2=R2)
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).max()
    assert diff.max() / scale < 0.02, (diff.max(), scale)


def test_module_fused_path_on_chip():
    """FusedFFN takes the kernel path in training mode on TPU and the
    result is res + something-finite with gradient flow."""
    from ishara_tpu.models.layers import FusedFFN

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 16, 128)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((4, 16, 128)), jnp.float32)
    mod = FusedFFN(dim=128, expansion_factor=2, dropout=0.2, res_rate=0.2)
    v = mod.init(jax.random.key(0), res, x)

    def loss(params):
        o = mod.apply({"params": params}, res, x, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})
        return jnp.mean(jnp.square(o))

    val, g = jax.jit(jax.value_and_grad(loss))(v["params"])
    assert np.isfinite(float(val))
    for layer in ("fc1", "fc2"):
        arr = np.asarray(g[layer]["kernel"])
        assert np.isfinite(arr).all() and np.abs(arr).max() > 0
