"""Fused Squeezeformer conv-module kernel (ops/conv_kernel.py) vs the exact
flax composition (models.layers.SqueezeformerConvModule): forward value and
every gradient, including the masked SE pool, in interpret mode on the CPU
mesh. On-chip Mosaic lowering is gated in tests/test_conv_kernel_tpu.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.models.layers import SqueezeformerConvModule
from ishara_tpu.ops.conv_kernel import _bb, conv_module_residual


def make_case(rng, B=4, T=32, D=64, E=128, K=7, r=8):
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    # ragged valid lengths exercise the masked SE pool
    lengths = rng.integers(T // 2, T + 1, size=B)
    mask = jnp.asarray(
        np.arange(T)[None, :] < lengths[:, None], jnp.float32)
    params = {
        "gamma": 1.0 + 0.1 * rng.standard_normal(D),
        "beta": 0.1 * rng.standard_normal(D),
        "w1": rng.standard_normal((D, E)) / np.sqrt(D),
        "b1": 0.1 * rng.standard_normal(E),
        "wdw": rng.standard_normal((K, E)) / np.sqrt(K),
        "w2": rng.standard_normal((E, D)) / np.sqrt(E),
        "b2": 0.1 * rng.standard_normal(D),
        "wf1": rng.standard_normal((D, r)) / np.sqrt(D),
        "bf1": 0.1 * rng.standard_normal(r),
        "wf2": rng.standard_normal((r, D)) / np.sqrt(r),
        "bf2": 0.1 * rng.standard_normal(D),
    }
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    return x, mask, params


def to_module_tree(p):
    return {
        "norm": {"scale": p["gamma"], "bias": p["beta"]},
        "pw1": {"kernel": p["w1"][None], "bias": p["b1"]},
        "dw": {"dwconv": {"kernel": p["wdw"][:, None, :]}},
        "pw2": {"kernel": p["w2"][None], "bias": p["b2"]},
        "se": {"fc1": {"kernel": p["wf1"], "bias": p["bf1"]},
               "fc2": {"kernel": p["wf2"], "bias": p["bf2"]}},
    }


def module_apply(p, x, mask, D, K, E):
    mod = SqueezeformerConvModule(D, K, E // D)
    return mod.apply({"params": to_module_tree(p)}, x, mask=mask)


def kernel_apply(p, x, mask):
    return conv_module_residual(
        x, mask, p["gamma"], p["beta"], p["w1"], p["b1"], p["wdw"],
        p["w2"], p["b2"], p["wf1"], p["bf1"], p["wf2"], p["bf2"], True)


@pytest.mark.parametrize("B,T,D,E,K,r", [
    (4, 32, 64, 128, 7, 8),
    (3, 16, 32, 64, 3, 4),   # odd batch -> bb collapses to 3
])
def test_forward_parity(B, T, D, E, K, r):
    rng = np.random.default_rng(0)
    x, mask, p = make_case(rng, B, T, D, E, K, r)
    ref = module_apply(p, x, mask, D, K, E)
    out = kernel_apply(p, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradient_parity():
    rng = np.random.default_rng(1)
    B, T, D, E, K, r = 4, 32, 64, 128, 7, 8
    x, mask, p = make_case(rng, B, T, D, E, K, r)
    cot = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)

    def loss_ref(p, x):
        return jnp.sum(module_apply(p, x, mask, D, K, E) * cot)

    def loss_k(p, x):
        return jnp.sum(kernel_apply(p, x, mask) * cot)

    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    (gp_k, gx_k) = jax.grad(loss_k, argnums=(0, 1))(p, x)

    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    flat_ref = to_module_tree(gp_k)
    for path, ref_leaf in jax.tree_util.tree_leaves_with_path(
            to_module_tree(gp_ref)):
        k_leaf = flat_ref
        for seg in path:
            k_leaf = k_leaf[seg.key]
        name = "/".join(s.key for s in path)
        np.testing.assert_allclose(
            np.asarray(k_leaf), np.asarray(ref_leaf), rtol=2e-4, atol=2e-4,
            err_msg=name)


def test_full_mask_matches_unmasked_pool():
    rng = np.random.default_rng(2)
    x, _, p = make_case(rng)
    ones = jnp.ones(x.shape[:2], jnp.float32)
    ref = module_apply(p, x, None, 64, 7, 128)
    out = kernel_apply(p, x, ones)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bb_divisor():
    assert _bb(256) == 4
    assert _bb(6) == 3
    assert _bb(5) == 1
    assert _bb(8) == 4
