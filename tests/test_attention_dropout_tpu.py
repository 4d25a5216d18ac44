"""In-kernel attention dropout vs an exact mask-echo oracle.

TPU-only: the Mosaic PRNG has no interpret-mode lowering, so these skip on
the CPU CI mesh and run when the suite executes on a chip. The fwd/bwd
correctness evidence also lives in RESULTS.md (verified on v5e)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.ops.attention import flash_mhsa

if jax.devices()[0].platform not in ("tpu", "axon"):
    pytest.skip("Mosaic PRNG requires a TPU", allow_module_level=True)

B, H, T, Dh = 2, 4, 64, 32
RATE = 0.3
SEED = 42


def kernel_masks():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mask_kernel(seed_ref, out_ref):
        b = pl.program_id(0)
        for h in range(H):
            pltpu.prng_seed(seed_ref[0] + b * 131071 + h * 8191)
            bits = pltpu.prng_random_bits((T, T))
            thr = jnp.uint32(int(RATE * (2 ** 32)))
            out_ref[0, h] = (
                pltpu.bitcast(bits, jnp.uint32) >= thr).astype(jnp.float32)

    return pl.pallas_call(
        mask_kernel, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, H, T, T), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, T), jnp.float32),
    )(jnp.asarray([SEED], jnp.int32))


def test_dropout_matches_mask_oracle():
    masks = kernel_masks()
    r = np.random.default_rng(0)
    q, k, v = (jnp.asarray(r.standard_normal((B, H, T, Dh)).astype(np.float32))
               for _ in range(3))
    bias = jnp.zeros((B, T), jnp.float32)
    seed = jnp.asarray([SEED], jnp.int32)

    def oracle(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.1
        a = jax.nn.softmax(s, -1) * masks / (1 - RATE)
        return jnp.einsum("bhqk,bhkd->bhqd", a, v)

    fk = jax.jit(lambda q: flash_mhsa(q, k, v, bias, seed, scale=0.1,
                                      interpret=False, dropout_rate=RATE))
    np.testing.assert_allclose(np.asarray(fk(q)), np.asarray(oracle(q)),
                               rtol=1e-2, atol=5e-3)
    gk = jax.jit(jax.grad(lambda q: jnp.sum(fk(q) ** 2)))(q)
    go = jax.jit(jax.grad(lambda q: jnp.sum(oracle(q) ** 2)))(q)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(go),
                               rtol=1e-2, atol=1e-2)
