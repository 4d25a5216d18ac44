#!/usr/bin/env python
"""Is the 11.4 ms dropout gap PRNG-bound, and does an 8-bit threshold help?

probe_backward.py (round 5) showed the full-vs-no-dropout gap (68.1 vs
56.7 ms) carries only ~0.9 GB of modeled HBM traffic (~1.1 ms), so most of
the gap must be in-kernel compute — the prime suspect is
``pltpu.prng_random_bits``, which generates one 32-bit word per mask
element (~2-3e9 words/step across the attention-prob, FFN-hidden and
residual sites, fwd + bwd regeneration).

Measures, per variant, the chained-slope cost of a standalone mask kernel
at the attention-prob geometry, plus flash-attention fwd+bwd with
dropout 0.4 vs 0.0:

  u32: one prng word per element (shipped scheme)
  u8:  one prng word per FOUR elements, bitcast to u8 lanes; the keep
       threshold quantizes to 1/256 (0.4 -> 102/256 = 0.3984) — a labeled
       semantic change if it ships.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/ishara_jax_cache_tpu")
    print("devices:", jax.devices(), flush=True)

    B, H, T, Dh = 256, 8, 176, 32
    rate = 0.4

    # --- standalone mask kernels at the attention-prob geometry ----------
    def u32_kernel(seed_ref, x_ref, o_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
        thr = jnp.uint32(int(rate * (2 ** 32)))
        keep = (bits >= thr).astype(jnp.float32)
        o_ref[:] = x_ref[:] * keep * (1.0 / (1.0 - rate))

    def u8_kernel(seed_ref, x_ref, o_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        R, C = x_ref.shape
        # u32 -> u8 bitcast expands the SUBLANE dim x4: [R//4, C] u32
        # becomes [R, C] u8 with no shape cast
        bits = pltpu.prng_random_bits((R // 4, C))
        b8 = pltpu.bitcast(bits, jnp.uint8)
        thr = jnp.uint8(int(rate * 256))
        keep = (b8 >= thr).astype(jnp.float32)
        o_ref[:] = x_ref[:] * keep * (1.0 / (1.0 - rate))

    R, C = 1024, 1408  # ~1.4M elements/block
    grid = 16
    x = jnp.ones((grid * R, C), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)

    def bench_kernel(kernel, name):
        call = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((R, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * R, C), jnp.float32),
        )

        def loop(K):
            def body(c, _):
                y = call(seed, x + c * 1e-20)
                return c + y[0, 0], None
            return jax.jit(lambda: jax.lax.scan(
                body, jnp.float32(0), None, length=K)[0]).lower().compile()

        c_lo, c_hi = loop(4), loop(24)
        float(c_lo()), float(c_hi())
        diffs = []
        for _ in range(5):
            t0 = time.perf_counter(); float(c_lo())
            t1 = time.perf_counter(); float(c_hi())
            t2 = time.perf_counter()
            diffs.append((t2 - t1) - (t1 - t0))
        ms = float(np.median(diffs)) / 20 * 1e3
        n = grid * R * C
        print(f"{name}: {ms:.3f} ms for {n/1e6:.1f}M elements "
              f"({n / (ms * 1e-3) / 1e9:.1f} Ge/s; HBM r+w bound "
              f"{2 * 4 * n / 819e9 * 1e3:.3f} ms)", flush=True)
        return ms

    m32 = bench_kernel(u32_kernel, "mask u32")
    try:
        m8 = bench_kernel(u8_kernel, "mask u8 ")
    except Exception as e:
        print(f"mask u8: unsupported ({repr(e)[:120]})", flush=True)

    # --- flash attention fwd+bwd, dropout 0.4 vs 0.0 ---------------------
    from ishara_tpu.ops.attention import flash_mhsa, mask_to_bias

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)
    bias = mask_to_bias(jnp.ones((B, T), bool))
    seed1 = jnp.asarray([3], jnp.int32)

    for dr in (0.0, 0.4):
        def loss(q, k, v, dr=dr):
            o = flash_mhsa(q, k, v, bias, seed=seed1, scale=Dh ** -0.5,
                           dropout_rate=dr)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g = jax.value_and_grad(loss, argnums=(0, 1, 2))

        def loop(K, g=g):
            def body(c, _):
                val, (dq, dk, dv) = g(q + c.astype(jnp.bfloat16) * 0, k, v)
                return c + val + dq[0, 0, 0, 0].astype(jnp.float32), None
            return jax.jit(lambda: jax.lax.scan(
                body, jnp.float32(0), None, length=K)[0]).lower().compile()

        c_lo, c_hi = loop(2), loop(12)
        float(c_lo()), float(c_hi())
        diffs = []
        for _ in range(5):
            t0 = time.perf_counter(); float(c_lo())
            t1 = time.perf_counter(); float(c_hi())
            t2 = time.perf_counter()
            diffs.append((t2 - t1) - (t1 - t0))
        ms = float(np.median(diffs)) / 10 * 1e3
        print(f"flash fwd+bwd dropout={dr}: {ms:.3f} ms per call "
              f"(x8 flagship sites = {8 * ms:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
