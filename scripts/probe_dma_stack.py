#!/usr/bin/env python
"""Probe: manual double-buffered weight DMA vs the automatic grid pipeline
in the stacked serving kernels (VERDICT r3 #7 / RESULTS.md round-2
"Identified lever": 44.5 us of the 84 us expansion-4 stack probe is
non-overlapped per-block weight DMA).

Measures, with the chained-slope methodology (bench.py), per-call time of:
  * fused_squeezeformer_stack(dma=False)  — Mosaic grid pipeline
  * fused_squeezeformer_stack(dma=True)   — manual make_async_copy doubles
at the flagship serving geometry (T=176, dim=256, 4 blocks, expansion 4)
for bf16 and int8 weight storage, plus the full fused_encoder_forward
hybrid path both ways.

Run on the TPU:  python scripts/probe_dma_stack.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def slope(fn, lo=64, hi=512, reps=7):
    """Median paired (hi-lo) slope of fn-chained repetitions, ms/call."""
    import jax
    import jax.numpy as jnp

    def make(K):
        def body(c, _):
            out = fn(c)
            return (c + jnp.sum(out) * 1e-12).astype(jnp.float32), None

        return jax.jit(
            lambda: jax.lax.scan(body, jnp.float32(0), None, length=K)[0]
        ).lower().compile()

    c_lo, c_hi = make(lo), make(hi)
    float(c_lo()), float(c_hi())
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(c_lo())
        t1 = time.perf_counter()
        float(c_hi())
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    return float(np.median(diffs)) / (hi - lo) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ishara_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    from ishara_tpu.models.blocks import SqueezeformerBlock
    from ishara_tpu.ops.fused_block import (
        fused_squeezeformer_stack,
        quantize_serving_weights,
    )

    T, dim, heads, k, n = 176, 256, 8, 15, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, dim)).astype(np.float32))
    mask = jnp.asarray(np.arange(T) < 150)
    sq = SqueezeformerBlock(dim, heads, 4, k, dropout=0.0)
    params = [
        sq.init(jax.random.key(i), x[None], mask[None], False)["params"]
        for i in range(n)
    ]
    qparams = [quantize_serving_weights(p) for p in params]

    for label, plist, cdt in (
        ("bf16", params, jnp.bfloat16),
        ("int8", qparams, "int8"),
    ):
        for dma in (False, True):
            fn = lambda c, plist=plist, cdt=cdt, dma=dma: (
                fused_squeezeformer_stack(
                    x + c * 1e-12, mask, plist, num_heads=heads,
                    compute_dtype=cdt, dma=dma))
            t0 = time.perf_counter()
            ms = slope(fn)
            print(f"squeeze stack x{n} [{label}, dma={dma}]: "
                  f"{ms * 1e3:.1f} us  (compile+measure "
                  f"{time.perf_counter() - t0:.0f}s)", flush=True)

    # full serving program both ways (hybrid 4+4 flagship)
    from ishara_tpu.config import baseline_config
    from ishara_tpu.models import IsharaEncoder

    cfg = baseline_config(5).model
    model = IsharaEncoder(cfg)
    x0 = np.zeros((1, cfg.frame_len, cfg.input_dim), np.float32)
    variables = model.init(jax.random.key(0), x0)
    from ishara_tpu.ops.fused_block import fused_encoder_forward

    xf = jnp.asarray(
        rng.standard_normal((cfg.frame_len, cfg.input_dim)).astype(np.float32))
    for dma in (False, True):
        fn = lambda c, dma=dma: fused_encoder_forward(
            cfg, variables, xf + c * 1e-12, dma=dma)
        t0 = time.perf_counter()
        ms = slope(fn)
        print(f"encoder fused fwd [bf16, dma={dma}]: {ms * 1e3:.1f} us  "
              f"(compile+measure {time.perf_counter() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
