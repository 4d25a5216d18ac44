#!/usr/bin/env python
"""Calibrate the fused-decode VMEM budget on real hardware.

Walks a geometry ladder (growing dim/L/T/W), computes the closed-form VMEM
need (ops.decoder_kernel.fused_decode_vmem_bytes), and tries to COMPILE the
fused kernel at each rung with the guard disabled. The largest need that
still compiles (and the smallest that fails) bracket the true Mosaic budget;
VMEM_BUDGET_BYTES should sit just under the failure point.

    ISHARA_DECODE_VMEM_BUDGET=999999999999 python scripts/probe_decoder_vmem.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("ISHARA_DECODE_VMEM_BUDGET", str(10 ** 12))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/ishara_jax_cache_tpu"
                      if jax.default_backend() != "cpu"
                      else "/tmp/ishara_jax_cache")

    from ishara_tpu.models.seq2seq import ASLTranslationModel
    from ishara_tpu.ops.decoder_kernel import (
        fused_beam_decode,
        fused_decode_vmem_bytes,
        fused_greedy_decode,
    )

    # (dim, L, T, S, W) — W=1 means greedy. T caps at 384: the seq2seq
    # encoder's RoPE buffer is max_seq_len=384 (reference parity,
    # integration.py:55-69), so bigger memories are unreachable anyway —
    # VMEM pressure is driven through dim/L/S/W instead.
    ladder = [
        (208, 2, 176, 64, 1),
        (208, 2, 176, 64, 4),
        (512, 2, 384, 64, 1),
        (512, 4, 384, 64, 4),
        (512, 4, 384, 128, 8),
        (768, 4, 384, 128, 4),
        (1024, 6, 384, 256, 4),
        (1024, 8, 384, 512, 8),
    ]
    for dim, L, T, S, W in ladder:
        need = fused_decode_vmem_bytes(dim, 8, L, 62, T, S, W)
        model = ASLTranslationModel(
            num_classes=62, feature_dim=dim, num_layers=1,
            num_decoder_layers=L, num_heads=8, dropout=0.0)
        x = jnp.zeros((1, T, 92, 3), jnp.float32)
        mask = jnp.ones((1, T), bool)
        try:
            variables = model.init(jax.random.key(0), x, mask,
                                   jnp.zeros((1, 4), jnp.int32))
            memory, _ = jax.jit(
                lambda v, x, m: model.apply(v, x, m, training=False,
                                            method=model.encode)
            )(variables, x, mask)
            t0 = time.time()
            if W == 1:
                fn = jax.jit(lambda v, mem, m: fused_greedy_decode(
                    model, v, mem, m, max_len=S, interpret=False))
            else:
                fn = jax.jit(lambda v, mem, m: fused_beam_decode(
                    model, v, mem, m, max_len=S, beam_width=W,
                    interpret=False)[0])
            out = fn(variables, memory, mask)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            status = f"OK ({time.time() - t0:.1f}s)"
        except Exception as e:
            msg = repr(e)
            status = ("VMEM-FAIL" if ("vmem" in msg.lower()
                                      or "mosaic" in msg.lower()
                                      or "scoped" in msg.lower())
                      else f"FAIL {msg[:160]}")
        print(f"dim={dim:5d} L={L} T={T:5d} S={S:4d} W={W}: "
              f"need {need / 2**20:8.1f} MiB -> {status}", flush=True)


if __name__ == "__main__":
    main()
