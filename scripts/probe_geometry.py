#!/usr/bin/env python
"""Geometry-robust kernel selection probes (VERDICT r3 #4 / ROADMAP #11).

Every kernel-vs-XLA selection shipped in rounds 2-3 was measured at the
flagship geometry (dim=256, T=176, batch=256). This script re-measures the
three selection decisions at larger dims/sequence lengths so the gates in
models/layers.py can read a measured table instead of extrapolating:

  A. training MHSA fwd+bwd: XLA einsum vs single-block flash vs blocked
     flash (the current gate: flash when ``not deterministic and T<=384``)
  B. serving MHSA fwd: einsum vs blocked flash (current: einsum always)
  C. training FFN+residual fwd+bwd with dropout: FusedFFN kernel vs XLA
     composition (current: kernel whenever dropout active)
  D. conv-module branch fwd+bwd: fused kernel vs XLA composition
     (current: XLA always — the round-4 recorded negative at dim 256)

Timing: chained-carry slope per CLAUDE.md rules. Run on the real chip:

    python scripts/probe_geometry.py            # all geometries
    python scripts/probe_geometry.py 512 512 128  # one (dim, T, B)

Results land in RESULTS.md's round-4 geometry table; the selection gates
cite that table.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.perf_probe import log, slope  # noqa: E402

# (dim, T, B): anchor + the VERDICT-requested larger geometries. Dh=64
# above dim 256 (the common large-model head size); the anchor keeps the
# flagship's Dh=32.
GEOMS = [
    (256, 176, 256),
    (512, 512, 128),
    (768, 512, 128),
    (512, 1024, 64),
]


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/ishara_jax_cache_tpu" if on_tpu else "/tmp/ishara_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())

    from ishara_tpu.ops.attention import flash_mhsa
    from ishara_tpu.ops.attention_blocked import flash_mhsa_blocked
    from ishara_tpu.ops.dropout import fast_dropout
    from ishara_tpu.ops.ffn_kernel import ffn_residual
    from ishara_tpu.models.layers import SqueezeformerConvModule

    geoms = ([tuple(int(a) for a in sys.argv[1:4])]
             if len(sys.argv) >= 4 else GEOMS)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    def bwd_ms(label, loss_fn, *args, lo=8, hi=40):
        """fwd+bwd slope of sum-loss wrt args[0] (+ carry chained into the
        input so nothing hoists). ``args`` are passed as COMPILED-FUNCTION
        ARGUMENTS, not closure constants — zero-arg jit inlines every
        captured array into the HLO, and at dim>=768 the 200+ MB constant
        blobs exceed the compile tunnel's request-size limit (HTTP 413)."""
        try:
            grad = jax.grad(
                lambda x0, rest: loss_fn(x0, rest), argnums=0)

            def make(K):
                def run(arrs):
                    def body(c, _):
                        g = grad(arrs[0] + c.astype(arrs[0].dtype),
                                 arrs[1:])
                        return jnp.sum(g.astype(jnp.float32)) * 1e-20, None

                    return jax.lax.scan(body, jnp.float32(0), None,
                                        length=K)[0]

                compiled = jax.jit(run).lower(args).compile()
                return lambda: float(compiled(args))

            ms = slope(make, lo, hi, n=3) * 1e3
            log(f"  {label}: {ms:.3f} ms")
            return ms
        except Exception as e:
            log(f"  {label}: FAILED {type(e).__name__}: {e}")
            return None

    def fwd_ms(label, fn, *args, lo=64, hi=512):
        try:
            def make(K):
                def run(arrs):
                    def body(c, _):
                        out = fn(arrs[0] + c.astype(arrs[0].dtype),
                                 *arrs[1:])
                        return jnp.sum(out.astype(jnp.float32)) * 1e-20, None

                    return jax.lax.scan(body, jnp.float32(0), None,
                                        length=K)[0]

                compiled = jax.jit(run).lower(args).compile()
                return lambda: float(compiled(args))

            ms = slope(make, lo, hi, n=3) * 1e3
            log(f"  {label}: {ms:.3f} ms")
            return ms
        except Exception as e:
            log(f"  {label}: FAILED {type(e).__name__}: {e}")
            return None

    for dim, T, B in geoms:
        H = dim // (32 if dim <= 256 else 64)
        Dh = dim // H
        log(f"== geometry dim={dim} T={T} B={B} (H={H}, Dh={Dh}) ==")
        t_geom = time.time()
        cd = jnp.bfloat16
        scale = dim ** -0.5

        qkv = jnp.asarray(rng.standard_normal((3, B, H, T, Dh)), cd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        bias = jnp.zeros((B, T), jnp.float32)

        # ---- A. training attention fwd+bwd (dropout 0.1 where supported)
        def einsum_attn(q, k, v, drop):
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            attn = jax.nn.softmax(attn, axis=-1)
            if drop:
                attn = fast_dropout(attn, key, 0.1)
            return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

        seed = jnp.asarray([17], jnp.int32)
        bwd_ms("A train einsum+dropout",
               lambda q0, rest: jnp.sum(
                   einsum_attn(q0, *rest[:2], True).astype(jnp.float32)),
               q, k, v)
        bwd_ms("A train flash(single-block)+dropout",
               lambda q0, rest: jnp.sum(
                   flash_mhsa(q0, rest[0], rest[1], bias, seed,
                              scale=scale, dropout_rate=0.1)
                   .astype(jnp.float32)),
               q, k, v)
        bwd_ms("A train flash(blocked 128x128), no-dropout",
               lambda q0, rest: jnp.sum(
                   flash_mhsa_blocked(q0, rest[0], rest[1], bias, scale)
                   .astype(jnp.float32)),
               q, k, v)
        bwd_ms("A train einsum no-dropout",
               lambda q0, rest: jnp.sum(
                   einsum_attn(q0, *rest[:2], False).astype(jnp.float32)),
               q, k, v)

        # ---- B. serving attention fwd (batch 1)
        q1, k1, v1 = q[:1], k[:1], v[:1]
        fwd_ms("B serve einsum fwd",
               lambda q0, k0, v0: einsum_attn(q0, k0, v0, False),
               q1, k1, v1)
        fwd_ms("B serve blocked-flash fwd",
               lambda q0, k0, v0: flash_mhsa_blocked(
                   q0, k0, v0, bias[:1], scale),
               q1, k1, v1)

        # ---- C. FFN+residual fwd+bwd, dropout 0.1 both sites.
        # expansion 2 — the PRODUCT geometry (config.EncoderConfig
        # expansion_factor=2 at every preset, matching the reference); an
        # earlier probe draft used 4x and scoped-vmem-OOMed at rc=1024,
        # which is how the rc*m boundary in ops/ffn_kernel._row_chunk was
        # found
        E = dim * 2
        x = jnp.asarray(rng.standard_normal((B, T, dim)), cd)
        res = jnp.asarray(rng.standard_normal((B, T, dim)), cd)
        # weights stay f32 (flax param dtype) exactly as FusedFFN passes
        # them from get_variable — the kernel casts to the compute dtype
        # internally; an all-bf16-weight variant hit a different
        # specialization that scoped-vmem-OOMed even at the anchor
        w1 = jnp.asarray(rng.standard_normal((dim, E)) / np.sqrt(dim),
                         jnp.float32)
        b1 = jnp.zeros((E,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((E, dim)) / np.sqrt(E),
                         jnp.float32)
        b2 = jnp.zeros((dim,), jnp.float32)
        seeds = jnp.asarray([3, 5], jnp.int32)

        bwd_ms("C FusedFFN kernel (dropout .1/.1)",
               lambda x0, rest: jnp.sum(ffn_residual(
                   x0, rest[0], w1, b1, w2, b2, seeds, 0.1, 0.1, False)
                   .astype(jnp.float32)),
               x, res)

        def xla_ffn(x0, res0):
            h = jax.nn.swish(x0 @ w1 + b1.astype(cd))
            h = fast_dropout(h, key, 0.1)
            h = (h @ w2 + b2.astype(cd))
            return res0 + fast_dropout(h, jax.random.fold_in(key, 1), 0.1)

        bwd_ms("C XLA FFN composition (dropout .1/.1)",
               lambda x0, rest: jnp.sum(
                   xla_ffn(x0, rest[0]).astype(jnp.float32)),
               x, res)

        # ---- D. conv-module branch fwd+bwd (kernel vs XLA)
        Kw = 15
        mod_x = SqueezeformerConvModule(dim, Kw, 2, dtype=cd, fused=False)
        mod_k = SqueezeformerConvModule(dim, Kw, 2, dtype=cd, fused=True)
        mask = jnp.ones((B, T), jnp.float32)
        variables = mod_x.init(jax.random.key(1), x, mask=mask)
        for label, mod in (("D conv-module XLA", mod_x),
                           ("D conv-module fused kernel", mod_k)):
            bwd_ms(label,
                   lambda x0, rest, mod=mod: jnp.sum(mod.apply(
                       variables, x0, mask=mask, training=True)
                       .astype(jnp.float32)),
                   x)

        log(f"== geometry done in {time.time() - t_geom:.0f}s ==")


if __name__ == "__main__":
    main()
