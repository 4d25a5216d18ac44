#!/usr/bin/env python
"""On-chip component breakdown for the round-2 perf work (VERDICT #2).

Measures, with the verified slope methodology (carry-chained in-program
repetition, value fetches — see bench.py / RESULTS.md):

  1. encoder fwd (eval mode) at batch 64, f32 and bf16   [VERDICT target]
  2. fused train step at batch 256 bf16: full / no-dropout / rbg-PRNG
  3. train step with flash attention (Pallas kernel) vs XLA einsum

Run on the real chip: ``python scripts/perf_probe.py``.
"""

import dataclasses
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def med_time(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t)
    return float(np.median(ts))


def slope(make_loop, lo, hi, n=5):
    t_lo, t_hi = med_time(make_loop(lo), n), med_time(make_loop(hi), n)
    return (t_hi - t_lo) / (hi - lo)


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/ishara_jax_cache_tpu" if on_tpu else "/tmp/ishara_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())

    from ishara_tpu.config import TrainConfig, baseline_config
    from ishara_tpu.data.synthetic import SyntheticASLFR
    from ishara_tpu.data.tokenizer import CTCTokenizer
    from ishara_tpu.models import IsharaEncoder
    from ishara_tpu.preprocess import GroupStats, preprocess_batch
    from ishara_tpu.train import TrainState, make_optimizer
    from ishara_tpu.train.state import make_fused_ctc_train_step

    tok = CTCTokenizer()

    # ---------------- 1. encoder fwd at batch 64 ----------------
    B = 64
    ds = SyntheticASLFR(num_sequences=B, seed=3)
    batch = ds.batch(range(B), tok, max_frames=96)

    for dtype in ("float32", "bfloat16"):
        cfg = dataclasses.replace(baseline_config(4).model, dtype=dtype)
        model = IsharaEncoder(cfg)
        x = preprocess_batch(
            jnp.asarray(batch["raw"]), jnp.asarray(batch["lengths"]),
            GroupStats.identity(), frame_len=cfg.frame_len)
        variables = model.init(jax.random.key(0), x[:1])

        def loop(K):
            def body(c, _):
                logits = model.apply(variables, x + c * 1e-12, training=False)
                return jnp.sum(logits[:, 0, 0]).astype(jnp.float32), None

            compiled = jax.jit(
                lambda: jax.lax.scan(body, jnp.float32(0),
                                     None, length=K)[0]
            ).lower().compile()
            return lambda: float(compiled())

        ms = slope(loop, 4, 20) * 1e3
        log(f"encoder fwd  batch{B} [{dtype}]: {ms:.2f} ms")

    # ---------------- 2. fused train step variants ----------------
    B = 256
    ds = SyntheticASLFR(num_sequences=B, seed=3)
    batch = ds.batch(range(B), tok, max_frames=96)
    jb = {"raw": jnp.asarray(batch["raw"]),
          "lengths": jnp.asarray(batch["lengths"]),
          "labels": jnp.asarray(batch["labels"])}
    tcfg = TrainConfig(steps_per_epoch=1000)
    tx, _ = make_optimizer(tcfg)

    def train_ms(cfg, label, aug_prob=0.2, prng_impl=None):
        model = IsharaEncoder(cfg)
        sample = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
        state0 = TrainState.create(model, tx, sample)
        step = make_fused_ctc_train_step(
            GroupStats.identity(), cfg.frame_len, aug_prob=aug_prob,
            blank_id=cfg.blank_id)
        rng = jax.random.key(0, impl=prng_impl) if prng_impl \
            else jax.random.key(0)

        def loop(K):
            def body(s, _):
                s2, m = step(s, jb, rng)
                return s2, m["loss"]

            compiled = jax.jit(
                lambda s: jnp.sum(jax.lax.scan(body, s, None, length=K)[1])
            ).lower(state0).compile()
            return lambda: float(compiled(state0))

        ms = slope(loop, 2, 10, n=3) * 1e3
        log(f"train step batch{B} [{label}]: {ms:.1f} ms "
            f"({B / ms * 1e3:.0f} seqs/s)")
        return ms

    base = dataclasses.replace(baseline_config(4).model, dtype="bfloat16")
    train_ms(base, "bf16 full")
    nodrop = dataclasses.replace(base, dropout=0.0, top_dropout=0.0)
    train_ms(nodrop, "bf16 no-dropout")
    train_ms(base, "bf16 full rbg-prng", prng_impl="rbg")
    train_ms(dataclasses.replace(base, use_flash=True), "bf16 flash-attn")
    train_ms(dataclasses.replace(base, remat=True), "bf16 remat")


if __name__ == "__main__":
    main()
