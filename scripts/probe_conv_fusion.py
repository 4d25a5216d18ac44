"""One-off probe: bf16 flagship train-step time with the fused conv-module
kernel (round-4). Timing follows the repo's chained-carry rules (CLAUDE.md):
the scan carries the state, the fetched value depends on all K steps, and
the reported number is the slope between two in-program repetition counts.
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")
from scripts.perf_probe import slope, log  # noqa: E402


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
    from ishara_tpu.preprocess import GroupStats
    from ishara_tpu.train import TrainState, make_optimizer
    from ishara_tpu.train.state import make_fused_ctc_train_step

    tok = CTCTokenizer()
    B = 256
    ds = SyntheticASLFR(num_sequences=B, seed=3)
    batch = ds.batch(range(B), tok, max_frames=96)
    jb = {"raw": jnp.asarray(batch["raw"]),
          "lengths": jnp.asarray(batch["lengths"]),
          "labels": jnp.asarray(batch["labels"])}
    tcfg = TrainConfig(steps_per_epoch=1000)
    tx, _ = make_optimizer(tcfg)

    def train_ms(cfg, label, aug_prob=0.2):
        model = IsharaEncoder(cfg)
        sample = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
        state0 = TrainState.create(model, tx, sample)
        step = make_fused_ctc_train_step(
            GroupStats.identity(), cfg.frame_len, aug_prob=aug_prob,
            blank_id=cfg.blank_id)
        rng = jax.random.key(0)

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
    t0 = time.time()
    train_ms(base, "bf16 full + fused-conv")
    nodrop = dataclasses.replace(base, dropout=0.0, top_dropout=0.0)
    train_ms(nodrop, "bf16 no-dropout + fused-conv")
    log(f"total {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
