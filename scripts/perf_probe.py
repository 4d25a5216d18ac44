#!/usr/bin/env python
"""On-chip component breakdown for the round-2 perf work (VERDICT #2).

Measures, with the verified slope methodology (carry-chained in-program
repetition, value fetches — see bench.py / RESULTS.md):

  1. encoder fwd (eval mode) at batch 64, f32 and bf16   [VERDICT target]
  2. fused train step at batch 256 bf16: full / no-dropout / rbg-PRNG
  3. round-3 stage ablation: preprocess / CTC / fwd / bwd / optimizer
  4. round-3 module ablation: dw-conv width, FFN width, block type/count

Run on the real chip: ``python scripts/perf_probe.py [sections]`` where
``sections`` is e.g. ``34`` to run only sections 3 and 4 (default: all).
"""

import dataclasses
import os
import sys
import time

import numpy as np

# runnable as `python scripts/perf_probe.py` from the repo root (never via
# PYTHONPATH — that breaks the axon PJRT registration, CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# comma/space-separated section numbers. A part that is itself a section
# number in [1, 19] selects that section ("10" = section ten, not {1, 0});
# longer digit runs keep the legacy per-digit meaning ("34" = {3, 4}).
def _parse_sections(argv):
    out = set()
    for a in argv:
        for part in a.replace(",", " ").split():
            if not part.isdigit():
                continue
            if 1 <= int(part) <= 19:
                out.add(int(part))
            else:
                out.update(int(c) for c in part)
    return out


SECTIONS = _parse_sections(sys.argv[1:]) or {1, 2, 3, 4}
# section 5: dropout-kernel micro-bench (bandwidth vs launch attribution)
# section 6: dropout-site-class ablation (round 4: which class costs the
#            full-vs-no-dropout gap)
# section 7: batch-512 scaling point


def log(*a):
    print(*a, flush=True)


def slope(make_loop, lo, hi, n=5):
    """Median of paired (hi - lo) wall times: interleaving the two loop
    lengths cancels tunnel-RT drift that two separately-timed blocks let
    masquerade as on-chip time (see bench.py slope_measure)."""
    f_lo, f_hi = make_loop(lo), make_loop(hi)
    f_lo(), f_hi()  # warm
    diffs = []
    for _ in range(n):
        t0 = time.perf_counter()
        f_lo()
        t1 = time.perf_counter()
        f_hi()
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    return float(np.median(diffs)) / (hi - lo)


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

    for dtype in ("float32", "bfloat16") if 1 in SECTIONS else ():
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
    if 2 in SECTIONS:
        train_ms(base, "bf16 full")
        nodrop = dataclasses.replace(base, dropout=0.0, top_dropout=0.0)
        train_ms(nodrop, "bf16 no-dropout")
        train_ms(base, "bf16 full rbg-prng", prng_impl="rbg")
        train_ms(dataclasses.replace(base, use_flash=True), "bf16 flash-attn")
        train_ms(dataclasses.replace(base, remat=True), "bf16 remat")

    # ---------------- 3. round-3 ablation: where do the 75 ms go? --------
    # Same batch/config as section 2; each probe removes one pipeline stage
    # from the SAME no-dropout step so the deltas attribute the time
    # (dropout-free floor per VERDICT r2 #4; dropout cost is known ~3 ms).
    from ishara_tpu.ops.ctc import ctc_loss
    from ishara_tpu.preprocess.augment import augment
    from ishara_tpu.preprocess.pipeline import preprocess
    import optax

    cfg = dataclasses.replace(base, dropout=0.0, top_dropout=0.0)
    model = IsharaEncoder(cfg)
    sample = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
    state0 = TrainState.create(model, tx, sample)
    rng = jax.random.key(0)

    def prep_batch(aug=True):
        def prep(key, raw, length):
            if aug:
                raw, length = augment(key, raw, length, prob=0.2)
            return preprocess(raw, length, GroupStats.identity(),
                              cfg.frame_len)
        keys = jax.random.split(rng, B)
        return jax.vmap(prep)(keys, jb["raw"], jb["lengths"])

    x_pre = jax.jit(lambda: prep_batch(aug=False))()

    def probe(label, fn, lo=2, hi=10, state=None, section=3):
        if section not in SECTIONS:
            return None
        st = state0 if state is None else state
        def loop(K):
            def body(s, _):
                s2, out = fn(s)
                return s2, out
            compiled = jax.jit(
                lambda s: jnp.sum(jax.lax.scan(body, s, None, length=K)[1])
            ).lower(st).compile()
            return lambda: float(compiled(st))
        ms = slope(loop, lo, hi, n=3) * 1e3
        log(f"probe [{label}]: {ms:.1f} ms ({B / ms * 1e3:.0f} seqs/s)")
        return ms

    def fwd_bwd(loss_of_logits, x):
        def fn(s):
            def loss_fn(params):
                logits, updates = s.apply_fn(
                    {"params": params, "batch_stats": s.batch_stats},
                    x, training=True, mutable=["batch_stats"])
                return loss_of_logits(logits), updates["batch_stats"]
            (loss, nbs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(s.params)
            from ishara_tpu.train.state import _finish_step
            s2, m = _finish_step(s, loss, grads, nbs)
            return s2, m["loss"]
        return fn

    ctc = lambda lg: ctc_loss(lg, jb["labels"], blank_id=cfg.blank_id)  # noqa: E731
    sq = lambda lg: jnp.mean(jnp.square(lg.astype(jnp.float32)))  # noqa: E731

    # full chain (aug+preprocess+fwd+ctc+bwd+update), = section-2 no-dropout
    def full(s):
        x = prep_batch(aug=True)
        return fwd_bwd(ctc, x)(s)
    probe("full no-dropout", full)
    # drop aug+preprocess (pre-preprocessed input)
    probe("no-preprocess", fwd_bwd(ctc, x_pre))
    # swap CTC for a trivial loss (isolates CTC fwd+bwd)
    probe("no-preprocess, mse-loss", fwd_bwd(sq, x_pre))

    # forward only (no grad, no update); the carry MUST feed the model
    # input or XLA hoists the whole forward out of the scan (the round-3
    # first cut measured 1.4 ms that way — garbage)
    def fwd_only(s):
        x = x_pre + s.step.astype(jnp.float32) * 1e-12
        logits = s.apply_fn(
            {"params": s.params, "batch_stats": s.batch_stats},
            x, training=False)
        return s.replace(step=s.step + 1), \
            jnp.mean(jnp.square(logits.astype(jnp.float32)))
    probe("fwd only (eval mode)", fwd_only)

    # training-mode forward only (stores/extra BN work, no grads)
    def fwd_train(s):
        x = x_pre + s.step.astype(jnp.float32) * 1e-12
        logits, _ = s.apply_fn(
            {"params": s.params, "batch_stats": s.batch_stats},
            x, training=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        return s.replace(step=s.step + 1), \
            jnp.mean(jnp.square(logits.astype(jnp.float32)))
    probe("fwd only (train mode, no-dropout cfg)", fwd_train)

    # optimizer/update only: grads = params-shaped ones
    ones = jax.tree_util.tree_map(jnp.ones_like, state0.params)

    def opt_only(s):
        from ishara_tpu.train.state import _finish_step
        s2, m = _finish_step(s, jnp.float32(1.0), ones, s.batch_stats)
        return s2, m["loss"]
    probe("optimizer update only", opt_only, lo=8, hi=40)

    # CTC alone, fwd+bwd wrt logits
    lg0 = jnp.zeros((B, cfg.frame_len, 60), jnp.float32)

    def ctc_only(s):
        v, g = jax.value_and_grad(
            lambda lg: ctc(lg + s.step.astype(jnp.float32) * 1e-12))(lg0)
        return s.replace(step=s.step + 1), v + jnp.sum(g[0, 0])
    probe("ctc loss fwd+bwd only", ctc_only, lo=8, hi=40)

    # flash-attention kernel in the dropout-free fwd+bwd: the einsum path
    # materializes [B, H, T, T] probabilities to HBM for the backward pass
    # (x8 blocks); the Pallas kernel recomputes them blockwise
    cfg_f = dataclasses.replace(cfg, use_flash=True)
    model_f = IsharaEncoder(cfg_f)
    state_f = TrainState.create(model_f, tx, sample)
    probe("no-preprocess, flash-attn", fwd_bwd(ctc, x_pre), state=state_f)
    probe("no-preprocess, mse-loss, flash-attn", fwd_bwd(sq, x_pre),
          state=state_f)

    # ---------------- 4. module ablation: where does the bwd go? --------
    # All probes are the SAME dropout-free fwd+bwd+update with mse loss
    # (model time only, no CTC/preprocess), one architecture knob turned per
    # row, so deltas vs "baseline 4+4" attribute time to a module. Training
    # mode auto-selects the flash attention kernel after round 3.
    def ablate(label, **repl):
        cfg_a = dataclasses.replace(cfg, **repl)
        model_a = IsharaEncoder(cfg_a)
        st = TrainState.create(model_a, tx, sample)
        probe(f"ablate {label}", fwd_bwd(sq, x_pre), state=st, section=4)

    # ---------------- 5. dropout kernel micro-bench ----------------
    # Where do the ~13 ms of dropout go? Time the kernels standalone at the
    # two real site geometries (FFN hidden [256,176,512], residual
    # [256,176,256]) and compare against the HBM round-trip bound.
    if 5 in SECTIONS:
        from ishara_tpu.ops.dropout import tpu_dropout, tpu_dropout_add

        seed = jnp.asarray([1234], jnp.int32)
        for shape in [(256, 176, 512), (256, 176, 256)]:
            xb = jnp.ones(shape, jnp.bfloat16)

            def drop_loop(K, xb=xb):
                def body(c, _):
                    return tpu_dropout(c, seed, 0.2), None
                compiled = jax.jit(
                    lambda x0: jnp.sum(
                        jax.lax.scan(body, x0, None, length=K)[0]
                        .astype(jnp.float32))
                ).lower(xb).compile()
                return lambda: float(compiled(xb))

            ms = slope(drop_loop, 8, 40) * 1e3
            gb = 2 * xb.size * 2 / 1e9
            log(f"probe [tpu_dropout {shape}]: {ms:.3f} ms "
                f"({gb / (ms / 1e3):.0f} GB/s eff; r+w bound "
                f"{gb / 0.819:.3f} ms)")

            def dropadd_loop(K, xb=xb):
                def body(c, _):
                    return tpu_dropout_add(c, xb, seed, 0.2), None
                compiled = jax.jit(
                    lambda x0: jnp.sum(
                        jax.lax.scan(body, x0, None, length=K)[0]
                        .astype(jnp.float32))
                ).lower(xb).compile()
                return lambda: float(compiled(xb))

            ms = slope(dropadd_loop, 8, 40) * 1e3
            gb = 3 * xb.size * 2 / 1e9
            log(f"probe [tpu_dropout_add {shape}]: {ms:.3f} ms "
                f"({gb / (ms / 1e3):.0f} GB/s eff; bound "
                f"{gb / 0.819:.3f} ms)")

    ablate("baseline 4+4")
    ablate("dw-conv k=3 (vs 15)", transformer_kernel_size=3)
    ablate("ffn expansion=1 (vs 2)", expansion_factor=1)
    ablate("blocks 2+2 (vs 4+4)", num_squeeze_blocks=2, num_conform_blocks=2)
    ablate("dim=128 (vs 256)", dim=128)
    ablate("8x squeezeformer", variant="squeezeformer", num_squeeze_blocks=8)
    ablate("8x conformer", variant="conformer", num_conform_blocks=8)

    # ---------------- 6. dropout-site-class ablation (round 4) ----------
    # Attribute the full-vs-no-dropout step gap to individual dropout site
    # classes. Each probe disables ONE class via flax method interception —
    # trace-time only, zero production-code changes — on the full-dropout
    # bf16 flagship step, so (full − probe) is that class's cost.
    if 6 in SECTIONS:
        import flax.linen as fnn
        from ishara_tpu.ops import ffn_kernel as FK

        def skip_call(cls_name, replace):
            def interceptor(next_fun, args, kwargs, context):
                if (type(context.module).__name__ == cls_name
                        and context.method_name == "__call__"):
                    return replace(*args, **kwargs)
                return next_fun(*args, **kwargs)
            return interceptor

        def attn_det(next_fun, args, kwargs, context):
            if (type(context.module).__name__ == "MultiHeadSelfAttention"
                    and context.method_name == "__call__"):
                kwargs = dict(kwargs)
                kwargs["deterministic"] = True
            return next_fun(*args, **kwargs)

        full_ms = train_ms(base, "bf16 full (s6 baseline)")
        with fnn.intercept_methods(skip_call(
                "RowDropout", lambda x, deterministic=True: x)):
            train_ms(base, "bf16, RowDropout class off (24+1 sites)")
        with fnn.intercept_methods(skip_call(
                "FastDropout", lambda x, deterministic=True: x)):
            train_ms(base, "bf16, FastDropout class off")
        with fnn.intercept_methods(skip_call(
                "FastDropoutAdd",
                lambda res, h, deterministic=True: res + h)):
            train_ms(base, "bf16, post-MHSA dropout-add off (4 sites)")
        with fnn.intercept_methods(attn_det):
            train_ms(base, "bf16, attention deterministic (8 sites)")

        # FusedFFN kernel vs plain XLA compositions, everything else equal:
        # swap the kernel entrypoint for (a) an XLA dropout composition and
        # (b) the dropout-free matmul chain (isolates the pure matmul-
        # scheduling gap the kernel pays to beat the masks).
        def xla_ffn_dropout(x, res, w1, b1, w2, b2, seeds, p, res_p,
                            interpret=False):
            key = jax.random.fold_in(jax.random.key(0), seeds[0])
            h = jax.nn.swish(x @ w1 + b1)
            if p > 0:
                keep = jax.random.bernoulli(key, 1.0 - p, h.shape)
                h = h * keep.astype(h.dtype) / (1.0 - p)
            h = h @ w2 + b2
            if res_p > 0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(key, 1), 1.0 - res_p, h.shape)
                h = h * keep.astype(h.dtype) / (1.0 - res_p)
            return (res + h).astype(x.dtype)

        def xla_ffn_nodrop(x, res, w1, b1, w2, b2, seeds, p, res_p,
                           interpret=False):
            h = jax.nn.swish(x @ w1 + b1.astype(x.dtype))
            return res + (h @ w2 + b2.astype(x.dtype))

        real = FK.ffn_residual
        try:
            FK.ffn_residual = xla_ffn_dropout
            train_ms(base, "bf16, FusedFFN -> XLA dropout composition")
            FK.ffn_residual = xla_ffn_nodrop
            train_ms(base, "bf16, FusedFFN -> XLA matmuls, masks dropped")
        finally:
            FK.ffn_residual = real

        nodrop_cfg = dataclasses.replace(base, dropout=0.0, top_dropout=0.0)
        train_ms(nodrop_cfg, "bf16 no-dropout (s6 floor repro)")
        del full_ms

    # ---------------- 8. the missing ~9 ms: combined ablation -----------
    # Section 6 found the site-class deltas (row 0.4 + fast 0.6 + dropadd
    # 1.7 + FFN-sites-free 0.5) sum to ~3 ms of the 11.9 ms full-vs-floor
    # gap. The two hypotheses left: (a) the in-kernel PRNG dropout inside
    # the flash attention bwd (8 sites, rate 0.4 on the flagship), (b)
    # cross-site scheduling interactions that single-class ablations hide.
    if 8 in SECTIONS:
        import flax.linen as fnn
        from ishara_tpu.ops import ffn_kernel as FK
        from ishara_tpu.ops.attention import flash_mhsa

        def skip_call8(cls_names, replace):
            def interceptor(next_fun, args, kwargs, context):
                if (type(context.module).__name__ in cls_names
                        and context.method_name == "__call__"):
                    return replace[type(context.module).__name__](
                        *args, **kwargs)
                return next_fun(*args, **kwargs)
            return interceptor

        repl = {
            "RowDropout": lambda x, deterministic=True: x,
            "FastDropout": lambda x, deterministic=True: x,
            "FastDropoutAdd": lambda res, h, deterministic=True: res + h,
        }

        def xla_ffn_nodrop8(x, res, w1, b1, w2, b2, seeds, p, res_p,
                            interpret=False):
            h = jax.nn.swish(x @ w1 + b1.astype(x.dtype))
            return res + (h @ w2 + b2.astype(x.dtype))

        real = FK.ffn_residual
        try:
            FK.ffn_residual = xla_ffn_nodrop8
            with fnn.intercept_methods(
                    skip_call8(set(repl), repl)):
                train_ms(base, "bf16, ALL classes off except attn dropout")
        finally:
            FK.ffn_residual = real

        # flash attention fwd+bwd microbench: dropout 0.4 vs 0.0 at the
        # flagship site geometry [256, 8, 176, 32] — x8 sites in the step
        rngm = np.random.default_rng(0)
        qkv8 = jnp.asarray(
            rngm.standard_normal((3, 256, 8, 176, 32)), jnp.bfloat16)
        bias8 = jnp.zeros((256, 176), jnp.float32)
        seed8 = jnp.asarray([17], jnp.int32)

        for rate in (0.4, 0.0):
            def floss(q0, rate=rate):
                return jnp.sum(flash_mhsa(
                    q0, qkv8[1], qkv8[2], bias8, seed8,
                    scale=256 ** -0.5, dropout_rate=rate)
                    .astype(jnp.float32))

            fgrad = jax.grad(floss)

            def fmake(K):
                def body(c, _):
                    g = fgrad(qkv8[0] + c.astype(jnp.bfloat16))
                    return jnp.sum(g.astype(jnp.float32)) * 1e-20, None
                compiled = jax.jit(
                    lambda: jax.lax.scan(body, jnp.float32(0), None,
                                         length=K)[0]
                ).lower().compile()
                return lambda: float(compiled())

            ms = slope(fmake, 3, 9, n=3) * 1e3
            log(f"probe [flash fwd+bwd rate={rate}]: {ms:.3f} ms "
                f"(x8 sites = {8 * ms:.1f} ms/step)")

    # ---------------- 9. seed-plumbing isolation (round 4) --------------
    # Section 8: combined-off = 62.5 vs floor 56.2, while the in-kernel
    # flash dropout micro-delta is only ~1.5 ms — so ~4.8 ms rides with the
    # per-site seed derivations (jax.random.randint(make_rng(...))) or
    # scheduling interactions. Isolate: (9a) combined-off + flash forced
    # rate-0 + randint stubbed to a constant (keeps flax fold_ins only);
    # (9b) combined-off + randint stubbed (in-kernel attn dropout kept).
    if 9 in SECTIONS:
        import flax.linen as fnn
        from ishara_tpu.ops import attention as ATT
        from ishara_tpu.ops import ffn_kernel as FK

        repl9 = {
            "RowDropout": lambda x, deterministic=True: x,
            "FastDropout": lambda x, deterministic=True: x,
            "FastDropoutAdd": lambda res, h, deterministic=True: res + h,
        }

        def skip9(next_fun, args, kwargs, context):
            name = type(context.module).__name__
            if name in repl9 and context.method_name == "__call__":
                return repl9[name](*args, **kwargs)
            return next_fun(*args, **kwargs)

        def xla_ffn_nodrop9(x, res, w1, b1, w2, b2, seeds, p, res_p,
                            interpret=False):
            h = jax.nn.swish(x @ w1 + b1.astype(x.dtype))
            return res + (h @ w2 + b2.astype(x.dtype))

        from ishara_tpu.ops import dropout as DR

        real_ffn = FK.ffn_residual
        real_flash = ATT.flash_mhsa
        real_seeds = DR.site_seeds

        def stub_seeds(key, n=1):
            return jnp.zeros((n,), jnp.int32)

        def flash_rate0(q, k, v, bias, seed=None, scale=1.0,
                        interpret=False, dropout_rate=0.0):
            return real_flash(q, k, v, bias, None, scale=scale,
                              interpret=interpret, dropout_rate=0.0)

        try:
            FK.ffn_residual = xla_ffn_nodrop9
            DR.site_seeds = stub_seeds
            ATT.flash_mhsa = flash_rate0
            with fnn.intercept_methods(skip9):
                train_ms(base, "bf16 9a: all off + flash rate0 + "
                               "site_seeds stubbed (fold_ins only)")
            ATT.flash_mhsa = real_flash
            with fnn.intercept_methods(skip9):
                train_ms(base, "bf16 9b: all off + site_seeds stubbed "
                               "(attn in-kernel dropout kept)")
        finally:
            FK.ffn_residual = real_ffn
            ATT.flash_mhsa = real_flash
            DR.site_seeds = real_seeds

    # ---------------- 10. paired attribution (round 4) ------------------
    # Sections 6/8/9 ran across ~1 h and the numbers drifted (9a measured
    # 60.6 then 72.1 for the same program class). Per-row comparisons are
    # only valid back-to-back in ONE process: re-measure the four key rows
    # paired — full, floor, everything-off (corrected bf16 stub), and
    # FusedFFN->XLA-nodrop — interleaved twice so drift shows up as
    # disagreement between the repeats.
    if 10 in SECTIONS:
        import flax.linen as fnn
        from ishara_tpu.ops import attention as ATT
        from ishara_tpu.ops import ffn_kernel as FK

        repl10 = {
            "RowDropout": lambda x, deterministic=True: x,
            "FastDropout": lambda x, deterministic=True: x,
            "FastDropoutAdd": lambda res, h, deterministic=True: res + h,
        }

        def skip10(next_fun, args, kwargs, context):
            name = type(context.module).__name__
            if name in repl10 and context.method_name == "__call__":
                return repl10[name](*args, **kwargs)
            return next_fun(*args, **kwargs)

        def xla_ffn_nodrop10(x, res, w1, b1, w2, b2, seeds, p, res_p,
                             interpret=False):
            h = jax.nn.swish(x @ w1 + b1.astype(x.dtype))
            return res + (h @ w2 + b2.astype(x.dtype))

        from ishara_tpu.ops import dropout as DR10

        real_ffn = FK.ffn_residual
        real_flash = ATT.flash_mhsa
        real_seeds10 = DR10.site_seeds

        def stub_seeds10(key, n=1):
            return jnp.zeros((n,), jnp.int32)

        def flash_rate0_10(q, k, v, bias, seed=None, scale=1.0,
                           interpret=False, dropout_rate=0.0):
            return real_flash(q, k, v, bias, None, scale=scale,
                              interpret=interpret, dropout_rate=0.0)

        nodrop10 = dataclasses.replace(base, dropout=0.0, top_dropout=0.0)

        def row_full():
            return train_ms(base, "s10 full")

        def row_floor():
            return train_ms(nodrop10, "s10 no-dropout floor")

        def row_alloff():
            try:
                FK.ffn_residual = xla_ffn_nodrop10
                DR10.site_seeds = stub_seeds10
                ATT.flash_mhsa = flash_rate0_10
                with fnn.intercept_methods(skip10):
                    return train_ms(base, "s10 all-off (bf16 stub)")
            finally:
                FK.ffn_residual = real_ffn
                ATT.flash_mhsa = real_flash
                DR10.site_seeds = real_seeds10

        def row_ffn_swap():
            try:
                FK.ffn_residual = xla_ffn_nodrop10
                return train_ms(base, "s10 FusedFFN->XLA-nodrop (bf16)")
            finally:
                FK.ffn_residual = real_ffn

        for rep in (1, 2):
            log(f"--- s10 repeat {rep} ---")
            row_full()
            row_floor()
            row_alloff()
            row_ffn_swap()

    # ---------------- 11. seed-derivation swap (round 4) ----------------
    # Measures the site_seeds change directly: the full step with the new
    # key_data-reinterpret derivation (product code) vs the old
    # jax.random.randint(make_rng(...)) derivation, paired with the
    # no-dropout floor. Interleaved twice (drift guard, like s10).
    if 11 in SECTIONS:
        from ishara_tpu.ops import dropout as DR11

        real_seeds11 = DR11.site_seeds

        def randint_seeds(key, n=1):
            return jax.random.randint(key, (n,), 0, 2 ** 31 - 1, jnp.int32)

        nodrop11 = dataclasses.replace(base, dropout=0.0, top_dropout=0.0)
        for rep in (1, 2):
            log(f"--- s11 repeat {rep} ---")
            train_ms(base, "s11 full, key_data site seeds (new)")
            try:
                DR11.site_seeds = randint_seeds
                train_ms(base, "s11 full, randint site seeds (old)")
            finally:
                DR11.site_seeds = real_seeds11
            train_ms(nodrop11, "s11 no-dropout floor")

    # ---------------- 7. batch-512 scaling point (round 4) --------------
    if 7 in SECTIONS:
        B2 = 512
        ds2 = SyntheticASLFR(num_sequences=B2, seed=3)
        batch2 = ds2.batch(range(B2), tok, max_frames=96)
        jb2 = {"raw": jnp.asarray(batch2["raw"]),
               "lengths": jnp.asarray(batch2["lengths"]),
               "labels": jnp.asarray(batch2["labels"])}

        def train_ms_b(cfg, label, jbx, Bx):
            model = IsharaEncoder(cfg)
            sample = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
            state0 = TrainState.create(model, tx, sample)
            step = make_fused_ctc_train_step(
                GroupStats.identity(), cfg.frame_len, aug_prob=0.2,
                blank_id=cfg.blank_id)
            rng2 = jax.random.key(0)

            def loop(K):
                def body(s, _):
                    s2, m = step(s, jbx, rng2)
                    return s2, m["loss"]
                compiled = jax.jit(
                    lambda s: jnp.sum(
                        jax.lax.scan(body, s, None, length=K)[1])
                ).lower(state0).compile()
                return lambda: float(compiled(state0))

            ms = slope(loop, 2, 10, n=3) * 1e3
            log(f"train step batch{Bx} [{label}]: {ms:.1f} ms "
                f"({Bx / ms * 1e3:.0f} seqs/s)")

        train_ms_b(base, "bf16 full", jb2, B2)


if __name__ == "__main__":
    main()
