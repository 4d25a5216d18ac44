#!/usr/bin/env python
"""Real-EOS translation serving latency from a TRAINED bundle (VERDICT r4 #2).

Every previous "typical phrase" translation latency was a step-cap
simulation: random-init weights never emit EOS, so the early-exit loop was
capped at 18 steps to model an 18-token phrase. With a trained bundle
(examples/train_translation_hard.py) the decode loop emits genuine EOS, so
this script measures the actual per-sequence latency DISTRIBUTION over the
validation phrase mix — p50/p99 with real early exits — for both the XLA
early-exit while_loop and the whole-loop fused Pallas kernel
(ops/decoder_kernel.py), plus the fixed-64 ceiling for reference.

Methodology: per-sequence chained-slope timing (the bench.py discipline —
this chip sits behind a tunnel where block_until_ready lies, so each
latency is the slope between two in-program repetition counts chained
through a value that depends on the decoded tokens). One compile per path;
the raw sequence is an ARGUMENT of the compiled loop so all N sequences
share it.

    python scripts/measure_translation_latency.py runs/hard_translation/bundle
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def per_seq_slope(program, variables, max_raw_frames, lo=8, hi=40, reps=3):
    """Compile chained lo/hi loops of ``program(variables, raw, len)`` with
    (raw, len) as arguments; returns measure(raw, len) -> ms."""
    import jax
    import jax.numpy as jnp

    from ishara_tpu.data import landmarks as lm

    def make(K):
        def run(raw, length):
            def body(carry, _):
                out = program(variables, raw + carry * 1e-12, length)
                s = (jnp.sum(out[0]) + jnp.sum(out[1])).astype(jnp.float32)
                return carry + s, None

            return jax.lax.scan(body, jnp.float32(0), None, length=K)[0]

        shape = jax.ShapeDtypeStruct((max_raw_frames, lm.N_COLS), jnp.float32)
        lshape = jax.ShapeDtypeStruct((), jnp.int32)
        return jax.jit(run).lower(shape, lshape).compile()

    c_lo, c_hi = make(lo), make(hi)

    def measure(raw, length):
        float(c_lo(raw, length)), float(c_hi(raw, length))  # warm this input
        diffs = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(c_lo(raw, length))
            t1 = time.perf_counter(); float(c_hi(raw, length))
            t2 = time.perf_counter()
            diffs.append((t2 - t1) - (t1 - t0))
        return float(np.median(diffs)) / (hi - lo) * 1e3

    return measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bundle")
    ap.add_argument("--num-sequences", type=int, default=32)
    ap.add_argument("--val-sequences", type=int, default=512)
    ap.add_argument("--confusability", type=float, default=0.6)
    ap.add_argument("--hand-nan", type=float, default=0.15)
    ap.add_argument("--max-raw-frames", type=int, default=384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/ishara_jax_cache_tpu"
                      if jax.default_backend() != "cpu"
                      else "/tmp/ishara_jax_cache")

    from ishara_tpu.data import landmarks as lm
    from ishara_tpu.data.synthetic import HardSyntheticASLFR
    from ishara_tpu.data.tokenizer import Seq2SeqTokenizer
    from ishara_tpu.serve.export import load_engine

    tok = Seq2SeqTokenizer()
    val_ds = HardSyntheticASLFR(num_sequences=args.val_sequences, seed=1,
                                confusability=args.confusability,
                                hand_nan=args.hand_nan, proto_seed=7)

    # evenly-spaced sample of the val set (phrase lengths vary with index)
    idx = np.linspace(0, args.val_sequences - 1,
                      args.num_sequences).astype(int)
    raws, lens, phrases = [], [], []
    for i in idx:
        x, phrase = val_ds.render(int(i))
        buf = np.zeros((args.max_raw_frames, lm.N_COLS), np.float32)
        n = min(len(x), args.max_raw_frames)
        buf[:n] = x[:n]
        raws.append(jnp.asarray(buf))
        lens.append(jnp.int32(max(n, 1)))
        phrases.append(phrase)

    paths = {
        "xla_early_exit": dict(early_exit=True),
        "xla_fixed64": dict(early_exit=False),
        "fused_kernel": dict(fused=True),
    }
    results = {}
    decoded_lengths = None
    for name, kw in paths.items():
        t0 = time.time()
        engine = load_engine(args.bundle,
                             max_raw_frames=args.max_raw_frames, **kw)
        print(f"compile[{name}]: {time.time() - t0:.1f}s", flush=True)
        measure = per_seq_slope(engine.program_fn(), engine.variables,
                                args.max_raw_frames)
        lat, dec_lens = [], []
        for raw, length, phrase in zip(raws, lens, phrases):
            ms = measure(raw, length)
            toks, _conf = engine(np.asarray(raw))
            dec = tok.decode(toks)
            lat.append(ms)
            dec_lens.append(len(dec))
            print(f"  [{name}] len(target)={len(phrase):2d} "
                  f"len(pred)={len(dec):2d} {ms:7.3f} ms", flush=True)
        results[name] = {
            "p50_ms": round(float(np.percentile(lat, 50)), 4),
            "p99_ms": round(float(np.percentile(lat, 99)), 4),
            "mean_ms": round(float(np.mean(lat)), 4),
            "mean_decoded_len": round(float(np.mean(dec_lens)), 1),
        }
        decoded_lengths = dec_lens

    # sanity: genuine EOS — decoded lengths must be far below max_out-1 (63)
    print("\ndecoded length stats (fused path):",
          f"mean={np.mean(decoded_lengths):.1f}",
          f"max={np.max(decoded_lengths)}")
    print(json.dumps({"real_eos_latency": results,
                      "num_sequences": args.num_sequences}), flush=True)


if __name__ == "__main__":
    main()
