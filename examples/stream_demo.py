#!/usr/bin/env python
"""Live-captioning demo: chunked streaming inference over a causal encoder.

Trains a small causal hybrid model on the synthetic corpus for a few
epochs, then replays a held-out sequence through ``serve.StreamingEncoder``
chunk by chunk, printing the caption as it grows — each frame is processed
exactly once (per-block K/V caches + conv tails + running SE state), unlike
a sliding-window client that recomputes the window per update.

Run: ``python examples/stream_demo.py [--epochs 30] [--chunk 8]``
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--sequences", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--attn-context", type=int, default=176)
    args = ap.parse_args()

    import jax

    from ishara_tpu.config import baseline_config
    from ishara_tpu.data.synthetic import SyntheticASLFR
    from ishara_tpu.data.tokenizer import CTCTokenizer
    from ishara_tpu.preprocess import GroupStats
    from ishara_tpu.serve import StreamingEncoder
    from ishara_tpu.train.trainer import Trainer

    cfg = baseline_config(5)
    cfg.model = dataclasses.replace(
        cfg.model, dim=128, num_squeeze_blocks=2, num_conform_blocks=2,
        dropout=0.1, top_dropout=0.1, causal=True,
        attn_context=args.attn_context)
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=64, num_epochs=args.epochs, warmup_epochs=2,
        validate_every_epochs=max(args.epochs // 2, 1),
        checkpoint_every_epochs=10 ** 6)

    tok = CTCTokenizer()
    train = SyntheticASLFR(num_sequences=args.sequences, seed=0, proto_seed=7)
    val = SyntheticASLFR(num_sequences=64, seed=99, proto_seed=7)
    tr = Trainer(cfg, train, val, tok, workdir="runs/stream_demo")
    print(f"training causal model ({args.epochs} epochs)...", flush=True)
    tr.train()

    eng = StreamingEncoder(cfg.model,
                           {"params": tr.state.params,
                            "batch_stats": tr.state.batch_stats},
                           GroupStats.identity(), chunk_size=args.chunk)

    raw, phrase = val.render(0)
    T = (len(raw) // args.chunk) * args.chunk
    state = eng.init_state()
    caption: list[int] = []
    print(f"\nstreaming {T} frames in chunks of {args.chunk} "
          f"(target: {phrase!r})")
    for i in range(0, T, args.chunk):
        t0 = time.perf_counter()
        state, ids, n, _ = eng.step(state, raw[i:i + args.chunk])
        dt = (time.perf_counter() - t0) * 1e3
        caption.extend(StreamingEncoder.collect([ids]))
        sys.stdout.write(f"\r  frame {i + args.chunk:4d}  "
                         f"[{dt:6.1f} ms/chunk]  "
                         f"caption: {eng.decode_text(caption)!r:40s}")
        sys.stdout.flush()
    print(f"\nfinal: {eng.decode_text(caption)!r}  target: {phrase!r}")


if __name__ == "__main__":
    main()
