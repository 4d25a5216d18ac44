#!/usr/bin/env python
"""Flagship-scale convergence gate on the HARD synthetic corpus.

VERDICT r3 #2: the easy synthetic corpus saturates (val norm-Lev 0.99), so
it cannot catch a regression that would cost 0.02 on real data. This script
trains the preset-4 flagship (hybrid 4+4, dim 256) with the reference
recipe shape — batch 256, 30-epoch exp-warmup + half-cosine lrfn, RAdam +
Lookahead, bf16 — on ``HardSyntheticASLFR`` (dominant-hand-only signal,
confusable handshape clusters, Markov-burst NaNs, handedness skew,
coarticulation; data/synthetic.py), then scores the exported serving bundle
through the eval harness. The recorded score is the regression gate for
kernel/training changes en route to the 0.728 real-data target
(/root/reference/README.md:105).

    python examples/train_hard.py --epochs 30 --sequences 8192

Expect a score meaningfully below 1.0 (the point of the hard corpus); the
paired RESULTS.md table records the reference numbers per difficulty.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--sequences", type=int, default=8192)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--workdir", default="runs/hard_flagship")
    ap.add_argument("--confusability", type=float, default=0.6)
    ap.add_argument("--hand-nan", type=float, default=0.15)
    ap.add_argument("--dropout", type=float, default=0.4)
    ap.add_argument("--lr", type=float, default=4e-3)
    ap.add_argument("--max-raw-frames", type=int, default=384,
                    help="hard phrases run long (up to ~40 chars x ~10 "
                         "frames); 384 keeps truncation <1%%")
    ap.add_argument("--val-sequences", type=int, default=512)
    ap.add_argument("--causal", action="store_true",
                    help="train the causal/streaming flagship "
                         "(attn_context-bounded causal attention, causal "
                         "convs, running SE gate) — the StreamingEncoder-"
                         "servable variant; VERDICT r4 #6")
    ap.add_argument("--attn-context", type=int, default=176)
    ap.add_argument("--skip-export", action="store_true",
                    help="stop after training (difficulty-curve runs only "
                         "need the val score, not 3 exports + harness)")
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint in --workdir and "
                         "continue (exact mid-epoch resume; trainer.resume)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/ishara_jax_cache_tpu"
                      if jax.default_backend() != "cpu"
                      else "/tmp/ishara_jax_cache")

    from ishara_tpu.config import baseline_config
    from ishara_tpu.data.synthetic import HardSyntheticASLFR
    from ishara_tpu.data.tokenizer import CTCTokenizer
    from ishara_tpu.evaluation.harness import run_harness
    from ishara_tpu.serve.export import export_model, load_engine
    from ishara_tpu.train.trainer import Trainer

    cfg = baseline_config(4)           # hybrid 4+4 dim=256 — the 0.728 family
    cfg.model.dropout = args.dropout
    if args.causal:
        cfg.model.causal = True
        cfg.model.attn_context = args.attn_context
    cfg.train.num_epochs = args.epochs
    cfg.train.batch_size = args.batch_size
    cfg.train.warmup_epochs = max(1, args.epochs // 10)
    cfg.train.lr_max = args.lr
    cfg.train.validate_every_epochs = max(2, args.epochs // 10)

    common = dict(confusability=args.confusability, hand_nan=args.hand_nan,
                  proto_seed=7)        # train/val share the handshape table
    train_ds = HardSyntheticASLFR(num_sequences=args.sequences, seed=0,
                                  **common)
    val_ds = HardSyntheticASLFR(num_sequences=args.val_sequences, seed=1,
                                **common)

    t0 = time.time()
    tok = CTCTokenizer()
    trainer = Trainer(cfg, train_ds, val_ds, tok,
                      workdir=args.workdir,
                      max_raw_frames=args.max_raw_frames)
    if args.resume and trainer.resume():
        print(f"resumed from step {trainer.state.step}", flush=True)
    history = trainer.train()
    print("final:", json.dumps(history[-1]), flush=True)
    print(f"train wall: {time.time() - t0:.0f}s", flush=True)
    if args.skip_export:
        return

    # Export the trained model at all three deployment precisions and score
    # each through the serving harness (VERDICT r4 missing #3: the int8
    # "lossless" claim was only ever measured on the saturated easy corpus;
    # the hard corpus is where a quantization gap could actually show).
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    scores = {}
    for name, kw in (("f32", dict(half_precision=False)),
                     ("bf16", dict(half_precision=True)),
                     ("int8", dict(quantize_int8=True))):
        bundle = Path(args.workdir) / ("bundle" if name == "f32"
                                       else f"bundle_{name}")
        export_model(bundle, cfg, variables, stats=trainer.stats, **kw)
        engine = load_engine(bundle, max_raw_frames=args.max_raw_frames)
        result = run_harness(engine, val_ds, tok,
                             num_sequences=args.val_sequences)
        scores[name] = result.score
        print(f"harness[{name}]:", json.dumps(result.as_dict()), flush=True)
        if name == "f32":
            for p, t in result.examples[:8]:
                print(f"  pred={p!r} target={t!r}")
    gap = scores["f32"] - scores["int8"]
    print(f"int8 gap vs f32: {gap:+.4f}"
          + (" (>=0.005 — run the QAT variant)" if gap >= 0.005 else ""),
          flush=True)


if __name__ == "__main__":
    main()
