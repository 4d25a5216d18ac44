#!/usr/bin/env python
"""Translation-family (torch-path) convergence gate on the HARD corpus.

VERDICT r4 missing #1: the encoder-decoder family (reference
integration.py:633-963 — AdamW/OneCycle trainer, confidence head, AR
validation at :799-868) had every component built and unit-tested but no
recorded training run. This script trains ``ASLTranslationModel`` (RoPE
Squeezeformer encoder -> causal decoder + confidence head, dim=208 — the
4x52 reference feature geometry) with the reference recipe shape on
``HardSyntheticASLFR`` phrases through the ``Seq2SeqTokenizer``
(pad=0/sos=1/eos=2), records the val normalized-Levenshtein curve, exports
the bundle, and scores it through the TranslationEngine serving path.

The trained bundle is the prerequisite for the real-EOS latency measurement
(scripts/measure_translation_latency.py): with random weights the decode
loop never emits EOS, so every previous "typical phrase" number was a
step-cap simulation.

    python examples/train_translation_hard.py --epochs 40 --sequences 8192
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--sequences", type=int, default=8192)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--workdir", default="runs/hard_translation")
    ap.add_argument("--confusability", type=float, default=0.6)
    ap.add_argument("--hand-nan", type=float, default=0.15)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-raw-frames", type=int, default=384)
    ap.add_argument("--val-sequences", type=int, default=512)
    ap.add_argument("--dim", type=int, default=208)
    ap.add_argument("--frame-len", type=int, default=176)
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint in --workdir and "
                         "continue (exact mid-epoch resume; Trainer.resume)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/ishara_jax_cache_tpu"
                      if jax.default_backend() != "cpu"
                      else "/tmp/ishara_jax_cache")

    from ishara_tpu.config import EncoderConfig, IsharaConfig, TrainConfig
    from ishara_tpu.data.synthetic import HardSyntheticASLFR
    from ishara_tpu.data.tokenizer import Seq2SeqTokenizer
    from ishara_tpu.evaluation.harness import run_harness
    from ishara_tpu.serve.export import export_model, load_engine
    from ishara_tpu.train.trainer import Trainer

    # reference geometry: 4 x FeatureExtractor(52) = 208 features, 2 RoPE
    # Squeezeformer layers, 2 decoder layers, 8 heads (integration.py:280-394);
    # recipe: AdamW + OneCycle peak 1e-3, grad clip 1.0 (integration.py:692-700)
    cfg = IsharaConfig(
        task="translation",
        model=EncoderConfig(dim=args.dim, num_heads=8,
                            frame_len=args.frame_len,
                            dropout=args.dropout, num_classes=62),
        train=TrainConfig(
            batch_size=args.batch_size,
            num_epochs=args.epochs,
            warmup_epochs=max(1, args.epochs // 10),
            lr_max=args.lr,
            optimizer="adamw",
            validate_every_epochs=max(2, args.epochs // 10),
            aug_prob=0.2,
        ),
    )

    common = dict(confusability=args.confusability, hand_nan=args.hand_nan,
                  proto_seed=7)
    train_ds = HardSyntheticASLFR(num_sequences=args.sequences, seed=0,
                                  **common)
    val_ds = HardSyntheticASLFR(num_sequences=args.val_sequences, seed=1,
                                **common)

    t0 = time.time()
    tok = Seq2SeqTokenizer()
    trainer = Trainer(cfg, train_ds, val_ds, tok,
                      workdir=args.workdir,
                      max_raw_frames=args.max_raw_frames,
                      task="translation")
    if args.resume and trainer.resume():
        print(f"resumed from step {int(trainer.state.step)}", flush=True)
    history = trainer.train()
    print("final:", json.dumps(history[-1]), flush=True)
    print(f"train wall: {time.time() - t0:.0f}s", flush=True)

    bundle = Path(args.workdir) / "bundle"
    export_model(bundle, cfg,
                 {"params": trainer.state.params,
                  "batch_stats": trainer.state.batch_stats},
                 stats=trainer.stats, half_precision=False)
    engine = load_engine(bundle, max_raw_frames=args.max_raw_frames,
                         early_exit=True)
    result = run_harness(engine, val_ds, tok,
                         num_sequences=args.val_sequences, translation=True)
    print("harness:", json.dumps(result.as_dict()), flush=True)
    for p, t in result.examples[:8]:
        print(f"  pred={p!r} target={t!r}")


if __name__ == "__main__":
    main()
