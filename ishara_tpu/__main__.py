"""Command-line interface: ``python -m ishara_tpu <command>``.

The reference has no CLI layer (SURVEY.md §1: everything is notebook
execution); this provides the standard framework entry points:

  train    train a model (parquet corpus or built-in synthetic)
  eval     run the 1000-sample harness on an export bundle or checkpoint
  export   package a trained run into a deployment bundle
  infer    decode one .npy landmark sequence with a bundle
  bench    the latency/throughput benchmark (same as bench.py)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _load_dataset(args, split="train"):
    if args.data_dir:
        from .data.dataset import ParquetASLFR

        return ParquetASLFR(
            args.data_dir, fold=args.fold,
            split=split, max_sequences=args.max_sequences,
        )
    from .data.synthetic import SyntheticASLFR

    n = args.max_sequences or (512 if split == "train" else 128)
    # splits must share proto_seed (same character->pose language) and
    # differ only in phrase seed
    return SyntheticASLFR(num_sequences=n, seed=0 if split == "train" else 1,
                          proto_seed=7)


def _config(args):
    from .config import IsharaConfig, baseline_config

    if args.config:
        if not Path(args.config).exists():
            raise SystemExit(f"--config not found: {args.config}")
        return IsharaConfig.from_json(args.config)
    if args.preset:
        return baseline_config(args.preset)
    return IsharaConfig()


def cmd_train(args):
    import jax

    from .data.tokenizer import CTCTokenizer
    from .parallel.mesh import make_mesh
    from .train.trainer import Trainer

    cfg = _config(args)
    if args.epochs:
        cfg.train.num_epochs = args.epochs
    if args.batch_size:
        cfg.train.batch_size = args.batch_size
    tok = CTCTokenizer()
    train_ds = _load_dataset(args, "train")
    val_ds = _load_dataset(args, "val")
    mesh = make_mesh() if args.data_parallel and jax.device_count() > 1 else None
    stats = None
    if args.compute_stats:
        from .data.dataset import compute_group_stats

        stats = compute_group_stats(train_ds, num_sequences=500)
    trainer = Trainer(cfg, train_ds, val_ds, tok, stats=stats,
                      workdir=args.workdir, mesh=mesh)
    if args.resume:
        trainer.resume()
    history = trainer.train()
    print(json.dumps(history[-1] if history else {}))


def cmd_export(args):
    from .config import IsharaConfig
    from .models.encoder import build_model
    from .serve.export import export_model
    from .train.checkpoint import CheckpointManager
    from .train.optim import make_optimizer
    from .train.state import TrainState

    import jax
    import jax.numpy as jnp

    cfg = IsharaConfig.from_json(Path(args.workdir) / "config.json") \
        if (Path(args.workdir) / "config.json").exists() else _config(args)
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.train)
    sample = jnp.zeros((1, cfg.model.frame_len, cfg.model.input_dim),
                       jnp.float32)
    state = TrainState.create(model, tx, sample)
    ckpt = CheckpointManager(Path(args.workdir) / "ckpt")
    best = ckpt.best_step()
    if best is not None:
        step = best
        state = ckpt.restore(state, best=True)
    else:
        step = ckpt.latest_step()
        state = ckpt.restore(state, step=step)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = export_model(args.output, cfg, variables,
                       half_precision=not args.full_precision)
    print(f"exported step={step} -> {out}")


def cmd_eval(args):
    from .data.tokenizer import CTCTokenizer
    from .evaluation.harness import run_harness
    from .serve.export import load_engine

    engine = load_engine(args.bundle)
    tok = CTCTokenizer()
    ds = _load_dataset(args, "val")
    result = run_harness(engine, ds, tok, num_sequences=args.num_sequences,
                         apply_filter=args.dominant_hand_filter)
    print(json.dumps(result.as_dict()))


def cmd_infer(args):
    import numpy as np

    from .data.tokenizer import CTCTokenizer
    from .serve.export import load_engine

    engine = load_engine(args.bundle)
    x = np.load(args.input).astype(np.float32)
    print(engine.predict_text(x, CTCTokenizer()))


def cmd_bench(args):
    sys.argv = ["bench.py"] + (["--profile"] if args.profile else [])
    root = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root))
    import bench

    bench.main()


def main(argv=None):
    p = argparse.ArgumentParser(prog="ishara_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--data-dir", default=None,
                        help="ASLFR parquet root (default: synthetic corpus)")
        sp.add_argument("--fold", type=int, default=None)
        sp.add_argument("--max-sequences", type=int, default=None)
        sp.add_argument("--config", default=None, help="IsharaConfig JSON")
        sp.add_argument("--preset", type=int, default=None,
                        help="baseline config preset 1-5")

    sp = sub.add_parser("train")
    common(sp)
    sp.add_argument("--workdir", default="runs/default")
    sp.add_argument("--epochs", type=int, default=None)
    sp.add_argument("--batch-size", type=int, default=None)
    sp.add_argument("--data-parallel", action="store_true")
    sp.add_argument("--compute-stats", action="store_true")
    sp.add_argument("--resume", action="store_true")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("export")
    common(sp)
    sp.add_argument("--workdir", default="runs/default")
    sp.add_argument("--output", default="export/bundle")
    sp.add_argument("--full-precision", action="store_true")
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("eval")
    common(sp)
    sp.add_argument("--bundle", required=True)
    sp.add_argument("--num-sequences", type=int, default=1000)
    sp.add_argument("--dominant-hand-filter", action="store_true")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("infer")
    sp.add_argument("--bundle", required=True)
    sp.add_argument("--input", required=True, help=".npy [T, 276] landmarks")
    sp.set_defaults(fn=cmd_infer)

    sp = sub.add_parser("bench")
    sp.add_argument("--profile", action="store_true")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
