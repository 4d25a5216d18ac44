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
        from .parallel.distributed import process_shard

        # per-host corpus shard; (0, 1) single-process so always safe
        pidx, pcount = process_shard()
        return ParquetASLFR(
            args.data_dir, fold=args.fold,
            split=split, max_sequences=args.max_sequences,
            process_index=pidx, process_count=pcount,
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


def _tokenizer(task: str):
    from .data.tokenizer import CTCTokenizer, Seq2SeqTokenizer

    return Seq2SeqTokenizer() if task == "translation" else CTCTokenizer()


def cmd_train(args):
    import jax

    from .parallel.mesh import make_mesh
    from .train.trainer import Trainer

    if args.multihost:
        from .parallel.distributed import initialize_distributed

        initialize_distributed()

    cfg = _config(args)
    if args.epochs:
        cfg.train.num_epochs = args.epochs
    if args.batch_size:
        cfg.train.batch_size = args.batch_size
    if getattr(args, "task", None):
        cfg.task = args.task
    tok = _tokenizer(cfg.task)
    if cfg.task == "translation":
        cfg.model.num_classes = tok.vocab_size
    train_ds = _load_dataset(args, "train")
    val_ds = _load_dataset(args, "val")
    mesh = make_mesh() if args.data_parallel and jax.device_count() > 1 else None
    stats = None
    if args.compute_stats:
        from .data.dataset import compute_group_stats

        stats = compute_group_stats(train_ds, num_sequences=500)
    trainer = Trainer(cfg, train_ds, val_ds, tok, stats=stats,
                      workdir=args.workdir, mesh=mesh, task=cfg.task)
    if args.resume:
        trainer.resume()
    history = trainer.train()
    print(json.dumps(history[-1] if history else {}))


def cmd_export(args):
    from .config import IsharaConfig
    from .serve.export import build_task_model, export_model
    from .train.checkpoint import CheckpointManager
    from .train.optim import make_optimizer
    from .train.state import TrainState

    import jax
    import jax.numpy as jnp

    cfg = IsharaConfig.from_json(Path(args.workdir) / "config.json") \
        if (Path(args.workdir) / "config.json").exists() else _config(args)
    model, init = build_task_model(cfg)
    tx, _ = make_optimizer(cfg.train)
    variables = init(jax.random.key(0))
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        slow_params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx, apply_fn=model.apply,
    )
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
    from .config import IsharaConfig
    from .evaluation.harness import run_harness
    from .serve.export import load_engine

    cfg = IsharaConfig.from_json(Path(args.bundle) / "config.json")
    engine = load_engine(args.bundle)
    tok = _tokenizer(cfg.task)
    ds = _load_dataset(args, "val")
    result = run_harness(engine, ds, tok, num_sequences=args.num_sequences,
                         apply_filter=args.dominant_hand_filter,
                         translation=cfg.task == "translation")
    print(json.dumps(result.as_dict()))


def cmd_infer(args):
    import numpy as np

    from .config import IsharaConfig
    from .serve.export import load_engine

    cfg = IsharaConfig.from_json(Path(args.bundle) / "config.json")
    engine = load_engine(args.bundle)
    x = np.load(args.input).astype(np.float32)
    out = engine.predict_text(x, _tokenizer(cfg.task))
    if cfg.task == "translation":
        text, conf = out
        print(json.dumps({"text": text, "confidence": conf}))
    else:
        print(out)


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
    sp.add_argument("--task", choices=["ctc", "translation"], default=None,
                    help="pipeline family (default: config's task, ctc)")
    sp.add_argument("--workdir", default="runs/default")
    sp.add_argument("--epochs", type=int, default=None)
    sp.add_argument("--batch-size", type=int, default=None)
    sp.add_argument("--data-parallel", action="store_true")
    sp.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed (one process per host; "
                         "coordinator via ISHARA_COORDINATOR/NUM_PROCESSES/"
                         "PROCESS_ID or TPU-pod auto-detection)")
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
