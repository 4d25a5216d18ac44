"""The Trainer: epoch orchestration, validation, checkpointing, telemetry.

Capability parity with the reference's two trainers (integration.py:633-963
Trainer; notebook ``model.fit`` + CallbackEval/LR/WeightDecay callbacks),
TPU-first:

* the whole augment->preprocess->forward->CTC->backward->update chain is ONE
  jitted program per step (no tf.data thread pool, no host Levenshtein sync);
* validation every N epochs with greedy decode + all three normalized
  Levenshtein conventions; per-epoch example predictions (CallbackEval);
* checkpoints: best-on-val, periodic, final — plus restore (which the
  reference lacks);
* optional data-parallel mesh: batches sharded over ICI, state replicated.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IsharaConfig
from ..evaluation.metrics import normalized_levenshtein
from ..models.encoder import build_model
from ..parallel.mesh import batch_sharding, replicated
from ..preprocess.pipeline import GroupStats
from ..utils.logging import MetricLogger
from ..utils.profiling import Throughput
from .checkpoint import CheckpointManager
from .optim import make_optimizer
from .state import (
    TrainState,
    make_fused_ctc_eval_step,
    make_fused_ctc_train_step,
)


class Trainer:
    def __init__(
        self,
        config: IsharaConfig,
        train_data,
        val_data,
        tokenizer,
        stats: GroupStats | None = None,
        workdir: str | Path = "runs/default",
        mesh=None,
        max_raw_frames: int = 384,
        task: str = "ctc",
    ):
        self.cfg = config
        self.train_data = train_data
        self.val_data = val_data
        self.tokenizer = tokenizer
        self.stats = stats or GroupStats.identity()
        self.workdir = Path(workdir)
        self.mesh = mesh
        self.max_raw_frames = max_raw_frames
        self._bucket_sampler = None
        self.task = task

        mcfg = config.model
        tcfg = config.train
        if tcfg.bucket_boundaries:
            # build the sampler up front so the LR schedule is sized to the
            # ACTUAL bucketed step count (each bucket drops its own
            # remainder, so it is below len//batch_size)
            from ..data.sampler import BucketSampler, dataset_lengths

            caps = tuple(sorted({min(b, self.max_raw_frames)
                                 for b in tcfg.bucket_boundaries}))
            self._bucket_sampler = BucketSampler(
                dataset_lengths(train_data), tcfg.batch_size, caps,
                seed=tcfg.seed)
            steps_per_epoch = max(1, len(self._bucket_sampler.batches(0)))
        else:
            steps_per_epoch = max(1, len(train_data) // tcfg.batch_size)
        tcfg.steps_per_epoch = steps_per_epoch

        tx, self.schedule = make_optimizer(tcfg)
        lookahead = (tcfg.lookahead_sync_period
                     if tcfg.optimizer == "radam_lookahead" else 1)
        if task == "ctc":
            self.model = build_model(mcfg)
            sample = jnp.zeros((1, mcfg.frame_len, mcfg.input_dim),
                               jnp.float32)
            self.state = TrainState.create(
                self.model, tx, sample, rng=jax.random.key(tcfg.seed),
                lookahead_sync_period=lookahead,
            )
            train_step = make_fused_ctc_train_step(
                self.stats, mcfg.frame_len, tcfg.aug_prob, mcfg.blank_id,
                lr_flip_prob=tcfg.lr_flip_prob,
                dominant_hand=mcfg.dominant_hand,
                qat=tcfg.qat,
            )
            hist_step = make_fused_ctc_train_step(
                self.stats, mcfg.frame_len, tcfg.aug_prob, mcfg.blank_id,
                lr_flip_prob=tcfg.lr_flip_prob,
                dominant_hand=mcfg.dominant_hand,
                qat=tcfg.qat, with_grads=True,
            ) if tcfg.histogram_every_steps > 0 else None
            eval_step = make_fused_ctc_eval_step(
                self.stats, mcfg.frame_len, mcfg.blank_id,
                dominant_hand=mcfg.dominant_hand, qat=tcfg.qat,
            )
        elif task == "translation":
            from ..models.seq2seq import ASLTranslationModel
            from .translation import (
                make_fused_translation_eval_step,
                make_fused_translation_train_step,
            )

            self.model = ASLTranslationModel(
                num_classes=tokenizer.vocab_size,
                feature_dim=mcfg.dim,
                num_heads=mcfg.num_heads,
                dropout=mcfg.dropout,
                # model.variant selects the torch-path encoder family too
                encoder_type=("conformer" if mcfg.variant == "conformer"
                              else "squeezeformer"),
            )
            x0 = jnp.zeros((1, mcfg.frame_len, 92, 3), jnp.float32)
            m0 = jnp.ones((1, mcfg.frame_len), bool)
            t0 = jnp.zeros((1, 4), jnp.int32)
            variables = self.model.init(
                jax.random.key(tcfg.seed), x0, m0, t0)
            self.state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=variables["params"],
                slow_params=jax.tree_util.tree_map(
                    jnp.array, variables["params"]),
                batch_stats=variables.get("batch_stats", {}),
                opt_state=tx.init(variables["params"]),
                tx=tx, apply_fn=self.model.apply,
                lookahead_sync_period=lookahead,
            )
            train_step = make_fused_translation_train_step(
                self.stats, mcfg.frame_len, tcfg.aug_prob,
                pad_idx=tokenizer.pad_token, eos_idx=tokenizer.eos_token,
            )
            hist_step = make_fused_translation_train_step(
                self.stats, mcfg.frame_len, tcfg.aug_prob,
                pad_idx=tokenizer.pad_token, eos_idx=tokenizer.eos_token,
                with_grads=True,
            ) if tcfg.histogram_every_steps > 0 else None
            eval_step = make_fused_translation_eval_step(
                self.stats, mcfg.frame_len, self.model,
                pad_idx=tokenizer.pad_token, eos_idx=tokenizer.eos_token,
            )
        else:
            raise ValueError(task)
        if mesh is not None:
            rep, bsh = replicated(mesh), batch_sharding(mesh)
            self.state = jax.device_put(self.state, rep)
            batch_shardings = {"raw": bsh, "lengths": bsh, "labels": bsh}
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rep, batch_shardings, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(
                eval_step, in_shardings=(rep, batch_shardings),
            )
            self._hist_step = jax.jit(
                hist_step,
                in_shardings=(rep, batch_shardings, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            ) if hist_step is not None else None
            self._bsh = bsh
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_step)
            self._hist_step = (jax.jit(hist_step, donate_argnums=(0,))
                               if hist_step is not None else None)
            self._bsh = None

        self.workdir.mkdir(parents=True, exist_ok=True)
        config.to_json(self.workdir / "config.json")
        self.logger = MetricLogger(self.workdir)
        self.ckpt = CheckpointManager(self.workdir / "ckpt")
        self.best_score = -np.inf
        self.history: list[dict] = []
        # resume bookkeeping: epochs fully completed so far (train() starts
        # from here; restored by resume() from checkpoint metadata), plus
        # batches consumed inside the in-flight epoch (so a SIGTERM
        # checkpoint resumes mid-epoch without double-training the batches
        # before the interrupt — each epoch's schedule is a pure function of
        # (seed, epoch) and step-keyed rngs ride state.step, so skipping is
        # bit-exact)
        self.completed_epochs = 0
        self._epoch_batches_done = 0
        self._resume_skip = 0

    # ------------------------------------------------------------------
    def _device_batch(self, batch: dict) -> dict:
        out = {
            "raw": jnp.asarray(batch["raw"]),
            "lengths": jnp.asarray(batch["lengths"]),
            "labels": jnp.asarray(batch["labels"]),
        }
        if self._bsh is not None:
            out = {k: jax.device_put(v, self._bsh) for k, v in out.items()}
        return out

    def _epoch_indices(self, epoch: int) -> list:
        """Per-epoch batches as (indices, max_frames) pairs. With
        ``bucket_boundaries`` set, batches are length-bucketed
        (data/sampler.py) so short sequences collate/ship/compute at a
        smaller static cap."""
        tcfg = self.cfg.train
        if self._bucket_sampler is not None:
            return self._bucket_sampler.batches(epoch)
        rng = np.random.default_rng(tcfg.seed * 1000 + epoch)
        idx = rng.permutation(len(self.train_data))
        bs = tcfg.batch_size
        n = (len(idx) // bs) * bs
        batched = idx[:n].reshape(-1, bs) if n else idx[:0].reshape(0, bs)
        return [(b, self.max_raw_frames) for b in batched]

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int, rng, start_batch: int = 0) -> float:
        """One epoch; ``start_batch`` skips the first N batches of the
        deterministic (seed, epoch) schedule — the mid-epoch resume path
        (batch bi runs at the same state.step as in an uninterrupted run,
        so step-keyed aug/dropout randomness is identical)."""
        from ..utils.prefetch import prefetch

        tput = Throughput()
        losses = []
        schedule = self._epoch_indices(epoch)[start_batch:]
        batches = prefetch(
            (self.train_data.batch(idx, self.tokenizer, max_frames=cap)
             for idx, cap in schedule),
            depth=2,
        )
        every = self.cfg.train.histogram_every_steps
        self._epoch_batches_done = start_batch
        for bi, batch in enumerate(batches, start=start_batch):
            if self._hist_step is not None and every > 0 and bi % every == 0:
                # instrumented step: same update, grads also returned —
                # per-layer grad/param histograms (wandb.watch parity,
                # integration.py:672)
                self.state, metrics = self._hist_step(
                    self.state, self._device_batch(batch), rng
                )
                grads = metrics.pop("grads")
                step = int(self.state.step)
                self.logger.log_histograms(grads, step=step, prefix="grad")
                self.logger.log_histograms(self.state.params, step=step,
                                           prefix="param")
            else:
                self.state, metrics = self._train_step(
                    self.state, self._device_batch(batch), rng
                )
            self._epoch_batches_done = bi + 1
            if bi % 10 == 0:
                loss = float(metrics["loss"])
                # non-finite batches are skipped inside the jitted step
                # (update gated on isfinite — the reference's analogue is the
                # OOM catch-and-continue, integration.py:779-788); EVERY skip
                # is counted on-device in state.nonfinite_count, this sparse
                # host sampling is just for the loss log
                if not np.isfinite(loss):
                    continue
                losses.append(loss)
                step = int(self.state.step)
                self.logger.log(
                    {
                        "train_loss": loss,
                        "grad_norm": float(metrics["grad_norm"]),
                        "lr": float(self.schedule(step)),
                        "seqs_per_sec": tput.update(
                            10 * self.cfg.train.batch_size),
                        "epoch": epoch,
                    },
                    step=step,
                )
        return float(np.mean(losses)) if losses else float("nan")

    def validate(self, max_batches: int | None = None) -> dict:
        bs = self.cfg.train.batch_size
        all_preds, all_targets = [], []
        loss_sum, loss_n = 0.0, 0
        n_batches = max(1, -(-len(self.val_data) // bs))  # ceil: cover tail
        if max_batches:
            n_batches = min(n_batches, max_batches)
        for bi in range(n_batches):
            # the tail batch is PADDED to the static batch size by repeating
            # the last index (one eval-step compile per run instead of one
            # per distinct tail size — expensive on the slow-compile TPU
            # tunnel); padded rows are dropped from loss and score below
            n_real = min((bi + 1) * bs, len(self.val_data)) - bi * bs
            indices = [min(bi * bs + j, len(self.val_data) - 1)
                       for j in range(bs)]
            batch = self.val_data.batch(
                indices, self.tokenizer, max_frames=self.max_raw_frames
            )
            out = self._eval_step(self.state, self._device_batch(batch))
            loss_sum += float(np.sum(
                np.asarray(out["loss_per_seq"])[:n_real]))
            loss_n += n_real
            ids = np.asarray(out["ids"])[:n_real]
            counts = np.asarray(out["counts"])[:n_real]
            all_preds += [
                self.tokenizer.decode(i[:c]) for i, c in zip(ids, counts)
            ]
            all_targets += list(batch["phrases"])[:n_real]
        result = {
            "val_loss": loss_sum / max(loss_n, 1),
            "val_score": normalized_levenshtein(all_preds, all_targets),
            "val_score_maxlen": normalized_levenshtein(
                all_preds, all_targets, "max_len"),
            "val_score_pooled": normalized_levenshtein(
                all_preds, all_targets, "pooled"),
            "examples": list(zip(all_preds[:32], all_targets[:32])),
        }
        return result

    # ------------------------------------------------------------------
    def train(self, num_epochs: int | None = None) -> list[dict]:
        tcfg = self.cfg.train
        num_epochs = num_epochs or tcfg.num_epochs
        rng = jax.random.key(tcfg.seed)
        if self.mesh is not None:
            rng = jax.device_put(rng, replicated(self.mesh))

        # Preemption safety: SIGTERM triggers a checkpoint before exit (the
        # reference only covers KeyboardInterrupt via finally:, and TPU pods
        # are preempted with SIGTERM).
        import signal

        def _on_term(signum, frame):
            self.ckpt.save(int(self.state.step), self.state,
                           metrics=self._resume_meta(), wait=True)
            raise SystemExit(143)

        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            pass  # not the main thread
        try:
            # resume() restores completed_epochs — already-run epoch data
            # schedules are NOT replayed (each epoch's shuffle/buckets are a
            # pure function of (seed, epoch), so the continuation matches an
            # uninterrupted run; tests/test_resume.py)
            # EarlyStopping bookkeeping (nb4 EarlyStopping(patience,
            # restore_best_weights)): epoch of the last val improvement;
            # improvements are only observable at validation epochs
            last_improve_epoch = self.completed_epochs - 1
            for epoch in range(self.completed_epochs, num_epochs):
                t0 = time.time()
                start_batch = self._resume_skip  # mid-epoch resume offset
                self._resume_skip = 0            # (first epoch only)
                train_loss = self.train_epoch(epoch, rng,
                                              start_batch=start_batch)
                self.completed_epochs = epoch + 1
                self._epoch_batches_done = 0
                rec = {"epoch": epoch, "train_loss": train_loss,
                       "epoch_time_s": round(time.time() - t0, 1),
                       # exact on-device skip count (cumulative)
                       "nonfinite_batches": int(self.state.nonfinite_count)}
                stop_early = False
                if (epoch + 1) % tcfg.validate_every_epochs == 0 \
                        or epoch == num_epochs - 1:
                    val = self.validate()
                    examples = val.pop("examples")
                    rec.update(val)
                    # reference CallbackEval prints 32 val pairs (nb cell 9)
                    for p, t in examples[:32]:
                        print(f"  pred={p!r} target={t!r}")
                    if val["val_score"] > self.best_score:
                        self.best_score = val["val_score"]
                        last_improve_epoch = epoch
                        self.ckpt.save(
                            int(self.state.step), self.state,
                            metrics={"val_score": val["val_score"],
                                     **self._resume_meta()},
                            best=True)
                    elif (tcfg.early_stop_patience > 0
                          and epoch - last_improve_epoch
                          >= tcfg.early_stop_patience):
                        rec["early_stopped"] = True
                        stop_early = True
                if (epoch + 1) % tcfg.checkpoint_every_epochs == 0:
                    self.ckpt.save(int(self.state.step), self.state,
                                   metrics=self._resume_meta())
                self.logger.log(rec, step=int(self.state.step))
                self.history.append(rec)
                if stop_early:
                    break
            if tcfg.restore_best_at_end:
                self.restore_best()
        finally:
            # reference parity: a final checkpoint is always written
            self.ckpt.save(int(self.state.step), self.state,
                           metrics=self._resume_meta(), wait=True)
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
        return self.history

    def _resume_meta(self) -> dict:
        return {"completed_epochs": self.completed_epochs,
                "epoch_batches_done": int(self._epoch_batches_done),
                "best_score": (float(self.best_score)
                               if np.isfinite(self.best_score) else None)}

    def restore_best(self) -> bool:
        """Load the best-val checkpoint into ``self.state`` (the Keras
        ``restore_best_weights=True`` behavior, nb4 train_model). Returns
        False when no best checkpoint exists yet."""
        try:
            self.state = self.ckpt.restore(self.state, best=True)
            return True
        except FileNotFoundError:
            return False

    def resume(self) -> bool:
        """Restore the latest checkpoint if one exists — params/opt-state/
        step AND the training-loop bookkeeping (completed epoch count,
        batches consumed in the in-flight epoch, best validation score), so
        ``train()`` continues where the interrupted run stopped instead of
        replaying epoch 0 (the reference writes checkpoints but never reads
        them back, integration.py:906-958).

        Granularity is per-BATCH: a SIGTERM checkpoint written mid-epoch
        carries ``epoch_batches_done``; the continuation skips exactly that
        many batches of the interrupted epoch's deterministic schedule, so
        no batch is trained twice and the concatenated run is bit-identical
        to an uninterrupted one (tests/test_resume.py, both the
        epoch-boundary and the mid-epoch case)."""
        step = self.ckpt.latest_step()
        if step is None:
            return False
        self.state = self.ckpt.restore(self.state)
        meta = self.ckpt.step_meta(step)
        if "completed_epochs" in meta:
            self.completed_epochs = int(meta["completed_epochs"])
        self._resume_skip = int(meta.get("epoch_batches_done", 0))
        if meta.get("best_score") is not None:
            self.best_score = float(meta["best_score"])
        return True
