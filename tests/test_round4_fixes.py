"""Round-4 hardening: EarlyStopping/restore-best (nb4 train_model parity),
validation tail padding (single eval compile), per-layer histogram logging
(wandb.watch parity, integration.py:672), CTC-kernel odd-batch padding, and
the webcam-client draw guard."""

import json
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.config import EncoderConfig, IsharaConfig, TrainConfig
from ishara_tpu.data.synthetic import SyntheticASLFR
from ishara_tpu.data.tokenizer import CTCTokenizer
from ishara_tpu.train import Trainer


def _mk_trainer(tmp_path, n_val=8, **tkw):
    cfg = IsharaConfig(
        model=EncoderConfig(dim=64, variant="squeezeformer",
                            num_squeeze_blocks=1, num_heads=4, frame_len=48,
                            dropout=0.0, top_dropout=0.0),
        train=TrainConfig(batch_size=8, num_epochs=4, warmup_epochs=0,
                          lr_max=3e-3, validate_every_epochs=1,
                          checkpoint_every_epochs=100, aug_prob=0.0, **tkw),
    )
    tok = CTCTokenizer()
    train_ds = SyntheticASLFR(num_sequences=16, frames_per_char=6,
                              min_phrase=2, max_phrase=4, nan_frac=0.02)
    val_ds = SyntheticASLFR(num_sequences=n_val, frames_per_char=6,
                            min_phrase=2, max_phrase=4, nan_frac=0.02)
    return Trainer(cfg, train_ds, val_ds, tok, workdir=tmp_path,
                   max_raw_frames=96)


def test_early_stop_and_restore_best(tmp_path):
    trainer = _mk_trainer(tmp_path / "run", early_stop_patience=2,
                          restore_best_at_end=True)
    # scripted val scores: epoch 0 improves, then a plateau — patience 2
    # stops after epoch 2 (epochs 1 and 2 without improvement)
    scores = iter([0.5, 0.4, 0.3, 0.2, 0.1, 0.0])

    def fake_validate(max_batches=None):
        s = next(scores)
        return {"val_loss": 1.0, "val_score": s, "val_score_maxlen": s,
                "val_score_pooled": s, "examples": []}

    trainer.validate = fake_validate
    history = trainer.train(num_epochs=6)
    assert history[-1].get("early_stopped") is True
    assert len(history) == 3  # epochs 0, 1, 2
    # restore_best_at_end loaded the epoch-0 best checkpoint: its step count
    # is epoch 0's (2 steps at 16 seqs / batch 8), not epoch 2's
    assert int(trainer.state.step) == 2
    assert trainer.best_score == 0.5


def test_restore_best_without_checkpoint(tmp_path):
    trainer = _mk_trainer(tmp_path / "run")
    assert trainer.restore_best() is False


def test_validate_pads_tail_batch(tmp_path):
    # 10 val sequences at batch 8: tail batch has 2 real rows — padded to 8
    # on device, sliced back on host
    trainer = _mk_trainer(tmp_path / "run", )
    trainer.val_data = SyntheticASLFR(num_sequences=10, frames_per_char=6,
                                      min_phrase=2, max_phrase=4)
    seen_sizes = []
    inner = trainer._eval_step

    def spy(state, batch):
        seen_sizes.append(batch["raw"].shape[0])
        return inner(state, batch)

    trainer._eval_step = spy
    out = trainer.validate()
    assert seen_sizes == [8, 8]  # tail padded to the static batch size
    assert len(out["examples"]) == 10  # padded rows dropped from the score
    assert np.isfinite(out["val_loss"])


def test_histogram_logging(tmp_path):
    trainer = _mk_trainer(tmp_path / "run", histogram_every_steps=2)
    trainer.train(num_epochs=1)
    recs = [json.loads(l) for l in
            (tmp_path / "run" / "train_metrics.jsonl").read_text().splitlines()]
    hists = [r["histograms"] for r in recs if "histograms" in r]
    assert hists, "no histogram records logged"
    grad_keys = [k for k in hists[0] if k.startswith("grad/")]
    param_keys = [k for h in hists for k in h if k.startswith("param/")]
    assert grad_keys and param_keys
    h = hists[0][grad_keys[0]]
    assert len(h["counts"]) == 20 and h["lo"] <= h["hi"]
    assert np.isfinite(h["norm"])


def test_ctc_kernel_pads_odd_batch():
    from ishara_tpu.ops.ctc import ctc_loss
    from ishara_tpu.ops.ctc_kernel import ctc_loss_kernel

    rng = np.random.default_rng(0)
    B, T, U, C, blank = 12, 9, 4, 8, 7  # B=12 pads to 16; T=9 -> chunk 9
    logits = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    labels = np.full((B, U), blank, np.int32)
    for b in range(B):
        n = rng.integers(0, U + 1)
        labels[b, :n] = rng.choice(range(C - 1), size=n)
    labels = jnp.asarray(labels)

    ref = ctc_loss(logits, labels, blank_id=blank, impl="scan",
                   reduction="none")
    out = ctc_loss_kernel(logits, labels, blank_id=blank, reduction="none")
    assert out.shape == (B,)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)

    g_ref = jax.grad(lambda lg: ctc_loss(lg, labels, blank_id=blank,
                                         impl="scan"))(logits)
    g_out = jax.grad(lambda lg: ctc_loss_kernel(lg, labels,
                                                blank_id=blank))(logits)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


def test_webcam_draw_guard_without_mediapipe(monkeypatch):
    """An injected extractor returning MediaPipe-style results with draw=True
    must not dereference the unimported mediapipe module (ADVICE round 3)."""
    from ishara_tpu.serve import clients

    class FakeCV2:
        FONT_HERSHEY_SIMPLEX = 0

        def putText(self, *a, **k):
            pass

        def imshow(self, *a, **k):
            pass

        def waitKey(self, *a, **k):
            return 0

        def destroyAllWindows(self):
            pass

    monkeypatch.setattr(clients, "_require", lambda name: FakeCV2())

    frames = iter([(True, np.zeros((4, 4, 3), np.uint8))] * 2 + [(False, None)])
    cap = SimpleNamespace(read=lambda: next(frames), release=lambda: None)
    hand = SimpleNamespace(landmark=[
        SimpleNamespace(x=0.1, y=0.2, z=0.3) for _ in range(21)])
    results = SimpleNamespace(right_hand_landmarks=hand,
                              left_hand_landmarks=None,
                              pose_landmarks=None, face_landmarks=None)
    engine = SimpleNamespace(predict_text=lambda seq, tok: "ok")

    texts = clients.run_webcam(engine, None, window_frames=2, draw=True,
                               capture=cap, extractor=lambda img: results)
    assert texts == ["ok"]


def test_topk_classes(tmp_path):
    from ishara_tpu.models import IsharaEncoder
    from ishara_tpu.serve import InferenceEngine
    from ishara_tpu.serve.clients import topk_classes

    cfg = EncoderConfig(dim=64, variant="squeezeformer",
                        num_squeeze_blocks=1, num_heads=4, frame_len=48,
                        dropout=0.0, top_dropout=0.0)
    model = IsharaEncoder(cfg)
    x0 = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
    variables = model.init(jax.random.key(0), x0)
    eng = InferenceEngine(model, variables, max_raw_frames=64)
    tok = CTCTokenizer()
    raw = np.random.default_rng(1).standard_normal(
        (32, 276)).astype(np.float32)
    out = topk_classes(eng, raw, tok, k=3)
    assert len(out) == 3
    probs = [p for _, p in out]
    assert probs == sorted(probs, reverse=True)
    assert all(0.0 <= p <= 1.0 for p in probs)
