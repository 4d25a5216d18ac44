"""Trainer orchestration: short synthetic run with validation, checkpointing
round-trip, and resume."""

import numpy as np
import pytest

from ishara_tpu.config import EncoderConfig, IsharaConfig, TrainConfig
from ishara_tpu.data.synthetic import SyntheticASLFR
from ishara_tpu.data.tokenizer import CTCTokenizer
from ishara_tpu.train import Trainer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = IsharaConfig(
        model=EncoderConfig(dim=64, variant="squeezeformer",
                            num_squeeze_blocks=1, num_heads=4, frame_len=48,
                            dropout=0.0, top_dropout=0.0),
        train=TrainConfig(batch_size=8, num_epochs=6, warmup_epochs=0,
                          lr_max=3e-3, validate_every_epochs=3,
                          checkpoint_every_epochs=100, aug_prob=0.0),
    )
    tok = CTCTokenizer()
    train_ds = SyntheticASLFR(num_sequences=16, frames_per_char=6,
                              min_phrase=2, max_phrase=4, nan_frac=0.02)
    val_ds = SyntheticASLFR(num_sequences=8, frames_per_char=6,
                            min_phrase=2, max_phrase=4, nan_frac=0.02)
    workdir = tmp_path_factory.mktemp("run")
    trainer = Trainer(cfg, train_ds, val_ds, tok, workdir=workdir,
                      max_raw_frames=96)
    return trainer, workdir


def test_trainer_runs_and_improves(setup):
    trainer, workdir = setup
    history = trainer.train(num_epochs=6)
    assert len(history) == 6
    first, last = history[0]["train_loss"], history[-1]["train_loss"]
    assert last < first, (first, last)
    assert "val_score" in history[-1]
    # metrics jsonl exists
    assert (workdir / "train_metrics.jsonl").exists()


def test_checkpoint_roundtrip_and_resume(setup):
    trainer, workdir = setup
    step_before = int(trainer.state.step)
    assert trainer.ckpt.latest_step() is not None
    # wipe params then restore
    import jax

    zeroed = jax.tree_util.tree_map(lambda x: x * 0, trainer.state.params)
    trainer.state = trainer.state.replace(params=zeroed)
    assert trainer.resume()
    assert int(trainer.state.step) == step_before
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert np.abs(np.asarray(leaf)).sum() > 0  # params actually restored


def test_validate_reports_all_normalizations(setup):
    trainer, _ = setup
    out = trainer.validate()
    for k in ("val_loss", "val_score", "val_score_maxlen", "val_score_pooled"):
        assert k in out and np.isfinite(out[k])
