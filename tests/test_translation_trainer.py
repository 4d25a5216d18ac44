"""Trainer in translation mode: short synthetic run, loss descends, AR
validation produces strings."""

import numpy as np

from ishara_tpu.config import EncoderConfig, IsharaConfig, TrainConfig
from ishara_tpu.data.synthetic import SyntheticASLFR
from ishara_tpu.data.tokenizer import Seq2SeqTokenizer
from ishara_tpu.train import Trainer


def test_translation_trainer(tmp_path):
    cfg = IsharaConfig(
        model=EncoderConfig(dim=64, num_heads=4, frame_len=48, dropout=0.0),
        train=TrainConfig(batch_size=8, num_epochs=4, warmup_epochs=0,
                          lr_max=1e-3, validate_every_epochs=4,
                          checkpoint_every_epochs=100, aug_prob=0.0,
                          optimizer="adamw"),
    )
    tok = Seq2SeqTokenizer()
    train_ds = SyntheticASLFR(num_sequences=16, frames_per_char=6,
                              min_phrase=2, max_phrase=4, nan_frac=0.02)
    val_ds = SyntheticASLFR(num_sequences=8, frames_per_char=6,
                            min_phrase=2, max_phrase=4, nan_frac=0.02)
    trainer = Trainer(cfg, train_ds, val_ds, tok, workdir=tmp_path,
                      max_raw_frames=96, task="translation")
    history = trainer.train(num_epochs=4)
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert "val_score" in history[-1]
    val = trainer.validate()
    assert np.isfinite(val["val_loss"])
    # predictions decode to strings through the seq2seq tokenizer
    for p, t in val["examples"]:
        assert isinstance(p, str) and isinstance(t, str)
