"""Length-bucketed sampling + parallel shard writing (ROADMAP #8)."""

import numpy as np
import pytest

from ishara_tpu.data.sampler import BucketSampler, dataset_lengths


def test_buckets_respect_boundaries(rng):
    lengths = rng.integers(10, 400, size=500)
    s = BucketSampler(lengths, batch_size=16, boundaries=(96, 192, 384),
                      seed=1)
    batches = s.batches(epoch=0)
    assert batches, "expected at least one batch"
    seen = set()
    for idx, cap in batches:
        assert cap in (96, 192, 384)
        assert len(idx) == 16
        for i in idx:
            assert i not in seen  # no duplicates across batches
            seen.add(i)
            # members always fit their cap (spill-up only), except the last
            # bucket which truncates (batch(..., max_frames=cap) semantics)
            if cap < 384:
                assert lengths[i] <= cap
    # at most one sub-batch remainder is dropped per epoch
    assert len(lengths) - len(seen) < 16


def test_small_buckets_spill_up_not_lost():
    """Sequences in a sub-batch-size bucket are trained (at the next cap),
    not permanently excluded."""
    # 10 short sequences (< one batch) + 64 long ones
    lengths = np.asarray([50] * 10 + [150] * 64)
    s = BucketSampler(lengths, batch_size=16, boundaries=(96, 192), seed=0)
    covered = set()
    for epoch in range(3):
        for idx, cap in s.batches(epoch):
            covered.update(int(i) for i in idx)
            if any(i < 10 for i in idx):
                assert cap == 192  # shorts ride along in the larger cap
    assert covered >= set(range(10))


def test_deterministic_and_epoch_varying():
    lengths = np.arange(1, 201)
    s = BucketSampler(lengths, 8, (64, 128, 256), seed=7)
    a = s.batches(0)
    b = s.batches(0)
    assert all((x[0] == y[0]).all() and x[1] == y[1] for x, y in zip(a, b))
    c = s.batches(1)
    assert any((x[0] != y[0]).any() for x, y in zip(a, c))


def test_rejects_bad_boundaries():
    with pytest.raises(ValueError):
        BucketSampler([1, 2], 1, ())
    with pytest.raises(ValueError):
        BucketSampler([1, 2], 1, (128, 64))


def test_dataset_lengths_fallback_and_fast_path(tmp_path):
    from ishara_tpu.data.cache import ShardedASLFR, write_shards
    from ishara_tpu.data.synthetic import SyntheticASLFR

    ds = SyntheticASLFR(num_sequences=20, seed=0, max_phrase=4)
    want = [ds.render(i)[0].shape[0] for i in range(20)]
    # fallback path (synthetic has no sequence_lengths)
    np.testing.assert_array_equal(dataset_lengths(ds), want)
    # fast path through the shard cache metadata
    write_shards(ds, tmp_path / "sh", shard_size=6)
    sharded = ShardedASLFR(tmp_path / "sh")
    np.testing.assert_array_equal(dataset_lengths(sharded), want)


def test_parallel_shard_writing_identical(tmp_path):
    from ishara_tpu.data.cache import ShardedASLFR, write_shards
    from ishara_tpu.data.synthetic import SyntheticASLFR

    ds = SyntheticASLFR(num_sequences=25, seed=3, max_phrase=4)
    write_shards(ds, tmp_path / "seq", shard_size=7, num_workers=1)
    write_shards(ds, tmp_path / "par", shard_size=7, num_workers=4)
    a, b = ShardedASLFR(tmp_path / "seq"), ShardedASLFR(tmp_path / "par")
    assert len(a) == len(b) == 25
    for i in range(25):
        xa, pa = a.render(i)
        xb, pb = b.render(i)
        assert pa == pb
        np.testing.assert_array_equal(xa, xb)


def test_trainer_buckets_smoke(tmp_path):
    """Trainer with bucket_boundaries trains an epoch end-to-end."""
    import dataclasses

    from ishara_tpu.config import baseline_config
    from ishara_tpu.data.synthetic import SyntheticASLFR
    from ishara_tpu.train.trainer import Trainer

    cfg = baseline_config(5)
    cfg.model = dataclasses.replace(
        cfg.model, dim=32, num_squeeze_blocks=1, num_conform_blocks=1,
        num_heads=4, frame_len=32, transformer_kernel_size=7, dropout=0.0,
        top_dropout=0.0, top_mult=1)
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=4, num_epochs=1, warmup_epochs=0,
        bucket_boundaries=(64, 128), validate_every_epochs=100,
        checkpoint_every_epochs=100)
    from ishara_tpu.data.tokenizer import CTCTokenizer

    ds = SyntheticASLFR(num_sequences=16, seed=0, max_phrase=4)
    tr = Trainer(cfg, ds, ds, CTCTokenizer(), workdir=tmp_path / "run",
                 max_raw_frames=128)
    import jax

    loss = tr.train_epoch(0, jax.random.key(0))
    assert np.isfinite(loss)
    caps = {cap for _, cap in tr._epoch_indices(0)}
    assert caps <= {64, 128} and caps