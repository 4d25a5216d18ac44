"""Multi-process readiness (VERDICT r1 #8): jax.distributed entry point,
per-process corpus sharding, and host-local -> global batch assembly.

True multi-process can't run inside one CI process; these tests prove the
single-process degradation is exact and the per-process sharding logic is a
disjoint cover, which is what the pod run relies on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ishara_tpu.data import landmarks as lm
from ishara_tpu.parallel.distributed import (
    host_local_to_global,
    initialize_distributed,
    process_shard,
)
from ishara_tpu.parallel.mesh import make_mesh


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("ISHARA_COORDINATOR", raising=False)
    monkeypatch.delenv("ISHARA_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False
    assert process_shard() == (0, 1)


@pytest.fixture(scope="module")
def parquet_dir(tmp_path_factory):
    import pandas as pd

    root = tmp_path_factory.mktemp("aslfr_dist")
    (root / "train_landmarks").mkdir()
    rng = np.random.default_rng(0)
    rows, frames = [], []
    for seq_id in range(10):
        rows.append({
            "path": "train_landmarks/7.parquet", "file_id": 7,
            "sequence_id": seq_id + 1000,
            "participant_id": 100 + seq_id % 3,
            "phrase": "abc",
        })
        for _ in range(6):
            frame = {"sequence_id": seq_id + 1000}
            for col in lm.SEL_COLS[:30]:
                frame[col] = float(rng.standard_normal())
            frames.append(frame)
    pd.DataFrame(rows).to_csv(root / "train.csv", index=False)
    pd.DataFrame(frames).to_parquet(root / "train_landmarks" / "7.parquet")
    return root


def test_process_sharding_disjoint_cover(parquet_dir):
    """Simulated 3-process corpus shard: disjoint, covering, deterministic."""
    from ishara_tpu.data.dataset import ParquetASLFR

    full = ParquetASLFR(parquet_dir)
    shards = [
        ParquetASLFR(parquet_dir, process_index=i, process_count=3)
        for i in range(3)
    ]
    all_ids = sorted(
        sid for ds in shards for sid in ds.df["sequence_id"].tolist())
    assert all_ids == sorted(full.df["sequence_id"].tolist())
    assert len(all_ids) == len(set(all_ids)) == len(full)


def test_host_local_to_global_single_process_train_step():
    """Single-process degradation: identical to shard_batch, feeds a sharded
    train step on the 8-device mesh."""
    from ishara_tpu.config import EncoderConfig, TrainConfig
    from ishara_tpu.models import IsharaEncoder
    from ishara_tpu.train import TrainState, ctc_train_step, make_optimizer

    mesh = make_mesh(8)
    B, T, F = 16, 8, lm.N_COLS
    batch = {
        "x": jnp.ones((B, T, F), jnp.float32),
        "labels": jnp.full((B, 4), 59, jnp.int32).at[:, :2].set(3),
    }
    gbatch = host_local_to_global(batch, mesh)
    assert gbatch["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert gbatch["x"].shape == (B, T, F)

    cfg = EncoderConfig(variant="squeezeformer", dim=16, num_squeeze_blocks=1,
                        num_conform_blocks=0, num_heads=2, frame_len=T,
                        transformer_kernel_size=3, dropout=0.0)
    model = IsharaEncoder(cfg)
    tx, _ = make_optimizer(TrainConfig(steps_per_epoch=2, num_epochs=1,
                                       warmup_epochs=0))
    state = TrainState.create(model, tx, gbatch["x"][:1])
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    rng = jax.device_put(
        jax.random.key(0),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    new_state, metrics = jax.jit(ctc_train_step)(state, gbatch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_multislice_mesh_train_step_matches_single_device():
    """A 2-slice x 4-chip (dcn, data) mesh trains with the batch sharded
    over both axes and produces the same loss as the unsharded step."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ishara_tpu.config import EncoderConfig, TrainConfig
    from ishara_tpu.data.synthetic import SyntheticASLFR
    from ishara_tpu.data.tokenizer import CTCTokenizer
    from ishara_tpu.models import IsharaEncoder
    from ishara_tpu.parallel.mesh import (
        make_multislice_mesh,
        multislice_batch_sharding,
    )
    from ishara_tpu.train import TrainState, ctc_train_step, make_optimizer
    from ishara_tpu.preprocess import GroupStats, preprocess_batch

    mesh = make_multislice_mesh(num_slices=2)
    assert mesh.shape == {"dcn": 2, "data": 4}

    cfg = EncoderConfig(dim=32, variant="hybrid", num_squeeze_blocks=1,
                        num_conform_blocks=1, num_heads=4, frame_len=16,
                        transformer_kernel_size=7, dropout=0.0,
                        top_dropout=0.0, top_mult=1)
    model = IsharaEncoder(cfg)
    tok = CTCTokenizer()
    ds = SyntheticASLFR(num_sequences=16, seed=0, max_phrase=4)
    batch = ds.batch(range(16), tok, max_frames=24)
    x = preprocess_batch(jnp.asarray(batch["raw"]),
                         jnp.asarray(batch["lengths"]),
                         GroupStats.identity(), cfg.frame_len)
    jb = {"x": x, "labels": jnp.asarray(batch["labels"])}

    tx, _ = make_optimizer(TrainConfig(steps_per_epoch=10))
    sample = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
    state = TrainState.create(model, tx, sample)

    ref_state, ref_m = jax.jit(ctc_train_step)(state, jb, jax.random.key(0))

    bsh = multislice_batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    sharded = jax.jit(
        ctc_train_step,
        in_shardings=(rep, {"x": bsh, "labels": bsh}, rep),
        out_shardings=(rep, rep),
    )
    st = jax.device_put(state, rep)
    jbs = {k: jax.device_put(v, bsh) for k, v in jb.items()}
    out_state, m = sharded(st, jbs, jax.device_put(jax.random.key(0), rep))
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    # params updated identically
    a = jax.tree_util.tree_leaves(out_state.params)[0]
    b = jax.tree_util.tree_leaves(ref_state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multislice_mesh_guards():
    import pytest

    from ishara_tpu.parallel.mesh import make_multislice_mesh

    with pytest.raises(ValueError):
        make_multislice_mesh()  # CPU devices report no slice_index
    with pytest.raises(ValueError):
        make_multislice_mesh(num_slices=16)  # more slices than devices
