"""ASLFR parquet dataset: loading, signer-fold splits, stats.

Covers both reference data paths with one class:

* lazy per-file parquet reads with an LRU table cache (``data_loader.py``
  ASLDataset) or full RAM preload (``integration.py:539-555`` eager dict);
* signer-based k-fold splits on ``participant_id`` (``data_loader.py:42-51``,
  ``integration.py:527-536``);
* landmark selection to the 276 SEL_COLS (missing columns -> NaN);
* per-group mean/std estimation over the corpus (the reference's
  precomputed ``*_mean.npy``/``*_std.npy`` side dataset, nb cell 1).

Exposes the same ``render/batch`` protocol as
:class:`ishara_tpu.data.synthetic.SyntheticASLFR`, so the Trainer and eval
harness are source-agnostic.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

from . import landmarks as lm
from .vocab import PAD_TOKEN_IDX


class ParquetASLFR:
    def __init__(
        self,
        data_dir: str | Path,
        csv_name: str = "train.csv",
        landmarks_dir: str = "train_landmarks",
        fold: int | None = None,
        num_folds: int = 4,
        split: str = "train",
        preload: bool = False,
        max_sequences: int | None = None,
        cache_files: int = 4,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        """``process_index``/``process_count`` shard the corpus across hosts
        for multi-host pods (each process loads a disjoint slice; the device
        mesh then shards each host's batch across its local chips)."""
        import pandas as pd

        self.data_dir = Path(data_dir)
        self.landmarks_dir = self.data_dir / landmarks_dir
        df = pd.read_csv(self.data_dir / csv_name)

        if process_count is not None and process_count > 1:
            df = df.iloc[(process_index or 0)::process_count]

        if fold is not None:
            # signer-based folds, stable across hosts/processes: fold is a
            # pure function of the participant id, independent of which rows
            # this process happens to see
            in_fold = df["participant_id"].map(
                lambda s: int(s) % num_folds) == fold
            df = df[~in_fold] if split == "train" else df[in_fold]

        if max_sequences is not None:
            df = df.iloc[:max_sequences]
        self.df = df.reset_index(drop=True)

        self._read_file = lru_cache(maxsize=cache_files)(self._read_file_raw)
        self._ram: dict[int, np.ndarray] | None = None
        if preload:
            self._ram = {}
            for i in range(len(self.df)):
                self._ram[i] = self._load_seq(i)

    def __len__(self) -> int:
        return len(self.df)

    # ------------------------------------------------------------------
    def _read_file_raw(self, file_id):
        import pyarrow.parquet as pq

        path = self.landmarks_dir / f"{file_id}.parquet"
        table = pq.read_table(path)
        return table.to_pandas()

    def _load_seq(self, idx: int) -> np.ndarray:
        row = self.df.iloc[idx]
        frames = self._read_file(row["file_id"])
        seq = frames.loc[frames.index == row["sequence_id"]] \
            if frames.index.name == "sequence_id" \
            else frames[frames["sequence_id"] == row["sequence_id"]]
        out = np.full((len(seq), lm.N_COLS), np.nan, np.float32)
        for c, col in enumerate(lm.SEL_COLS):
            if col in seq.columns:
                out[:, c] = seq[col].to_numpy(np.float32)
        return out

    # ------------------------------------------------------------------
    def render(self, idx: int) -> tuple[np.ndarray, str]:
        x = self._ram[idx] if self._ram is not None else self._load_seq(idx)
        return x, str(self.df.iloc[idx]["phrase"])

    def batch(self, indices, tokenizer, max_frames: int = 384,
              max_phrase: int = lm.MAX_PHRASE_LENGTH) -> dict:
        indices = list(indices)
        xs = np.zeros((len(indices), max_frames, lm.N_COLS), np.float32)
        lens = np.zeros((xs.shape[0],), np.int32)
        labels = np.full((xs.shape[0], max_phrase), PAD_TOKEN_IDX, np.int32)
        phrases = []
        for i, idx in enumerate(indices):
            x, phrase = self.render(int(idx))
            T = min(x.shape[0], max_frames)
            xs[i, :T] = x[:T]
            lens[i] = max(T, 1)
            labels[i] = tokenizer.encode(phrase, max_len=max_phrase)
            phrases.append(phrase)
        return {"raw": xs, "lengths": lens, "labels": labels,
                "phrases": phrases}


def compute_group_stats(dataset, num_sequences: int | None = None):
    """Estimate per-group, per-coordinate mean/std over the corpus
    (nan-aware), shaped [1, 1, 3] per group — the rebuild of the reference's
    precomputed mean/std .npy side dataset."""
    import jax.numpy as jnp

    from ..preprocess.pipeline import GroupStats

    n = len(dataset) if num_sequences is None else min(
        num_sequences, len(dataset))
    sums = {g: np.zeros(3, np.float64) for g in lm.GROUPS}
    sqs = {g: np.zeros(3, np.float64) for g in lm.GROUPS}
    counts = {g: np.zeros(3, np.float64) for g in lm.GROUPS}
    for i in range(n):
        x, _ = dataset.render(i)
        for g in lm.GROUPS:
            grp = np.stack(
                [x[:, lm.GROUP_IDX[g][:, c]] for c in range(3)], axis=-1
            )  # [T, n, 3]
            valid = ~np.isnan(grp)
            grp0 = np.where(valid, grp, 0.0)
            sums[g] += grp0.sum((0, 1))
            sqs[g] += (grp0 ** 2).sum((0, 1))
            counts[g] += valid.sum((0, 1))
    mean, std = {}, {}
    for g in lm.GROUPS:
        c = np.maximum(counts[g], 1.0)
        m = sums[g] / c
        v = np.maximum(sqs[g] / c - m ** 2, 1e-8)
        mean[g] = jnp.asarray(m, jnp.float32).reshape(1, 1, 3)
        std[g] = jnp.asarray(np.sqrt(v), jnp.float32).reshape(1, 1, 3)
    return GroupStats(mean=mean, std=std)


def normalize_per_sequence(x: np.ndarray) -> np.ndarray:
    """Per-sequence standardization + NaN->0 (integration.py:561-577)."""
    m = np.nanmean(x, axis=0, keepdims=True)
    s = np.nanstd(x, axis=0, keepdims=True)
    out = (x - m) / np.where(s < 1e-6, 1.0, s)
    return np.nan_to_num(out, nan=0.0)
