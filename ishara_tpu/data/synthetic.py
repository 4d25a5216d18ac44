"""Synthetic ASLFR-like data generator.

The real Kaggle parquet dataset is not distributed with the reference; this
module provides a *learnable* stand-in with the same tensor contract
([T, 276] raw landmarks + phrase strings): each character is assigned a fixed
prototype hand configuration, a phrase renders as a sequence of noisy
prototype frames with NaN dropout — so CTC training on it actually converges,
which backs the overfit tests, the benchmark, and the e2e demo.
"""

from __future__ import annotations

import numpy as np

from . import landmarks as lm
from .vocab import ASLFR_CHARS


class SyntheticASLFR:
    """Deterministic synthetic corpus keyed by (seed, index)."""

    def __init__(
        self,
        num_sequences: int = 512,
        seed: int = 0,
        frames_per_char: int = 8,
        min_phrase: int = 3,
        max_phrase: int = 10,
        noise: float = 0.05,
        nan_frac: float = 0.05,
        charset: str = ASLFR_CHARS.strip() or ASLFR_CHARS,
        proto_seed: int | None = None,
    ):
        """``seed`` draws the phrases (and, unless ``proto_seed`` is given,
        the character prototypes). Train/val splits of the same task must
        share ``proto_seed`` and differ in ``seed`` — different prototype
        tables are different languages."""
        self.num_sequences = num_sequences
        self.frames_per_char = frames_per_char
        self.noise = noise
        self.nan_frac = nan_frac
        self.charset = charset
        root = np.random.default_rng(seed if proto_seed is None else proto_seed)
        # one prototype frame (all 276 features) per character
        self.prototypes = {
            c: root.standard_normal(lm.N_COLS).astype(np.float32) * 0.5 + 0.5
            for c in charset
        }
        self._seed = seed
        self._phrase_rng = np.random.default_rng(seed + 1)
        self.phrases = [
            "".join(
                self._phrase_rng.choice(list(charset))
                for _ in range(self._phrase_rng.integers(min_phrase, max_phrase + 1))
            )
            for _ in range(num_sequences)
        ]

    def __len__(self):
        return self.num_sequences

    def render(self, idx: int) -> tuple[np.ndarray, str]:
        """-> ([T, 276] float32 with NaNs, phrase)."""
        phrase = self.phrases[idx % self.num_sequences]
        # stable per-(seed, idx) stream — python hash() is process-salted
        rng = np.random.default_rng((self._seed * 1_000_003 + idx) % (2**32))
        frames = []
        for c in phrase:
            proto = self.prototypes[c]
            n = self.frames_per_char + int(rng.integers(-2, 3))
            block = proto[None, :] + rng.standard_normal(
                (max(n, 2), lm.N_COLS)
            ).astype(np.float32) * self.noise
            frames.append(block)
        x = np.concatenate(frames, axis=0)
        drop = rng.random(x.shape) < self.nan_frac
        x[drop] = np.nan
        return x, phrase

    def batch(
        self, indices, tokenizer, max_frames: int = 384,
        max_phrase: int = lm.MAX_PHRASE_LENGTH,
    ) -> dict:
        """Host-side collate: pad raw frames, tokenize phrases."""
        xs = np.zeros((len(indices), max_frames, lm.N_COLS), np.float32)
        lens = np.zeros((len(indices),), np.int32)
        labels = np.full((len(indices), max_phrase), tokenizer.pad_idx, np.int32)
        phrases = []
        for i, idx in enumerate(indices):
            x, phrase = self.render(idx)
            T = min(x.shape[0], max_frames)
            xs[i, :T] = x[:T]
            lens[i] = T
            ids = tokenizer.encode(phrase, max_len=max_phrase)
            labels[i] = ids
            phrases.append(phrase)
        return {"raw": xs, "lengths": lens, "labels": labels, "phrases": phrases}
