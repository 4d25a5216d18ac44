"""Evaluation metrics: Levenshtein distance and the reference's three
normalized-score conventions (SURVEY.md §5 'Metrics'):

* ``competition`` — (len(target) - dist) / len(target), summed over the set:
  the ASLFR metric and the TFLite harness convention (nb cell 18).
* ``max_len`` — 1 - dist / max(len(pred), len(target)) (integration.py:843).
* ``pooled`` — 1 - sum(dist) / sum(len(target)) (nb4 calculate_levenshtein).

Pure numpy/python (host-side); the on-device confidence-target proxy lives in
the trainer.
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Classic O(len(a)·len(b)) edit distance, two-row DP."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def _corpus_distances(preds, targets) -> list[int]:
    """Native batched kernel when available (ishara_tpu.native), else the
    python DP — identical results, ~20x faster at harness scale."""
    from .. import native

    return list(native.batch_levenshtein(preds, targets))


def normalized_levenshtein(
    preds: list[str], targets: list[str], mode: str = "competition"
) -> float:
    """Aggregate normalized Levenshtein score over a corpus."""
    if len(preds) != len(targets):
        raise ValueError("preds and targets must align")
    dists = _corpus_distances(preds, targets)
    if mode == "competition":
        num = sum(max(len(t), 1) - d for d, t in zip(dists, targets))
        den = sum(max(len(t), 1) for t in targets)
        return num / den
    if mode == "max_len":
        return float(np.mean([
            1.0 - d / max(len(p), len(t), 1)
            for d, p, t in zip(dists, preds, targets)
        ]))
    if mode == "pooled":
        return 1.0 - sum(dists) / max(sum(len(t) for t in targets), 1)
    raise ValueError(mode)


def character_error_rate(preds: list[str], targets: list[str]) -> float:
    """CER = sum(dist) / sum(len(target))."""
    dists = _corpus_distances(preds, targets)
    return sum(dists) / max(sum(len(t) for t in targets), 1)
