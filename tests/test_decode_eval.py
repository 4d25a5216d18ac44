import jax.numpy as jnp
import numpy as np

from ishara_tpu.data.tokenizer import CTCTokenizer
from ishara_tpu.data.vocab import PAD_TOKEN_IDX
from ishara_tpu.decode import greedy_decode, greedy_decode_batch
from ishara_tpu.evaluation import (
    character_error_rate,
    levenshtein,
    normalized_levenshtein,
)

BLANK = PAD_TOKEN_IDX
C = 60


def logits_for(frames):
    """One-hot-ish logits spelling out the given per-frame argmax ids."""
    out = np.full((len(frames), C), -10.0, np.float32)
    for t, k in enumerate(frames):
        out[t, k] = 10.0
    return jnp.asarray(out)


def reference_decode(frames):
    """Literal port of nb cell 8 decode_phrase for oracle checking."""
    x = np.asarray(frames)
    diff = x[:-1] != x[1:]
    idx = np.where(diff)[0]
    x = x[idx]
    return x[x != BLANK].tolist()


def test_collapse_repeats_and_blanks(rng):
    frames = [5, 5, BLANK, 5, 7, 7, BLANK, BLANK, 9, 9, BLANK]
    ids, n = greedy_decode(logits_for(frames))
    want = reference_decode(frames)
    assert np.asarray(ids)[: int(n)].tolist() == want == [5, 5, 7, 9]


def test_final_run_dropped_like_reference():
    # reference quirk: trailing run has no successor-diff index -> dropped
    frames = [3, BLANK, 4, 4]
    ids, n = greedy_decode(logits_for(frames))
    assert np.asarray(ids)[: int(n)].tolist() == reference_decode(frames) == [3]


def test_random_parity_with_reference_decode(rng):
    for _ in range(25):
        T = int(rng.integers(2, 60))
        frames = rng.integers(0, C, size=T)
        ids, n = greedy_decode(logits_for(frames))
        assert np.asarray(ids)[: int(n)].tolist() == reference_decode(frames)


def test_batch_decode_and_tokenizer_roundtrip(rng):
    tok = CTCTokenizer()
    frames = [
        [tok.char_to_idx["h"]] * 3 + [BLANK] + [tok.char_to_idx["i"]] * 2 + [BLANK, BLANK],
        [tok.char_to_idx["y"], BLANK, tok.char_to_idx["o"], BLANK] * 2,
    ]
    logits = jnp.stack([logits_for(f) for f in frames])
    ids, ns = greedy_decode_batch(logits)
    texts = [tok.decode(np.asarray(i)[: int(n)]) for i, n in zip(ids, ns)]
    assert texts == ["hi", "yoyo"]  # trailing blank run dropped, last 'o' kept


def test_length_arg_matches_cropped_decode():
    """length=n must decode exactly like running on the cropped sequence
    (the reference final-run-drop quirk applies at position n-1)."""
    frames = [5, 5, BLANK, 7, 7, 7, 8, 8]
    ids, n = greedy_decode(logits_for(frames), length=6)
    ids_crop, n_crop = greedy_decode(logits_for(frames[:6]))
    assert (np.asarray(ids)[: int(n)].tolist()
            == np.asarray(ids_crop)[: int(n_crop)].tolist()
            == reference_decode(frames[:6]) == [5])


def test_length_arg_random_crop_parity(rng):
    for _ in range(15):
        T = int(rng.integers(4, 40))
        L = int(rng.integers(2, T + 1))
        frames = rng.integers(0, C, size=T)
        ids, n = greedy_decode(logits_for(frames), length=L)
        assert np.asarray(ids)[: int(n)].tolist() == reference_decode(
            frames[:L])


def test_levenshtein_basics():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0


def test_normalizations():
    preds, targets = ["abc", "xyz"], ["abcd", "xy"]
    # competition: ((4-1)+(2-1))/(4+2)
    assert abs(normalized_levenshtein(preds, targets) - 4 / 6) < 1e-9
    assert abs(
        normalized_levenshtein(preds, targets, "max_len")
        - np.mean([1 - 1 / 4, 1 - 1 / 3])
    ) < 1e-9
    assert abs(
        normalized_levenshtein(preds, targets, "pooled") - (1 - 2 / 6)
    ) < 1e-9
    assert abs(character_error_rate(preds, targets) - 2 / 6) < 1e-9
