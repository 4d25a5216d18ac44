"""Native C++ batched Levenshtein vs. the python oracle."""

import numpy as np

from ishara_tpu import native
from ishara_tpu.evaluation.metrics import levenshtein


def test_native_builds():
    # g++ is baked into the image; the kernel must actually compile
    assert native.available()


def test_matches_python_oracle(rng):
    alphabet = "abcdefg -"
    pairs = []
    for _ in range(200):
        n, m = rng.integers(0, 20, 2)
        pairs.append((
            "".join(rng.choice(list(alphabet), n)),
            "".join(rng.choice(list(alphabet), m)),
        ))
    preds, targets = zip(*pairs)
    got = native.batch_levenshtein(list(preds), list(targets))
    want = np.asarray([levenshtein(p, t) for p, t in pairs])
    np.testing.assert_array_equal(got, want)


def test_unicode_safe():
    got = native.batch_levenshtein(["héllo"], ["hello"])
    assert got[0] == 1
