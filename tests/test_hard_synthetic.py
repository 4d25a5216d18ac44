"""Hard-mode synthetic corpus (data/synthetic.py HardSyntheticASLFR):
statistics must match the real-corpus shape it encodes (VERDICT r3 #2) —
dominant-hand signal, mostly-missing resting hand, group-burst NaNs,
charset-legal realistic phrases, deterministic rendering."""

import numpy as np

from ishara_tpu.data import landmarks as lm
from ishara_tpu.data.synthetic import HardSyntheticASLFR
from ishara_tpu.data.tokenizer import CTCTokenizer
from ishara_tpu.data.vocab import ASLFR_CHARS


def test_render_deterministic_and_legal():
    ds = HardSyntheticASLFR(num_sequences=16, seed=3)
    for i in (0, 5, 11):
        x1, p1 = ds.render(i)
        x2, p2 = ds.render(i)
        assert p1 == p2
        np.testing.assert_array_equal(x1, x2)
        assert set(p1) <= set(ASLFR_CHARS)
        assert 5 <= len(p1) <= 40
        assert x1.shape[1] == lm.N_COLS


def test_handedness_and_group_nans():
    ds = HardSyntheticASLFR(num_sequences=64, seed=0, left_frac=0.25)
    rest_rates, dom_rates, lip_rates, n_left = [], [], [], 0
    for i in range(32):
        x, _ = ds.render(i)
        r = np.isnan(x[:, lm.GROUP_IDX["rhand"].reshape(-1)]).mean()
        l = np.isnan(x[:, lm.GROUP_IDX["lhand"].reshape(-1)]).mean()
        lip_rates.append(np.isnan(x[:, lm.GROUP_IDX["lip"].reshape(-1)]).mean())
        dom, rest = (l, r) if l < r else (r, l)
        if l < r:
            n_left += 1
        dom_rates.append(dom)
        rest_rates.append(rest)
        # NaNs are whole-group-per-frame: each frame's hand block is all-NaN
        # or all-finite
        rh = np.isnan(x[:, lm.GROUP_IDX["rhand"].reshape(-1)])
        assert np.all((rh.sum(1) == 0) | (rh.sum(1) == rh.shape[1]))
    assert np.mean(rest_rates) > 0.6           # resting hand mostly missing
    assert np.mean(dom_rates) < 0.4            # dominant hand mostly present
    assert np.mean(lip_rates) < 0.15
    assert 1 <= n_left <= 16                   # left-dominant minority exists


def test_confusability_orders_prototype_separation():
    easy = HardSyntheticASLFR(num_sequences=4, seed=0, confusability=0.0)
    hard = HardSyntheticASLFR(num_sequences=4, seed=0, confusability=0.9)

    def min_sep(protos):
        d = np.linalg.norm(protos[:, None] - protos[None, :], axis=-1)
        return d[~np.eye(len(protos), dtype=bool)].min()

    assert min_sep(easy.hand_protos) > min_sep(hard.hand_protos)


def test_batch_contract():
    ds = HardSyntheticASLFR(num_sequences=8, seed=1)
    tok = CTCTokenizer()
    b = ds.batch(range(8), tok, max_frames=256)
    assert b["raw"].shape == (8, 256, lm.N_COLS)
    assert b["labels"].shape[0] == 8
    assert (b["lengths"] > 0).all()
