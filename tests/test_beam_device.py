"""On-device CTC beam search vs. the host prefix beam search oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.decode.beam import ctc_beam_search
from ishara_tpu.decode.beam_device import (
    beam_decode_device_batch,
    beam_search_device,
)

BLANK = 59
C = 60


def log_probs_of(logits):
    x = np.asarray(logits, np.float32)
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_matches_host_beam_search(seed):
    rng = np.random.default_rng(seed)
    T = int(rng.integers(4, 16))
    logits = rng.standard_normal((T, C)).astype(np.float32) * 2.0
    lp = log_probs_of(logits)

    host = ctc_beam_search(lp, beam_width=8, blank_id=BLANK,
                           top_k_emissions=C)
    ids, count, score = beam_search_device(
        jnp.asarray(lp), beam_width=8, top_k=C, blank_id=BLANK)
    got = np.asarray(ids)[: int(count)].tolist()
    assert got == list(host[0][0]), (got, host[0][0])
    np.testing.assert_allclose(float(score), host[0][1], rtol=1e-4,
                               atol=1e-4)


def test_small_vocab_matches_host(rng):
    """Small vocab forces fewer distinct prefixes than the beam width — the
    regime where duplicate merged-mass re-admission corrupts the search."""
    Csmall, blank = 3, 2
    for seed in range(12):
        r = np.random.default_rng(seed)
        lp = log_probs_of(r.standard_normal((8, Csmall)).astype(np.float32))
        host = ctc_beam_search(lp, beam_width=8, blank_id=blank,
                               top_k_emissions=Csmall)
        ids, count, score = beam_search_device(
            jnp.asarray(lp), beam_width=8, top_k=Csmall, blank_id=blank,
            max_len=16)
        got = np.asarray(ids)[: int(count)].tolist()
        assert got == list(host[0][0]), (seed, got, host[0][0])
        np.testing.assert_allclose(float(score), host[0][1], rtol=1e-4,
                                   atol=1e-4)


def test_batch_wrapper_shapes(rng):
    logits = jnp.asarray(rng.standard_normal((3, 10, C)).astype(np.float32))
    ids, counts = beam_decode_device_batch(logits, beam_width=4, top_k=8,
                                           max_len=16)
    assert ids.shape == (3, 16)
    assert counts.shape == (3,)


def test_respects_length(rng):
    logits = rng.standard_normal((12, C)).astype(np.float32)
    lp = log_probs_of(logits)
    trunc_ids, trunc_n, _ = beam_search_device(
        jnp.asarray(lp), jnp.int32(5), beam_width=4, top_k=C)
    host = ctc_beam_search(lp, beam_width=4, blank_id=BLANK, length=5,
                           top_k_emissions=C)
    assert np.asarray(trunc_ids)[: int(trunc_n)].tolist() == list(host[0][0])
