"""CTC loss vs. torch.nn.functional.ctc_loss (the C++ oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ishara_tpu.ops import ctc_loss

BLANK = 59
C = 60


def torch_ctc(logits, labels, label_lens, logit_lens, blank=BLANK):
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)  # [T,B,C]
    targets = torch.tensor(
        np.concatenate([lab[:n] for lab, n in zip(labels, label_lens)])
    )
    return F.ctc_loss(
        lp, targets,
        input_lengths=torch.tensor(logit_lens),
        target_lengths=torch.tensor(label_lens),
        blank=blank, reduction="none", zero_infinity=False,
    ).numpy()


def rand_case(rng, B=4, T=20, U=8):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    label_lens = rng.integers(1, U + 1, size=B).astype(np.int32)
    labels = np.full((B, U), BLANK, np.int32)
    for b in range(B):
        labels[b, : label_lens[b]] = rng.integers(0, C - 1, size=label_lens[b])
    return logits, labels, label_lens


def test_matches_torch_full_length(rng):
    logits, labels, label_lens = rand_case(rng)
    got = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              reduction="none"))
    want = torch_ctc(logits, labels, label_lens, [logits.shape[1]] * 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_matches_torch_variable_logit_lengths(rng):
    logits, labels, label_lens = rand_case(rng, B=5, T=30, U=6)
    logit_lens = rng.integers(15, 31, size=5).astype(np.int32)
    got = np.asarray(ctc_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        logit_lengths=jnp.asarray(logit_lens), reduction="none"))
    want = torch_ctc(logits, labels, label_lens, logit_lens)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_repeated_labels(rng):
    """Repeats force the no-skip path — the classic CTC correctness trap."""
    B, T, U = 3, 15, 6
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    labels = np.full((B, U), BLANK, np.int32)
    labels[0, :4] = [5, 5, 5, 5]
    labels[1, :4] = [7, 7, 2, 2]
    labels[2, :3] = [1, 2, 1]
    lens = np.array([4, 4, 3], np.int32)
    got = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              reduction="none"))
    want = torch_ctc(logits, labels, lens, [T] * B)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gradient_matches_torch(rng):
    logits, labels, label_lens = rand_case(rng, B=2, T=12, U=4)
    g = jax.grad(
        lambda l: ctc_loss(l, jnp.asarray(labels), reduction="sum")
    )(jnp.asarray(logits))

    tl = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(tl, dim=-1).transpose(0, 1)
    targets = torch.tensor(
        np.concatenate([lab[:n] for lab, n in zip(labels, label_lens)])
    )
    loss = F.ctc_loss(lp, targets,
                      input_lengths=torch.tensor([logits.shape[1]] * 2),
                      target_lengths=torch.tensor(label_lens),
                      blank=BLANK, reduction="sum")
    loss.backward()
    np.testing.assert_allclose(np.asarray(g), tl.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_perfect_alignment_low_loss():
    """Logits that spell the label cleanly should have near-zero loss."""
    T, U = 12, 3
    labels = np.full((1, U), BLANK, np.int32)
    labels[0] = [10, 11, 12]
    logits = np.full((1, T, C), -20.0, np.float32)
    frames = [10, 10, BLANK, 11, 11, BLANK, 12, 12, BLANK, BLANK, BLANK, BLANK]
    for t, k in enumerate(frames):
        logits[0, t, k] = 20.0
    loss = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert loss < 1e-3


def test_jit_and_batch_shapes(rng):
    logits, labels, _ = rand_case(rng, B=8, T=176, U=64)
    f = jax.jit(lambda a, b: ctc_loss(a, b))
    out = f(jnp.asarray(logits), jnp.asarray(labels))
    assert np.isfinite(float(out))


def test_empty_label():
    """Zero-length label: loss = -sum log P(blank) over all frames."""
    T, C = 6, 60
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    labels = np.full((1, 4), BLANK, np.int32)
    got = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                         reduction="none")[0])
    lp = np.log(np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True))
    want = -lp[:, BLANK].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_impossible_alignment_is_huge():
    """Label longer than the frame count cannot be emitted: loss ~ inf."""
    T, U, C = 3, 8, 60
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    labels = np.full((1, U), BLANK, np.int32)
    labels[0] = rng.integers(0, C - 1, U)
    loss = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                          reduction="none")[0])
    assert loss > 1e20  # NEG_INF path, finite representation


def test_single_frame_single_label(rng):
    logits = rng.standard_normal((1, 1, 60)).astype(np.float32)
    labels = np.full((1, 2), BLANK, np.int32)
    labels[0, 0] = 7
    got = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                         reduction="none")[0])
    lp = np.log(np.exp(logits[0, 0]) / np.exp(logits[0, 0]).sum())
    np.testing.assert_allclose(got, -lp[7], rtol=1e-5)
