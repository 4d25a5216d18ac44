"""CTC loss as a log-space forward recursion (`lax.scan`), TPU-native.

Replaces the reference's ``tf.nn.ctc_loss`` (nb cell 6) with a pure-JAX
implementation: statically-shaped alpha recursion over the extended label
sequence, batched, differentiable via autodiff through the scan. Blank id is
the pad token (59) to match the reference contract, where ``label_length`` is
the count of non-pad labels and ``logit_length`` is the full frame count.

Shapes: logits [B, T, C]; labels [B, U] padded with blank; the extended state
dimension S = 2U+1 is static, so the whole loss jits into one fused XLA loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logaddexp(a, b):
    # Double-where: keep the discarded branch finite so the backward pass of
    # log/exp never produces inf*0 = NaN cotangents.
    m = jnp.maximum(a, b)
    both_ninf = m <= NEG_INF
    m_safe = jnp.where(both_ninf, 0.0, m)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
    s_safe = jnp.where(both_ninf, 1.0, s)
    return jnp.where(both_ninf, NEG_INF, m_safe + jnp.log(s_safe))


def ctc_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray | None = None,
    label_lengths: jnp.ndarray | None = None,
    blank_id: int = 59,
    reduction: str = "mean",
    impl: str = "auto",
) -> jnp.ndarray:
    """Negative log-likelihood of ``labels`` under the CTC alignment model.

    ``label_lengths`` defaults to the non-blank count per row (reference
    CTCLoss contract); ``logit_lengths`` defaults to the full T.

    ``impl``: "auto" routes the training contract (default lengths) to the
    Pallas forward-backward kernel on TPU (ops/ctc_kernel.py — in-VMEM
    recursions, analytic gradient); "scan" forces this lax.scan reference
    implementation; "kernel" forces the kernel (interpret mode off-TPU).
    """
    if impl != "scan" and logit_lengths is None and label_lengths is None:
        from .attention import _on_tpu
        if impl == "kernel" or _on_tpu():
            from .ctc_kernel import ctc_loss_kernel
            return ctc_loss_kernel(logits, labels, blank_id=blank_id,
                                   reduction=reduction)
    B, T, C = logits.shape
    U = labels.shape[1]
    S = 2 * U + 1

    if label_lengths is None:
        label_lengths = jnp.sum(labels != blank_id, axis=-1)
    if logit_lengths is None:
        logit_lengths = jnp.full((B,), T, dtype=jnp.int32)

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # Extended label sequence: blank at even s, labels[(s-1)//2] at odd s.
    s_idx = jnp.arange(S)
    is_label = (s_idx % 2) == 1
    lab_at_s = jnp.where(is_label, labels[:, jnp.minimum(s_idx // 2, U - 1)],
                         blank_id)  # [B, S]

    # Skip transition allowed into odd states whose label differs from the
    # label two states back.
    prev2 = jnp.concatenate(
        [jnp.full((B, 2), -1, lab_at_s.dtype), lab_at_s[:, :-2]], axis=1
    )
    allow_skip = is_label[None, :] & (lab_at_s != prev2) & (s_idx[None, :] >= 2)

    # Valid states: s < 2*label_len + 1.
    state_valid = s_idx[None, :] < (2 * label_lengths[:, None] + 1)

    # Emission log-probs per state per step: lp[t, b, s] = log_probs[b, t, ext[b, s]]
    emit = jnp.take_along_axis(
        log_probs, lab_at_s[:, None, :].astype(jnp.int32), axis=-1
    )  # [B, T, S] — broadcast gather of the extended sequence per frame
    emit = jnp.transpose(emit, (1, 0, 2))  # [T, B, S]

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, emit[0, :, 1], NEG_INF)
    )

    def shift(a, n):
        return jnp.concatenate([jnp.full((B, n), NEG_INF), a[:, :-n]], axis=1)

    def step(alpha, inputs):
        t, emit_t = inputs
        stay = alpha
        diag = shift(alpha, 1)
        skip = jnp.where(allow_skip, shift(alpha, 2), NEG_INF)
        new = _logaddexp(_logaddexp(stay, diag), skip) + emit_t
        new = jnp.where(state_valid, new, NEG_INF)
        # Freeze rows past their logit length.
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    alpha, _ = jax.lax.scan(
        step, alpha0, (jnp.arange(1, T), emit[1:]),
    )

    # P(labels) = alpha[final blank] + alpha[final label]
    final_label = 2 * label_lengths - 1
    final_blank = 2 * label_lengths
    a_label = jnp.where(
        label_lengths > 0,
        jnp.take_along_axis(alpha, jnp.maximum(final_label, 0)[:, None],
                            axis=1)[:, 0],
        NEG_INF,
    )
    a_blank = jnp.take_along_axis(alpha, final_blank[:, None], axis=1)[:, 0]
    loss = -_logaddexp(a_label, a_blank)

    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(reduction)
