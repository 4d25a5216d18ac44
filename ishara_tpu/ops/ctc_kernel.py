"""CTC loss as Pallas TPU kernels: in-VMEM alpha/beta recursions with an
analytic (forward-backward) gradient.

Why: the `lax.scan` implementation (ops/ctc.py) costs ~8 ms of the 75 ms
flagship train step at batch 256 (RESULTS.md round-3 attribution) — T=176
sequential steps over tiny [B, 2U+1] carries pay XLA's per-iteration loop
overhead twice (forward scan + autodiff-replayed backward scan), and the
autodiff path stores several residual tensors per step. These kernels run
the whole recursion inside one Pallas grid (the t-chunk axis is the grid's
fast dimension; alpha/beta live in a VMEM scratch carried across grid
steps — the same pipeline pattern as ops/fused_block.py's stacked blocks)
and the backward pass uses the classic alpha·beta occupancy gradient
instead of replaying log-space autodiff.

Semantics: identical to ops/ctc.py `ctc_loss` restricted to the training
contract (reference nb cell 6 / tf.nn.ctc_loss usage: `logit_length` = full
T for every row, `label_length` = non-blank count, blank = pad = 59).
Parity + gradient equivalence vs the scan oracle: tests/test_ctc_kernel.py;
on-chip gate: tests/test_ctc_kernel_tpu.py.

Gradient identity used (standard CTC forward-backward result): with
alpha_t(s) inclusive and beta_t(s) exclusive of frame t's emission,
  dL_b/dlogits[b,t,c] = softmax(logits)[b,t,c]
                        - sum_{s: ext[b,s]=c} exp(alpha_t(s)+beta_t(s) - logP_b).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _on_tpu

NEG = -1e30


def _lae2(a, b):
    m = jnp.maximum(a, b)
    ninf = m <= NEG
    m_safe = jnp.where(ninf, 0.0, m)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
    return jnp.where(ninf, NEG, m_safe + jnp.log(jnp.where(ninf, 1.0, s)))


def _lae3(a, b, c):
    return _lae2(_lae2(a, b), c)


def _shift_r(a, n):
    bb = a.shape[0]
    return jnp.concatenate(
        [jnp.full((bb, n), NEG, a.dtype), a[:, :-n]], axis=1)


def _shift_l(a, n):
    bb = a.shape[0]
    return jnp.concatenate(
        [a[:, n:], jnp.full((bb, n), NEG, a.dtype)], axis=1)


def _alpha_kernel(tc, emit_ref, iv_ref, skip_ref, valid_ref, out_ref, a_scr):
    """One grid cell: advance alpha over this chunk's `tc` frames."""
    ti = pl.program_id(1)
    skip = skip_ref[...]
    valid = valid_ref[...]
    for j in range(tc):
        e = emit_ref[j]
        prev = a_scr[...]
        new = _lae3(prev, _shift_r(prev, 1), _shift_r(prev, 2) + skip)
        new = new + e + valid
        if j == 0:
            new = jnp.where(ti == 0, iv_ref[...] + e, new)
        a_scr[...] = new
        out_ref[j] = new


def _beta_kernel(tc, emit_ref, alpha_ref, fin_ref, skipf_ref, valid_ref,
                 logp_ref, p_ref, be_scr):
    """Reverse grid cell: beta recursion + occupancy probs for this chunk.

    The VMEM carry is be = beta_t + emit_t of the last-processed frame
    (the quantity the t-1 recursion consumes), so chunk boundaries need no
    cross-chunk emit access.
    """
    ti = pl.program_id(1)
    skipf = skipf_ref[...]
    valid = valid_ref[...]
    logp = logp_ref[...]  # [BB, 1]
    last = ti == 0  # reversed index map: grid step 0 holds the final chunk
    for j in reversed(range(tc)):
        e = emit_ref[j]
        prev = be_scr[...]
        beta = _lae3(prev, _shift_l(prev, 1), _shift_l(prev, 2) + skipf)
        beta = beta + valid
        if j == tc - 1:
            beta = jnp.where(last, fin_ref[...], beta)
        be_scr[...] = beta + e
        gamma = alpha_ref[j] + beta - logp
        p_ref[j] = jnp.exp(jnp.minimum(gamma, 0.0))


def _extend(labels, blank_id):
    """Extended label sequence + transition/validity masks (XLA, cheap)."""
    B, U = labels.shape
    S = 2 * U + 1
    s_idx = jnp.arange(S)
    is_label = (s_idx % 2) == 1
    lab_ext = jnp.where(is_label,
                        labels[:, jnp.minimum(s_idx // 2, U - 1)],
                        blank_id)  # [B, S]
    prev2 = jnp.concatenate(
        [jnp.full((B, 2), -1, lab_ext.dtype), lab_ext[:, :-2]], axis=1)
    allow_skip = is_label[None, :] & (lab_ext != prev2) & (s_idx[None, :] >= 2)
    label_lengths = jnp.sum(labels != blank_id, axis=-1)
    state_valid = s_idx[None, :] < (2 * label_lengths[:, None] + 1)
    return lab_ext, allow_skip, state_valid, label_lengths


def _chunks(n, cap):
    # gcd(n, cap) when nontrivial: the caps are powers of two tuned so the
    # resulting blocks fit scoped VMEM at the flagship geometry (a plain
    # largest-divisor-<=cap rule raised tc 16 -> 22 at T=176 and OOMed the
    # beta kernel's VMEM stack). Only when gcd collapses to 1 (odd/prime n,
    # which shares no factor with a power-of-two cap) fall back to the
    # largest divisor of n <= cap so the grid doesn't degrade to n steps.
    g = math.gcd(n, cap)
    if g > 1:
        return g
    best = 1
    for d in range(2, cap + 1):
        if n % d == 0:
            best = d
    return best


def _forward(logits, labels, blank_id):
    B, T, C = logits.shape
    lab_ext, allow_skip, state_valid, lab_len = _extend(labels, blank_id)
    S = lab_ext.shape[1]

    logits32 = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits32, axis=-1)
    emit = jnp.take_along_axis(
        log_probs, lab_ext[:, None, :].astype(jnp.int32), axis=-1)
    emit = jnp.transpose(emit, (1, 0, 2))  # [T, B, S]

    f32 = jnp.float32
    skip_add = jnp.where(allow_skip, 0.0, NEG).astype(f32)
    valid_add = jnp.where(state_valid, 0.0, NEG).astype(f32)
    s_idx = jnp.arange(S)[None, :]
    init_add = jnp.where(s_idx < 2, 0.0, NEG).astype(f32) + valid_add

    tc = _chunks(T, 32)
    bb = _chunks(B, 128)
    nt, nb = T // tc, B // bb
    row = lambda b, t: (b, 0)  # noqa: E731

    alpha = pl.pallas_call(
        functools.partial(_alpha_kernel, tc),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((tc, bb, S), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, bb, S), lambda b, t: (t, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, S), f32),
        scratch_shapes=[pltpu.VMEM((bb, S), f32)],
        interpret=not _on_tpu(),
    )(emit, init_add, skip_add, valid_add)

    final_label = 2 * lab_len - 1
    final_blank = 2 * lab_len
    a_last = alpha[T - 1]  # [B, S]
    a_lab = jnp.where(
        lab_len > 0,
        jnp.take_along_axis(a_last, jnp.maximum(final_label, 0)[:, None],
                            axis=1)[:, 0],
        NEG)
    a_blk = jnp.take_along_axis(a_last, final_blank[:, None], axis=1)[:, 0]
    logp = _lae2(a_lab, a_blk)  # [B]

    res = (logits, emit, alpha, lab_ext, skip_add, valid_add,
           lab_len, logp)
    return -logp, res


def _backward(blank_id, res, dy):
    logits, emit, alpha, lab_ext, skip_add, valid_add, lab_len, logp = res
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    T, B, S = emit.shape
    C = log_probs.shape[-1]
    f32 = jnp.float32

    s_idx = jnp.arange(S)[None, :]
    fin = jnp.where(
        (s_idx == 2 * lab_len[:, None])
        | ((s_idx == 2 * lab_len[:, None] - 1) & (lab_len[:, None] > 0)),
        0.0, NEG).astype(f32)
    # skip transition OUT of s lands at s+2: allowed iff allow_skip[s+2]
    skip_from = jnp.concatenate(
        [skip_add[:, 2:], jnp.full((B, 2), NEG, f32)], axis=1)

    tc = _chunks(T, 32)
    bb = _chunks(B, 128)
    nt, nb = T // tc, B // bb
    row = lambda b, t: (b, 0)  # noqa: E731
    rev = lambda b, t: (nt - 1 - t, b, 0)  # noqa: E731

    p_state = pl.pallas_call(
        functools.partial(_beta_kernel, tc),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((tc, bb, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, bb, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, bb, S), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, S), f32),
        scratch_shapes=[pltpu.VMEM((bb, S), f32)],
        interpret=not _on_tpu(),
    )(emit, alpha, fin, skip_from, valid_add, logp[:, None])

    # Occupancy per class: occ[b,t,c] = sum_{s: ext[b,s]=c} p_state[t,b,s].
    onehot = (lab_ext[:, :, None] == jnp.arange(C)[None, None, :]).astype(f32)
    occ = jnp.einsum("tbs,bsc->btc", p_state, onehot)
    grad = (jnp.exp(log_probs) - occ) * dy[:, None, None]
    return grad.astype(logits.dtype), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _ctc_nll(logits, labels, blank_id):
    loss, _ = _forward(logits, labels, blank_id)
    return loss


def _vjp_fwd(logits, labels, blank_id):
    return _forward(logits, labels, blank_id)


def _vjp_bwd(blank_id, res, dy):
    return _backward(blank_id, res, dy)


_ctc_nll.defvjp(_vjp_fwd, _vjp_bwd)


def ctc_loss_kernel(logits, labels, blank_id: int = 59,
                    reduction: str = "mean"):
    """Pallas-kernel CTC loss for the training contract (full logit length,
    labels blank-padded). Same value and gradient as ops.ctc.ctc_loss.

    A batch that is odd/prime would make the kernels' batch-block divisor
    collapse to 1 (pathological grid overhead), so the batch is padded to a
    multiple of 8 with all-blank rows and the padded losses discarded —
    gradient flows only through the real rows."""
    B = logits.shape[0]
    pad = (-B) % 8
    if pad and B > 8:
        logits = jnp.concatenate(
            [logits, jnp.broadcast_to(logits[:1], (pad,) + logits.shape[1:])],
            axis=0)
        labels = jnp.concatenate(
            [labels, jnp.full((pad,) + labels.shape[1:], blank_id,
                              labels.dtype)], axis=0)
    loss = _ctc_nll(logits, labels, blank_id)[:B]
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(reduction)
