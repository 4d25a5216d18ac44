"""Whole-loop fused greedy decode kernel for the translation family.

Measured context (RESULTS.md round 4): the KV-cached serving decode costs
~23 us per step at batch 1 — the per-step XLA program is ~25 tiny ops
(LN/projections/attention/FFN over a [1, 208] activation row) and each op
carries fixed dispatch overhead, exactly the op-count-bound regime the
grid-pipelined encoder stacks (ops/fused_block.py) fused away for the CTC
families. This kernel runs the ENTIRE autoregressive greedy loop as ONE
Pallas kernel: the pallas grid dimension is the decode step, the ~2.6 MB of
decoder weights are VMEM-resident across all steps (constant index maps —
fetched once), the per-layer self-attention K/V caches live in VMEM scratch,
and the next-token embedding lookup is a one-hot matmul. Once every output
is EOS the whole step body is predicated off (``pl.when`` on an SMEM
``finished`` flag) — the in-kernel form of the host path's while_loop early
exit; dead grid steps cost only iteration overhead since the constant-index
weight blocks never re-stream. The output matches
:func:`ishara_tpu.decode.autoregressive.greedy_translate_cached`
(either ``early_exit`` mode — post-finish steps only ever append pad).

Reference behavior: the torch path has no generation loop at all (its
validate() argmaxes encoder states, integration.py:819-827); the decode
semantics fused here are this repo's ``DecoderLayer.step`` serving path
(models/seq2seq.py), itself the O(S) form of ``nn.TransformerDecoderLayer``
with norm_first=True (integration.py:367-377).

Head-blocked attention without per-head loops: with activations flattened to
[S, d] (head-major: feature index = h*Dh + dh), per-head scores are
``(k * q) @ M`` where M[dd, h] = [dd // Dh == h] — one MXU matmul instead of
H tiny per-head dots; the context is ``sum_s (p @ M.T) * v``. Summation sets
match the einsum exactly (f32 accumulate), so parity with the XLA path is at
float-associativity tolerance (token-exact in the tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _on_tpu

NEG = -1e30

# Mosaic VMEM budget for the whole-loop decode kernels. Everything the
# kernel touches is VMEM-resident for the entire decode (constant index
# maps), so the need is a closed-form function of the geometry — computed
# by :func:`fused_decode_vmem_bytes` and enforced by the wrappers, which
# fall back to the XLA while_loop paths instead of dying with a Mosaic
# scoped-VMEM compile error (VERDICT r4 weak #3: the selection-table
# discipline applied to these kernels). The default budget is calibrated
# on-chip by scripts/probe_decoder_vmem.py: the flagship geometry
# (~4.3 MB greedy / ~6.9 MB beam) compiles with wide margin; the v5e
# physical VMEM is 128 MiB and Mosaic reserves pipeline scratch, so the
# guard trips conservatively below that. Override with
# ISHARA_DECODE_VMEM_BUDGET (bytes) after re-calibrating on new hardware.
VMEM_BUDGET_BYTES = 96 * 2 ** 20


class DecoderVmemError(ValueError):
    """Raised when the fused decode kernel's VMEM need exceeds the budget."""


def fused_decode_vmem_bytes(d: int, H: int, L: int, C: int, T: int,
                            S: int, W: int = 1) -> int:
    """Closed-form VMEM bytes of the fused decode kernel (all f32):
    decoder weights + embedding/classifier + 2L cross-K/V [T, d] banks +
    2L self-attention cache banks [W*S, d] + carried state + outputs."""
    weights = (
        C * d + d + d * H + T                 # embed, sos row, headmap, memadd
        + 2 * d + d * C + C                   # decoder_norm, classifier
        + L * (14 * d * d + 15 * d)           # per layer: sa 4d^2, ca 2d^2,
    )                                         #   ffn 8d^2, norms/biases ~15d
    crosses = 2 * L * T * d
    scratch = W * d + W * S + W + 2 * L * W * S * d
    outputs = W * S + W
    return 4 * (weights + crosses + scratch + outputs)


def _decode_budget() -> int:
    import os

    return int(os.environ.get("ISHARA_DECODE_VMEM_BUDGET",
                              VMEM_BUDGET_BYTES))


def fused_decode_fits(model, T: int, max_len: int = 64,
                      beam_width: int = 1) -> bool:
    """True when the fused whole-loop kernel's VMEM need fits the budget at
    this geometry; callers that get False should use the XLA while_loop
    decode (``greedy_translate_cached`` / ``beam_translate_cached``)."""
    need = fused_decode_vmem_bytes(
        model.feature_dim, model.num_heads, model.num_decoder_layers,
        model.num_classes, T, max_len, beam_width)
    return need <= _decode_budget()


def _ln(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _mm(a, w):
    return jnp.dot(a.astype(jnp.float32), w.astype(jnp.float32),
                   preferred_element_type=jnp.float32)


def _attend(q, k, v, headmap, scale, maskadd):
    """One query row against a key/value bank.

    q [1, d]; k, v [S, d] head-major flattened; headmap [d, H];
    maskadd [S, 1] additive (0 visible / NEG hidden). Returns [1, d]."""
    s = _mm(k * q, headmap) * scale + maskadd          # [S, H]
    s = s - jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=0, keepdims=True)
    pd = jax.lax.dot_general(                           # p @ headmap.T
        p, headmap, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [S, d]
    return jnp.sum(pd * v, axis=0, keepdims=True)       # [1, d]


def _decoder_layer_step(x, kc_ref, vc_ref, kx, vx, w, headmap, scale,
                        step, memadd, ln_eps):
    """One DecoderLayer.step (models/seq2seq.py:282-313) against VMEM cache
    scratch refs. ``step`` is the grid index (= cache row to write); the
    caller predicates the whole step on the not-finished flag, so post-EOS
    steps never reach these cache writes."""
    (n1g, n1b, qw, qb, kw, kb, vw, vb, ow, ob,
     n2g, n2b, cqw, cqb, cow, cob,
     n3g, n3b, f1w, f1b, f2w, f2b) = w
    S = kc_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)

    # self-attention against the carried cache
    h = _ln(x, n1g, n1b, ln_eps)
    q = _mm(h, qw) + qb
    k_new = _mm(h, kw) + kb
    v_new = _mm(h, vw) + vb
    upd = rows == step                                  # [S, 1]
    kc_ref[:] = jnp.where(upd, k_new, kc_ref[:])
    vc_ref[:] = jnp.where(upd, v_new, vc_ref[:])
    visadd = jnp.where(rows <= step, 0.0, NEG)          # causal visibility
    ctx = _attend(q, kc_ref[:], vc_ref[:], headmap, scale, visadd)
    x = x + _mm(ctx, ow) + ob

    # cross-attention against the precomputed memory K/V
    h = _ln(x, n2g, n2b, ln_eps)
    q = _mm(h, cqw) + cqb
    ctx = _attend(q, kx, vx, headmap, scale, memadd)
    x = x + _mm(ctx, cow) + cob

    # FFN (relu, dropout sites are serving no-ops)
    h = _ln(x, n3g, n3b, ln_eps)
    return x + _mm(jax.nn.relu(_mm(h, f1w) + f1b), f2w) + f2b


def _decode_kernel(n_layers, sos, eos, pad, ln_eps, scale, treedef,
                   *refs):
    n_scratch = 3 + 2 * n_layers
    ins = refs[: -1 - n_scratch]
    tok_ref = refs[-1 - n_scratch]
    emb, toks, fin = refs[-n_scratch: -n_scratch + 3]
    cache_refs = refs[-n_scratch + 3:]

    i = pl.program_id(0)
    S_out = toks.shape[1]

    @pl.when(i == 0)
    def _():
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, S_out), 1)
        emb[:] = ins[0][:]                               # sos embedding row
        toks[:] = jnp.where(lanes == 0, sos, pad)
        fin[0, 0] = 0
        for r in cache_refs:
            r[:] = jnp.zeros_like(r)  # garbage V rows would NaN-poison p*v

    # in-kernel EOS early exit: once finished, the whole step body is
    # predicated off — dead grid steps cost only the iteration overhead
    # (the weight blocks have constant index maps, so nothing re-streams)
    @pl.when(fin[0, 0] == 0)
    def _():
        (sos_emb, embed, headmap, memadd, dng, dnb, clsw, clsb,
         layer_ws, crosses) = jax.tree_util.tree_unflatten(
            treedef, [r[:] for r in ins])
        C = embed.shape[0]
        lanes_S = jax.lax.broadcasted_iota(jnp.int32, (1, S_out), 1)
        lanes_C = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

        x = emb[:]
        for li in range(n_layers):
            kx, vx = crosses[li]
            x = _decoder_layer_step(
                x, cache_refs[2 * li], cache_refs[2 * li + 1], kx, vx,
                layer_ws[li], headmap, scale, i, memadd, ln_eps)

        logits = _mm(_ln(x, dng, dnb, ln_eps), clsw) + clsb  # [1, C]
        mx = jnp.max(logits, axis=1, keepdims=True)
        # first-max index == jnp.argmax tie-breaking
        nxt = jnp.min(jnp.where(logits == mx, lanes_C, C), axis=1,
                      keepdims=True)

        toks[:] = jnp.where(lanes_S == i + 1, nxt, toks[:])
        fin[0, 0] = jnp.sum(jnp.where(nxt == eos, 1, 0))
        onehot = (lanes_C == nxt).astype(jnp.float32)    # [1, C]
        emb[:] = _mm(onehot, embed)

    tok_ref[:] = toks[:]


def _layer_args(p):
    row = lambda v: jnp.asarray(v, jnp.float32)[None, :]  # noqa: E731
    mat = lambda v: jnp.asarray(v, jnp.float32)  # noqa: E731
    return (
        row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
        mat(p["sa_q"]["kernel"]), row(p["sa_q"]["bias"]),
        mat(p["sa_k"]["kernel"]), row(p["sa_k"]["bias"]),
        mat(p["sa_v"]["kernel"]), row(p["sa_v"]["bias"]),
        mat(p["sa_out"]["kernel"]), row(p["sa_out"]["bias"]),
        row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
        mat(p["ca_q"]["kernel"]), row(p["ca_q"]["bias"]),
        mat(p["ca_out"]["kernel"]), row(p["ca_out"]["bias"]),
        row(p["norm3"]["scale"]), row(p["norm3"]["bias"]),
        mat(p["fc1"]["kernel"]), row(p["fc1"]["bias"]),
        mat(p["fc2"]["kernel"]), row(p["fc2"]["bias"]),
    )


def fused_greedy_decode(model, variables, memory, mask=None, *,
                        max_len: int = 64, sos: int = 1, eos: int = 2,
                        pad: int = 0, interpret: bool | None = None):
    """Greedy-decode ``memory`` [1, T, d] (the output of ``model.encode``)
    with one Pallas kernel for the whole loop. Returns tokens [1, max_len]
    equal to ``greedy_translate_cached``'s (tests/test_decoder_kernel.py).

    ``mask`` [1, T] bool marks valid memory frames (as in ``decode_step``).
    Weights are loaded f32 (they stream HBM->VMEM once for all steps, so
    storage-dtype games buy nothing here)."""
    if interpret is None:
        interpret = not _on_tpu()
    if memory.shape[0] != 1:
        raise ValueError("fused decode serves one sequence at a time")
    params = variables["params"]
    d = model.feature_dim
    H = model.num_heads
    L = model.num_decoder_layers
    C = model.num_classes
    Dh = d // H
    T = memory.shape[1]
    need = fused_decode_vmem_bytes(d, H, L, C, T, max_len)
    if need > _decode_budget():
        raise DecoderVmemError(
            f"fused greedy decode needs {need / 2**20:.1f} MiB VMEM "
            f"(budget {_decode_budget() / 2**20:.1f} MiB) at dim={d} L={L} "
            f"T={T} S={max_len}; use greedy_translate_cached")
    # the model builds DecoderLayer(...) with flax-default LN eps handling:
    # LN_EPS from models/seq2seq.py (1e-6)
    from ..models.seq2seq import LN_EPS as MODEL_LN_EPS

    cross = model.apply(variables, memory, method=model.cross_kv)
    crosses = tuple(
        (k[0].reshape(T, d).astype(jnp.float32),
         v[0].reshape(T, d).astype(jnp.float32))
        for k, v in cross
    )
    embed = jnp.asarray(params["target_embedding"]["embedding"], jnp.float32)
    sos_emb = embed[sos][None, :]
    dd = jnp.arange(d) // Dh
    headmap = (dd[:, None] == jnp.arange(H)[None, :]).astype(jnp.float32)
    if mask is not None:
        memadd = jnp.where(jnp.asarray(mask[0], bool), 0.0, NEG)[
            :, None].astype(jnp.float32)
    else:
        memadd = jnp.zeros((T, 1), jnp.float32)
    layer_ws = tuple(_layer_args(params[f"decoder_layers_{i}"])
                     for i in range(L))
    args = (sos_emb, embed, headmap, memadd,
            jnp.asarray(params["decoder_norm"]["scale"],
                        jnp.float32)[None, :],
            jnp.asarray(params["decoder_norm"]["bias"], jnp.float32)[None, :],
            jnp.asarray(params["classifier"]["kernel"], jnp.float32),
            jnp.asarray(params["classifier"]["bias"], jnp.float32)[None, :],
            layer_ws, crosses)
    flat, treedef = jax.tree_util.tree_flatten(args)

    kernel = functools.partial(
        _decode_kernel, L, sos, eos, pad, MODEL_LN_EPS, Dh ** -0.5, treedef)
    const = lambda *_: tuple([0] * 2)  # noqa: E731

    def inspec(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    tokens = pl.pallas_call(
        kernel,
        grid=(max_len - 1,),
        in_specs=[inspec(a) for a in flat],
        out_specs=pl.BlockSpec((1, max_len), const, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, max_len), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),          # carried embedding
            pltpu.VMEM((1, max_len), jnp.int32),      # token accumulator
            pltpu.SMEM((1, 1), jnp.int32),            # finished flag
        ] + [pltpu.VMEM((max_len, d), jnp.float32)
             for _ in range(2 * L)],                  # per-layer K/V caches
        interpret=interpret,
    )(*flat)
    return tokens


def fused_greedy_translate(model, variables, x, mask=None, *,
                           max_len: int = 64, sos: int = 1, eos: int = 2,
                           pad: int = 0, interpret: bool | None = None):
    """Drop-in for ``greedy_translate_cached`` (same contract: x [1, T, 92,
    3] -> (tokens [1, max_len], confidence)): XLA encoder + cross-K/V, then
    the whole decode loop as one Pallas kernel.

    Geometry guard: when the kernel's VMEM need exceeds the budget (bigger
    decoder / longer memory), this falls back to the measured XLA
    while_loop path with a one-line log instead of dying in Mosaic."""
    if not fused_decode_fits(model, x.shape[1], max_len):
        import logging

        logging.getLogger(__name__).warning(
            "fused greedy decode exceeds the VMEM budget at dim=%d L=%d "
            "T=%d S=%d; falling back to the XLA while_loop path",
            model.feature_dim, model.num_decoder_layers, x.shape[1], max_len)
        from ..decode.autoregressive import greedy_translate_cached

        return greedy_translate_cached(model, variables, x, mask,
                                       max_len=max_len, sos=sos, eos=eos,
                                       pad=pad)
    memory, confidence = model.apply(
        variables, x, mask, training=False, method=model.encode)
    tokens = fused_greedy_decode(
        model, variables, memory, mask, max_len=max_len,
        sos=sos, eos=eos, pad=pad, interpret=interpret)
    return tokens, confidence


# ---------------------------------------------------------------------------
# Whole-loop fused BEAM search (decode/autoregressive.py beam_translate_cached
# semantics, W beams in one kernel)
# ---------------------------------------------------------------------------
#
# The beam state rides the kernel the same way the greedy state does, with
# three additions, all expressed as static-shape vector arithmetic (Mosaic
# has no dynamic gather/scatter):
#   * top-W over the [W, C] continuation matrix = W rounds of stable
#     first-max extraction (max value, then the smallest untaken flat index
#     among value ties — exactly jax.lax.top_k's stable-descending order);
#   * parent reordering of tokens/finished = a [W, W] one-hot selection
#     matrix (parent_col == cols) applied as an MXU matmul (token ids < C
#     are exact in f32);
#   * parent reordering of the [W*S, d] K/V caches = per-(w, p) static
#     block slices scaled by sel[w, p] and re-concatenated (16 tiny VPU
#     multiply-adds at W=4 — no dynamic leading-index loads needed).


def _decoder_layer_step_beam(x, kc_ref, vc_ref, kx, vx, w, headmap, scale,
                             step, memadd, ln_eps, W, S):
    """DecoderLayer.step over W beam rows; caches are [W*S, d] refs with
    beam w's bank in rows [w*S, (w+1)*S)."""
    (n1g, n1b, qw, qb, kw, kb, vw, vb, ow, ob,
     n2g, n2b, cqw, cqb, cow, cob,
     n3g, n3b, f1w, f1b, f2w, f2b) = w
    rows_ws = jax.lax.broadcasted_iota(jnp.int32, (W * S, 1), 0)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    rows_s = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)

    h = _ln(x, n1g, n1b, ln_eps)                        # [W, d]
    q = _mm(h, qw) + qb
    k_new = _mm(h, kw) + kb
    v_new = _mm(h, vw) + vb
    # expand per-beam rows to their cache banks and write row ``step``
    expand = ((rows_ws // S) == cols_w).astype(jnp.float32)  # [W*S, W]
    upd = (rows_ws % S) == step
    kc_ref[:] = jnp.where(upd, _mm(expand, k_new), kc_ref[:])
    vc_ref[:] = jnp.where(upd, _mm(expand, v_new), vc_ref[:])
    kc, vc = kc_ref[:], vc_ref[:]
    visadd = jnp.where(rows_s <= step, 0.0, NEG)

    ctx = jnp.concatenate(
        [_attend(q[b: b + 1], kc[b * S: (b + 1) * S],
                 vc[b * S: (b + 1) * S], headmap, scale, visadd)
         for b in range(W)], axis=0)                    # [W, d]
    x = x + _mm(ctx, ow) + ob

    h = _ln(x, n2g, n2b, ln_eps)
    q = _mm(h, cqw) + cqb
    ctx = jnp.concatenate(
        [_attend(q[b: b + 1], kx, vx, headmap, scale, memadd)
         for b in range(W)], axis=0)
    x = x + _mm(ctx, cow) + cob

    h = _ln(x, n3g, n3b, ln_eps)
    return x + _mm(jax.nn.relu(_mm(h, f1w) + f1b), f2w) + f2b


def _beam_kernel(n_layers, W, sos, eos, pad, ln_eps, scale, treedef, *refs):
    n_scratch = 4 + 2 * n_layers
    ins = refs[: -2 - n_scratch]
    tok_ref, sc_ref = refs[-2 - n_scratch: -n_scratch]
    emb, toks, scores, fin = refs[-n_scratch: -n_scratch + 4]
    cache_refs = refs[-n_scratch + 4:]

    i = pl.program_id(0)
    S_out = toks.shape[1]
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    lanes_S = jax.lax.broadcasted_iota(jnp.int32, (1, S_out), 1)

    @pl.when(i == 0)
    def _():
        sos_emb = ins[0][:]
        emb[:] = sos_emb * jnp.ones((W, 1), jnp.float32)
        toks[:] = jnp.where(lanes_S == 0, sos, pad) + jnp.zeros(
            (W, 1), jnp.int32)
        # only beam 0 live at the first step (all beams start identically);
        # -1e30 plays host -inf: never selected while any live beam offers
        # C finite continuations (W <= C is asserted by the wrapper)
        scores[:] = jnp.where(rows_w == 0, 0.0, NEG).astype(jnp.float32)
        fin[0, 0] = 0
        for r in cache_refs:
            r[:] = jnp.zeros_like(r)

    @pl.when(fin[0, 0] == 0)
    def _():
        (sos_emb, embed, headmap, memadd, dng, dnb, clsw, clsb,
         layer_ws, crosses) = jax.tree_util.tree_unflatten(
            treedef, [r[:] for r in ins])
        C = embed.shape[0]
        lanes_C = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        S = cache_refs[0].shape[0] // W

        x = emb[:]
        for li in range(n_layers):
            kx, vx = crosses[li]
            x = _decoder_layer_step_beam(
                x, cache_refs[2 * li], cache_refs[2 * li + 1], kx, vx,
                layer_ws[li], headmap, scale, i, memadd, ln_eps, W, S)

        logits = _mm(_ln(x, dng, dnb, ln_eps), clsw) + clsb   # [W, C]
        mx = jnp.max(logits, axis=1, keepdims=True)
        shifted = logits - mx
        logp = shifted - jnp.log(
            jnp.sum(jnp.exp(shifted), axis=1, keepdims=True))
        # finished beams extend only with pad, at no cost; a beam is
        # finished iff its (parent-reordered) token row contains eos —
        # equivalent to the host's carried finished[parent] | (tok == eos)
        fin_row = jnp.where(lanes_C == pad, 0.0, NEG)
        finished = jnp.sum((toks[:] == eos).astype(jnp.int32), axis=1,
                           keepdims=True) > 0                  # [W, 1]
        logp = jnp.where(finished, fin_row, logp)
        total = scores[:] + logp                              # [W, C]

        # stable top-W extraction over the flattened [W, C] continuations
        flat_idx = rows_w * C + lanes_C                       # [W, C]
        taken = jnp.zeros((W, C), bool)
        parent_col = jnp.zeros((W, 1), jnp.int32)
        tok_col = jnp.zeros((W, 1), jnp.int32)
        new_scores = jnp.zeros((W, 1), jnp.float32)
        BIG = W * C + 1
        zW_f = jnp.zeros((W, 1), jnp.float32)
        zW_i = jnp.zeros((W, 1), jnp.int32)
        for j in range(W):
            cur = jnp.where(taken, NEG * 2.0, total)
            # global max/argmin staged through [W, 1] columns: a [1, 1]
            # value may broadcast along sublanes OR lanes but not both at
            # once on Mosaic, so it never meets a [W, C] operand directly
            mxv = jnp.max(jnp.max(cur, axis=1, keepdims=True),
                          axis=0, keepdims=True) + zW_f       # [W, 1]
            fi = jnp.min(jnp.min(
                jnp.where((total == mxv) & ~taken, flat_idx, BIG),
                axis=1, keepdims=True), axis=0, keepdims=True) + zW_i
            parent_col = jnp.where(rows_w == j, fi // C, parent_col)
            tok_col = jnp.where(rows_w == j, fi % C, tok_col)
            new_scores = jnp.where(rows_w == j, mxv, new_scores)
            taken = taken | (flat_idx == fi)

        sel = (parent_col == cols_w).astype(jnp.float32)      # [W, W]
        new_toks = _mm(sel, toks[:].astype(jnp.float32))      # [W, S]
        new_toks = jnp.where(lanes_S == i + 1,
                             tok_col.astype(jnp.float32), new_toks)
        toks[:] = new_toks.astype(jnp.int32)
        scores[:] = new_scores
        # cache reorder as ONE [W*S, W*S] selection matmul per bank:
        # P[r, c] = 1 iff row r's beam takes its bank from row c's beam
        # (parent) AND r, c index the same in-bank position. Built purely
        # from iota compares (no [1, 1]-to-2D broadcasts — Mosaic cannot
        # broadcast in sublanes and lanes at once).
        rows_ws = jax.lax.broadcasted_iota(jnp.int32, (W * S, 1), 0)
        cols_ws = jax.lax.broadcasted_iota(jnp.int32, (1, W * S), 1)
        expand = ((rows_ws // S) == cols_w).astype(jnp.float32)  # [W*S, W]
        parent_rows = _mm(expand, parent_col.astype(jnp.float32))
        P = ((parent_rows == (cols_ws // S).astype(jnp.float32)) &
             ((rows_ws % S) == (cols_ws % S))).astype(jnp.float32)
        for r in cache_refs:
            r[:] = _mm(P, r[:])
        onehot = (lanes_C == tok_col).astype(jnp.float32)     # [W, C]
        emb[:] = _mm(onehot, embed)
        # all beams finished (eos somewhere in every row) -> stop
        any_eos = jnp.sum((toks[:] == eos).astype(jnp.int32), axis=1,
                          keepdims=True)                      # [W, 1]
        fin[0, 0] = jnp.sum(jnp.where(
            jnp.min(any_eos, axis=0, keepdims=True) > 0, 1, 0))

    tok_ref[:] = toks[:]
    sc_ref[:] = scores[:]


def fused_beam_decode(model, variables, memory, mask=None, *,
                      max_len: int = 64, beam_width: int = 4, sos: int = 1,
                      eos: int = 2, pad: int = 0,
                      interpret: bool | None = None):
    """Beam-search ``memory`` [1, T, d] with one Pallas kernel for the whole
    loop. Returns (tokens [W, max_len], scores [W, 1]) — all beams, final
    raw log-prob scores; the wrapper applies the length penalty and picks
    the best (matching ``beam_translate_cached``'s tail)."""
    if interpret is None:
        interpret = not _on_tpu()
    if memory.shape[0] != 1:
        raise ValueError("beam decode serves one sequence at a time")
    params = variables["params"]
    d = model.feature_dim
    H = model.num_heads
    L = model.num_decoder_layers
    C = model.num_classes
    W = beam_width
    if W > C:
        raise ValueError(f"beam_width {W} > num_classes {C}")
    Dh = d // H
    T = memory.shape[1]
    need = fused_decode_vmem_bytes(d, H, L, C, T, max_len, W)
    if need > _decode_budget():
        raise DecoderVmemError(
            f"fused beam decode needs {need / 2**20:.1f} MiB VMEM "
            f"(budget {_decode_budget() / 2**20:.1f} MiB) at dim={d} L={L} "
            f"T={T} S={max_len} W={W}; use beam_translate_cached")
    from ..models.seq2seq import LN_EPS as MODEL_LN_EPS

    cross = model.apply(variables, memory, method=model.cross_kv)
    crosses = tuple(
        (k[0].reshape(T, d).astype(jnp.float32),
         v[0].reshape(T, d).astype(jnp.float32))
        for k, v in cross
    )
    embed = jnp.asarray(params["target_embedding"]["embedding"], jnp.float32)
    sos_emb = embed[sos][None, :]
    dd = jnp.arange(d) // Dh
    headmap = (dd[:, None] == jnp.arange(H)[None, :]).astype(jnp.float32)
    if mask is not None:
        memadd = jnp.where(jnp.asarray(mask[0], bool), 0.0, NEG)[
            :, None].astype(jnp.float32)
    else:
        memadd = jnp.zeros((T, 1), jnp.float32)
    layer_ws = tuple(_layer_args(params[f"decoder_layers_{i}"])
                     for i in range(L))
    args = (sos_emb, embed, headmap, memadd,
            jnp.asarray(params["decoder_norm"]["scale"],
                        jnp.float32)[None, :],
            jnp.asarray(params["decoder_norm"]["bias"], jnp.float32)[None, :],
            jnp.asarray(params["classifier"]["kernel"], jnp.float32),
            jnp.asarray(params["classifier"]["bias"], jnp.float32)[None, :],
            layer_ws, crosses)
    flat, treedef = jax.tree_util.tree_flatten(args)

    kernel = functools.partial(
        _beam_kernel, L, W, sos, eos, pad, MODEL_LN_EPS, Dh ** -0.5, treedef)

    def inspec(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    tokens, scores = pl.pallas_call(
        kernel,
        grid=(max_len - 1,),
        in_specs=[inspec(a) for a in flat],
        out_specs=[
            pl.BlockSpec((W, max_len), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((W, max_len), jnp.int32),
            jax.ShapeDtypeStruct((W, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, d), jnp.float32),          # carried embeddings
            pltpu.VMEM((W, max_len), jnp.int32),      # token accumulator
            pltpu.VMEM((W, 1), jnp.float32),          # beam scores
            pltpu.SMEM((1, 1), jnp.int32),            # all-finished flag
        ] + [pltpu.VMEM((W * max_len, d), jnp.float32)
             for _ in range(2 * L)],                  # per-layer K/V banks
        interpret=interpret,
    )(*flat)
    return tokens, scores


def fused_beam_translate(model, variables, x, mask=None, *,
                         max_len: int = 64, beam_width: int = 4,
                         sos: int = 1, eos: int = 2, pad: int = 0,
                         length_penalty: float = 0.0,
                         interpret: bool | None = None):
    """Drop-in for ``beam_translate_cached`` (returns (tokens [1, max_len],
    confidence, best score)): XLA encoder + cross-K/V, one Pallas kernel for
    the whole beam loop, then the oracle's length-penalty/argmax tail.

    Geometry guard: falls back to the XLA while_loop beam path (one-line
    log) when the kernel's VMEM need exceeds the budget."""
    if not fused_decode_fits(model, x.shape[1], max_len, beam_width):
        import logging

        logging.getLogger(__name__).warning(
            "fused beam decode exceeds the VMEM budget at dim=%d L=%d T=%d "
            "S=%d W=%d; falling back to the XLA while_loop path",
            model.feature_dim, model.num_decoder_layers, x.shape[1], max_len,
            beam_width)
        from ..decode.autoregressive import beam_translate_cached

        return beam_translate_cached(model, variables, x, mask,
                                     max_len=max_len, beam_width=beam_width,
                                     length_penalty=length_penalty,
                                     sos=sos, eos=eos, pad=pad)
    memory, confidence = model.apply(
        variables, x, mask, training=False, method=model.encode)
    tokens, scores = fused_beam_decode(
        model, variables, memory, mask, max_len=max_len,
        beam_width=beam_width, sos=sos, eos=eos, pad=pad,
        interpret=interpret)
    scores = scores[:, 0]
    if length_penalty > 0.0:
        gen = tokens[:, 1:]
        lengths = jnp.sum((gen != pad) & (gen != eos), axis=1)
        scores = scores / jnp.maximum(lengths, 1).astype(
            jnp.float32) ** length_penalty
    best = jnp.argmax(scores)
    return tokens[best][None], confidence, scores[best]
