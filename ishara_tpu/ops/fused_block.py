"""Whole-block fused Pallas kernels for batch-1 serving.

Measured context (RESULTS.md): the batch-1 serving executable is *op-count*
bound, not bandwidth bound — activations at [T=176, 256] are ~180 KB while
each of the ~40 XLA ops per encoder block carries fixed dispatch/scheduling
overhead, and every op re-streams its weights from HBM anyway. Fusing one
entire block (LN -> FFN -> LN -> MHSA -> conv module(SE/BN) -> LN -> FFN,
residuals included) into ONE Pallas kernel removes that overhead: the block's
~4.2 MB of weights stream HBM->VMEM once and all compute (MXU matmuls per
head, VPU elementwise) happens on-chip, approaching the weight-streaming
roofline (~32 us f32 for the whole 26 MB model).

Forward-only by design — this is the serving path; training keeps XLA's
autodiff'd graph (where batch=256 fusion economics differ, see RESULTS.md).

Semantics are exactly ``models.blocks.SqueezeformerBlock`` /
``models.blocks.ConformerBlock`` in eval mode (all the reference quirks:
full-dim attention scale, shared ``ln1`` in the conformer, default-eps norms
in its conv module, causal vs 'same' depthwise convs, masked GAP in SE).
Parity is enforced by tests/test_fused_block.py against the flax modules.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _on_tpu

LN_EPS = 1e-6
LN_EPS_DEFAULT = 1e-3
BN_EPS = 1e-3
NEG = -1e30


def _ln(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _mm(a, w):
    """[T, I] @ [I, O] on the MXU, f32 operands/accumulate.

    Weights arrive at the STORAGE dtype (bf16 serving default — halves the
    HBM->VMEM stream, which is the kernel's bottleneck) and are upcast at
    the dot: on v5e, f32-operand Mosaic dots measured 1.7x faster than
    bf16-operand dots (61.7 -> 46.2 us whole-encoder with bf16 streaming;
    bf16-operand dots hit a relayout slow path — RESULTS.md round 2).

    ``w`` may also be an int8 pair ``(q [I, O] int8, scale [1, O] f32)``
    (the export/QAT symmetric per-output-channel scheme): the quarter-width
    matrix streams HBM->VMEM, the dot runs on the upcast f32 operands, and
    the per-channel scale folds in AFTER the dot — mathematically identical
    to dequantize-then-dot (sum_i a_i q_ij) * s_j == sum_i a_i (q_ij s_j),
    but the scale multiply touches [T, O] instead of [I, O]."""
    if isinstance(w, tuple):
        q, s = w
        return jnp.dot(a.astype(jnp.float32), q.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * s
    return jnp.dot(a.astype(jnp.float32), w.astype(jnp.float32),
                   preferred_element_type=jnp.float32)


def _mhsa(x, maskrow, qkv_w, proj_w, num_heads, dim):
    """Fused-QKV attention, reference full-dim scale; maskrow [1, T] of 1/0."""
    dh = dim // num_heads
    qkv = _mm(x, qkv_w)  # [T, 3*dim] laid out per head as [q|k|v] blocks
    bias = (1.0 - maskrow) * NEG  # 0 where valid, NEG (-1e30) at padding
    scale = dim ** -0.5
    outs = []
    # per-head dots run with bf16 operands (f32 accumulate): unlike the
    # weight matmuls these are activation×activation products where the
    # bf16 MXU path measured faster (71 -> 46 us whole-encoder on v5e);
    # int8-stored weights keep the bf16 activation path (activations are
    # never int8 — only the HBM-resident weights are)
    adt = jnp.bfloat16 if isinstance(qkv_w, tuple) else qkv_w.dtype
    for h in range(num_heads):
        base = h * 3 * dh
        q = qkv[:, base: base + dh].astype(adt)
        k = qkv[:, base + dh: base + 2 * dh].astype(adt)
        v = qkv[:, base + 2 * dh: base + 3 * dh].astype(adt)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(adt), v,
                            preferred_element_type=jnp.float32))
    # static concat: Mosaic has no dynamic_update_slice lowering (the
    # value-level .at[].set alternative lowers to exactly that primitive)
    return _mm(jnp.concatenate(outs, axis=1), proj_w)


def _is_q(v):
    """An export-scheme int8 leaf: {"q": int8 [..., O], "scale": f32 [O]}."""
    return isinstance(v, dict) and set(v.keys()) == {"q", "scale"}


def _deq(v):
    """Dequantize an export-scheme leaf (float leaves pass through), f32."""
    if _is_q(v):
        return jnp.asarray(v["q"], jnp.float32) * jnp.asarray(
            v["scale"], jnp.float32)
    return jnp.asarray(v, jnp.float32)


def _mat_fn(dt):
    """Matmul-weight loader for storage mode ``dt``: a float dtype, or the
    string "int8" — leaves must then be export-scheme {"q","scale"} dicts
    (quantize_serving_weights) and are handed to the kernel as
    (q int8, scale-row f32) pairs that ``_mm`` consumes."""
    if dt == "int8":
        def mat(v):
            if not _is_q(v):
                raise ValueError(
                    'compute_dtype="int8" requires params quantized with '
                    "quantize_serving_weights (the export int8 scheme)")
            return (jnp.asarray(v["q"], jnp.int8),
                    jnp.asarray(v["scale"], jnp.float32)[None, :])
        return mat
    return lambda v: jnp.asarray(_deq(v), dt)


def _first(v):
    """Drop a leading singleton kernel axis ([1, I, O] conv1x1 -> [I, O]),
    through either a float leaf or an int8 {"q","scale"} dict."""
    if _is_q(v):
        return {"q": v["q"][0], "scale": v["scale"]}
    return v[0]


def quantize_serving_weights(tree):
    """Host-side symmetric per-output-channel int8 on >=2-D float kernels —
    exactly the export scheme (serve/export._quantize_tree, bit-matched by
    TrainConfig.qat's fake-quantizer), so the int8-fused serving path
    computes the same numerics an int8 export bundle deploys."""
    from ..serve.export import _quantize_tree

    return _quantize_tree(tree)


def _masked_gap(x, maskrow):
    m = maskrow.T  # [T, 1]
    return jnp.sum(x * m, axis=0, keepdims=True) / jnp.maximum(
        jnp.sum(m), 1.0)  # [1, C]


def _dwconv(h, w, causal: bool):
    """Depthwise conv over time. w [k, C]; causal left-pads k-1, else 'same'."""
    k = w.shape[0]
    T = h.shape[0]
    pad = (k - 1, 0) if causal else ((k - 1) // 2, k // 2)
    hp = jnp.pad(h, (pad, (0, 0)))
    out = jnp.zeros_like(h)
    for i in range(k):
        out = out + hp[i: i + T] * w[i][None, :]
    return out


def _ffn(x, w1, b1, w2, b2):
    return _mm(_swish(_mm(x, w1) + b1), w2) + b2


# ---------------------------------------------------------------------------
# Squeezeformer block (reference nb cell 5 SqueezeformerBlock, eval mode)
# ---------------------------------------------------------------------------

def _squeeze_body(num_heads, dim, x, maskrow,
                  n1g, n1b, f1w1, f1b1, f1w2, f1b2,
                  n2g, n2b, qkvw, projw,
                  cng, cnb, pw1w, pw1b, dww, pw2w, pw2b,
                  se1w, se1b, se2w, se2b,
                  n3g, n3b, f2w1, f2b1, f2w2, f2b2):
    # FFN1
    x = x + _ffn(_ln(x, n1g, n1b, LN_EPS), f1w1, f1b1, f1w2, f1b2)
    # MHSA
    x = x + _mhsa(_ln(x, n2g, n2b, LN_EPS), maskrow,
                  qkvw, projw, num_heads, dim)
    # Conv module: LN -> pw1 swish -> causal dw swish -> pw2 -> SE -> +res
    h = _ln(x, cng, cnb, LN_EPS)
    h = _swish(_mm(h, pw1w) + pw1b)
    h = _swish(_dwconv(h, dww, causal=True))
    h = _mm(h, pw2w) + pw2b
    g = _masked_gap(h, maskrow)
    g = _swish(_mm(g, se1w) + se1b)
    g = jax.nn.sigmoid(_mm(g, se2w) + se2b)
    x = x + h * g
    # FFN2
    return x + _ffn(_ln(x, n3g, n3b, LN_EPS), f2w1, f2b1, f2w2, f2b2)


def _squeeze_kernel(num_heads, dim, treedef, x_ref, mask_ref, *rest):
    *w, o_ref = rest
    args = jax.tree_util.tree_unflatten(treedef, [r[:] for r in w])
    o_ref[:] = _squeeze_body(
        num_heads, dim, x_ref[:].astype(jnp.float32),
        mask_ref[:].astype(jnp.float32), *args
    ).astype(o_ref.dtype)


def _squeeze_args(p, dt):
    """Flatten a flax SqueezeformerBlock param dict into the kernel order.
    Matmul weights are stored at ``dt`` (halves the HBM->VMEM stream at
    bf16, quarters it at "int8" — see ``_mm``/``_mat_fn``); vectors stay
    f32."""
    row = lambda v: jnp.asarray(v, jnp.float32)[None, :]  # noqa: E731
    mat = _mat_fn(dt)
    c = p["conv"]
    return (
        row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
        mat(p["ffn1"]["fc1"]["kernel"]), row(p["ffn1"]["fc1"]["bias"]),
        mat(p["ffn1"]["fc2"]["kernel"]), row(p["ffn1"]["fc2"]["bias"]),
        row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
        mat(p["mha"]["qkv"]["kernel"]), mat(p["mha"]["proj"]["kernel"]),
        row(c["norm"]["scale"]), row(c["norm"]["bias"]),
        mat(_first(c["pw1"]["kernel"])), row(c["pw1"]["bias"]),
        _deq(c["dw"]["dwconv"]["kernel"])[:, 0, :],
        mat(_first(c["pw2"]["kernel"])), row(c["pw2"]["bias"]),
        mat(c["se"]["fc1"]["kernel"]), row(c["se"]["fc1"]["bias"]),
        mat(c["se"]["fc2"]["kernel"]), row(c["se"]["fc2"]["bias"]),
        row(p["norm3"]["scale"]), row(p["norm3"]["bias"]),
        mat(p["ffn2"]["fc1"]["kernel"]), row(p["ffn2"]["fc1"]["bias"]),
        mat(p["ffn2"]["fc2"]["kernel"]), row(p["ffn2"]["fc2"]["bias"]),
    )


# ---------------------------------------------------------------------------
# Conformer block (reference nb cell 5 ConformerBlock, eval mode)
# ---------------------------------------------------------------------------

def _conformer_body(num_heads, dim, x, maskrow,
                    l1g, l1b, f1w1, f1b1, f1w2, f1b2,
                    qkvw, projw,
                    pw1w, pw1b, dww, dwb, bng, bnb, bnm, bnv,
                    pw2w, pw2b, clng, clnb,
                    l2g, l2b, f2w1, f2b1, f2w2, f2b2):
    # FFN1 and MHSA share ln1 (reference quirk)
    x = x + _ffn(_ln(x, l1g, l1b, LN_EPS), f1w1, f1b1, f1w2, f1b2)
    x = x + _mhsa(_ln(x, l1g, l1b, LN_EPS), maskrow,
                  qkvw, projw, num_heads, dim)
    # Conv module: pw1 -> GLU -> 'same' dw(+bias) -> BN(stats) -> pw2
    # -> LN(x + res), default-eps norms (reference quirk)
    res = x
    h = _mm(x, pw1w) + pw1b
    a, b = h[:, :dim], h[:, dim:]
    h = a * jax.nn.sigmoid(b)
    h = _dwconv(h, dww, causal=False) + dwb
    h = (h - bnm) * jax.lax.rsqrt(bnv + BN_EPS) * bng + bnb
    h = _mm(h, pw2w) + pw2b
    x = _ln(h + res, clng, clnb, LN_EPS_DEFAULT)
    # FFN2
    return x + _ffn(_ln(x, l2g, l2b, LN_EPS), f2w1, f2b1, f2w2, f2b2)


def _conformer_kernel(num_heads, dim, treedef, x_ref, mask_ref, *rest):
    *w, o_ref = rest
    args = jax.tree_util.tree_unflatten(treedef, [r[:] for r in w])
    o_ref[:] = _conformer_body(
        num_heads, dim, x_ref[:].astype(jnp.float32),
        mask_ref[:].astype(jnp.float32), *args
    ).astype(o_ref.dtype)


def _conformer_args(p, stats, dt):
    row = lambda v: jnp.asarray(v, jnp.float32)[None, :]  # noqa: E731
    mat = _mat_fn(dt)
    c = p["conv"]
    return (
        row(p["ln1"]["scale"]), row(p["ln1"]["bias"]),
        mat(p["ffn1"]["fc1"]["kernel"]), row(p["ffn1"]["fc1"]["bias"]),
        mat(p["ffn1"]["fc2"]["kernel"]), row(p["ffn1"]["fc2"]["bias"]),
        mat(p["mha"]["qkv"]["kernel"]), mat(p["mha"]["proj"]["kernel"]),
        mat(_first(c["pw1"]["kernel"])), row(c["pw1"]["bias"]),
        _deq(c["dw"]["kernel"])[:, 0, :],
        row(c["dw"]["bias"]),
        row(c["bn"]["scale"]), row(c["bn"]["bias"]),
        row(stats["conv"]["bn"]["mean"]), row(stats["conv"]["bn"]["var"]),
        mat(_first(c["pw2"]["kernel"])), row(c["pw2"]["bias"]),
        row(c["ln"]["scale"]), row(c["ln"]["bias"]),
        row(p["ln2"]["scale"]), row(p["ln2"]["bias"]),
        mat(p["ffn2"]["fc1"]["kernel"]), row(p["ffn2"]["fc1"]["bias"]),
        mat(p["ffn2"]["fc2"]["kernel"]), row(p["ffn2"]["fc2"]["bias"]),
    )


def _call(kernel, x, mask, args, interpret):
    # args may contain int8 (q, scale) pairs — flatten to kernel inputs and
    # hand the treedef to the kernel so the body sees the original structure
    maskrow = jnp.asarray(mask, jnp.float32)[None, :]
    flat, treedef = jax.tree_util.tree_flatten(args)
    ins = (jnp.asarray(x), maskrow) + tuple(flat)
    return pl.pallas_call(
        functools.partial(kernel, treedef),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*ins)


def fused_squeezeformer_block(x, mask, params, *, num_heads: int,
                              interpret: bool | None = None,
                              compute_dtype=jnp.bfloat16):
    """x [T, dim] f32, mask [T] bool/float -> [T, dim]. ``params`` is the
    flax SqueezeformerBlock param subtree. ``compute_dtype`` sets the matmul
    weight STORAGE dtype (bf16 default = deploy numerics, halves the weight
    stream; f32 = exact parity with the flax module, used by the CPU tests;
    "int8" = quarter-width stream with in-kernel dequant, params must be
    pre-quantized via :func:`quantize_serving_weights`). Dots always run
    with f32 operands — see ``_mm``."""
    if interpret is None:
        interpret = not _on_tpu()
    dim = x.shape[-1]
    kernel = functools.partial(_squeeze_kernel, num_heads, dim)
    return _call(kernel, x, mask, _squeeze_args(params, compute_dtype),
                 interpret)


def fused_conformer_block(x, mask, params, batch_stats, *, num_heads: int,
                          interpret: bool | None = None,
                          compute_dtype=jnp.bfloat16):
    """x [T, dim] f32 -> [T, dim]; ``batch_stats`` is the block's
    batch_stats subtree (BN moving mean/var, eval mode)."""
    if interpret is None:
        interpret = not _on_tpu()
    dim = x.shape[-1]
    kernel = functools.partial(_conformer_kernel, num_heads, dim)
    return _call(kernel, x, mask,
                 _conformer_args(params, batch_stats, compute_dtype),
                 interpret)


# ---------------------------------------------------------------------------
# Conv1DBlock (reference nb cell 5 Conv1DBlock, credited @hoyso48) and the
# conv-interleaved families (conv_hybrid / conv_transformer)
# ---------------------------------------------------------------------------

def _eca_gate(h, maskrow, ecw):
    """Efficient channel attention gate (models.layers.ECA, eval): masked
    GAP -> 1-D conv over the CHANNEL axis (SAME, no bias) -> sigmoid.
    ``ecw`` [1, k] is the conv window."""
    g = _masked_gap(h, maskrow)  # [1, C]
    k = ecw.shape[1]
    C = g.shape[1]
    gp = jnp.pad(g, ((0, 0), ((k - 1) // 2, k // 2)))
    out = jnp.zeros_like(g)
    for i in range(k):
        out = out + gp[:, i: i + C] * ecw[0, i]
    return jax.nn.sigmoid(out)


def _conv1d_block_body(x, maskrow, ew, eb, dww, bng, bnb, bnm, bnv,
                       ecw, pw, pb):
    """MBConv-style block, eval mode (models.blocks.Conv1DBlock): Dense
    expand (swish) -> causal DW conv -> BN(stats) -> ECA -> Dense project ->
    skip add (row dropout is an eval no-op; channels always match inside the
    conv stacks)."""
    h = _swish(_mm(x, ew) + eb)
    h = _dwconv(h, dww, causal=True)
    h = (h - bnm) * jax.lax.rsqrt(bnv + BN_EPS) * bng + bnb
    h = h * _eca_gate(h, maskrow, ecw)
    return x + _mm(h, pw) + pb


def _conv1d_args(p, stats, dt):
    row = lambda v: jnp.asarray(v, jnp.float32)[None, :]  # noqa: E731
    mat = _mat_fn(dt)
    return (
        mat(p["expand"]["kernel"]), row(p["expand"]["bias"]),
        _deq(p["dw"]["dwconv"]["kernel"])[:, 0, :],
        row(p["bn"]["scale"]), row(p["bn"]["bias"]),
        row(stats["bn"]["mean"]), row(stats["bn"]["var"]),
        _deq(p["eca"]["conv"]["kernel"])[:, 0, 0][None, :],
        mat(p["project"]["kernel"]), row(p["project"]["bias"]),
    )


def _transformer_body(num_heads, dim, x, maskrow,
                      l1g, l1b, qkvw, projw, l2g, l2b, f1w, f2w):
    """Pre-LN MHSA + pre-LN biasless swish FFN (models.blocks.
    TransformerBlock, eval — row dropouts are no-ops)."""
    x = x + _mhsa(_ln(x, l1g, l1b, LN_EPS), maskrow,
                  qkvw, projw, num_heads, dim)
    h = _ln(x, l2g, l2b, LN_EPS)
    return x + _mm(_swish(_mm(h, f1w)), f2w)


def _transformer_args(p, dt):
    row = lambda v: jnp.asarray(v, jnp.float32)[None, :]  # noqa: E731
    mat = _mat_fn(dt)
    return (
        row(p["ln1"]["scale"]), row(p["ln1"]["bias"]),
        mat(p["mha"]["qkv"]["kernel"]), mat(p["mha"]["proj"]["kernel"]),
        row(p["ln2"]["scale"]), row(p["ln2"]["bias"]),
        mat(p["fc1"]["kernel"]), mat(p["fc2"]["kernel"]),
    )


def _make_group_body(inner_body):
    """Grid-step body for the conv families: N Conv1DBlocks then one
    attention block, all inside the same kernel invocation. Per-step args
    are the nested tuple (conv_args_tuple, inner_args_tuple) — the stack
    machinery flattens/unflattens it transparently."""

    def group_body(num_heads, dim, x, maskrow, conv_args, inner_args):
        for ca in conv_args:
            x = _conv1d_block_body(x, maskrow, *ca)
        return inner_body(num_heads, dim, x, maskrow, *inner_args)

    return group_body


_GROUP_BODIES = {
    "squeezeformer": _make_group_body(_squeeze_body),
    "conformer": _make_group_body(_conformer_body),
    "transformer": _make_group_body(_transformer_body),
}


def fused_conv_group_stack(x, mask, groups, inner: str, *, num_heads: int,
                           interpret: bool | None = None, dma: bool = False):
    """Run N (conv-stack -> attention-block) groups as ONE grid-pipelined
    kernel. ``groups`` is a list of (conv_args_tuple, inner_args) built by
    the caller; ``inner`` selects the attention-block body. All groups must
    share kernel sizes/shape structure (they do: cfg.kernel_sizes is one
    tuple for the whole encoder)."""
    if interpret is None:
        interpret = not _on_tpu()
    call = _stack_call_dma if dma else _stack_call
    return call(_GROUP_BODIES[inner], x, mask, groups, num_heads,
                interpret)


# ---------------------------------------------------------------------------
# Grid-pipelined block stacks: one kernel for N same-type blocks
# ---------------------------------------------------------------------------
#
# The single-block kernels pay, per block, one kernel launch plus a
# weight-stream that cannot overlap the previous block's compute (an empty
# copy-through block kernel measured 6.6 of the 9.2 us total on v5e —
# RESULTS.md round 2). Stacking the N blocks' weights on a leading axis and
# making the block index the pallas grid dimension turns the whole stack into
# ONE kernel: Mosaic's grid pipeline prefetches block i+1's weights during
# block i's compute, the activations never leave a VMEM scratch, and launch
# overhead is paid once.

def _stack_kernel(body, num_heads, dim, treedef, x_ref, mask_ref, *rest):
    *w, o_ref, acc = rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = x_ref[:].astype(jnp.float32)

    args = jax.tree_util.tree_unflatten(treedef, [r[0] for r in w])
    out = body(num_heads, dim, acc[:], mask_ref[:].astype(jnp.float32),
               *args)
    acc[:] = out
    # constant out index: the buffer is flushed to HBM once, after the
    # final grid step
    o_ref[:] = out.astype(o_ref.dtype)


def _stack_call(body, x, mask, per_block_args, num_heads, interpret):
    n = len(per_block_args)
    # per-block args share one treedef (same block type); stack each leaf
    # on a leading block axis that becomes the pallas grid dimension
    flats = [jax.tree_util.tree_flatten(a) for a in per_block_args]
    treedef = flats[0][1]
    stacked = tuple(jnp.stack(ws) for ws in zip(*(f for f, _ in flats)))
    maskrow = jnp.asarray(mask, jnp.float32)[None, :]
    dim = x.shape[-1]
    const = lambda *_: (0, 0)  # noqa: E731

    def wspec(w):
        nd = w.ndim - 1
        return pl.BlockSpec((1,) + w.shape[1:],
                            lambda i, nd=nd: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_stack_kernel, body, num_heads, dim, treedef)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec(x.shape, const, memory_space=pltpu.VMEM),
                  pl.BlockSpec(maskrow.shape, const,
                               memory_space=pltpu.VMEM)]
        + [wspec(w) for w in stacked],
        out_specs=pl.BlockSpec(x.shape, const, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((x.shape[0], dim), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(x), maskrow, *stacked)


# --- manual double-buffered weight DMA variant ------------------------------
#
# Round-2/3 finding (RESULTS.md "Identified lever"): in the automatic grid
# pipeline above, the per-step weight DMA does NOT overlap compute — a
# weight-touching-but-no-compute stack kernel still costs 44.5 of 84 us at
# the expansion-4 probe geometry, and neither constant-out-index flushing nor
# dimension_semantics tuning moved it. This variant takes scheduling away
# from Mosaic: the stacked weights stay in HBM (memory_space=ANY) and the
# kernel itself issues pltpu.make_async_copy of block i+1's weights into the
# free half of a VMEM double buffer while block i computes from the other
# half. The compute body is emitted twice (once per buffer slot) because
# Mosaic has no dynamic leading-index VMEM loads.

def _sublane(dt) -> int:
    """Second-to-last-dim tile size for ``dt`` on TPU ((8,128) f32,
    (16,128) bf16, (32,128) int8)."""
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dt).itemsize]


def _stack_kernel_dma(body, num_heads, dim, treedef, nblocks, nleaves,
                      shapes, x_ref, mask_ref, *rest):
    wrefs = rest[:nleaves]                     # HBM-resident stacked weights
    o_ref = rest[nleaves]
    acc = rest[nleaves + 1]
    bufs = rest[nleaves + 2: nleaves + 2 + nleaves]  # [2, ...] VMEM doubles
    sem = rest[-1]                             # DMA semaphore array [2]
    i = pl.program_id(0)

    def dmas(b, s):
        return [
            pltpu.make_async_copy(w.at[b], buf.at[s], sem.at[s])
            for w, buf in zip(wrefs, bufs)
        ]

    @pl.when(i == 0)
    def _():
        acc[:] = x_ref[:].astype(jnp.float32)
        for d in dmas(0, 0):                   # prologue: block 0, slot 0
            d.start()

    for d in dmas(i, i % 2):                   # block i landed in slot i%2
        d.wait()

    @pl.when(i + 1 < nblocks)
    def _():
        for d in dmas(i + 1, (i + 1) % 2):     # prefetch next block's weights
            d.start()

    maskf = mask_ref[:].astype(jnp.float32)

    def compute(slot):                          # slot is a PYTHON int
        # full-tile (aligned) load of each double buffer, then value-slice
        # back to the leaf's logical shape (leaves were padded to the dtype
        # tiling so the HBM->VMEM DMA slices stay tile-aligned)
        leaves = [buf[slot][: r, : c]
                  for buf, (r, c) in zip(bufs, shapes)]
        args = jax.tree_util.tree_unflatten(treedef, leaves)
        out = body(num_heads, dim, acc[:], maskf, *args)
        acc[:] = out
        o_ref[:] = out.astype(o_ref.dtype)

    @pl.when(i % 2 == 0)
    def _():
        compute(0)

    @pl.when(i % 2 == 1)
    def _():
        compute(1)


def _stack_call_dma(body, x, mask, per_block_args, num_heads, interpret):
    n = len(per_block_args)
    flats = [jax.tree_util.tree_flatten(a) for a in per_block_args]
    treedef = flats[0][1]
    stacked = [jnp.stack(ws) for ws in zip(*(f for f, _ in flats))]
    # Mosaic DMA slices must be tile-aligned in the trailing two dims: pad
    # every (2-D per-block) leaf up to its dtype tiling; the kernel slices
    # the logical shape back out of the loaded buffer.
    shapes = tuple(w.shape[1:] for w in stacked)
    padded = []
    for w in stacked:
        assert w.ndim == 3, f"per-block leaves must be 2-D, got {w.shape}"
        sl = _sublane(w.dtype)
        rp = -(-w.shape[1] // sl) * sl - w.shape[1]
        cp = -(-w.shape[2] // 128) * 128 - w.shape[2]
        padded.append(jnp.pad(w, ((0, 0), (0, rp), (0, cp)))
                      if rp or cp else w)
    maskrow = jnp.asarray(mask, jnp.float32)[None, :]
    dim = x.shape[-1]
    const = lambda *_: (0, 0)  # noqa: E731

    kernel = functools.partial(_stack_kernel_dma, body, num_heads, dim,
                               treedef, n, len(stacked), shapes)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec(x.shape, const, memory_space=pltpu.VMEM),
                  pl.BlockSpec(maskrow.shape, const,
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in padded],
        out_specs=pl.BlockSpec(x.shape, const, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((x.shape[0], dim), jnp.float32)]
        + [pltpu.VMEM((2,) + w.shape[1:], w.dtype) for w in padded]
        + [pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(jnp.asarray(x), maskrow, *padded)


def fused_squeezeformer_stack(x, mask, params_list, *, num_heads: int,
                              interpret: bool | None = None,
                              compute_dtype=jnp.bfloat16, dma: bool = False):
    """Run ``len(params_list)`` SqueezeformerBlocks as one grid-pipelined
    kernel. Semantics identical to chaining :func:`fused_squeezeformer_block`.
    ``dma=True`` switches to the manual double-buffered weight-DMA schedule
    (same numerics; see :func:`_stack_call_dma`)."""
    if interpret is None:
        interpret = not _on_tpu()
    args = [_squeeze_args(p, compute_dtype) for p in params_list]
    call = _stack_call_dma if dma else _stack_call
    return call(_squeeze_body, x, mask, args, num_heads, interpret)


def fused_conformer_stack(x, mask, params_list, stats_list, *, num_heads: int,
                          interpret: bool | None = None,
                          compute_dtype=jnp.bfloat16, dma: bool = False):
    """Run ``len(params_list)`` ConformerBlocks as one grid-pipelined
    kernel (eval mode, BN moving stats)."""
    if interpret is None:
        interpret = not _on_tpu()
    args = [_conformer_args(p, s, compute_dtype)
            for p, s in zip(params_list, stats_list)]
    call = _stack_call_dma if dma else _stack_call
    return call(_conformer_body, x, mask, args, num_heads, interpret)


# ---------------------------------------------------------------------------
# Full fused forward for the hybrid/squeezeformer/conformer families
# ---------------------------------------------------------------------------

def fused_encoder_forward(cfg, variables, x, *, interpret: bool | None = None,
                          compute_dtype=jnp.bfloat16, dma: bool = False):
    """Batch-1 eval forward of an IsharaEncoder via fused block kernels.

    x [T, input_dim] (preprocessed frames). Stem/top stay plain jnp (a
    handful of ops); every encoder block is one Pallas kernel. Matches
    ``model.apply(variables, x[None], training=False)[0]`` for the
    squeezeformer / conformer / hybrid variants — exactly at
    ``compute_dtype=jnp.float32``, to ~1% logit tolerance at the bf16
    deploy default (measured on v5e; decode is an argmax so the serving
    output is unaffected, tests/test_serving_extras.py).

    ``compute_dtype="int8"`` streams the matmul weights as int8 with
    in-kernel dequant (scale folded after the dot): ``variables["params"]``
    must then be pre-quantized host-side with
    :func:`quantize_serving_weights` — quantizing inside the program was
    the measured round-1 regression (XLA re-materializes the dequantized
    tree per sequence, RESULTS.md). Numerics equal the int8 export bundle's
    (same scheme), ~1% logits like bf16; harness score measured lossless.
    """
    from ..models.layers import BN_EPS as STEM_BN_EPS, positional_encoding
    from ..preprocess.pipeline import frame_mask

    if cfg.variant not in ("squeezeformer", "conformer", "hybrid",
                           "conv_hybrid", "conv_transformer"):
        raise ValueError(f"fused path covers the attention and conv-"
                         f"interleaved families, not {cfg.variant!r}")
    if getattr(cfg, "causal", False):
        # the kernels implement the bidirectional eval semantics; silently
        # serving a causal-trained model through them would apply full
        # attention / whole-sequence SE the weights never saw. Streaming
        # models serve via serve.StreamingEncoder or the XLA path.
        raise ValueError("fused serving kernels do not implement "
                         "cfg.causal semantics; use InferenceEngine("
                         "fused=False) or serve.StreamingEncoder")
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    mask = frame_mask(x)

    def wload(v):
        # stem/top/classifier run as plain XLA ops: int8 leaves become
        # (q, scale-row) pairs for _mm (3 small matrices — nothing like the
        # whole-tree in-program dequant that regressed in round 1)
        if _is_q(v):
            return (jnp.asarray(v["q"]),
                    jnp.asarray(v["scale"], jnp.float32)[None, :])
        return jnp.asarray(v, jnp.float32)

    h = jnp.asarray(x, jnp.float32)
    h = _mm(h, wload(params["stem_conv"]["kernel"]))
    h = h + jnp.asarray(positional_encoding(cfg.frame_len, cfg.dim),
                        jnp.float32)[: h.shape[0]]
    bn, bs = params["stem_bn"], stats["stem_bn"]
    h = (h - bs["mean"]) * jax.lax.rsqrt(bs["var"] + STEM_BN_EPS) \
        * bn["scale"] + bn["bias"]

    if cfg.variant in ("squeezeformer", "hybrid") and cfg.num_squeeze_blocks:
        h = fused_squeezeformer_stack(
            h, mask,
            [params[f"squeezeformer_{i}"]
             for i in range(cfg.num_squeeze_blocks)],
            num_heads=cfg.num_heads, interpret=interpret,
            compute_dtype=compute_dtype, dma=dma)
    if cfg.variant in ("conformer", "hybrid") and cfg.num_conform_blocks:
        h = fused_conformer_stack(
            h, mask,
            [params[f"conformer_{i}"]
             for i in range(cfg.num_conform_blocks)],
            [stats[f"conformer_{i}"]
             for i in range(cfg.num_conform_blocks)],
            num_heads=cfg.num_heads, interpret=interpret,
            compute_dtype=compute_dtype, dma=dma)

    def conv_args(tag):
        return tuple(
            _conv1d_args(params[f"conv_{tag}_{j}"], stats[f"conv_{tag}_{j}"],
                         compute_dtype)
            for j in range(cfg.num_conv_per_block))

    if cfg.variant == "conv_hybrid":
        # (conv-stack -> Squeezeformer) x N then (conv-stack -> Conformer)
        # x M, each segment one grid-pipelined kernel (encoder.py layout)
        if cfg.num_squeeze_blocks:
            h = fused_conv_group_stack(
                h, mask,
                [(conv_args(f"squeeze{i}"),
                  _squeeze_args(params[f"squeezeformer_{i}"], compute_dtype))
                 for i in range(cfg.num_squeeze_blocks)],
                "squeezeformer", num_heads=cfg.num_heads,
                interpret=interpret, dma=dma)
        if cfg.num_conform_blocks:
            h = fused_conv_group_stack(
                h, mask,
                [(conv_args(f"conform{i}"),
                  _conformer_args(params[f"conformer_{i}"],
                                  stats[f"conformer_{i}"], compute_dtype))
                 for i in range(cfg.num_conform_blocks)],
                "conformer", num_heads=cfg.num_heads, interpret=interpret,
                dma=dma)
    if cfg.variant == "conv_transformer":
        h = fused_conv_group_stack(
            h, mask,
            [(conv_args(f"t{i}"),
              _transformer_args(params[f"transformer_{i}"], compute_dtype))
             for i in range(cfg.num_squeeze_blocks)],
            "transformer", num_heads=cfg.num_heads, interpret=interpret)

    h = _mm(h, wload(params["top_conv"]["kernel"])) \
        + params["top_conv"]["bias"]
    h = jax.nn.relu(h)
    return _mm(h, wload(params["classifier"]["kernel"])) \
        + params["classifier"]["bias"]
