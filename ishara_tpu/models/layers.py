"""Core layers for the Ishara-TPU encoder zoo (flax.linen).

Behavioral contracts follow the reference Keras layers
(``Test Notebooks/conv-squeezeformer-conformer-test.ipynb`` cell 5), including
its quirks where they affect trained-weight parity:

* ``MultiHeadSelfAttention`` scales scores by ``dim**-0.5`` (the *full* model
  dim, not head_dim — reference quirk, kept).
* The Conformer ``ConvolutionModule`` uses a 'same'-padded depthwise conv with
  no activation after BatchNorm and a *post*-LayerNorm residual (reference
  quirk, kept). The Squeezeformer ``ConvModule`` is causal with swish.
* Keras ``Masking(0.0)`` semantics: padding mask feeds attention softmax and
  the masked global-average-pools in ECA/SqueezeExcite; BatchNorm and convs
  ignore it (as Keras does).

Everything is statically shaped and jit/pjit-friendly; batch statistics in
BatchNorm reduce over the global (sharded) batch under GSPMD, matching the
reference's cross-replica TPUStrategy behavior without explicit collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Keras parity epsilons.
LN_EPS = 1e-6
BN_EPS = 1e-3
BN_MOMENTUM = 0.95
# The reference's Conformer ``ConvolutionModule`` (nb cell 5) creates its
# BatchNormalization/LayerNormalization with Keras *defaults* (eps=1e-3,
# BN momentum=0.99) unlike every other norm in the model — quirk kept.
LN_EPS_DEFAULT = 1e-3
BN_MOMENTUM_DEFAULT = 0.99


def positional_encoding(maxlen: int, dim: int) -> np.ndarray:
    """Fixed sin/cos encoding, concat layout [sin | cos] (reference cell 5)."""
    depth = dim / 2
    positions = np.arange(maxlen, dtype=np.float32)[:, None]
    depths = np.arange(depth, dtype=np.float32)[None, :] / depth
    angle_rates = 1.0 / np.power(10000.0, depths).astype(np.float32)
    angle_rads = positions * angle_rates
    return np.concatenate([np.sin(angle_rads), np.cos(angle_rads)], axis=-1)


def masked_global_average_pool(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """[B, T, C] -> [B, C] mean over valid frames (Keras GAP-with-mask)."""
    if mask is None:
        return jnp.mean(x, axis=1)
    m = mask[..., None].astype(x.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return jnp.sum(x * m, axis=1) / denom


def causal_masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """[B, T, C] -> [B, T, C] running mean over valid frames <= t.

    The causal-mode replacement for the global average pool: frame t's
    pooled statistic uses only its past, so the op streams (state = running
    sum + count, serve/streaming.py). Not a reference behavior — causal mode
    is an Ishara-TPU extension (ROADMAP #5)."""
    m = (jnp.ones_like(x[..., :1]) if mask is None
         else mask[..., None].astype(x.dtype))
    s = jnp.cumsum(x * m, axis=1)
    c = jnp.maximum(jnp.cumsum(m, axis=1), 1.0)
    return s / c


class ECA(nn.Module):
    """Efficient channel attention: GAP -> Conv1D(1, k) over channels -> gate."""

    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        g = masked_global_average_pool(x, mask)          # [B, C]
        g = g[..., None]                                 # [B, C, 1]
        g = nn.Conv(
            1, (self.kernel_size,), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv",
        )(g)                                             # [B, C, 1]
        g = nn.sigmoid(g[..., 0])                        # [B, C]
        return x * g[:, None, :]


class SqueezeExcite(nn.Module):
    """SE gate: masked GAP -> Dense(C/r, swish) -> Dense(C, sigmoid).

    ``causal=True`` swaps the whole-sequence GAP for the running mean
    (:func:`causal_masked_mean`) so the gate at frame t sees only <= t;
    parameter shapes are unchanged, so causal and batch mode share weights.
    """

    channels: int
    reduction_ratio: int = 8
    dtype: jnp.dtype = jnp.float32
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        if self.causal:
            g = causal_masked_mean(x, mask)  # [B, T, C]
        else:
            g = masked_global_average_pool(x, mask)  # [B, C]
        g = nn.Dense(max(1, self.channels // self.reduction_ratio),
                     dtype=self.dtype, name="fc1")(g)
        g = nn.swish(g)
        g = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(g)
        g = nn.sigmoid(g)
        return x * g if self.causal else x * g[:, None, :]


class CausalDWConv1D(nn.Module):
    """Left-padded depthwise conv: pad (k-1)*dilation then VALID conv."""

    kernel_size: int = 17
    dilation_rate: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.dilation_rate * (self.kernel_size - 1)
        C = x.shape[-1]
        return nn.Conv(
            C, (self.kernel_size,),
            padding=[(pad, 0)],
            kernel_dilation=(self.dilation_rate,),
            feature_group_count=C,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="dwconv",
        )(x)


class MultiHeadSelfAttention(nn.Module):
    """Fused-QKV attention with padding mask.

    Score scale is ``dim**-0.5`` over the full model dim — a reference quirk
    (nb cell 5 ``MultiHeadSelfAttention.scale``) kept for weight parity.

    With ``use_flash`` the scores/softmax/value contraction run as the fused
    Pallas flash kernel (:func:`ishara_tpu.ops.attention.flash_mhsa`),
    including in-kernel attention dropout seeded from the flax RNG.

    Path selection is measured, not dogmatic (RESULTS.md): in *eval* at this
    model size (T=176, Dh=32) XLA's batched einsum is ~3x faster than the
    kernel, but in *training* the einsum path must materialize + mask the
    [B, H, T, T] probabilities for dropout while the kernel applies an
    in-kernel hardware-PRNG mask — measured 102.6 -> 80.6 ms per batch-256
    flagship step on v5e. So on TPU the flash kernel is selected
    automatically whenever attention dropout is active (and T fits one
    block); ``use_flash=True`` forces it (long-context path, SURVEY.md §5).
    """

    dim: int = 256
    num_heads: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # causal mode (streaming families): queries attend to keys k <= q within
    # the last `attn_context` frames (0 = unbounded left context)
    causal: bool = False
    attn_context: int = 0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        from ..ops.attention import NEG, flash_mhsa, _on_tpu

        B, T, _ = x.shape
        H = self.num_heads
        Dh = self.dim // H
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, T, H, 3 * Dh).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = self.dim ** -0.5

        if self.causal:
            qi = jnp.arange(T)[:, None]
            ki = jnp.arange(T)[None, :]
            allowed = ki <= qi
            if self.attn_context > 0:
                allowed &= (qi - ki) < self.attn_context
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            full = (allowed[None, :, :] if mask is None
                    else allowed[None] & mask[:, None, :])
            attn = jnp.where(full[:, None], attn, jnp.finfo(attn.dtype).min)
            attn = nn.softmax(attn, axis=-1)
            attn = FastDropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
            return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                            name="proj")(out)

        rate = 0.0 if deterministic else self.dropout
        # in-kernel dropout needs the TPU PRNG; interpret mode (CPU tests)
        # falls back to einsum when dropout is active. Path selection reads
        # the MEASURED table in ops/selection.py (nearest probed geometry;
        # RESULTS.md round-4 "Geometry sweep"): at the flagship regime the
        # flash kernel wins training-mode fwd+bwd with dropout (avoids
        # materializing [B, H, T, T] for the mask, 102.6 -> 80.6 ms/step)
        # AND without (the einsum backward writes the probabilities to HBM,
        # 66.2 -> 60.9 ms); eval keeps einsum (3x faster at T=176). The
        # single-block kernel holds [T, T] scores in VMEM — hard-capped at
        # T<=384 regardless of table (the round-4 geometry probe measured a
        # scoped-VMEM OOM in its backward at T=512/Dh=64; beyond the cap
        # only "flash_blocked" / "einsum" are eligible).
        from ..ops import selection

        if not deterministic and _on_tpu():
            path = selection.train_attention(self.dim, T,
                                             dropout_active=rate > 0.0,
                                             batch=B)
        else:
            path = selection.serve_attention(self.dim, T) if _on_tpu() \
                else "einsum"
        if path == "flash" and T > 384:
            path = "einsum"
        if path == "flash_blocked" and rate == 0.0 and _on_tpu():
            from ..ops.attention_blocked import flash_mhsa_blocked

            bias = (jnp.where(mask, 0.0, NEG).astype(jnp.float32)
                    if mask is not None
                    else jnp.zeros((B, T), jnp.float32))
            out = flash_mhsa_blocked(q, k, v, bias, scale)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
            return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                            name="proj")(out)
        flash = self.use_flash or (
            not deterministic and _on_tpu() and path == "flash")
        if flash and (_on_tpu() or rate == 0.0):
            bias = (
                jnp.where(mask, 0.0, NEG).astype(jnp.float32)
                if mask is not None else jnp.zeros((B, T), jnp.float32)
            )
            seed = None
            if rate > 0.0:
                from ..ops.dropout import site_seeds

                seed = site_seeds(self.make_rng("dropout"), 1)
            out = flash_mhsa(q, k, v, bias, seed, scale=scale,
                             interpret=not _on_tpu(), dropout_rate=rate)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            if mask is not None:
                attn = jnp.where(mask[:, None, None, :], attn,
                                 jnp.finfo(attn.dtype).min)
            attn = nn.softmax(attn, axis=-1)
            attn = FastDropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)

        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="proj")(out)


class FastDropout(nn.Module):
    """Dropout with a hardware-PRNG mask on TPU (ops/dropout.py).

    Drop-in for ``nn.Dropout`` at the full-tensor mask sites (FFN hiddens,
    attention probabilities, residual branches): identical inverted-dropout
    semantics, but the mask comes from the Mosaic PRNG instead of threefry —
    measured 82 ms -> ~0 of per-step mask generation on the flagship config
    (RESULTS.md round 2). Parameter-free, uses the standard "dropout" RNG
    collection; off-TPU it falls back to jax.random (CPU test mesh).
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..ops.dropout import fast_dropout

        if deterministic or self.rate <= 0.0:
            return x
        return fast_dropout(x, self.make_rng("dropout"), self.rate)


class FastDropoutAdd(nn.Module):
    """Fused ``res + dropout(h)`` for the residual sites (ops/dropout.py
    ``tpu_dropout_add``): same semantics as ``res + FastDropout(rate)(h)``
    but one kernel pass — saves a full write+read of the branch tensor per
    site on TPU (~24 sites/step on the flagship hybrid)."""

    rate: float

    @nn.compact
    def __call__(self, res, h, deterministic: bool = True):
        from ..ops.dropout import fast_dropout_add

        if deterministic or self.rate <= 0.0:
            return res + h
        return fast_dropout_add(res, h, self.make_rng("dropout"), self.rate)


class RowDropout(nn.Module):
    """Keras ``Dropout(noise_shape=(None, 1, 1))``: drops whole samples."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.Dropout(
            self.rate, broadcast_dims=(1, 2)
        )(x, deterministic=deterministic)


class FeedForwardModule(nn.Module):
    """Dense(dim*exp, swish) -> Dropout -> Dense(dim)."""

    dim: int
    expansion_factor: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.dim * self.expansion_factor, dtype=self.dtype, name="fc1")(x)
        x = nn.swish(x)
        x = FastDropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class FusedFFN(nn.Module):
    """FFN + residual as one training kernel (ops/ffn_kernel.py).

    Drop-in for ``res + [FastDropout] FeedForwardModule(LN(x))`` at the
    block FFN sites: identical math and param tree (``fc1``/``fc2`` Dense
    children — checkpoints and the serving fused_block param paths are
    unchanged), but training-mode forwards on TPU run Dense->swish->
    dropout->Dense->res-dropout->add as a single Pallas kernel whose
    backward regenerates the masks and recomputes the hidden
    (flash-attention-style), eliminating the per-site HBM round-trips of
    the hidden/branch tensors. Eval mode, CPU, and init use the exact XLA
    composition. ``res_rate`` is the residual-branch dropout (reference
    SqueezeformerBlock shared-dropout sites; 0 for the Conformer FFNs)."""

    dim: int
    expansion_factor: int = 4
    dropout: float = 0.1
    res_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x, deterministic: bool = True):
        from ..ops.attention import _on_tpu
        from ..ops.ffn_kernel import ffn_residual

        d0 = nn.Dense(self.dim * self.expansion_factor, dtype=self.dtype,
                      name="fc1")
        d1 = nn.Dense(self.dim, dtype=self.dtype, name="fc2")
        # Fuse only when a dropout site is active: without dropout XLA's
        # composition is already optimal (no mask kernels to pay for) and
        # measured 8 ms/step faster than the hand-written matmuls. The
        # dropout-active choice reads the measured geometry table
        # (ops/selection.py; kernel wins at the flagship regime).
        from ..ops import selection

        dropping = self.dropout > 0.0 or self.res_rate > 0.0
        if (not deterministic and dropping and _on_tpu()
                and selection.ffn_fused_when_dropout(self.dim, x.shape[1],
                                                     batch=x.shape[0])
                and not self.is_initializing()):
            p0 = self.get_variable("params", "fc1")
            p1 = self.get_variable("params", "fc2")
            from ..ops.dropout import site_seeds

            seeds = site_seeds(self.make_rng("dropout"), 2)
            return ffn_residual(
                x, res, p0["kernel"], p0["bias"], p1["kernel"], p1["bias"],
                seeds, float(self.dropout), float(self.res_rate), False)
        h = nn.swish(d0(x))
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        h = d1(h)
        if self.res_rate > 0.0:
            return FastDropoutAdd(self.res_rate)(res, h,
                                                 deterministic=deterministic)
        return res + h


class SqueezeformerConvModule(nn.Module):
    """LN -> pw Dense(dim*exp) swish -> causal DW conv swish -> pw Dense(dim)
    -> SE -> +residual (reference ``ConvModule``, nb cell 5).

    ``fused=True`` runs training-mode forwards on TPU as ONE Pallas kernel
    (:func:`ishara_tpu.ops.conv_kernel.conv_module_residual`) whose backward
    recomputes the branch from x. Default OFF — a recorded negative: at the
    flagship geometry ([256, 176, 256] bf16, K=15) the fused fwd+bwd
    measured 2.08 ms vs 1.25 ms for XLA's composition (round-4 isolated
    probe, scripts/probe_conv_module.py) — the branch is matmul-light and
    VPU-heavy, so keeping intermediates in VMEM doesn't pay the way it does
    for FusedFFN. The knob stays because the balance may flip at larger
    dim/T (re-probe per RESULTS.md geometry table before enabling). Param
    tree and checkpoints are identical either way."""

    dim: int
    kernel_size: int
    expansion_factor: int = 2
    dtype: jnp.dtype = jnp.float32
    causal_se: bool = False
    # None = read the measured geometry table (ops/selection.py); True/False
    # force. The table says False everywhere measured so far (round-4
    # negative at the flagship geometry).
    fused: bool | None = None

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        from ..ops import selection
        from ..ops.attention import _on_tpu
        from ..ops.conv_kernel import conv_module_residual

        fused = (selection.conv_module_fused(self.dim, x.shape[1],
                                             batch=x.shape[0])
                 if self.fused is None else self.fused)
        if (fused and training and _on_tpu() and not self.causal_se
                and not self.is_initializing()):
            ln = self.get_variable("params", "norm")
            p1 = self.get_variable("params", "pw1")
            dw = self.get_variable("params", "dw")["dwconv"]
            p2 = self.get_variable("params", "pw2")
            se = self.get_variable("params", "se")
            m = (jnp.ones(x.shape[:2], jnp.float32) if mask is None
                 else mask.astype(jnp.float32))
            return conv_module_residual(
                x, m, ln["scale"], ln["bias"],
                p1["kernel"][0], p1["bias"], dw["kernel"][:, 0, :],
                p2["kernel"][0], p2["bias"],
                se["fc1"]["kernel"], se["fc1"]["bias"],
                se["fc2"]["kernel"], se["fc2"]["bias"], False)
        res = x
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        x = nn.Conv(self.dim * self.expansion_factor, (1,), dtype=self.dtype,
                    name="pw1")(x)
        x = nn.swish(x)
        x = CausalDWConv1D(self.kernel_size, dtype=self.dtype, name="dw")(x)
        x = nn.swish(x)
        x = nn.Conv(self.dim, (1,), dtype=self.dtype, name="pw2")(x)
        x = SqueezeExcite(self.dim, dtype=self.dtype, causal=self.causal_se,
                          name="se")(x, mask=mask)
        return x + res


class ConformerConvModule(nn.Module):
    """pw Conv(2*dim) -> GLU -> 'same' DW conv -> BN -> pw Conv(dim)
    -> LN(x + residual)  (reference Keras ``ConvolutionModule``; note: no
    activation after BN, post-norm residual, and *default* Keras norm
    hyperparameters — eps=1e-3 for both BN and LN, BN momentum 0.99 — unlike
    the 1e-6/0.95 used everywhere else; all quirks kept for weight parity)."""

    dim: int
    kernel_size: int = 31
    dtype: jnp.dtype = jnp.float32
    causal: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        res = x
        x = nn.Conv(self.dim * 2, (1,), dtype=self.dtype, name="pw1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)
        x = nn.Conv(
            self.dim, (self.kernel_size,),
            padding=[(self.kernel_size - 1, 0)] if self.causal else "SAME",
            feature_group_count=self.dim, dtype=self.dtype, name="dw",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training, momentum=BN_MOMENTUM_DEFAULT,
            epsilon=BN_EPS, dtype=self.dtype, name="bn",
        )(x)
        x = nn.Conv(self.dim, (1,), dtype=self.dtype, name="pw2")(x)
        return nn.LayerNorm(epsilon=LN_EPS_DEFAULT, dtype=self.dtype,
                            name="ln")(x + res)
