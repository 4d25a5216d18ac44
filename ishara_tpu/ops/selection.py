"""Measured kernel-vs-XLA selection table (VERDICT r3 #4 / ROADMAP #11;
batch axis added round 5 per VERDICT r4 weak #4).

Every kernel-vs-XLA choice in the model layers reads this table instead of a
hardcoded geometry gate. Rows are MEASURED on v5e by
``scripts/probe_geometry.py`` (chained-slope fwd+bwd timings; RESULTS.md
round-4 "Geometry sweep" and round-5 "Batch axis" record the raw numbers).
Lookup picks the nearest measured anchor in log-space over (dim, T, batch),
so any geometry resolves to the closest measured regime rather than an
extrapolated if-chain.

The batch axis is LOAD-BEARING, not a refinement: at the flagship
(dim 256, T 176) the round-5 probes measured the training-attention winner
flipping from flash (B=256: 2.317 vs 2.802 ms) to einsum (B=32: 0.307 vs
0.123; B=64: 0.524 vs 0.165), and FusedFFN flipping from a 43% win (B=256)
to a 2.8x LOSS (B=64: 0.212 vs 0.077) — small batches leave too little
per-(batch, head) grid for the kernels' pipelining to amortize. Conversely
at (512, 512) the single-block flash kernel scoped-VMEM-OOMs at B=128 but
compiles AND wins at B=32 (0.997 vs 1.976 ms).

Decisions covered:
  * ``train_attention(dim, T, dropout_active, batch)``
      -> "flash" | "flash_blocked" | "einsum"
      (training-mode MHSA fwd+bwd; "flash" = the single-block kernel with
      in-kernel PRNG dropout, ops/attention.py; "flash_blocked" = the tiled
      long-context kernel, ops/attention_blocked.py — NO dropout support,
      callers with active attention dropout clamp it to "flash" or
      "einsum")
  * ``serve_attention(dim, T)``  -> "einsum" | "flash_blocked"
      (eval/serving-mode MHSA forward; no batch axis — serving rows were
      measured at batch 1 and einsum wins everywhere measured)
  * ``ffn_fused_when_dropout(dim, T, batch)`` -> bool
      (FusedFFN Pallas kernel vs XLA composition at the block FFN sites,
      dropout active; with dropout off XLA always measured faster)
  * ``conv_module_fused(dim, T, batch)`` -> bool
      (the fused conv-module branch kernel, ops/conv_kernel.py, vs XLA —
      False at every measured anchor)
  * ``translation_decode_fused(dim, T)`` -> bool
      (whole-loop fused decode kernel vs the XLA while_loop, batch-1
      serving; the kernel's hard limit is VMEM, enforced separately by
      ``ops.decoder_kernel.fused_decode_fits``)

``batch=None`` assumes 256 — the reference training recipe's batch and the
regime the original 2-axis table was measured in; the model layers pass
the real traced batch.
"""

from __future__ import annotations

import math

# Measured winners per (dim, T, batch) anchor — v5e, bf16, chained-slope
# fwd+bwd (scripts/probe_geometry.py rounds 4-5). RESULTS.md carries the raw
# ms tables including the compile-failure modes (scoped-VMEM OOM) that force
# several False/einsum entries.
_ANCHORS: dict[tuple[int, int, int], dict] = {
    # ---- flagship geometry, three batches (round 5 batch sweep) ----
    # B=32: einsum+drop 0.123 vs flash 0.307; FusedFFN unmeasurably small
    # but already losing at B=64 -> XLA; conv fused 0.149 vs XLA 0.064.
    (256, 176, 32): {
        "train_attn": "einsum",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": False,
        "conv_module_fused": False,
    },
    # B=64: einsum+drop 0.165 vs flash 0.524; XLA FFN 0.077 vs kernel
    # 0.212; conv fused 0.287 vs XLA 0.174.
    (256, 176, 64): {
        "train_attn": "einsum",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": False,
        "conv_module_fused": False,
    },
    # B=256 (rounds 2-4 flagship recipe): flash wins training fwd+bwd with
    # AND without dropout (102.6->80.6 ms/step with, 66.2->60.9 without);
    # einsum wins eval by ~3x at T=176; FusedFFN beats XLA only when
    # dropout is active (0.322 vs 0.568); fused conv-module 66% slower.
    (256, 176, 256): {
        "train_attn": "flash",
        "train_attn_nodrop": "flash",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": True,
        "conv_module_fused": False,
    },
    # ---- dim=384 B=256 (round 5; the reference's dim-384 families) ----
    # flash+drop 1.891 vs einsum 2.074; einsum nodrop 1.066 (the einsum
    # backward sheds the mask traffic — nodrop flips to einsum here);
    # FusedFFN 0.894 vs 1.108; conv-module kernel fails to compile.
    (384, 176, 256): {
        "train_attn": "flash",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": True,
        "conv_module_fused": False,
    },
    # ---- dim=512 T=512, two batches ----
    # B=32 (round 5): the single-block flash kernel COMPILES at this batch
    # (the B=128 OOM is a pipeline-buffer budget, not a per-block limit)
    # and measured 0.997 vs einsum 1.976 — but the layers hard-clamp flash
    # at T>384 (the only mapped OOM boundary is "B=128 fails, B=32 works";
    # the in-between is unmeasured and a Mosaic OOM is a hard crash), so
    # this row ships einsum until the boundary is mapped. einsum nodrop
    # 0.952; XLA FFN 0.426 vs kernel 0.525; conv-module kernel fails to
    # compile.
    (512, 512, 32): {
        "train_attn": "einsum",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": False,
        "conv_module_fused": False,
    },
    # B=128 (round 4): single-block flash scoped-VMEM-OOMs (16.04M > 16M);
    # einsum 8.1 ms beats blocked-flash 13.4 even without dropout. FusedFFN
    # keeps winning (2.28 vs 2.87). Fused conv-module fails to compile.
    (512, 512, 128): {
        "train_attn": "einsum",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": True,
        "conv_module_fused": False,
    },
    # dim=512 T=1024 B=64 (round 4): einsum 16.3 ms (dropout) / 8.2 (none)
    # vs blocked-flash 24.8; serve einsum 0.034 vs 0.209; FusedFFN 2.50 vs
    # 2.83.
    (512, 1024, 64): {
        "train_attn": "einsum",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": True,
        "conv_module_fused": False,
    },
    # dim=768 T=512 B=128 (round 4): train-attention timings hit the
    # compile tunnel's request-size limit, but flash already VMEM-OOMs at
    # dim=512/B=128 so einsum is the only compilable path; serve einsum
    # 0.005 vs blocked 0.092. FusedFFN's backward OOMs scoped VMEM at
    # m=1536 (the f32 dw1/dw2 accumulator blocks alone are 9 MB) -> XLA.
    (768, 512, 128): {
        "train_attn": "einsum",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": False,
        "conv_module_fused": False,
    },
}

_DEFAULT_BATCH = 256  # the reference training recipe (nb cell 4 batch(64)
#                       scaled to the v5e chip; all original 2-axis rows
#                       were measured at their geometry's probe batch)


# Translation-family whole-loop decode kernel (ops/decoder_kernel.py)
# anchors, measured on v5e round 4 (RESULTS.md "Whole-loop fused ... kernel"
# sections) at the flagship translation geometry dim=208, L=2, T=176:
# fused greedy 0.337 vs 1.56 ms XLA (4.6x), fused beam W=4 0.558 vs 4.43 ms
# (7.9x). The kernel's applicability limit is VMEM, enforced separately by
# ``ops.decoder_kernel.fused_decode_fits`` (closed-form need vs budget) —
# a geometry that exceeds the budget falls back to the XLA while_loop no
# matter what this table says.
_DECODE_ANCHORS: dict[tuple[int, int], dict] = {
    (208, 176): {"decode_fused": True},
}


def translation_decode_fused(dim: int, T: int) -> bool:
    """Measured winner for the batch-1 translation decode loop at this
    geometry (nearest anchor). Callers must ALSO check
    ``ops.decoder_kernel.fused_decode_fits`` — VMEM, not speed, is the
    kernel's hard limit."""
    best, bestd = None, math.inf
    for (ad, at), row in _DECODE_ANCHORS.items():
        d = (math.log(dim / ad)) ** 2 + (math.log(T / at)) ** 2
        if d < bestd:
            best, bestd = row, d
    return best["decode_fused"]


def _nearest(dim: int, T: int, batch: int | None = None) -> dict:
    b = _DEFAULT_BATCH if batch is None else max(int(batch), 1)
    best, bestd = None, math.inf
    for (ad, at, ab), row in _ANCHORS.items():
        d = ((math.log(dim / ad)) ** 2 + (math.log(T / at)) ** 2
             + (math.log(b / ab)) ** 2)
        if d < bestd:
            best, bestd = row, d
    return best


def train_attention(dim: int, T: int, dropout_active: bool = True,
                    batch: int | None = None) -> str:
    """Winner for the training-mode MHSA fwd+bwd at this geometry."""
    row = _nearest(dim, T, batch)
    path = row["train_attn" if dropout_active else "train_attn_nodrop"]
    if dropout_active and path == "flash_blocked":
        # the blocked kernel has no in-kernel dropout; the measured
        # dropout-active alternatives are single-block flash vs einsum
        path = "flash" if row["train_attn"] == "flash" else "einsum"
    return path


def serve_attention(dim: int, T: int) -> str:
    return _nearest(dim, T, 1)["serve_attn"]


def ffn_fused_when_dropout(dim: int, T: int,
                           batch: int | None = None) -> bool:
    return _nearest(dim, T, batch)["ffn_dropout_kernel"]


def conv_module_fused(dim: int, T: int, batch: int | None = None) -> bool:
    return _nearest(dim, T, batch)["conv_module_fused"]
