"""Measured kernel-vs-XLA selection table (VERDICT r3 #4 / ROADMAP #11).

Every kernel-vs-XLA choice in the model layers reads this table instead of a
hardcoded geometry gate. Rows are MEASURED on v5e by
``scripts/probe_geometry.py`` (chained-slope fwd+bwd timings; RESULTS.md
round-4 "Geometry sweep" table records the raw numbers). Lookup picks the
nearest measured anchor in log-space over (dim, T), so any geometry resolves
to the closest measured regime rather than an extrapolated if-chain.

Decisions covered:
  * ``train_attention(dim, T)``  -> "flash" | "flash_blocked" | "einsum"
      (training-mode MHSA fwd+bwd; "flash" = the single-block kernel with
      in-kernel PRNG dropout, ops/attention.py; "flash_blocked" = the tiled
      long-context kernel, ops/attention_blocked.py — NO dropout support,
      callers with active attention dropout clamp it to "flash" or
      "einsum")
  * ``serve_attention(dim, T)``  -> "einsum" | "flash_blocked"
      (eval/serving-mode MHSA forward)
  * ``ffn_fused_when_dropout(dim, T)`` -> bool
      (FusedFFN Pallas kernel vs XLA composition at the block FFN sites,
      dropout active; with dropout off XLA always measured faster)
  * ``conv_module_fused(dim, T)`` -> bool
      (the fused conv-module branch kernel, ops/conv_kernel.py, vs XLA)
"""

from __future__ import annotations

import math

# Measured winners per (dim, T) anchor — v5e, bf16, batch from the probe
# geometry set {(256,176,B256), (512,512,B128), (768,512,B128),
# (512,1024,B64)}, run by scripts/probe_geometry.py round 4; RESULTS.md
# "Geometry sweep" carries the raw ms table including the compile-failure
# modes (scoped-VMEM OOM) that force several False/einsum entries.
_ANCHORS: dict[tuple[int, int], dict] = {
    # flagship (rounds 2-4): flash wins training fwd+bwd with AND without
    # dropout (102.6->80.6 ms/step with, 66.2->60.9 without); einsum wins
    # eval by ~3x at T=176; FusedFFN beats XLA only when dropout is active
    # (0.322 vs 0.568 ms); fused conv-module measured 66% slower.
    (256, 176): {
        "train_attn": "flash",
        "train_attn_nodrop": "flash",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": True,
        "conv_module_fused": False,
    },
    # dim=512 T=512 B=128: single-block flash no longer compiles (scoped
    # VMEM 16.04M > 16M); einsum 8.1 ms beats blocked-flash 13.4 even
    # without dropout. FusedFFN keeps winning (2.28 vs 2.87 ms). The fused
    # conv-module kernel fails to compile (bwd scoped VMEM).
    (512, 512): {
        "train_attn": "einsum",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": True,
        "conv_module_fused": False,
    },
    # dim=512 T=1024 B=64: same regime at double context — einsum 16.3 ms
    # (dropout) / 8.2 (none) vs blocked-flash 24.8; serve einsum 0.034 vs
    # 0.209; FusedFFN 2.50 vs 2.83.
    (512, 1024): {
        "train_attn": "einsum",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": True,
        "conv_module_fused": False,
    },
    # dim=768 T=512 B=128: train-attention timings hit the compile tunnel's
    # request-size limit, but flash already VMEM-OOMs at dim=512 so einsum
    # is the only compilable path; serve einsum 0.005 vs blocked 0.092.
    # FusedFFN's backward OOMs scoped VMEM at m=1536 (the f32 dw1/dw2
    # accumulator blocks alone are 9 MB) -> XLA composition.
    (768, 512): {
        "train_attn": "einsum",
        "train_attn_nodrop": "einsum",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": False,
        "conv_module_fused": False,
    },
}


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


def _nearest(dim: int, T: int) -> dict:
    best, bestd = None, math.inf
    for (ad, at), row in _ANCHORS.items():
        d = (math.log(dim / ad)) ** 2 + (math.log(T / at)) ** 2
        if d < bestd:
            best, bestd = row, d
    return best


def train_attention(dim: int, T: int, dropout_active: bool = True) -> str:
    """Winner for the training-mode MHSA fwd+bwd at this geometry."""
    row = _nearest(dim, T)
    path = row["train_attn" if dropout_active else "train_attn_nodrop"]
    if dropout_active and path == "flash_blocked":
        # the blocked kernel has no in-kernel dropout; the measured
        # dropout-active alternatives are single-block flash vs einsum
        path = "flash" if row["train_attn"] == "flash" else "einsum"
    return path


def serve_attention(dim: int, T: int) -> str:
    return _nearest(dim, T)["serve_attn"]


def ffn_fused_when_dropout(dim: int, T: int) -> bool:
    return _nearest(dim, T)["ffn_dropout_kernel"]


def conv_module_fused(dim: int, T: int) -> bool:
    return _nearest(dim, T)["conv_module_fused"]
