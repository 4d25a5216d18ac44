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
# (512,1024,B64)}. "UNMEASURED" rows fall back to the flagship anchor via
# nearest-lookup until probe_geometry.py has been run at that geometry;
# RESULTS.md carries the raw table.
_ANCHORS: dict[tuple[int, int], dict] = {
    # flagship (rounds 2-4): flash wins training fwd+bwd with AND without
    # dropout (102.6->80.6 ms/step with, 66.2->60.9 without); einsum wins
    # eval by ~3x at T=176; FusedFFN beats XLA only when dropout is active;
    # fused conv-module measured 66% slower (round-4 negative).
    (256, 176): {
        "train_attn": "flash",
        "train_attn_nodrop": "flash",
        "serve_attn": "einsum",
        "ffn_dropout_kernel": True,
        "conv_module_fused": False,
    },
}


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
