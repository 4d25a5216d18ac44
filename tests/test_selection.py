"""Unit tests for the measured kernel-selection table (ops/selection.py).

The table maps (dim, T, batch) to measured kernel-vs-XLA winners via
nearest-log-anchor lookup (VERDICT r3 #4 / ROADMAP #11; batch axis added
round 5 per VERDICT r4 weak #4). These tests pin the lookup semantics —
exact anchors resolve to their own row, off-anchor geometries resolve to
the nearest measured regime, the batch axis flips the winners it was
measured to flip, and the dropout-active clamp never returns the blocked
kernel (which has no in-kernel dropout).
"""

from ishara_tpu.ops import selection


def test_anchor_exact_lookup():
    # the flagship anchor must resolve to its own measured row
    row = selection._nearest(256, 176, 256)
    assert row is selection._ANCHORS[(256, 176, 256)]
    row = selection._nearest(256, 176, 32)
    assert row is selection._ANCHORS[(256, 176, 32)]


def test_nearest_is_log_space():
    # geometry between anchors resolves to the log-nearest one (3 axes)
    import math

    anchors = sorted(selection._ANCHORS)
    for dim, T, B in [(300, 200, 256), (512, 512, 96), (1024, 1024, 64),
                      (384, 176, 48)]:
        got = selection._nearest(dim, T, B)
        best = min(
            anchors,
            key=lambda a: (math.log(dim / a[0]) ** 2
                           + math.log(T / a[1]) ** 2
                           + math.log(B / a[2]) ** 2),
        )
        assert got is selection._ANCHORS[best]


def test_batch_axis_flips_flagship_winners():
    # round-5 measurements: at (256, 176) the training-attention winner is
    # einsum at B<=64 (0.123/0.165 ms vs flash 0.307/0.524) and flash at
    # B=256 (2.317 vs 2.802); FusedFFN loses at B=64 (0.212 vs 0.077) and
    # wins at B=256 (0.322 vs 0.568)
    assert selection.train_attention(256, 176, True, batch=32) == "einsum"
    assert selection.train_attention(256, 176, True, batch=64) == "einsum"
    assert selection.train_attention(256, 176, True, batch=256) == "flash"
    assert selection.ffn_fused_when_dropout(256, 176, batch=64) is False
    assert selection.ffn_fused_when_dropout(256, 176, batch=256) is True
    # batch=None assumes the reference recipe batch (256)
    assert selection.train_attention(256, 176, True) == "flash"


def test_dim384_anchor():
    # round-5: flash wins with dropout (1.891 vs 2.074) but einsum wins the
    # dropout-free fwd+bwd (1.066 — the einsum backward sheds mask traffic)
    assert selection.train_attention(384, 176, True, batch=256) == "flash"
    assert selection.train_attention(384, 176, False, batch=256) == "einsum"
    assert selection.ffn_fused_when_dropout(384, 176, batch=256) is True
    assert selection.conv_module_fused(384, 176, batch=256) is False


def test_dropout_active_never_returns_blocked():
    # the blocked kernel has no in-kernel dropout: the dropout-active
    # path must clamp to flash or einsum at EVERY geometry
    for dim in (128, 256, 512, 768, 1024):
        for T in (64, 176, 512, 1024, 4096):
            for B in (1, 32, 256, 1024):
                path = selection.train_attention(dim, T, True, batch=B)
                assert path in ("flash", "einsum")


def test_api_domains():
    for dim, T in [(256, 176), (512, 512), (768, 1024)]:
        assert selection.train_attention(dim, T, False) in (
            "flash", "flash_blocked", "einsum")
        assert selection.serve_attention(dim, T) in ("einsum", "flash_blocked")
        assert isinstance(selection.ffn_fused_when_dropout(dim, T), bool)
        assert isinstance(selection.conv_module_fused(dim, T), bool)


def test_large_geometry_rows_match_measured_results():
    # RESULTS.md round-4 "Geometry sweep": single-block flash stops
    # compiling at dim>=512/T>=512/B=128 and einsum beats blocked-flash at
    # every large geometry; FusedFFN keeps winning until its backward OOMs
    # at dim=768 (m=1536); the conv-module kernel never wins. Round 5 adds
    # (512,512,B32): flash measured faster there but ships clamped (the
    # OOM boundary between B=32 and B=128 is unmapped), and XLA FFN wins
    # at that batch.
    for dim, T, B in [(512, 512, 128), (512, 1024, 64)]:
        assert selection.train_attention(dim, T, True, batch=B) == "einsum"
        assert selection.train_attention(dim, T, False, batch=B) == "einsum"
        assert selection.serve_attention(dim, T) == "einsum"
        assert selection.ffn_fused_when_dropout(dim, T, batch=B) is True
        assert selection.conv_module_fused(dim, T, batch=B) is False
    assert selection.ffn_fused_when_dropout(768, 512, batch=128) is False
    assert selection.train_attention(768, 512, True, batch=128) == "einsum"
    assert selection.train_attention(512, 512, True, batch=32) == "einsum"
    assert selection.ffn_fused_when_dropout(512, 512, batch=32) is False
    # nearest-lookup extrapolation: a huge geometry lands on a large
    # (einsum / no-conv-fusion) anchor, never the flagship flash row
    assert selection.train_attention(2048, 4096, True) == "einsum"
    assert selection.conv_module_fused(2048, 4096) is False


def test_flagship_row_matches_measured_results():
    # RESULTS.md round-3/4: flash wins training fwd+bwd at the flagship
    # recipe batch, einsum wins eval, FusedFFN fuses when dropout active,
    # conv-module fusion is a recorded negative
    assert selection.train_attention(256, 176, True) == "flash"
    assert selection.train_attention(256, 176, False) == "flash"
    assert selection.serve_attention(256, 176) == "einsum"
    assert selection.ffn_fused_when_dropout(256, 176) is True
    assert selection.conv_module_fused(256, 176) is False


def test_translation_decode_anchor():
    assert selection.translation_decode_fused(208, 176) is True
