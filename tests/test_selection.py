"""Unit tests for the measured kernel-selection table (ops/selection.py).

The table maps (dim, T) to measured kernel-vs-XLA winners via
nearest-log-anchor lookup (VERDICT r3 #4 / ROADMAP #11). These tests pin
the lookup semantics — exact anchors resolve to their own row, off-anchor
geometries resolve to the nearest measured regime, and the dropout-active
clamp never returns the blocked kernel (which has no in-kernel dropout).
"""

from ishara_tpu.ops import selection


def test_anchor_exact_lookup():
    # the flagship anchor must resolve to its own measured row
    row = selection._nearest(256, 176)
    assert row is selection._ANCHORS[(256, 176)]


def test_nearest_is_log_space():
    # geometry between two anchors resolves to the log-nearest one
    anchors = sorted(selection._ANCHORS)
    if len(anchors) < 2:
        # single-anchor table: everything resolves to it
        far = selection._nearest(4096, 8192)
        assert far is selection._ANCHORS[anchors[0]]
        return
    import math

    for dim, T in [(300, 200), (512, 512), (1024, 1024)]:
        got = selection._nearest(dim, T)
        best = min(
            anchors,
            key=lambda a: math.log(dim / a[0]) ** 2 + math.log(T / a[1]) ** 2,
        )
        assert got is selection._ANCHORS[best]


def test_dropout_active_never_returns_blocked():
    # the blocked kernel has no in-kernel dropout: the dropout-active
    # path must clamp to flash or einsum at EVERY geometry
    for dim in (128, 256, 512, 768, 1024):
        for T in (64, 176, 512, 1024, 4096):
            path = selection.train_attention(dim, T, dropout_active=True)
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
    # compiling at dim>=512/T>=512 and einsum beats blocked-flash at every
    # large geometry; FusedFFN keeps winning until its backward OOMs at
    # dim=768 (m=1536); the conv-module kernel never wins.
    for dim, T in [(512, 512), (512, 1024)]:
        assert selection.train_attention(dim, T, True) == "einsum"
        assert selection.train_attention(dim, T, False) == "einsum"
        assert selection.serve_attention(dim, T) == "einsum"
        assert selection.ffn_fused_when_dropout(dim, T) is True
        assert selection.conv_module_fused(dim, T) is False
    assert selection.ffn_fused_when_dropout(768, 512) is False
    assert selection.train_attention(768, 512, True) == "einsum"
    # nearest-lookup extrapolation: a huge geometry lands on a large
    # (einsum / no-conv-fusion) anchor, never the flagship flash row
    assert selection.train_attention(2048, 4096, True) == "einsum"
    assert selection.conv_module_fused(2048, 4096) is False


def test_flagship_row_matches_measured_results():
    # RESULTS.md round-3/4: flash wins training fwd+bwd at the flagship,
    # einsum wins eval, FusedFFN fuses when dropout active, conv-module
    # fusion is a recorded negative
    assert selection.train_attention(256, 176, True) == "flash"
    assert selection.train_attention(256, 176, False) == "flash"
    assert selection.serve_attention(256, 176) == "einsum"
    assert selection.ffn_fused_when_dropout(256, 176) is True
    assert selection.conv_module_fused(256, 176) is False
