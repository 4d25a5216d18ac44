"""CPU-fallback semantics of fast_dropout_add (the fused residual-site
dropout, ops/dropout.py): must equal res + fast_dropout(x) with the same
RNG, and pass through at rate 0 / deterministic."""

import jax
import jax.numpy as jnp
import numpy as np

from ishara_tpu.ops.dropout import fast_dropout, fast_dropout_add


def test_fallback_matches_unfused():
    r = np.random.default_rng(0)
    res = jnp.asarray(r.standard_normal((4, 20, 32)).astype(np.float32))
    x = jnp.asarray(r.standard_normal((4, 20, 32)).astype(np.float32))
    rng = jax.random.key(7)
    fused = fast_dropout_add(res, x, rng, 0.3)
    unfused = res + fast_dropout(x, rng, 0.3)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=1e-6)


def test_rate_zero_is_plain_add():
    res = jnp.ones((2, 3, 4))
    x = jnp.full((2, 3, 4), 2.0)
    out = fast_dropout_add(res, x, jax.random.key(0), 0.0)
    np.testing.assert_array_equal(np.asarray(out), 3.0)


def test_site_seeds_shapes_and_distinctness():
    """site_seeds: n int32 in [0, 2^31) from typed/raw keys; folded keys
    give distinct seeds; raw PRNGKey(x) keys differ in the first word."""
    from ishara_tpu.ops.dropout import site_seeds

    for key in (jax.random.key(3), jax.random.PRNGKey(3)):
        for n in (1, 2, 5):
            s = site_seeds(key, n)
            assert s.shape == (n,) and s.dtype == jnp.int32
            assert bool((s >= 0).all())
    a = site_seeds(jax.random.fold_in(jax.random.key(0), 1), 2)
    b = site_seeds(jax.random.fold_in(jax.random.key(0), 2), 2)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    ra = site_seeds(jax.random.PRNGKey(10), 1)
    rb = site_seeds(jax.random.PRNGKey(11), 1)
    assert int(ra[0]) != int(rb[0])


def test_module_site_still_trains():
    """SqueezeformerBlock with the fused residual sites: grads flow and
    eval mode is exactly res + h."""
    from ishara_tpu.models.blocks import SqueezeformerBlock

    block = SqueezeformerBlock(dim=32, num_heads=4, expansion_factor=2,
                               kernel_size=3, dropout=0.2)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 12, 32)).astype(np.float32))
    variables = block.init(jax.random.key(0), x)

    def loss(params):
        vs = dict(variables, params=params)
        out = block.apply(
            vs, x, training=True, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"])[0]
        return jnp.mean(jnp.square(out))

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in flat)
    assert any(float(jnp.abs(v).max()) > 0 for v in flat)


def test_row_block_respects_padded_vmem_budget():
    """The block law must budget by the Mosaic lane-PADDED width (ceil to
    128): the translation decoder's self-attn prob dropout ([B*H*S, S] with
    S=63) compiled to a 16.27 MB scoped-VMEM stack under the old
    logical-width law and died on-chip. Aligned widths must be unchanged
    (they are the measured anchors)."""
    from ishara_tpu.ops.dropout import _row_block

    for R, C in [(129024, 63), (360448, 176), (131072, 1), (8, 129),
                 (45056, 256), (45056, 1024), (1000, 200), (7, 63)]:
        br = _row_block(R, C)
        cp = -(-C // 128) * 128
        assert br * cp <= 1 << 19, (R, C, br)
        assert br >= min(R, 8)
        assert br <= R or br % 8 == 0
    # lane-aligned widths: byte-identical to the old ~2MB law
    assert _row_block(45056, 256) == 2048
    assert _row_block(45056, 512) == 1024
    # the failing geometry now fits: padded width 128 -> 4096 rows
    assert _row_block(129024, 63) == 4096
