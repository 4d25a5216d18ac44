"""Isolated conv-module probe: fused Pallas kernel vs XLA composition,
fwd+bwd at the flagship training geometry ([256, 176, 256], bf16).
Chained-carry timing per CLAUDE.md rules."""

import sys
import time

sys.path.insert(0, ".")
from scripts.perf_probe import slope, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/ishara_jax_cache_tpu" if on_tpu else "/tmp/ishara_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())

    from ishara_tpu.models.layers import SqueezeformerConvModule

    B, T, D, K, exp = 256, 176, 256, 15, 2
    mod = SqueezeformerConvModule(D, K, exp, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.float32)
    variables = mod.init(jax.random.key(0), x, mask=mask)
    params = variables["params"]

    def make(training):
        def loss(params, x):
            out = mod.apply({"params": params}, x, mask=mask,
                            training=training)
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        grad = jax.grad(loss, argnums=(0, 1))

        def loop(Ksteps):
            def body(c, _):
                gp, gx = grad(params, x + c.astype(x.dtype))
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree_util.tree_leaves(gp))
                return s * 1e-20 + jnp.sum(gx.astype(jnp.float32)) * 1e-20, None

            compiled = jax.jit(
                lambda: jax.lax.scan(body, jnp.float32(0), None,
                                     length=Ksteps)[0]
            ).lower().compile()
            return lambda: float(compiled())

        return loop

    t0 = time.time()
    for training, label in ((False, "XLA composition"),
                            (True, "fused kernel")):
        ms = slope(make(training), 4, 24, n=3) * 1e3
        log(f"conv-module fwd+bwd [{label}]: {ms:.3f} ms "
            f"(x4 sites = {4 * ms:.1f} ms/step)")
    log(f"total {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
