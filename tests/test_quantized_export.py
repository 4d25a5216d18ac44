"""Int8 quantized export: artifact shrinks, outputs stay close, decode
unchanged on confident inputs."""

import jax
import jax.numpy as jnp
import numpy as np

from ishara_tpu.config import EncoderConfig, IsharaConfig
from ishara_tpu.models.encoder import IsharaEncoder
from ishara_tpu.serve.export import export_model, load_bundle


def test_int8_bundle_roundtrip(tmp_path):
    cfg = IsharaConfig(model=EncoderConfig(
        dim=64, variant="hybrid", num_squeeze_blocks=1, num_conform_blocks=1,
        num_heads=4, frame_len=32, dropout=0.0))
    model = IsharaEncoder(cfg.model)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 276)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)

    d_f32 = export_model(tmp_path / "f32", cfg, variables,
                         half_precision=False)
    d_q = export_model(tmp_path / "q", cfg, variables, quantize_int8=True)
    size_f32 = (d_f32 / "params.msgpack").stat().st_size
    size_q = (d_q / "params.msgpack").stat().st_size
    assert size_q < size_f32 * 0.35, (size_q, size_f32)

    _, restored, _ = load_bundle(d_q)
    y1 = np.asarray(model.apply(variables, x))
    y2 = np.asarray(model.apply(restored, x))
    # int8 per-channel keeps logits close
    assert np.mean(np.abs(y1 - y2)) < 0.1 * np.std(y1), (
        np.mean(np.abs(y1 - y2)), np.std(y1))
    # argmax decode agrees on the vast majority of frames
    agree = (y1.argmax(-1) == y2.argmax(-1)).mean()
    assert agree > 0.9, agree
