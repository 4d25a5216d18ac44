"""Export bundle round-trip, eval harness, and the CLI surface."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.config import EncoderConfig, IsharaConfig
from ishara_tpu.data.synthetic import SyntheticASLFR
from ishara_tpu.data.tokenizer import CTCTokenizer
from ishara_tpu.evaluation.harness import run_harness
from ishara_tpu.models.encoder import IsharaEncoder
from ishara_tpu.serve.export import export_model, load_bundle, load_engine


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    cfg = IsharaConfig(model=EncoderConfig(
        dim=64, variant="squeezeformer", num_squeeze_blocks=1, num_heads=4,
        frame_len=32, dropout=0.0))
    model = IsharaEncoder(cfg.model)
    x = jnp.zeros((1, 32, 276), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = tmp_path_factory.mktemp("export") / "bundle"
    export_model(out, cfg, variables)
    return out, variables


def test_bundle_contents(bundle):
    out, _ = bundle
    assert (out / "config.json").exists()
    assert (out / "params.msgpack").exists()
    assert (out / "stats.npz").exists()
    args = json.loads((out / "inference_args.json").read_text())
    assert len(args["selected_columns"]) == 276
    assert args["selected_columns"][0] == "x_right_hand_0"


def test_bundle_roundtrip_preserves_outputs(bundle):
    out, variables = bundle
    cfg, restored, stats = load_bundle(out)
    model = IsharaEncoder(cfg.model)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 32, 276)), jnp.float32)
    y1 = model.apply(variables, x)
    y2 = model.apply(restored, x)
    # bf16 export: tolerances match half-precision storage
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=0.05, atol=0.05)


def test_load_engine_and_harness(bundle):
    out, _ = bundle
    engine = load_engine(out, max_raw_frames=64)
    tok = CTCTokenizer()
    ds = SyntheticASLFR(num_sequences=6, frames_per_char=4, min_phrase=2,
                        max_phrase=3)
    res = run_harness(engine, ds, tok, num_sequences=6)
    assert res.num_sequences == 6
    assert np.isfinite(res.latency_ms_p50)
    # competition normalization is unbounded below for long wrong preds
    assert res.score <= 1.0
    assert 0.0 <= res.score_maxlen <= 1.0


# ---------------------------------------------------------------------------
# Translation-family deployment (VERDICT r1 #7): bundle round-trip + engine +
# harness for ASLTranslationModel, mirroring the CTC path.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def translation_bundle(tmp_path_factory):
    from ishara_tpu.serve.export import build_task_model

    cfg = IsharaConfig(
        model=EncoderConfig(dim=64, num_heads=4, frame_len=32, dropout=0.0,
                            num_classes=62),
        task="translation",
    )
    model, init = build_task_model(cfg)
    variables = init(jax.random.key(1))
    out = tmp_path_factory.mktemp("export_tr") / "bundle"
    export_model(out, cfg, variables)
    return out, model, variables


def test_translation_bundle_roundtrip(translation_bundle):
    from ishara_tpu.data.landmarks import N_LANDMARKS

    out, model, variables = translation_bundle
    cfg, restored, _ = load_bundle(out)
    assert cfg.task == "translation"
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 32, N_LANDMARKS, 3)), jnp.float32)
    mask = jnp.ones((1, 32), bool)
    tgt = jnp.asarray([[1, 5, 2, 0]], jnp.int32)
    (y1, c1) = model.apply(variables, x, mask, tgt)
    (y2, c2) = model.apply(restored, x, mask, tgt)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=0.05, atol=0.05)


def test_translation_load_engine_and_harness(translation_bundle):
    from ishara_tpu.data.tokenizer import Seq2SeqTokenizer
    from ishara_tpu.serve.translation_engine import TranslationEngine

    out, _, _ = translation_bundle
    engine = load_engine(out, max_raw_frames=48, max_out=8)
    assert isinstance(engine, TranslationEngine)
    tok = Seq2SeqTokenizer()
    raw = np.random.default_rng(3).standard_normal((40, 276)).astype(np.float32)
    text, conf = engine.predict_text(raw, tok)
    assert isinstance(text, str) and np.isfinite(conf)

    ds = SyntheticASLFR(num_sequences=4, frames_per_char=4, min_phrase=2,
                        max_phrase=3)
    res = run_harness(engine, ds, tok, num_sequences=4, translation=True)
    assert res.num_sequences == 4 and np.isfinite(res.latency_ms_p50)


def test_cli_translation_train_export_infer(tmp_path):
    """Full CLI path for the seq2seq family: train 1 epoch -> export ->
    infer, mirroring the CTC CLI test."""
    env_patch = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_num_cpu_devices',8); "
    )
    run = lambda code: subprocess.run(  # noqa: E731
        [sys.executable, "-c", env_patch + code],
        capture_output=True, text=True, timeout=600)

    r = run("from ishara_tpu.__main__ import main; main(['train',"
            f"'--task','translation','--workdir','{tmp_path}/run',"
            "'--epochs','1','--max-sequences','8','--batch-size','8'])")
    assert r.returncode == 0, r.stderr[-2000:]

    r = run("from ishara_tpu.__main__ import main; main(['export',"
            f"'--workdir','{tmp_path}/run','--output','{tmp_path}/bundle'])")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads((tmp_path / "bundle" / "config.json").read_text())[
        "task"] == "translation"

    np.save(tmp_path / "x.npy",
            np.random.default_rng(0).standard_normal((40, 276)).astype(
                np.float32))
    r = run("from ishara_tpu.__main__ import main; main(['infer',"
            f"'--bundle','{tmp_path}/bundle','--input','{tmp_path}/x.npy'])")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "text" in out and "confidence" in out


def test_cli_help_and_train_smoke(tmp_path):
    env_patch = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_num_cpu_devices',8); "
    )
    r = subprocess.run(
        [sys.executable, "-c",
         env_patch + "from ishara_tpu.__main__ import main; main(['train',"
         f"'--workdir','{tmp_path}/run','--epochs','1',"
         "'--max-sequences','8','--batch-size','8'])"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "train_loss" in out
