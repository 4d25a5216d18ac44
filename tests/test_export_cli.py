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
