"""Test harness: CPU backend with 8 virtual devices (multi-chip sharding tests
run on a simulated mesh, mirroring the reference's fake-model/no-GPU CI
philosophy — SURVEY.md §4)."""

import os
import pathlib
import subprocess
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; config.update after import wins (no backend initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = REPO / ".fixtures"
DATA = REPO / "tests" / "data"
REF_MODELS = pathlib.Path("/root/reference/models")
JFK_WAV = pathlib.Path("/root/reference/samples/jfk.wav")

MINI_MODEL = FIXTURES / "mini-f16.bin"


def _ensure_mini_model() -> pathlib.Path:
    """Deterministically regenerate the random-weight mini model."""
    if MINI_MODEL.exists():
        return MINI_MODEL
    header = REF_MODELS / "for-tests-ggml-tiny.en.bin"
    if not header.exists():
        pytest.skip("reference for-tests model not available")
    FIXTURES.mkdir(exist_ok=True)
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_test_model.py"),
         "--header-from", str(header), "--out", str(MINI_MODEL)],
        check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    return MINI_MODEL


@pytest.fixture(scope="session")
def mini_model_path() -> pathlib.Path:
    return _ensure_mini_model()


@pytest.fixture(scope="session")
def mini_model(mini_model_path):
    from whisper_tpu.models.whisper.load import load_model

    return load_model(str(mini_model_path))


@pytest.fixture(scope="session")
def jfk_pcm() -> np.ndarray:
    if not JFK_WAV.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import read_wav

    mono, _, sr = read_wav(str(JFK_WAV))
    assert sr == 16000
    return mono
