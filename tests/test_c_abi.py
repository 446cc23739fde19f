"""whisper.h-shaped C ABI shim (native/whisper_abi.cpp): build the shared
library + a pure-C host, then run the reference binding call sequence
(init -> full -> iterate segments -> free) end-to-end from C against the
deterministic mini model.  This is the door-opener for whisper.cpp-style
language bindings (reference bindings/go/whisper.go:12-29)."""

import os
import pathlib
import subprocess
import sys
import sysconfig

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
BUILD = REPO / ".fixtures" / "abi"
MINI_MODEL = REPO / ".fixtures" / "mini-f16.bin"
JFK = pathlib.Path("/root/reference/samples/jfk.wav")


@pytest.fixture(scope="module")
def abi_build():
    BUILD.mkdir(parents=True, exist_ok=True)
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    so = BUILD / "libwhisper_tpu.so"
    exe = BUILD / "test_abi"
    src_so = REPO / "native" / "whisper_abi.cpp"
    src_c = REPO / "native" / "test_abi_main.c"
    if (not so.exists()
            or so.stat().st_mtime < src_so.stat().st_mtime):
        subprocess.run(
            ["g++", "-shared", "-fPIC", "-O2", str(src_so), "-o", str(so),
             f"-I{inc}", f"-L{libdir}", f"-l{pyver}",
             f"-Wl,-rpath,{libdir}"], check=True)
    if (not exe.exists()
            or exe.stat().st_mtime < src_c.stat().st_mtime
            or exe.stat().st_mtime < so.stat().st_mtime):
        subprocess.run(
            ["gcc", "-O2", str(src_c), "-o", str(exe),
             f"-L{BUILD}", "-lwhisper_tpu", f"-Wl,-rpath,{BUILD}"],
            check=True)
    return exe


def test_c_host_drives_engine(abi_build):
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    samples, _ = load_audio(str(JFK))
    pcm = BUILD / "jfk.pcm.f32"
    samples[: 16000 * 6].astype("<f4").tofile(pcm)

    env = dict(os.environ,
               PYTHONPATH=str(REPO),
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [str(abi_build), str(MINI_MODEL), str(pcm)],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "C-ABI OK" in proc.stdout, proc.stdout
    assert "n_segments=" in proc.stdout
    # at least one segment with a timestamp line was printed
    n = int([ln for ln in proc.stdout.splitlines()
             if ln.startswith("n_segments=")][0].split("=")[1])
    assert n >= 1


def test_capi_python_surface(mini_model_path):
    """The handle API itself (independent of the C build)."""
    from whisper_tpu import capi

    h = capi.init_from_file(str(mini_model_path))
    assert h > 0
    assert capi.init_from_file("/nonexistent.bin") == 0
    assert capi.lang_id("en") == 0
    assert capi.lang_str(0) == "en"
    assert capi.lang_max_id() > 90

    samples = np.zeros(16000, np.float32)  # 1 s silence
    rc = capi.full(h, '{"language": "en", "temperature_inc": 0.0}', samples)
    assert rc == 0
    n = capi.full_n_segments(h)
    for i in range(n):
        assert isinstance(capi.full_get_segment_text(h, i), str)
        assert capi.full_get_segment_t1(h, i) >= capi.full_get_segment_t0(h, i)
    capi.free(h)
    assert capi.full_n_segments(h) == 0
