"""HTTP server + stream mode tests (reference: examples/server, examples/stream)."""

import io
import json
import pathlib
import threading
import urllib.request

import numpy as np
import pytest

JFK = pathlib.Path("/root/reference/samples/jfk.wav")


def _multipart(fields):
    boundary = "----whisper-tpu-test-boundary"
    out = io.BytesIO()
    for name, (filename, content) in fields.items():
        out.write(f"--{boundary}\r\n".encode())
        dispo = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            dispo += f'; filename="{filename}"'
        out.write((dispo + "\r\n\r\n").encode())
        out.write(content if isinstance(content, bytes) else content.encode())
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


@pytest.fixture(scope="module")
def server(mini_model_path):
    from whisper_tpu.cli.server import serve

    httpd = serve(str(mini_model_path), host="127.0.0.1", port=0,
                  defaults={"language": "en"})
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, body, ctype, timeout=600):
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        assert r.status == 200
        assert json.loads(r.read())["status"] == "ok"


def test_inference_formats(server):
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    wav = JFK.read_bytes()

    # default json
    body, ctype = _multipart({"file": ("jfk.wav", wav),
                              "temperature_inc": ("", "0.0")})
    status, rtype, data = _post(server + "/inference", body, ctype)
    assert status == 200 and "json" in rtype
    assert "text" in json.loads(data)

    # srt
    body, ctype = _multipart({"file": ("jfk.wav", wav),
                              "response_format": ("", "srt"),
                              "temperature_inc": ("", "0.0")})
    status, rtype, data = _post(server + "/inference", body, ctype)
    assert status == 200 and "subrip" in rtype
    assert b"-->" in data

    # vtt
    body, ctype = _multipart({"file": ("jfk.wav", wav),
                              "response_format": ("", "vtt"),
                              "temperature_inc": ("", "0.0")})
    status, rtype, data = _post(server + "/inference", body, ctype)
    assert status == 200 and data.startswith(b"WEBVTT")

    # verbose_json
    body, ctype = _multipart({"file": ("jfk.wav", wav),
                              "response_format": ("", "verbose_json"),
                              "no_language_probabilities": ("", "true"),
                              "temperature_inc": ("", "0.0")})
    status, rtype, data = _post(server + "/inference", body, ctype)
    assert status == 200
    j = json.loads(data)
    assert j["task"] == "transcribe"
    assert "segments" in j and "duration" in j
    for seg in j["segments"]:
        assert "text" in seg and "avg_logprob" in seg


def test_inference_errors(server):
    body, ctype = _multipart({"notfile": ("", "x")})
    req = urllib.request.Request(server + "/inference", data=body,
                                 headers={"Content-Type": ctype})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_load_endpoint(server, mini_model_path):
    body, ctype = _multipart({"model": ("", str(mini_model_path))})
    status, _, data = _post(server + "/load", body, ctype)
    assert status == 200 and json.loads(data)["status"] == "ok"

    body, ctype = _multipart({"model": ("", "/nonexistent.bin")})
    req = urllib.request.Request(server + "/load", data=body,
                                 headers={"Content-Type": ctype})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_stream_fixed_step(mini_model_path, capsys):
    """Fixed-step sliding-window mode over jfk.wav, as fast as possible."""
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.cli.stream import FileAudioSource, run_stream
    from whisper_tpu.runtime.context import WhisperContext
    import argparse

    ctx = WhisperContext.from_file(str(mini_model_path))
    args = argparse.Namespace(
        step=3000, length=8000, keep=200, language="en", translate=False,
        max_tokens=32, audio_ctx=0, beam_size=-1, vad_thold=0.6,
        freq_thold=100.0, no_context=True, no_fallback=True)
    src = FileAudioSource(str(JFK), 30000, realtime=False)
    out = io.StringIO()
    rc = run_stream(ctx, src, args, out=out)
    assert rc == 0
    assert src.done


def test_stream_vad_mode(mini_model_path):
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.cli.stream import FileAudioSource, run_stream
    from whisper_tpu.runtime.context import WhisperContext
    import argparse
    import io as _io

    ctx = WhisperContext.from_file(str(mini_model_path))
    args = argparse.Namespace(
        step=0, length=5000, keep=200, language="en", translate=False,
        max_tokens=32, audio_ctx=0, beam_size=-1, vad_thold=0.6,
        freq_thold=100.0, no_context=True, no_fallback=True)
    src = FileAudioSource(str(JFK), 30000, realtime=False)
    # force fast clock: patch the 2 s gate by pre-filling time
    out = _io.StringIO()
    rc = run_stream(ctx, src, args, out=out)
    assert rc == 0


def test_vad_simple_and_hpf():
    from whisper_tpu.audio.energy_vad import high_pass_filter, vad_simple

    sr = 16000
    t = np.arange(sr * 2, dtype=np.float32) / sr
    speech = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    silence = np.zeros(sr, np.float32)
    # loud first second, quiet last second -> speech ended -> True
    buf = np.concatenate([speech[:sr], silence])
    assert vad_simple(buf, sr, 1000, 0.6, 100.0)
    # constant loudness -> False
    assert not vad_simple(speech, sr, 1000, 0.6, 100.0)
    # not enough samples -> False
    assert not vad_simple(silence[:100], sr, 1000, 0.6, 100.0)
    # HPF kills DC
    dc = np.ones(sr, np.float32)
    y = high_pass_filter(dc, 100.0, sr)
    assert abs(y[-1]) < 1e-3
