"""Live-capture ring buffer (audio/capture.py) — audio_async semantics
(reference examples/common-sdl.cpp) driven by a fake microphone subprocess
that emits deterministic s16le PCM on stdout."""

import sys
import time

import numpy as np
import pytest

from whisper_tpu.audio.capture import MicCapture, list_capture_devices

# a fake mic: emits an s16 ramp 0,1,2,... at ~4x realtime in 50 ms chunks
FAKE_MIC = [sys.executable, "-u", "-c", """
import sys, struct, time
i = 0
for _ in range(40):
    chunk = struct.pack('<800h', *[(i + j) % 32767 for j in range(800)])
    sys.stdout.buffer.write(chunk); sys.stdout.buffer.flush()
    i += 800
    time.sleep(0.0125)
"""]


def _wait(pred, timeout=60.0):
    # generous deadline: predicates fire in <1 s when healthy, but a
    # saturated CI box (parallel jit compiles) can starve the fake-mic
    # subprocess for tens of seconds
    t0 = time.monotonic()
    while not pred():
        if time.monotonic() - t0 > timeout:
            raise TimeoutError
        time.sleep(0.01)


def test_threaded_capture_fills_ring_without_polling():
    with MicCapture(length_ms=1500, mic_cmd=FAKE_MIC) as cap:
        # no poll() calls at all — the reader thread fills the buffer
        _wait(lambda: cap.available_ms() >= 500)
        got = cap.get(250)
        assert len(got) == 4000
        # ramp is contiguous: consecutive samples differ by 1/32768
        d = np.diff((got * 32768.0).round())
        assert np.all((d == 1) | (d < -30000))  # wrap at 32767


def test_ring_keeps_only_newest_length_ms():
    with MicCapture(length_ms=500, mic_cmd=FAKE_MIC) as cap:
        _wait(lambda: cap.done)
        assert cap.available_ms() <= 500
        # newest samples survive: last value is near the end of the ramp
        tail = int(round(float(cap.get(10)[-1]) * 32768.0))
        assert tail > 8000


def test_pause_resume_and_clear():
    with MicCapture(length_ms=2000, mic_cmd=FAKE_MIC) as cap:
        _wait(lambda: cap.available_ms() >= 200)
        cap.pause()
        n0 = cap.available_ms()
        time.sleep(0.2)
        assert cap.available_ms() == n0  # paused: nothing appended
        cap.resume()
        cap.clear()
        _wait(lambda: cap.available_ms() >= 100 or cap.done)


def test_no_backend_errors_cleanly(monkeypatch):
    import whisper_tpu.audio.capture as capture

    monkeypatch.setattr(capture.shutil, "which", lambda *_: None)
    monkeypatch.setattr(MicCapture, "_try_sounddevice", lambda self: False)
    cap = MicCapture(length_ms=1000)
    with pytest.raises(RuntimeError, match="no capture backend"):
        cap.start()


def test_list_capture_devices_no_crash():
    assert isinstance(list_capture_devices(), list)


def test_stream_cli_live_mic_end_to_end(mini_model_path):
    """The stream CLI's default (live microphone) path, driven end-to-end by
    a fake capture command that plays jfk.wav as s16 PCM faster than
    realtime — reference stream.cpp's audio_async flow without SDL."""
    import pathlib
    import subprocess as sp

    wav = pathlib.Path("/root/reference/samples/jfk.wav")
    if not wav.exists():
        pytest.skip("jfk.wav not available")

    mic_cmd = (
        f"{sys.executable} -c \"import sys,time,wave;"
        f"w=wave.open('{wav}','rb');"
        f"[(sys.stdout.buffer.write(w.readframes(1600)),"
        f"sys.stdout.buffer.flush(),time.sleep(0.02))"
        f" for _ in range(int(w.getnframes()/1600))]\""
    )
    proc = sp.run(
        [sys.executable, "-m", "whisper_tpu.cli.stream",
         "-m", str(mini_model_path), "--mic-cmd", mic_cmd,
         "--step", "3000", "--length", "6000", "-mt", "8", "-nf"],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # transcribed at least one step's worth of text (random weights -> any
    # non-empty output line)
    assert proc.stdout.strip(), proc.stderr
