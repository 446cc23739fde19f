"""Silero-VAD tests (reference: tests/test-vad.cpp + whisper_vad_* API).

The reference ships a real-weight tiny silero model; its segment output for
samples/jfk.wav is the oracle (reference test-vad binary prints:
(32,227) (327,441) (538,768) (816,1062) centiseconds).
"""

import pathlib

import numpy as np
import pytest

from whisper_tpu.decoding.params import VadParams
from whisper_tpu.models.vad.silero import (VadContext, load_vad_model,
                                           segments_from_probs,
                                           segments_from_samples)
from whisper_tpu.models.vad.writer import synth_vad_tensors, write_vad_model
from whisper_tpu.models.vad.pipeline import (filter_speech,
                                             map_processed_to_original_time)

SILERO = pathlib.Path("/root/reference/models/for-tests-silero-v6.2.0-ggml.bin")
JFK = pathlib.Path("/root/reference/samples/jfk.wav")

# reference test-vad output for jfk.wav with default params
ORACLE_SEGMENTS = [(32, 227), (327, 441), (538, 768), (816, 1062)]


@pytest.fixture(scope="module")
def jfk_samples():
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    samples, _ = load_audio(str(JFK))
    return samples


def test_load_real_model():
    if not SILERO.exists():
        pytest.skip("silero test model not available")
    m = load_vad_model(str(SILERO))
    assert m.model_type == "silero-16k"
    assert m.version == "6.2.0"
    assert m.n_window == 512 and m.n_context == 64
    assert m.hparams.encoder_in_channels == (129, 128, 64, 64)
    assert m.tensors["_model.stft.forward_basis_buffer"].shape == (258, 1, 256)
    assert m.tensors["_model.decoder.rnn.weight_ih"].shape == (512, 128)


def test_jfk_segments_match_reference(jfk_samples):
    if not SILERO.exists():
        pytest.skip("silero test model not available")
    vctx = VadContext.from_file(str(SILERO))
    segs = segments_from_samples(vctx, VadParams(), jfk_samples)
    got = [(s.start, s.end) for s in segs]
    assert got == ORACLE_SEGMENTS, got
    # probs exposed like whisper_vad_probs
    assert vctx.probs is not None and len(vctx.probs) == 344
    assert float(vctx.probs.min()) >= 0.0 and float(vctx.probs.max()) <= 1.0


def test_reset_state_determinism(jfk_samples):
    if not SILERO.exists():
        pytest.skip("silero test model not available")
    vctx = VadContext.from_file(str(SILERO))
    p1 = vctx.detect_speech(jfk_samples[:16000]).copy()
    p2 = vctx.detect_speech(jfk_samples[:16000]).copy()  # reset=True default
    np.testing.assert_array_equal(p1, p2)
    # no_reset continues the LSTM state -> different probs
    p3 = vctx.detect_speech(jfk_samples[:16000], reset=False)
    assert not np.array_equal(p1, p3)


def test_synth_model_roundtrip(tmp_path):
    path = tmp_path / "vad-synth.bin"
    write_vad_model(str(path), synth_vad_tensors())
    m = load_vad_model(str(path))
    assert not m.is_empty
    vctx = VadContext(m)
    probs = vctx.detect_speech(np.zeros(512 * 10, np.float32))
    assert probs.shape == (10,)
    assert np.all((probs >= 0) & (probs <= 1))


def test_empty_model(tmp_path):
    """Header-only VAD file loads as 'empty model for testing'
    (src/whisper.cpp:5103)."""
    path = tmp_path / "vad-empty.bin"
    write_vad_model(str(path), {})
    m = load_vad_model(str(path))
    assert m.is_empty
    vctx = VadContext(m)
    probs = vctx.detect_speech(np.zeros(512 * 4, np.float32))
    assert probs.shape == (4,) and np.all(probs == 1.0)


def test_segment_state_machine_rules():
    """Handcrafted probs through the exact state machine."""
    nw = 512
    p = VadParams(threshold=0.5, min_speech_duration_ms=250,
                  min_silence_duration_ms=100, speech_pad_ms=30)
    # 20 speech chunks (0.64s) then long silence: one segment
    probs = np.array([0.9] * 20 + [0.0] * 40, np.float32)
    segs = segments_from_probs(probs, p, nw)
    assert len(segs) == 1
    # padding: start = max(0, 0 - 480 samples) = 0
    assert segs[0].start == 0
    # too-short speech (2 chunks = 64 ms < 250 ms) is dropped
    probs = np.array([0.0] * 10 + [0.9] * 2 + [0.0] * 40, np.float32)
    assert segments_from_probs(probs, p, nw) == []
    # segments closer than 200 ms merge
    probs = np.array([0.9] * 20 + [0.0] * 3 + [0.9] * 20 + [0.0] * 40,
                     np.float32)
    segs = segments_from_probs(probs, p, nw)
    assert len(segs) == 1


def test_max_speech_split():
    nw = 512
    p = VadParams(threshold=0.5, max_speech_duration_s=2.0,
                  min_silence_duration_ms=100)
    probs = np.array([0.9] * 200, np.float32)  # 6.4 s continuous speech
    segs = segments_from_probs(probs, p, nw)
    # forced splits at ~2 s have zero gap, so the reference's 200 ms merge
    # pass (src/whisper.cpp:5366-5390) re-merges them into one segment
    assert len(segs) == 1
    assert segs[0].start == 0 and segs[0].end == 640


def test_filter_speech_and_remap(jfk_samples, tmp_path):
    if not SILERO.exists():
        pytest.skip("silero test model not available")

    class P:
        vad_model_path = str(SILERO)
        vad_params = VadParams()

    filtered, table, used = filter_speech(None, P(), jfk_samples)
    assert len(filtered) < len(jfk_samples)
    # the kept speech segments (state->vad_segments analogue) are the
    # Silero segments in original time, monotone and non-empty
    assert used and all(s < e for s, e in used)
    assert [s for s, _ in used] == sorted(s for s, _ in used)
    # mapping strictly increasing in processed time
    pts = [m[0] for m in table]
    assert pts == sorted(set(pts))
    # identity at table points, monotone in between
    for proc, orig in table:
        assert map_processed_to_original_time(proc, table) == orig
    assert map_processed_to_original_time(-5, table) == table[0][1]
    assert map_processed_to_original_time(10**9, table) == table[-1][1]
    mids = [map_processed_to_original_time(t, table)
            for t in range(0, pts[-1], 7)]
    assert all(b >= a for a, b in zip(mids, mids[1:]))


def test_vad_segments_cli_matches_reference():
    """cli/vad_segments output matches whisper-vad-speech-segments exactly."""
    import io
    import pathlib
    import subprocess
    from contextlib import redirect_stdout

    model = "/root/reference/models/for-tests-silero-v6.2.0-ggml.bin"
    jfk = "/root/reference/samples/jfk.wav"
    from oracle_paths import find_bin

    oracle = find_bin("whisper-vad-speech-segments")
    if not (pathlib.Path(model).exists() and pathlib.Path(jfk).exists()):
        pytest.skip("fixtures not available")

    from whisper_tpu.cli.vad_segments import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["-vm", model, "-f", jfk, "-np"]) == 0
    ours = buf.getvalue()
    assert "Detected 4 speech segments:" in ours
    if oracle is not None:
        ref = subprocess.run([str(oracle), "-vm", model, "-f", jfk, "-np"],
                             capture_output=True, text=True).stdout
        assert ours == ref
