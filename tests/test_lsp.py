"""LSP voice-interface tests (reference: examples/lsp + tests/test-whisper.js
protocol shape)."""

import io
import json
import pathlib

import numpy as np
import pytest

JFK = pathlib.Path("/root/reference/samples/jfk.wav")


def _framed(body: dict) -> bytes:
    data = json.dumps(body).encode()
    return f"Content-Length: {len(data)}\r\n\r\n".encode() + data


def test_framing_roundtrip():
    from whisper_tpu.cli.lsp import read_message, write_message

    buf = io.BytesIO()
    write_message(buf, {"jsonrpc": "2.0", "id": 1, "result": {"a": 1}})
    buf.seek(0)
    assert read_message(buf) == {"jsonrpc": "2.0", "id": 1, "result": {"a": 1}}
    assert read_message(buf) is None


@pytest.fixture(scope="module")
def server(mini_model_path):
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.cli.lsp import LspServer
    from whisper_tpu.cli.stream import FileAudioSource
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    source = FileAudioSource(str(JFK), 30000, realtime=False)
    # pre-fill the whole file so VAD sees audio immediately
    while not source.done:
        source.poll()
    return LspServer(ctx, source)


def test_echo_and_errors(server):
    res = server.dispatch({"jsonrpc": "2.0", "id": 7, "method": "echo",
                           "params": {"x": 1}})
    assert res == {"jsonrpc": "2.0", "result": {"x": 1}, "id": 7}

    res = server.dispatch({"jsonrpc": "1.0", "id": 8, "method": "echo"})
    assert res["error"]["code"] == -3260

    res = server.dispatch({"jsonrpc": "2.0", "id": 9, "method": "seek"})
    assert res["error"]["code"] == -32601


def test_register_and_guided(server):
    res = server.dispatch({"jsonrpc": "2.0", "id": 1,
                           "method": "registerCommandset",
                           "params": ["red", "green", "blue"]})
    assert res["result"] == {"index": 0}

    # duplicate first token rejected
    res = server.dispatch({"jsonrpc": "2.0", "id": 2,
                           "method": "registerCommandset",
                           "params": ["red", "red"]})
    assert res["error"]["code"] == -31000

    res = server.dispatch({"jsonrpc": "2.0", "id": 3, "method": "guided",
                           "params": {"commandset_index": 0}})
    assert "result" in res, res
    assert res["result"]["command_text"] in ("red", "green", "blue")


def test_unguided(server):
    res = server.dispatch({"jsonrpc": "2.0", "id": 4, "method": "unguided",
                           "params": {}})
    assert "result" in res, res
    assert "transcription" in res["result"]
