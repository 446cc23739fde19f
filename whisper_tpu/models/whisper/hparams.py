"""Whisper hyperparameters and audio constants.

Mirrors the reference header fields (src/whisper.cpp:1505-1547) and the audio
constants (include/whisper.h:33-36).
"""

from __future__ import annotations

from dataclasses import dataclass

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_SIZE = 30  # seconds per window
N_SAMPLES_PER_CHUNK = SAMPLE_RATE * CHUNK_SIZE  # 480000
MAX_DECODERS = 8  # WHISPER_MAX_DECODERS (src/whisper.cpp:142)

MODEL_NAMES = {4: "tiny", 6: "base", 12: "small", 24: "medium", 32: "large"}


@dataclass(frozen=True)
class WhisperHParams:
    n_vocab: int = 51864
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    n_mels: int = 80
    ftype: int = 1  # ggml_ftype after qnt-version split
    eps: float = 1e-5

    @property
    def model_name(self) -> str:
        name = MODEL_NAMES.get(self.n_audio_layer, "unknown")
        if name == "large" and self.n_vocab == 51866:
            # the distilled turbo variant keeps large-v3's encoder but only
            # 4 decoder layers
            name = ("large-v3-turbo" if self.n_text_layer == 4
                    else "large-v3")
        return name

    @property
    def d_head_audio(self) -> int:
        return self.n_audio_state // self.n_audio_head

    @property
    def d_head_text(self) -> int:
        return self.n_text_state // self.n_text_head


# canonical configurations (OpenAI whisper model zoo)
TINY = WhisperHParams()
TINY_EN = WhisperHParams(n_vocab=51864)
BASE = WhisperHParams(
    n_audio_state=512, n_audio_head=8, n_audio_layer=6,
    n_text_state=512, n_text_head=8, n_text_layer=6, n_vocab=51865,
)
SMALL = WhisperHParams(
    n_audio_state=768, n_audio_head=12, n_audio_layer=12,
    n_text_state=768, n_text_head=12, n_text_layer=12, n_vocab=51865,
)
MEDIUM = WhisperHParams(
    n_audio_state=1024, n_audio_head=16, n_audio_layer=24,
    n_text_state=1024, n_text_head=16, n_text_layer=24, n_vocab=51865,
)
LARGE_V3 = WhisperHParams(
    n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
    n_text_state=1280, n_text_head=20, n_text_layer=32, n_vocab=51866,
    n_mels=128,
)
# distilled 4-layer decoder variant (reference models/convert-h5-to-ggml.py
# output for openai/whisper-large-v3-turbo; bench row
# scripts/bench-all-gg.txt:411)
LARGE_V3_TURBO = WhisperHParams(
    n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
    n_text_state=1280, n_text_head=20, n_text_layer=4, n_vocab=51866,
    n_mels=128,
)
