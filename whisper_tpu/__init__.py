"""whisper_tpu — a TPU-native (JAX/XLA/Pallas) speech-recognition engine with
the capabilities of ggml-org/whisper.cpp: Whisper encoder-decoder and
Parakeet-TDT model families, ggml block-quantized weights, Silero VAD, a full
decoding state machine (timestamps, beam search, temperature fallback), CLI /
server / bench tools, and mesh sharding for multi-chip scale-out.
"""

from .decoding.full import Segment, transcribe
from .decoding.params import SamplingStrategy, TranscribeParams
from .models.whisper.load import load_model
from .runtime.context import WhisperContext

__version__ = "0.1.0"


def load(path: str, **kwargs) -> WhisperContext:
    """Load a ggml/gguf whisper model file into a ready-to-use context.

    The stable two-call surface (`ctx = whisper_tpu.load(p)`;
    `whisper_tpu.transcribe(ctx, params, samples)`) mirroring the
    reference's whisper_init_from_file_with_params + whisper_full
    (include/whisper.h:201-767)."""
    return WhisperContext.from_file(path, **kwargs)


__all__ = [
    "Segment",
    "SamplingStrategy",
    "TranscribeParams",
    "WhisperContext",
    "load",
    "load_model",
    "transcribe",
]
