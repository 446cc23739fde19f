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

__all__ = [
    "Segment",
    "SamplingStrategy",
    "TranscribeParams",
    "WhisperContext",
    "load_model",
    "transcribe",
]
