"""whisper_tpu — a TPU-native (JAX/XLA/Pallas) speech-recognition engine with
the capabilities of ggml-org/whisper.cpp: Whisper encoder-decoder and
Parakeet-TDT model families, ggml block-quantized weights, Silero VAD, a full
decoding state machine (timestamps, beam search, temperature fallback), CLI /
server / bench tools, and mesh sharding for multi-chip scale-out.
"""

import os as _os


def _enable_persistent_compile_cache() -> None:
    """Persist XLA executables across processes (opt-out: WHISPER_TPU_NO_CACHE).

    Large-v3 decode graphs take tens of seconds to compile; the reference
    engine has no compile step, so cold-start parity on TPU depends on
    reusing compiled programs.  JAX's persistent cache keys on HLO +
    compile flags + runtime version, so stale hits are not possible."""
    if _os.environ.get("WHISPER_TPU_NO_CACHE"):
        return
    if _os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # CPU compiles are fast; reloading CPU AOT entries across processes
        # with different XLA flags trips noisy feature-mismatch warnings
        return
    try:
        import jax

        if jax.config.jax_platforms == "cpu":
            return
        if _os.environ.get("JAX_COMPILATION_CACHE_DIR") is None:
            cache = _os.path.join(
                _os.path.expanduser("~"), ".cache", "whisper_tpu", "jax")
            jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

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
