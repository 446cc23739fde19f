"""Handle-based procedural API mirroring whisper.h — the bridge surface for
the C ABI shim (native/whisper_abi.cpp).

The reference's public contract is a procedural C API over opaque contexts
(include/whisper.h:201-767: whisper_init_from_file_with_params,
whisper_full, whisper_full_n_segments, whisper_full_get_segment_*, ...).
whisper_tpu's native surface is the Python API + HTTP server; this module
reproduces the whisper.h call shapes over integer handles so a C host (or
any FFI) can drive the engine with the same call sequence a whisper.cpp
consumer uses.  Params cross the boundary as a JSON object holding
whisper_full_params field names (strategy, language, translate,
beam_search.beam_size, ...), which sidesteps C struct-layout coupling while
keeping field-level parity.
"""

from __future__ import annotations

import itertools
import json
from typing import Dict, Optional

import numpy as np

_contexts: Dict[int, object] = {}
_segments: Dict[int, list] = {}
_handle = itertools.count(1)


def init_from_file(path: str) -> int:
    """whisper_init_from_file_with_params (whisper.h:210): returns a handle
    (0 on failure, mirroring the NULL context)."""
    from .runtime.context import WhisperContext

    try:
        ctx = WhisperContext.from_file(path)
    except Exception:
        return 0
    h = next(_handle)
    _contexts[h] = ctx
    _segments[h] = []
    return h


def free(h: int) -> None:
    """whisper_free (whisper.h:253)."""
    _contexts.pop(h, None)
    _segments.pop(h, None)


def _params_from_json(spec: Optional[str]):
    from .decoding.params import SamplingStrategy, TranscribeParams

    obj = json.loads(spec) if spec else {}
    strat = obj.get("strategy", 0)
    p = TranscribeParams.default(
        SamplingStrategy.BEAM_SEARCH if strat == 1
        else SamplingStrategy.GREEDY)
    p.print_progress = False
    for key, val in obj.items():
        if key == "strategy":
            continue
        if key == "greedy.best_of":
            p.greedy.best_of = int(val)
        elif key == "beam_search.beam_size":
            p.beam_search.beam_size = int(val)
        elif hasattr(p, key):
            setattr(p, key, val)
    return p


def full(h: int, params_json: Optional[str], samples: np.ndarray) -> int:
    """whisper_full (whisper.h:657): 0 on success."""
    from .decoding.full import full_with_state

    ctx = _contexts.get(h)
    if ctx is None:
        return -1
    try:
        p = _params_from_json(params_json)
        segs = full_with_state(ctx, p, np.asarray(samples, np.float32))
    except Exception:
        return -6  # whisper_full's failed-decode code
    _segments[h] = segs
    return 0


def full_parallel(h: int, params_json: Optional[str], samples: np.ndarray,
                  n_processors: int) -> int:
    """whisper_full_parallel (whisper.h:666)."""
    from .decoding.parallel import transcribe_parallel

    ctx = _contexts.get(h)
    if ctx is None:
        return -1
    try:
        p = _params_from_json(params_json)
        segs = transcribe_parallel(ctx, p, np.asarray(samples, np.float32),
                                   n_processors)
    except Exception:
        return -6
    _segments[h] = segs
    return 0


def full_n_segments(h: int) -> int:
    return len(_segments.get(h, []))


def full_get_segment_t0(h: int, i: int) -> int:
    return int(_segments[h][i].t0)


def full_get_segment_t1(h: int, i: int) -> int:
    return int(_segments[h][i].t1)


def full_get_segment_text(h: int, i: int) -> str:
    return _segments[h][i].text


def full_get_segment_speaker_turn_next(h: int, i: int) -> bool:
    return bool(getattr(_segments[h][i], "speaker_turn_next", False))


def full_n_tokens(h: int, i: int) -> int:
    return len(_segments[h][i].tokens)


def full_get_token_id(h: int, i: int, j: int) -> int:
    return int(_segments[h][i].tokens[j].id)


def full_get_token_p(h: int, i: int, j: int) -> float:
    return float(_segments[h][i].tokens[j].p)


def lang_max_id() -> int:
    from .decoding.languages import LANGUAGES

    return len(LANGUAGES) - 1


def lang_id(s: str) -> int:
    from .decoding.languages import lang_id as _lid

    return _lid(s)


def lang_str(i: int) -> str:
    from .decoding.languages import lang_str as _lstr

    return _lstr(i) or ""


def print_timings(h: int) -> None:
    ctx = _contexts.get(h)
    if ctx is not None:
        ctx.timings.print()


def system_info() -> str:
    import jax

    return f"whisper_tpu | backend = {jax.default_backend()} | " \
           f"devices = {len(jax.devices())}"
