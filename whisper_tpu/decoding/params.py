"""Transcription parameters — mirror of `whisper_full_params`.

Field-for-field port of the reference defaults
(include/whisper.h:487-591, src/whisper.cpp:5945-6052).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional, Sequence


class SamplingStrategy(enum.Enum):
    GREEDY = 0
    BEAM_SEARCH = 1


@dataclass
class GreedyParams:
    best_of: int = 5


@dataclass
class BeamSearchParams:
    beam_size: int = 5
    # unused by design: "TODO: not implemented" in the reference too
    # (include/whisper.h:558) — kept for field-level API parity
    patience: float = -1.0


@dataclass
class VadParams:
    """whisper_vad_default_params (src/whisper.cpp)"""

    threshold: float = 0.5
    min_speech_duration_ms: int = 250
    min_silence_duration_ms: int = 100
    max_speech_duration_s: float = float("inf")
    speech_pad_ms: int = 30
    samples_overlap: float = 0.1


@dataclass
class TranscribeParams:
    strategy: SamplingStrategy = SamplingStrategy.GREEDY

    n_threads: int = 4
    n_max_text_ctx: int = 16384
    offset_ms: int = 0
    duration_ms: int = 0

    translate: bool = False
    no_context: bool = True
    no_timestamps: bool = False
    single_segment: bool = False
    print_special: bool = False
    print_progress: bool = True
    print_realtime: bool = False
    print_timestamps: bool = True

    token_timestamps: bool = False
    thold_pt: float = 0.01
    thold_ptsum: float = 0.01
    max_len: int = 0
    split_on_word: bool = False
    max_tokens: int = 0

    # declared-but-unused in the reference core as well (whisper.cpp:5970 —
    # only the CLI sets it); kept for field-level API parity
    debug_mode: bool = False
    audio_ctx: int = 0

    tdrz_enable: bool = False

    suppress_regex: Optional[str] = None

    initial_prompt: Optional[str] = None
    carry_initial_prompt: bool = False
    prompt_tokens: Optional[Sequence[int]] = None

    language: Optional[str] = "en"
    detect_language: bool = False

    suppress_blank: bool = True
    suppress_nst: bool = False

    temperature: float = 0.0
    max_initial_ts: float = 1.0
    length_penalty: float = -1.0

    temperature_inc: float = 0.2
    entropy_thold: float = 2.4
    logprob_thold: float = -1.0
    no_speech_thold: float = 0.6

    # temperature>0 fallback attempts sample on the HOST with the bit-exact
    # emulation of the reference's per-decoder std::mt19937 +
    # discrete_distribution (decoding/stdrng.py), reproducing the reference
    # binary's draws token-for-token (tests/test_text_parity.py fallback
    # cases).  Set False to keep those attempts on the on-device window
    # loop (jax.random draws: same distribution, different engine) — faster
    # on long audio whose gates fail often, but not reference-identical.
    faithful_sampling: bool = True

    # t=0 BEAM candidate policy.  "topk" (default): deterministic top-k on
    # the device loop — OpenAI decoding.py's actual BeamSearchDecoder,
    # matching the binary whenever the step distribution is peaked (every
    # committed decisive beam parity case).  "reference": replay the
    # binary's actual policy — beam_size iid draws from
    # discrete_distribution(probs) per decoder per step through the
    # emulated std::mt19937 (whisper_sample_token_topk,
    # src/whisper.cpp:6543-6616; the partial_sort there is dead code — the
    # draws ARE the candidates).  The two can pick DIFFERENT beams when a
    # step's distribution carries real mass on runner-ups: the draws may
    # miss a candidate top-k would expand (tests/test_text_parity.py
    # fb-beam case).  Runs on the host loop; reference-identical, slower.
    beam_sampling: str = "topk"

    greedy: GreedyParams = field(default_factory=GreedyParams)
    beam_search: BeamSearchParams = field(default_factory=BeamSearchParams)

    new_segment_callback: Optional[Callable] = None
    progress_callback: Optional[Callable] = None
    encoder_begin_callback: Optional[Callable] = None
    abort_callback: Optional[Callable] = None
    logits_filter_callback: Optional[Callable] = None

    grammar_rules: Optional[Any] = None
    i_start_rule: int = 0
    grammar_penalty: float = 100.0

    vad: bool = False
    vad_model_path: Optional[str] = None
    vad_params: VadParams = field(default_factory=VadParams)

    @staticmethod
    def default(strategy: SamplingStrategy = SamplingStrategy.GREEDY) -> "TranscribeParams":
        p = TranscribeParams(strategy=strategy)
        if strategy == SamplingStrategy.GREEDY:
            p.greedy = GreedyParams(best_of=5)
        else:
            p.beam_search = BeamSearchParams(beam_size=5)
        return p


# fallback conditioning: history is dropped above this temperature
# (WHISPER_HISTORY_CONDITIONING_TEMP_CUTOFF, src/whisper.cpp:145)
HISTORY_CONDITIONING_TEMP_CUTOFF = 0.5
