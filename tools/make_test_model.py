#!/usr/bin/env python
"""Generate a deterministic random-weight whisper model in legacy ggml format.

The vocab + mel filterbank are taken from one of the reference's header-only
"for-tests" files, so the result loads in both the reference binaries and
whisper_tpu — giving us a real-weights end-to-end oracle without network
access.  Weights are seeded-random but scaled to keep activations in a sane
range so greedy decoding is deterministic across backends.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from whisper_tpu.models.whisper.hparams import WhisperHParams
from whisper_tpu.models.whisper.load import _read_header, expected_tensor_names
from whisper_tpu.models.whisper.writer import write_model_file


def synth_tensors(hp: WhisperHParams, seed: int = 0):
    rng = np.random.default_rng(seed)
    ns, nm = hp.n_audio_state, hp.n_mels

    def w(*shape, std=None):
        std = std if std is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * std).astype(np.float32)

    tensors = {}

    def ln(prefix):
        tensors[prefix + ".weight"] = (1.0 + 0.02 * rng.standard_normal(ns)).astype(np.float32)
        tensors[prefix + ".bias"] = (0.02 * rng.standard_normal(ns)).astype(np.float32)

    tensors["encoder.positional_embedding"] = w(hp.n_audio_ctx, ns, std=0.02)
    tensors["encoder.conv1.weight"] = w(ns, nm, 3)
    tensors["encoder.conv1.bias"] = w(ns, 1, std=0.02)
    tensors["encoder.conv2.weight"] = w(ns, ns, 3)
    tensors["encoder.conv2.bias"] = w(ns, 1, std=0.02)
    ln("encoder.ln_post")
    for i in range(hp.n_audio_layer):
        p = f"encoder.blocks.{i}"
        ln(p + ".attn_ln")
        tensors[p + ".attn.query.weight"] = w(ns, ns)
        tensors[p + ".attn.query.bias"] = w(ns, std=0.02)
        tensors[p + ".attn.key.weight"] = w(ns, ns)
        tensors[p + ".attn.value.weight"] = w(ns, ns)
        tensors[p + ".attn.value.bias"] = w(ns, std=0.02)
        tensors[p + ".attn.out.weight"] = w(ns, ns)
        tensors[p + ".attn.out.bias"] = w(ns, std=0.02)
        ln(p + ".mlp_ln")
        tensors[p + ".mlp.0.weight"] = w(4 * ns, ns)
        tensors[p + ".mlp.0.bias"] = w(4 * ns, std=0.02)
        tensors[p + ".mlp.2.weight"] = w(ns, 4 * ns)
        tensors[p + ".mlp.2.bias"] = w(ns, std=0.02)

    nt = hp.n_text_state
    tensors["decoder.positional_embedding"] = w(hp.n_text_ctx, nt, std=0.02)
    tensors["decoder.token_embedding.weight"] = w(hp.n_vocab, nt, std=0.02)
    ln("decoder.ln")
    for i in range(hp.n_text_layer):
        p = f"decoder.blocks.{i}"
        ln(p + ".attn_ln")
        tensors[p + ".attn.query.weight"] = w(nt, nt)
        tensors[p + ".attn.query.bias"] = w(nt, std=0.02)
        tensors[p + ".attn.key.weight"] = w(nt, nt)
        tensors[p + ".attn.value.weight"] = w(nt, nt)
        tensors[p + ".attn.value.bias"] = w(nt, std=0.02)
        tensors[p + ".attn.out.weight"] = w(nt, nt)
        tensors[p + ".attn.out.bias"] = w(nt, std=0.02)
        ln(p + ".cross_attn_ln")
        tensors[p + ".cross_attn.query.weight"] = w(nt, nt)
        tensors[p + ".cross_attn.query.bias"] = w(nt, std=0.02)
        tensors[p + ".cross_attn.key.weight"] = w(nt, nt)
        tensors[p + ".cross_attn.value.weight"] = w(nt, nt)
        tensors[p + ".cross_attn.value.bias"] = w(nt, std=0.02)
        tensors[p + ".cross_attn.out.weight"] = w(nt, nt)
        tensors[p + ".cross_attn.out.bias"] = w(nt, std=0.02)
        ln(p + ".mlp_ln")
        tensors[p + ".mlp.0.weight"] = w(4 * nt, nt)
        tensors[p + ".mlp.0.bias"] = w(4 * nt, std=0.02)
        tensors[p + ".mlp.2.weight"] = w(nt, 4 * nt)
        tensors[p + ".mlp.2.bias"] = w(nt, std=0.02)

    # sanity: cover the full expected set
    expected = set(expected_tensor_names(hp))
    assert set(tensors) == expected, (
        sorted(expected - set(tensors))[:5], sorted(set(tensors) - expected)[:5])
    return tensors


def make_decisive(tensors, hp: WhisperHParams, seed: int,
                  n_text_active: int = 64, ts_stride: int = 25,
                  boost: float = 25.0, eot_boost: float = 1.15,
                  tdrz: bool = False, pos_mix: float = 3.0,
                  ts_mix: float = 1.2, steep_ts: int = 0,
                  race: float = 0.0) -> None:
    """Rescale decoder token-embedding rows so greedy/beam decoding has
    LARGE argmax margins (gap >> any cross-implementation rounding noise).

    A plain random embedding gives near-uniform logits over 51864 tokens
    whose top-1/top-2 gap (~4% of max) sits within reach of the f16-vs-f32
    rounding differences between this implementation and the reference CPU
    backend (~1e-3 rel), so full-pipeline text diffs flip chaotically.
    Boosting a small 'active' set — N text tokens, every `ts_stride`-th
    timestamp token, and EOT (slightly more, so sequences terminate) —
    makes the argmax race run between ~128 well-separated candidates:
    gaps are ~15-25% of the max logit, 100x any rounding noise, while the
    trajectory still varies with the audio and exercises the timestamp
    rules, segmentation and EOT paths.  tests/test_text_parity.py asserts
    the margins hold on every sampled step."""
    W = tensors["decoder.token_embedding.weight"]
    n_vocab = W.shape[0]
    if n_vocab >= 51865:
        # multilingual vocab: eot/sot shift by 1 and the variable language
        # block shifts the specials by dt = num_languages - 98
        # (src/whisper.cpp:1625-1672, :451-456)
        n_lang = n_vocab - 51765 - 1
        dt = n_lang - 98
        token_eot = 50257
        token_sot = 50258
        token_beg = 50363 + 1 + dt
        # Make `-l auto` decisive: whisper_lang_auto_detect decodes [sot]
        # alone and softmaxes the POSITION-0 logits over the language block
        # (src/whisper.cpp:4045-4118).  Position 0 is never SAMPLED in normal
        # transcription (sot is forced), so mixing one boosted language row
        # into P[0] scripts the detected language without touching text.
        lang_es = token_sot + 1 + 3            # whisper_token_lang(es): id 3
        W[lang_es] *= boost
        tensors["decoder.positional_embedding"][0] += 3.0 * W[lang_es]
    else:
        # tiny.en-style vocab (non-multilingual, n_vocab=51864):
        # eot=50256, beg=50363 (src/whisper.cpp:1625-1672)
        token_eot = 50256
        token_beg = 50363
    rng = np.random.default_rng(seed + 7777)
    active = rng.choice(np.arange(1000, 50000), size=n_text_active,
                        replace=False)
    ts_active = np.arange(token_beg, n_vocab, ts_stride)
    W[active] *= boost
    W[ts_active] *= boost
    W[token_eot] *= boost * eot_boost
    # Position-scripted dynamics: mix one boosted row's direction into each
    # positional-embedding row.  The residual stream carries the positional
    # input to the logits head (tied embedding), so position p's mixed-in
    # token wins the argmax by a margin of order ||row||^2 * mix — without
    # this the deterministic token->token map collapses into a fixed point
    # and every window degenerates to one repeated token.  The mix pool is
    # mostly text with some timestamps (exercising the timestamp-pair /
    # monotonicity rules and mid-window segmentation) and a few EOTs (so
    # sequences terminate at varied lengths and the seek loop advances).
    P = tensors["decoder.positional_embedding"]
    n_pos = P.shape[0]
    # one nondecreasing timestamp row per position, mixed in WEAKLY at every
    # position: whenever a rule forces a timestamp sample (pair rule, ptsum)
    # or a token's `tid` is computed (argmax over the timestamp range —
    # it seeds segment t0), THIS row wins by a decisive margin instead of a
    # noise-level tie among the boosted timestamp rows.  Nondecreasing in p
    # keeps the monotonic-timestamp rule from suppressing the winner.
    if steep_ts > 0:
        # [FULL-DIMS] STRICTLY nondecreasing script: ts index = p // steep_ts
        # with no jitter.  The legacy jittered scheme below is only locally
        # nondecreasing; at full dims (384x6x4) a jitter dip puts the scripted
        # row BELOW the last emitted timestamp, the monotonicity mask kills it
        # (src/whisper.cpp:6330-6360 timestamp rules) and the forced-ts pick
        # degenerates to noise-level margins — measured: scripted-row logit
        # 163 masked, winner margin 0.78.  p//steep_ts can never decrease, so
        # every forced-ts step keeps its decisive margin.
        ts_choice = ts_active[np.clip(np.arange(n_pos) // steep_ts,
                                      0, len(ts_active) - 1)]
    else:
        ts_choice = ts_active[np.clip(
            (np.arange(n_pos) * len(ts_active)) // n_pos
            + rng.integers(0, 3, n_pos), 0, len(ts_active) - 1)]
    pool = np.concatenate([
        rng.choice(active, size=n_pos),               # text filler
        ts_choice,                                    # timestamp positions
        np.full(n_pos, token_eot),
    ]).reshape(3, -1)
    kind = rng.choice(3, size=n_pos, p=[0.80, 0.17, 0.03])
    script = pool[kind, np.arange(n_pos)]
    if race > 0.0:
        # [BEAM-RACE] a SINGLE two-way candidate race at position 4 (the
        # rest of the trajectory stays decisive): token B is mixed into
        # P[4] slightly weaker than the scripted A, so the filtered probs
        # split meaningful mass between exactly two STABLY-ordered tokens
        # (the gap is far above rounding noise but small enough that both
        # carry draw mass).  Deterministic top-k beam expands BOTH; the
        # reference's beam policy draws beam_size iid samples from the
        # distribution (whisper.cpp:7262) and can MISS one.  B's embedding
        # is correlated with the NEXT scripted token's row, so the B-path's
        # following step is MORE confident than the A-path's: whichever
        # policy keeps B wins the beam ranking one step later, making the
        # two policies' transcripts diverge whenever the draws drop B.
        p_star = 4
        kind[p_star] = 0
        script[p_star] = pool[0, p_star]        # A = scripted text token
        b_tok = int(active[(p_star * 13 + 5) % len(active)])
        if b_tok == int(script[p_star]):
            b_tok = int(active[(p_star * 13 + 6) % len(active)])
        W[b_tok] += 0.5 * W[script[p_star + 1]]
        P[p_star] += (pos_mix - race) * W[b_tok]
    P += pos_mix * W[script] + ts_mix * W[ts_choice]
    if steep_ts > 0:
        # Window-2+ initial step: the prompt pushes positions deep into the
        # steep script, so the scripted ts exceeds max_initial_ts (1.0 s,
        # src/whisper.cpp:6378-6388) and gets masked on the window's first
        # sampled token.  A weak constant mix of the 1.0 s row gives that
        # step a decisive sub-cap winner; everywhere else it loses to the
        # position's own ts (ts_mix > 0.5*ts_mix) or is monotonicity-masked.
        P += (0.5 * ts_mix) * W[ts_active[2]]
    if tdrz:
        # [TDRZ] script the solm speaker-turn token at a few mid-segment
        # positions: boost its row and mix it ABOVE the primary script
        # (4.5 > 3.0) so solm wins when -tdrz leaves it unsuppressed
        # (src/whisper.cpp:6260-6262, :7657-7660) while the primary text
        # script still wins decisively when the base mask bans it.
        # solm id 50359 is fixed for the 51864 en vocab (whisper.cpp:445);
        # multilingual shifts by dt (handled above when needed).
        # base solm id 50359 (whisper.cpp:445); multilingual shifts by dt
        # (whisper.cpp:1633: token_solm += dt)
        token_solm = 50359 if W.shape[0] < 51865 else 50359 + dt
        W[token_solm] *= boost
        # 8.0 > the 3.0 primary script because the positional direction
        # attenuates through the layer stack + final layernorm (measured:
        # 4.5 left solm ranked #2 behind the script at the sampled step)
        P[[5]] += 8.0 * W[token_solm]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--header-from", required=True,
                    help="reference for-tests-ggml-*.bin supplying vocab+filters")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-state", type=int, default=64)
    ap.add_argument("--n-head", type=int, default=2)
    ap.add_argument("--n-layer", type=int, default=2)
    ap.add_argument("--n-audio-ctx", type=int, default=1500)
    ap.add_argument("--n-text-ctx", type=int, default=448)
    ap.add_argument("--full-dims", action="store_true",
                    help="keep the header file's own dims (e.g. real tiny)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--decisive", action="store_true",
                    help="boost a small active token set so decode text is "
                         "robust to cross-implementation rounding noise "
                         "(full-pipeline text-parity fixtures)")
    ap.add_argument("--boost", type=float, default=25.0,
                    help="decisive boost factor; 25 gives ~100x-noise argmax "
                         "margins (exact-match tier), lower values give "
                         "REALISTIC margins for the statistical parity tier "
                         "(margins scale ~boost^2)")
    ap.add_argument("--pos-mix", type=float, default=3.0,
                    help="positional script mix strength (the 3.0 default is "
                         "tuned for mini dims; full-dims models need more — "
                         "the direction attenuates through the deeper stack)")
    ap.add_argument("--ts-mix", type=float, default=1.2,
                    help="secondary timestamp-row mix strength")
    ap.add_argument("--race", type=float, default=0.0,
                    help="script a single two-way beam-candidate race at "
                         "position 4 with this pos-mix deficit (0 = off; "
                         "the faithful-stochastic-beam parity fixture)")
    ap.add_argument("--steep-ts", type=int, default=0,
                    help="strictly-monotone timestamp script: ts index = "
                         "position // STEEP_TS, no jitter (full-dims models; "
                         "0 keeps the legacy jittered scheme the committed "
                         "mini fixtures are SHA-locked to)")
    ap.add_argument("--tdrz", action="store_true",
                    help="script the [_SOLM_] speaker-turn token at a few "
                         "positions (tinydiarize text-parity fixtures)")
    args = ap.parse_args()

    with open(args.header_from, "rb") as f:
        hp0, filters, vocab, n_vocab_read = _read_header(f)

    if args.full_dims:
        hp = hp0
    else:
        hp = WhisperHParams(
            n_vocab=hp0.n_vocab, n_audio_ctx=args.n_audio_ctx,
            n_audio_state=args.n_state, n_audio_head=args.n_head,
            n_audio_layer=args.n_layer, n_text_ctx=args.n_text_ctx,
            n_text_state=args.n_state, n_text_head=args.n_head,
            n_text_layer=args.n_layer, n_mels=hp0.n_mels,
        )

    tensors = synth_tensors(hp, args.seed)
    if args.decisive:
        make_decisive(tensors, hp, args.seed, boost=args.boost,
                      tdrz=args.tdrz, pos_mix=args.pos_mix,
                      ts_mix=args.ts_mix, steep_ts=args.steep_ts,
                      race=args.race)
    vocab_tokens = [vocab.id_to_token[i] for i in range(n_vocab_read)]
    write_model_file(args.out, hp, filters, vocab_tokens, tensors,
                     use_f16=not args.f32)
    print(f"wrote {args.out}: {hp.model_name} dims n_state={hp.n_audio_state} "
          f"layers={hp.n_audio_layer}/{hp.n_text_layer} vocab={hp.n_vocab}")


if __name__ == "__main__":
    main()
