"""Continuous-batching (lockstep parallel transcription) tests."""

import pathlib

import numpy as np
import pytest

JFK = pathlib.Path("/root/reference/samples/jfk.wav")


@pytest.fixture(scope="module")
def jfk(mini_model_path):
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    samples, _ = load_audio(str(JFK))
    return samples


def _params():
    from whisper_tpu.decoding.params import TranscribeParams

    return TranscribeParams(language="en", print_progress=False,
                            temperature_inc=0.0)


def test_batched_matches_sequential(mini_model_path, jfk):
    from whisper_tpu.decoding.parallel import transcribe_parallel
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    seq = transcribe_parallel(ctx, _params(), jfk, 2, batched=False)

    ctx2 = WhisperContext.from_file(str(mini_model_path))
    bat = transcribe_parallel(ctx2, _params(), jfk, 2, batched=True)

    assert [s.text for s in bat] == [s.text for s in seq]
    assert [(s.t0, s.t1) for s in bat] == [(s.t0, s.t1) for s in seq]


def test_batched_three_chunks(mini_model_path, jfk):
    from whisper_tpu.decoding.parallel import transcribe_parallel
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    segs = transcribe_parallel(ctx, _params(), jfk, 3, batched=True)
    # timestamps monotone after merge clamp
    ts = [(s.t0, s.t1) for s in segs]
    assert all(b[0] >= a[0] for a, b in zip(ts, ts[1:]))


def test_batched_beam_runs_native(mini_model_path, jfk):
    """Beam-search groups now ride the native windowxbeam batch path
    (device_loop._beam_select_grouped); parallel beam transcription must
    produce a coherent merged segment list."""
    from whisper_tpu.decoding.params import (SamplingStrategy,
                                             TranscribeParams)
    from whisper_tpu.decoding.parallel import transcribe_parallel
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    p = TranscribeParams.default(SamplingStrategy.BEAM_SEARCH)
    p.language = "en"
    p.print_progress = False
    p.temperature_inc = 0.0
    p.beam_search.beam_size = 2
    segs = transcribe_parallel(ctx, p, jfk[:16000 * 6], 2)
    assert isinstance(segs, list)


def test_native_window_batch_matches_single(mini_model_path, jfk):
    """decode_windows_native left-pads prompts so all windows share a scalar
    cache write head.  Verify the pad/mask/position math: the prompt-pass
    logits (and therefore prompt_probs) of a left-padded batched row must
    match the right-padded single-window decode, including rows with
    DIFFERENT prompt lengths.  (Full-trajectory token equality is checked
    end-to-end by test_batched_matches_sequential; with random weights
    near-tied logits make per-token comparison across fp summation orders
    meaningless at the unit level.)"""
    import jax
    import jax.numpy as jnp

    from whisper_tpu.decoding import device_loop as DL
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    hp, v = ctx.hp, ctx.vocab
    ctx.pcm_to_mel(jfk)
    ctx.encode_window(0)
    xk, xv = ctx.xk, ctx.xv

    bucket = 8
    prompts = [
        [v.token_sot, v.token_not],                          # len 2
        [v.token_prev, 100, 200, v.token_sot, v.token_not],  # len 5
    ]
    W = len(prompts)
    prompt_pad = np.zeros((W, bucket), np.int32)
    lens = np.zeros((W,), np.int32)
    for i, p in enumerate(prompts):
        prompt_pad[i, : len(p)] = p
        lens[i] = len(p)

    base = np.zeros(hp.n_vocab, np.float32)
    initial = np.zeros(hp.n_vocab, np.float32)
    single = DL.make_window_decoder(
        hp, 1, bucket, ctx.compute_dtype, False, False,
        v.token_eot, v.token_beg)
    native = DL.make_window_decoder(
        hp, 1, bucket, ctx.compute_dtype, False, False,
        v.token_eot, v.token_beg, n_windows=W)

    mt = jnp.int32(12)
    rngs = jnp.stack([jax.random.PRNGKey(7)] * W)
    singles = [
        single(ctx.params, jnp.asarray(prompt_pad[i]), jnp.int32(lens[i]),
               xk, xv, jnp.asarray(base), jnp.asarray(initial),
               jnp.float32(0.0), jnp.int32(0), jnp.int32(1098), mt,
               jax.random.PRNGKey(7))
        for i in range(W)
    ]
    batched = native(ctx.params, jnp.asarray(prompt_pad), jnp.asarray(lens),
                     jnp.stack([xk] * W), jnp.stack([xv] * W),
                     jnp.asarray(base), jnp.asarray(initial),
                     jnp.zeros(W, jnp.float32), jnp.zeros(W, jnp.int32),
                     jnp.full((W,), 1098, jnp.int32), mt, rngs)

    # prompt-pass distributions must agree per row (pad layout changes only
    # fp summation order)
    for i in range(W):
        np.testing.assert_allclose(
            np.asarray(batched.prompt_probs)[i],
            np.asarray(singles[i].prompt_probs), rtol=2e-3, atol=1e-5,
            err_msg=f"window {i}")
    # structural sanity: every row decoded something and the result layout
    # matches the vmapped mode's (W, 1, ...)
    assert batched.tok_id.shape[:2] == (W, 1)
    assert all(int(np.asarray(batched.n_tok)[i, 0]) >= 1 for i in range(W))


def test_batcher_straggler_deadline():
    """A queued request must dispatch after max_wait_s even when other live
    workers never submit — one wedged stream cannot stall the server."""
    import time

    from whisper_tpu.runtime.batching import WindowBatcher

    class _Ctx:
        def _decode_window_exec(self, key, *args):
            return ("ran", key, args)

    b = WindowBatcher(_Ctx(), n_workers=2, max_wait_s=0.1)
    t0 = time.perf_counter()
    out = b.submit("k", (1, 2))  # second worker never arrives
    elapsed = time.perf_counter() - t0
    assert out == ("ran", "k", (1, 2))
    assert elapsed < 2.0  # deadline fired (not a hang until worker_done)


def _mk_decoder_pair(ctx, strategy, W, B, bucket):
    from whisper_tpu.decoding import device_loop as DL

    v = ctx.vocab
    solo = DL.make_window_decoder(
        ctx.hp, B, bucket, ctx.compute_dtype, False, False,
        v.token_eot, v.token_beg, strategy=strategy)
    native = DL.make_window_decoder(
        ctx.hp, B, bucket, ctx.compute_dtype, False, False,
        v.token_eot, v.token_beg, strategy=strategy, n_windows=W)
    return solo, native


def test_native_window_beam_batch_matches_solo(mini_model_path, jfk):
    """W windows x B beam lanes on one row axis must reproduce the solo
    B-beam decode EXACTLY.  Prompts of length == bucket make the native
    left-pad layout bit-identical to the solo right-pad layout, so beam
    search (deterministic at t=0) must match token-for-token — covering the
    grouped top-k/dedup/parent-gather and the shared-cross-KV (xkv_group)
    broadcast."""
    import jax
    import jax.numpy as jnp

    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    v = ctx.vocab
    ctx.pcm_to_mel(jfk[:16000 * 6])
    ctx.encode_window(0)
    xk, xv = ctx.xk, ctx.xv

    bucket = 4
    prompt = [v.token_prev, 100, v.token_sot, v.token_not]
    W, B = 2, 2
    prompt_pad = np.tile(np.asarray(prompt, np.int32), (W, 1))
    lens = np.full((W,), bucket, np.int32)
    base = np.zeros(ctx.hp.n_vocab, np.float32)
    initial = np.zeros(ctx.hp.n_vocab, np.float32)
    mt = jnp.int32(10)

    solo, native = _mk_decoder_pair(ctx, "beam", W, B, bucket)
    s = solo(ctx.params, jnp.asarray(prompt_pad[0]), jnp.int32(bucket),
             xk, xv, jnp.asarray(base), jnp.asarray(initial),
             jnp.float32(0.0), jnp.int32(0), jnp.int32(3000), mt,
             jax.random.PRNGKey(7))
    n = native(ctx.params, jnp.asarray(prompt_pad), jnp.asarray(lens),
               jnp.stack([xk] * W), jnp.stack([xv] * W), jnp.asarray(base),
               jnp.asarray(initial), jnp.zeros(W, jnp.float32),
               jnp.zeros(W, jnp.int32), jnp.full((W,), 3000, jnp.int32),
               mt, jnp.stack([jax.random.PRNGKey(7)] * W))

    assert n.tok_id.shape[:2] == (W, B)
    assert int(np.asarray(s.n_tok).max()) > 1  # multi-step: gathers exercised
    for w in range(W):
        np.testing.assert_array_equal(np.asarray(n.tok_id)[w],
                                      np.asarray(s.tok_id))
        np.testing.assert_array_equal(np.asarray(n.n_tok)[w],
                                      np.asarray(s.n_tok))
        np.testing.assert_allclose(np.asarray(n.sum_logprobs)[w],
                                   np.asarray(s.sum_logprobs), rtol=2e-3)


def test_native_window_bestof_lanes_greedy_consistent(mini_model_path, jfk):
    """best-of lanes (greedy strategy, B>1) at temperature 0 collapse to
    argmax — every lane of every window must equal the 1-lane decode."""
    import jax
    import jax.numpy as jnp

    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    v = ctx.vocab
    ctx.pcm_to_mel(jfk[:16000 * 6])
    ctx.encode_window(0)
    xk, xv = ctx.xk, ctx.xv

    bucket = 4
    prompt = [v.token_prev, 100, v.token_sot, v.token_not]
    W, B = 2, 2
    prompt_pad = np.tile(np.asarray(prompt, np.int32), (W, 1))
    lens = np.full((W,), bucket, np.int32)
    base = np.zeros(ctx.hp.n_vocab, np.float32)
    initial = np.zeros(ctx.hp.n_vocab, np.float32)
    mt = jnp.int32(10)

    solo1, nativeB = _mk_decoder_pair(ctx, "greedy", W, B, bucket)
    from whisper_tpu.decoding import device_loop as DL

    solo = DL.make_window_decoder(
        ctx.hp, 1, bucket, ctx.compute_dtype, False, False,
        v.token_eot, v.token_beg, strategy="greedy")
    s = solo(ctx.params, jnp.asarray(prompt_pad[0]), jnp.int32(bucket),
             xk, xv, jnp.asarray(base), jnp.asarray(initial),
             jnp.float32(0.0), jnp.int32(0), jnp.int32(3000), mt,
             jax.random.PRNGKey(7))
    n = nativeB(ctx.params, jnp.asarray(prompt_pad), jnp.asarray(lens),
                jnp.stack([xk] * W), jnp.stack([xv] * W), jnp.asarray(base),
                jnp.asarray(initial), jnp.zeros(W, jnp.float32),
                jnp.zeros(W, jnp.int32), jnp.full((W,), 3000, jnp.int32),
                mt, jnp.stack([jax.random.PRNGKey(7)] * W))

    assert n.tok_id.shape[:2] == (W, B)
    for w in range(W):
        for b in range(B):
            np.testing.assert_array_equal(np.asarray(n.tok_id)[w, b],
                                          np.asarray(s.tok_id)[0])
