"""Regression tests for the decode-loop correctness batch (commit aad82c2).

Each test fails if its fix is reverted (VERDICT r4 weak #1: the batch
landed without a single regression test):

  (a) native batched KV overflow — a >128-token prompt generating past
      192 tokens writes at cell prompt_bucket + i, which pre-fix silently
      clamped onto cell 447 (dynamic_update_slice) and corrupted attention
  (b) per-request params digest — concurrent requests with different
      suppression params must not coalesce into one group that shares
      reqs[0]'s masks
  (c) per-window rng derivation — t>0 batched sampling must depend only on
      each window's own seed, not batch composition or row order
  (d) beam candidate exhaustion WRAPS to the best candidate like the host
      loop / reference (src/whisper.cpp:7338-7353), not clamp to the worst
  (e) zero-result_len acceptance uses the BARE window bound
      (src/whisper.cpp:7409 — no has_ts): a final window emitting text+EOT
      with no timestamp token is accepted, not failed into the ladder
"""

import pathlib
import subprocess
import sys
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.evals import text_parity as TP

REPO = pathlib.Path(__file__).resolve().parents[1]
FIXTURES = REPO / ".fixtures"
JFK = pathlib.Path("/root/reference/samples/jfk.wav")


@pytest.fixture(scope="module")
def dec_ctx():
    """Decisive mini model context with the jfk window encoded."""
    if not JFK.exists():
        pytest.skip("reference samples not available")
    path = FIXTURES / TP.model_filename("f16")
    if not path.exists():
        FIXTURES.mkdir(exist_ok=True)
        donor, margs = TP.model_recipe("f16")
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_test_model.py"),
             "--header-from", donor, "--out", str(path), *margs], check=True)
    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.runtime.context import WhisperContext

    samples, _ = load_audio(str(JFK))
    ctx = WhisperContext.from_file(str(path))
    ctx.pcm_to_mel(samples)
    ctx.encode_window(0)
    return ctx, samples


def _greedy_params(**kw):
    from whisper_tpu.decoding.params import (GreedyParams, TranscribeParams)

    p = TranscribeParams(print_progress=False)
    p.greedy = GreedyParams(best_of=1)
    p.temperature_inc = 0.0
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def _window_args(ctx, prompt, params, temperature=0.0, seek=0,
                 seek_end=3000, max_tokens=0, rng_seed=0,
                 ban_ts=False, ban_eot=False):
    """Build the (key, args) pair decode_window_device would submit,
    optionally editing the masks to script long / ts-free trajectories."""
    from whisper_tpu.decoding import device_loop as DL
    from whisper_tpu.runtime.context import _bucket

    bt = _bucket(len(prompt))
    base_mask, initial_mask = DL.build_masks(ctx.filter_tables, params)
    if ban_ts:
        base_mask[ctx.vocab.token_beg:] = -np.inf
        initial_mask[ctx.vocab.token_beg:] = -np.inf
    if ban_eot:
        base_mask[ctx.vocab.token_eot] = -np.inf
    prompt_padded = np.zeros(bt, np.int32)
    prompt_padded[: len(prompt)] = prompt
    key = (1, bt, False, False, "greedy", ())
    args = (jnp.asarray(prompt_padded), jnp.int32(len(prompt)),
            ctx.xk, ctx.xv, jnp.asarray(base_mask),
            jnp.asarray(initial_mask), jnp.float32(temperature),
            jnp.int32(seek), jnp.int32(seek_end), jnp.int32(max_tokens),
            jax.random.PRNGKey(rng_seed))
    return key, args


def _run_native(ctx, key, args_list):
    """Run the NATIVE batched window decoder exactly as the WindowBatcher
    dispatches a multi-request group; returns one WindowResult per arg."""
    from whisper_tpu.runtime.batching import WindowBatcher, _Request

    batcher = WindowBatcher(ctx, n_workers=len(args_list))
    reqs = [_Request(key, a) for a in args_list]
    batcher._run_group(key, reqs)
    for r in reqs:
        if r.error is not None:
            raise r.error
    return [r.result for r in reqs]


def test_native_batch_long_prompt_no_kv_overflow(dec_ctx):
    """(a) 160-token prompt (bucket 256) + 210 generated tokens: cells run
    to 256+210=466 > the 448-cell n_text_ctx cache.  The native batch must
    allocate prompt_bucket + n_max cells and stay token-for-token equal to
    the solo device loop (which writes at the true prompt length and fits);
    pre-fix the write head clamped onto cell 447 and the stream corrupted
    past step ~192."""
    ctx, _ = dec_ctx
    rng = np.random.default_rng(0)
    prompt = np.concatenate([
        rng.integers(1000, 30000, size=159).astype(np.int32),
        [ctx.vocab.token_sot]])
    params = _greedy_params()
    key, args = _window_args(ctx, prompt, params, max_tokens=210,
                             ban_ts=True, ban_eot=True)

    solo = ctx._decode_window_exec(key, *args)
    n = int(solo.n_tok[0])
    assert n >= 210, "scenario must generate 210+ tokens"

    res_a, res_b = _run_native(ctx, key, [args, args])
    for res in (res_a, res_b):
        assert int(res.n_tok[0]) == n
        np.testing.assert_array_equal(
            np.asarray(res.tok_id)[0, :n], np.asarray(solo.tok_id)[0, :n],
            err_msg="native-batch token stream diverged from the solo loop "
                    "(KV write head overflowed the cache)")


def test_mixed_params_requests_keep_their_masks(dec_ctx):
    """(b) two concurrent transcriptions, one with --suppress-regex ' Taj'
    (which changes this model's transcript) and one without, coalescing
    through one WindowBatcher: each must reproduce its SOLO transcript.
    Pre-fix both shared reqs[0]'s suppression masks."""
    from whisper_tpu.decoding.full import transcribe
    from whisper_tpu.runtime.batching import WindowBatcher

    ctx, samples = dec_ctx
    plain, sre = _greedy_params(), _greedy_params(suppress_regex=" Taj")

    solo = {}
    for name, p in (("plain", plain), ("sre", sre)):
        sub = ctx.clone_state()
        solo[name] = [(s.t0, s.t1, s.text) for s in transcribe(sub, p, samples)]
    assert solo["plain"] != solo["sre"], (
        "fixture must make the params change the transcript")

    batcher = WindowBatcher(ctx, n_workers=2)
    results, errors = {}, {}

    def run(name, p):
        sub = ctx.clone_state()
        sub.batcher = batcher
        try:
            results[name] = [(s.t0, s.t1, s.text)
                             for s in transcribe(sub, p, samples)]
        except BaseException as e:  # noqa: BLE001
            errors[name] = e
        finally:
            batcher.worker_done()

    threads = [threading.Thread(target=run, args=(n, p))
               for n, p in (("plain", plain), ("sre", sre))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert results["plain"] == solo["plain"]
    assert results["sre"] == solo["sre"], (
        "suppress-regex request decoded with another request's masks")


def test_t_gt0_sampling_batch_composition_invariant(mini_model_path):
    """(c) t>0 native-batch sampling: a window's sampled stream depends
    ONLY on its own rng seed — identical solo, batched [A,B], and batched
    [B,A].  Runs on the PLAIN random mini (near-uniform logits, so any key
    derivation change flips tokens immediately); pre-fix the whole batch
    split keys from rngs[0] by row index."""
    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.runtime.context import WhisperContext

    samples, _ = load_audio(str(JFK))
    ctx = WhisperContext.from_file(str(mini_model_path))
    ctx.pcm_to_mel(samples)
    ctx.encode_window(0)
    params = _greedy_params()
    key, args_a = _window_args(ctx, [ctx.vocab.token_sot], params,
                               temperature=1.0, rng_seed=11, seek_end=1100)
    _, args_b = _window_args(ctx, [ctx.vocab.token_sot], params,
                             temperature=1.0, rng_seed=22, seek_end=1100)

    solo_a = ctx._decode_window_exec(key, *args_a)
    ab = _run_native(ctx, key, [args_a, args_b])
    ba = _run_native(ctx, key, [args_b, args_a])

    def stream(res):
        n = int(res.n_tok[0])
        return np.asarray(res.tok_id)[0, :n].tolist()

    assert stream(ab[0]) == stream(solo_a) == stream(ba[1]), (
        "window A's t>0 samples changed with batch composition/row order")
    assert stream(ab[1]) == stream(ba[0]), "window B likewise"
    # the scenario must actually sample (not degenerate to one token)
    assert int(solo_a.n_tok[0]) >= 2


def test_beam_exhaustion_wraps_to_best():
    """(d) 5 live beams, 2 eligible candidates after dedup: surplus beams
    must WRAP to the best candidate ([3,7,3,7,3]) like the host loop's
    cur_c = 0 (full.py) and the reference (whisper.cpp:7338-7353) — not
    clamp to the worst ([3,7,7,7,7])."""
    from whisper_tpu.decoding import device_loop as DL

    B, V = 5, 100
    lp = np.full((B, V), -np.inf, np.float32)
    lp[:, 3] = -0.1
    lp[:, 7] = -0.5
    src, tok, score, hashes = DL._beam_select_core(
        jnp.asarray(lp), jnp.ones(B, bool), jnp.zeros(B, jnp.float32),
        jnp.zeros((B, 2), jnp.uint32), jnp.int32(1), 90)
    assert np.asarray(tok).tolist() == [3, 7, 3, 7, 3]
    assert np.asarray(score).tolist() == pytest.approx(
        [-0.1, -0.5, -0.1, -0.5, -0.1])


def test_zero_result_len_final_window_accepted(dec_ctx):
    """(e) all timestamp tokens masked: the window emits text then EOT with
    has_ts=False and result_len=0 at completion.  Because the window bound
    holds (seek + seek_delta + 100 >= seek_end — the BARE whisper.cpp:7409
    check), the result must be ACCEPTED with result_len = n_tok; pre-fix
    the device loop also required has_ts and failed it into the ladder."""
    ctx, _ = dec_ctx
    params = _greedy_params()
    key, args = _window_args(ctx, [ctx.vocab.token_sot], params,
                             seek=0, seek_end=1100, ban_ts=True)
    res = ctx._decode_window_exec(key, *args)
    n = int(res.n_tok[0])
    assert n > 0
    assert not bool(res.has_ts[0]), "scenario must sample no timestamp"
    assert int(np.asarray(res.tok_id)[0, n - 1]) == ctx.vocab.token_eot
    assert not bool(res.failed[0]), (
        "text+EOT final window with no timestamp was failed into the ladder")
    assert bool(res.completed[0])
    assert int(res.result_len[0]) == n


def test_parallel_offset_past_eof_returns_empty(dec_ctx):
    """Fuzzer catch (tools/fuzz_argv.py): -p 2 with -ot past the end of
    the audio produces empty/negative chunks; the batched path crashed
    with 'call pcm_to_mel first' and the sequential path would re-decode
    the previous chunk's still-loaded mel.  The reference's own splitting
    arithmetic reads out of bounds there (whisper.cpp:7840-7852) —
    undefined behavior; the engine returns no segments instead."""
    from whisper_tpu.decoding.parallel import transcribe_parallel

    ctx, samples = dec_ctx
    for batched in (False, True):
        p = _greedy_params()
        p.offset_ms = 12000            # jfk.wav is 11 s
        segs = transcribe_parallel(ctx.clone_state(), p, samples, 2,
                                   batched=batched)
        assert segs == [], (batched, segs)
