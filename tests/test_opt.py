"""Tests for whisper_tpu.training.opt — the ggml-opt analogue.

Covers the reference's training semantics (ggml/src/ggml-opt.cpp): exact
AdamW/SGD update math, loss scaling under gradient accumulation,
shard-granular dataset shuffling, result statistics, and the DP mesh path
(sharded step == single-device numerics, which ggml gets from NCCL
allreduce + deterministic kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.training import (
    LOSS_CROSS_ENTROPY,
    LOSS_MEAN_SQUARED_ERROR,
    Dataset,
    OptContext,
    OptimizerParams,
    Result,
    default_optimizer_params,
    fit,
)


def _linear_fn(params, x):
    return x @ params["w"] + params["b"]


def _toy_regression(n=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    w_true = rng.normal(size=(4, 2)).astype(np.float32)
    y = x @ w_true + 0.5
    return x, y.astype(np.float32)


def _init_linear(seed=1):
    rng = np.random.default_rng(seed)
    return {"w": rng.normal(size=(4, 2)).astype(np.float32) * 0.1,
            "b": np.zeros((2,), np.float32)}


def test_sgd_mse_converges():
    x, y = _toy_regression()
    ctx = OptContext(_linear_fn, _init_linear(),
                     loss_type=LOSS_MEAN_SQUARED_ERROR, optimizer="sgd",
                     get_opt_pars=lambda _i: OptimizerParams(alpha=0.05))
    first = ctx.step(x, y)
    for _ in range(200):
        last = ctx.step(x, y)
    assert last < first * 1e-3


def test_adamw_ce_classification_accuracy():
    rng = np.random.default_rng(0)
    n = 128
    x = rng.normal(size=(n, 4)).astype(np.float32)
    cls = (x[:, 0] + x[:, 1] > 0).astype(np.int32)
    labels = np.eye(2, dtype=np.float32)[cls]
    ctx = OptContext(_linear_fn, _init_linear(),
                     loss_type=LOSS_CROSS_ENTROPY, optimizer="adamw",
                     get_opt_pars=lambda _i: OptimizerParams(alpha=0.05))
    for _ in range(150):
        ctx.step(x, labels)
    res = Result()
    ctx.eval(x, labels, res)
    acc, unc = res.accuracy()
    assert acc > 0.95
    assert 0.0 <= unc < 0.1
    assert res.pred().shape == (n,)


def test_adamw_matches_reference_math():
    """One step against a hand-computed reference AdamW update
    (ggml-cpu/ops.cpp:11737-11748: decoupled decay, bias-corrected)."""
    w0, g = 0.7, 0.3  # model: output = w * x with x=1, loss = sum(g * w)
    p = OptimizerParams(alpha=0.01, beta1=0.9, beta2=0.999, eps=1e-8, wd=0.1)
    ctx = OptContext(lambda pr, x: pr["w"] * x * g, {"w": np.float32(w0)},
                     loss_type="sum", optimizer="adamw",
                     get_opt_pars=lambda _i: p)
    ctx.step(np.float32(1.0))
    m = (1 - p.beta1) * g
    v = (1 - p.beta2) * g * g
    mh = m / (1 - p.beta1)
    vh = np.sqrt(v / (1 - p.beta2)) + p.eps
    expect = w0 * (1 - p.alpha * p.wd) - p.alpha * mh / vh
    np.testing.assert_allclose(float(ctx.params["w"]), expect, rtol=1e-6)


def test_sgd_matches_reference_math():
    p = OptimizerParams(alpha=0.02, wd=0.25)
    ctx = OptContext(lambda pr, x: pr["w"] * x * 0.5, {"w": np.float32(2.0)},
                     loss_type="sum", optimizer="sgd",
                     get_opt_pars=lambda _i: p)
    ctx.step(np.float32(1.0))
    expect = 2.0 * (1 - 0.02 * 0.25) - 0.02 * 0.5
    np.testing.assert_allclose(float(ctx.params["w"]), expect, rtol=1e-6)


def test_grad_accumulation_matches_big_batch():
    """opt_period=4 microbatches == one step on the concatenated batch
    (the 1/opt_period loss scaling makes accumulated grads the big-batch
    mean — ggml-opt.cpp:390-425)."""
    x, y = _toy_regression(n=32)
    big = OptContext(_linear_fn, _init_linear(),
                     loss_type=LOSS_MEAN_SQUARED_ERROR, optimizer="adamw")
    big.step(x, y)
    acc = OptContext(_linear_fn, _init_linear(),
                     loss_type=LOSS_MEAN_SQUARED_ERROR, optimizer="adamw",
                     opt_period=4)
    for i in range(4):
        acc.step(x[i * 8:(i + 1) * 8], y[i * 8:(i + 1) * 8])
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(acc.params[k]),
                                   np.asarray(big.params[k]), rtol=2e-5)
    assert acc.iter == big.iter == 2  # exactly one optimizer step each


def test_trainable_mask_freezes_params():
    x, y = _toy_regression()
    ctx = OptContext(_linear_fn, _init_linear(),
                     loss_type=LOSS_MEAN_SQUARED_ERROR, optimizer="sgd",
                     trainable=lambda path: "b" not in path)
    b0 = np.asarray(ctx.params["b"]).copy()
    w0 = np.asarray(ctx.params["w"]).copy()
    for _ in range(5):
        ctx.step(x, y)
    np.testing.assert_array_equal(np.asarray(ctx.params["b"]), b0)
    assert not np.allclose(np.asarray(ctx.params["w"]), w0)


def test_dataset_shard_shuffle_keeps_pairs():
    data = np.arange(16, dtype=np.float32).reshape(16, 1)
    ds = Dataset(data, labels=data.copy(), ndata_shard=2)
    ds.shuffle(np.random.default_rng(3))
    batch, labels = ds.get_batch(0, 16)
    rows = batch[:, 0].astype(int)
    assert sorted(rows.tolist()) == list(range(16))
    assert not np.array_equal(rows, np.arange(16))  # actually shuffled
    for i in range(0, 16, 2):  # shard pairs (2k, 2k+1) stay adjacent
        assert rows[i + 1] == rows[i] + 1 and rows[i] % 2 == 0
    np.testing.assert_array_equal(batch, labels)


def test_dataset_partial_shuffle_preserves_tail():
    data = np.arange(12, dtype=np.float32).reshape(12, 1)
    ds = Dataset(data, ndata_shard=1)
    ds.shuffle(np.random.default_rng(0), idata=8)
    rows = ds.get_batch(0, 12)[0][:, 0].astype(int)
    assert sorted(rows[:8].tolist()) == list(range(8))
    np.testing.assert_array_equal(rows[8:], np.arange(8, 12))


def test_result_statistics_match_reference_formulas():
    """ggml_opt_result_loss (ggml-opt.cpp:660-698): mean ± sqrt(var/(n-1))
    for per-datapoint losses; sum ± sqrt(var*n/(n-1)) for sum losses."""
    res = Result()
    losses = [1.0, 2.0, 4.0]
    for l in losses:
        res._accumulate(l, 4, None, None, True, 1)
    mean, unc = res.loss()
    arr = np.asarray(losses)
    var = np.sum((arr - arr.mean()) ** 2) / len(arr)
    np.testing.assert_allclose(mean, arr.mean())
    np.testing.assert_allclose(unc, np.sqrt(var / 2))

    res2 = Result()
    for l in losses:
        res2._accumulate(l, 4, None, None, False, 1)
    total, unc2 = res2.loss()
    np.testing.assert_allclose(total, arr.sum())
    np.testing.assert_allclose(unc2, np.sqrt(var * 3 / 2))

    # opt_period scaling: per-datapoint losses were divided by opt_period
    res3 = Result()
    for l in losses:
        res3._accumulate(l / 2, 4, None, None, True, 2)
    np.testing.assert_allclose(res3.loss()[0], arr.mean())


def test_default_optimizer_params_match_reference():
    p = default_optimizer_params()
    assert (p.alpha, p.beta1, p.beta2, p.eps, p.wd) == (
        1e-3, 0.9, 0.999, 1e-8, 0.0)


def test_dp_mesh_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("dp",))
    x, y = _toy_regression(n=64)
    solo = OptContext(_linear_fn, _init_linear(),
                      loss_type=LOSS_MEAN_SQUARED_ERROR, optimizer="adamw")
    shard = OptContext(_linear_fn, _init_linear(),
                       loss_type=LOSS_MEAN_SQUARED_ERROR, optimizer="adamw",
                       mesh=mesh)
    for _ in range(3):
        l_solo = solo.step(x, y)
        l_shard = shard.step(x, y)
    np.testing.assert_allclose(l_shard, l_solo, rtol=1e-5)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(shard.params[k]),
                                   np.asarray(solo.params[k]), rtol=1e-5)


def test_fit_high_level_improves_loss():
    x, y = _toy_regression(n=64)
    ds = Dataset(x, y)
    params0 = _init_linear()
    loss_before = float(np.mean((x @ params0["w"] + params0["b"] - y) ** 2))
    trained = fit(_linear_fn, params0, ds,
                  loss_type=LOSS_MEAN_SQUARED_ERROR, optimizer="adamw",
                  get_opt_pars=lambda _i: OptimizerParams(alpha=0.05),
                  nepoch=60, nbatch_logical=16, nbatch_physical=8,
                  val_split=0.25, silent=True)
    w, b = np.asarray(trained["w"]), np.asarray(trained["b"])
    loss_after = float(np.mean((x @ w + b - y) ** 2))
    assert loss_after < loss_before * 0.1
