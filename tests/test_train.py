"""Training stack tests: Noam schedule parity, train step (loss decreases,
NaN-skip), grad accumulation equivalence, checkpoint round-trip, data-parallel
sharding on the 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastspeech2_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from fastspeech2_tpu.models.fastspeech2 import Batch, FastSpeech2
from fastspeech2_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from fastspeech2_tpu.train.optimizer import make_optimizer, noam_schedule
from fastspeech2_tpu.train.step import (
    TrainState,
    make_eval_step,
    make_mesh,
    make_train_step,
    shard_train_step,
)


def tiny_config() -> Config:
    return Config(
        model=ModelConfig(adim=32, aheads=2, elayers=1, eunits=64, ddim=32,
                          dlayers=1, dunits=64, postnet_layers=2, postnet_chans=16,
                          positionwise_conv_kernel_size=3,
                          duration_predictor_chans=16,
                          # fast warmup so short tests see actual learning
                          transformer_lr=5.0, transformer_warmup_steps=50),
        train=TrainConfig(accum_grad=2, batch_size=4),
    )


def tiny_batch(B=4, T=8, L=24, seed=0) -> Batch:
    g = np.random.default_rng(seed)
    ilens = np.full((B,), T, np.int32)
    ilens[1:] = g.integers(4, T, B - 1)
    olens = np.full((B,), L, np.int32)
    olens[1:] = g.integers(12, L, B - 1)
    xs = np.zeros((B, T), np.int32)
    ds = np.zeros((B, T), np.int32)
    for b in range(B):
        xs[b, : ilens[b]] = g.integers(1, 68, ilens[b])
        d = np.ones(ilens[b], np.int64)
        d[-1] += olens[b] - d.sum()
        ds[b, : ilens[b]] = d
    ys = g.normal(-2, 1, (B, L, 80)).astype(np.float32)
    es = g.uniform(0, 100, (B, L)).astype(np.float32)
    ps = g.uniform(71, 600, (B, L)).astype(np.float32)
    for b in range(B):
        ys[b, olens[b]:] = 0
        es[b, olens[b]:] = 0
        ps[b, olens[b]:] = 0
    return Batch(xs=jnp.asarray(xs), ilens=jnp.asarray(ilens), ys=jnp.asarray(ys),
                 olens=jnp.asarray(olens), ds=jnp.asarray(ds), es=jnp.asarray(es),
                 ps=jnp.asarray(ps))


def test_noam_schedule_matches_reference_formula():
    lr = noam_schedule(256, 4000, 1.0)
    for step in (1, 100, 4000, 50000):
        expected = 1.0 * 256 ** -0.5 * min(step ** -0.5, step * 4000 ** -1.5)
        np.testing.assert_allclose(float(lr(step)), expected, rtol=1e-6)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    ts = TrainState(params, state, opt_state, jnp.asarray(0, jnp.int32))
    return cfg, model, opt, ts


def test_train_step_decreases_loss(setup):
    cfg, model, opt, ts = setup
    step = jax.jit(make_train_step(model, opt, accum_grad=2))
    batch = tiny_batch()
    losses = []
    for i in range(40):
        ts, report = step(ts, batch, jax.random.PRNGKey(i))
        losses.append(float(report["loss"]))
    assert int(ts.step) == 40
    head, tail = np.mean(losses[:5]), np.mean(losses[-5:])
    assert tail < head, f"no learning: head={head} tail={tail}"
    assert np.isfinite(losses).all()


def test_nan_grads_skip_update(setup):
    cfg, model, opt, ts = setup
    step = jax.jit(make_train_step(model, opt, accum_grad=2))
    # NaN in an MSE target propagates to grads (a NaN L1 target does not:
    # XLA's sign(NaN)=0 kills it in the abs backward)
    bad = tiny_batch()._replace(es=tiny_batch().es.at[0, 0].set(jnp.nan))
    params_before = jax.tree.map(np.asarray, ts.params)
    ts2, report = step(ts, bad, jax.random.PRNGKey(0))
    # params unchanged (apply_if_finite skipped)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 params_before, ts2.params)


def test_eval_step_deterministic(setup):
    cfg, model, opt, ts = setup
    ev = jax.jit(make_eval_step(model))
    b = tiny_batch(seed=3)
    r1, r2 = ev(ts, b), ev(ts, b)
    assert float(r1["loss"]) == float(r2["loss"])


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, model, opt, ts = setup
    path = os.path.join(tmp_path, "ckpt_000100.npz")
    save_checkpoint(path, ts.params, ts.model_state, ts.opt_state, 100, cfg)
    p2, s2, o2, step, cfg2 = load_checkpoint(
        path, ts.params, ts.model_state, ts.opt_state)
    assert step == 100
    assert cfg2.model.adim == cfg.model.adim
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 ts.params, p2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 ts.opt_state, o2)


def test_data_parallel_step_matches_single_device(setup):
    """The GSPMD-sharded step on the 8-device mesh must produce the same
    numbers as the unsharded step."""
    cfg, model, opt, ts = setup
    assert jax.device_count() == 8
    batch = tiny_batch(B=8, seed=5)

    plain = jax.jit(make_train_step(model, opt, accum_grad=1))
    ts_a, report_a = plain(ts, batch, jax.random.PRNGKey(9))

    mesh = make_mesh()
    sharded = shard_train_step(make_train_step(model, opt, accum_grad=1), mesh)
    with mesh:
        ts_b, report_b = sharded(
            TrainState(*jax.tree.map(jnp.copy, tuple(ts))), batch,
            jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(report_a["loss"]), float(report_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(report_a["grad_norm"]),
                               float(report_b["grad_norm"]), rtol=1e-4)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts_a.params, ts_b.params)
    # cross-device reduction order perturbs grads at float eps; Adam's rsqrt
    # normalization amplifies that for near-zero grads -- 1e-4 is benign
    assert max(jax.tree.leaves(diffs)) < 5e-4
