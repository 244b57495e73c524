"""Tensor-parallel (Megatron-over-GSPMD) tests on the 8-virtual-device CPU
mesh: sharding-rule unit checks, dp x tp train-step equivalence vs the
unsharded step, and TP inference equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import small_cfg
from fastspeech2_tpu.models.fastspeech2 import FastSpeech2, Batch
from fastspeech2_tpu.parallel.sharding import (
    check_tp_divisibility,
    make_mesh_2d,
    shard_inference_fn_tp,
    shard_pytree,
    shard_train_step_tp,
    tree_pspecs,
)
from fastspeech2_tpu.train.optimizer import make_optimizer
from fastspeech2_tpu.train.step import TrainState, make_train_step
from test_train import tiny_batch


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg)
    ts = TrainState(params, state, opt.init(params), jnp.asarray(0, jnp.int32))
    return cfg, model, opt, ts


def test_pspec_rules(setup):
    _, _, _, ts = setup
    specs = tree_pspecs(ts.params)
    enc0 = specs["encoder"]["layers"][0]
    P = jax.sharding.PartitionSpec
    assert enc0["attn"]["q"]["w"] == P(None, "model")
    assert enc0["attn"]["q"]["b"] == P("model")
    assert enc0["attn"]["out"]["w"] == P("model", None)
    assert enc0["attn"]["out"]["b"] == P()
    assert enc0["ffn"]["w1"]["w"] == P(None, None, "model")  # conv (k,d,h)
    assert enc0["ffn"]["w1"]["b"] == P("model")
    assert enc0["ffn"]["w2"]["w"] == P(None, "model", None)
    assert enc0["norm1"]["g"] == P()
    assert specs["feat_out"]["w"] == P()
    assert specs["encoder"]["embed"]["w"] == P()
    # Adam moments inside the optimizer state get the same rules
    opt_specs = tree_pspecs(ts.opt_state)
    leaves_with_model = [
        s for s in jax.tree.leaves(opt_specs,
                                   is_leaf=lambda x: isinstance(x, P))
        if "model" in s]
    # 2 stacks x 1 layer x 10 sharded leaves (3 qkv w, 3 qkv b, out w,
    # ffn w1 w, ffn w1 b, ffn w2 w) x 2 moments (mu, nu)
    assert len(leaves_with_model) == 2 * 1 * 10 * 2


def test_divisibility_check(setup):
    cfg, _, _, _ = setup
    check_tp_divisibility(cfg, 2)
    with pytest.raises(ValueError):
        check_tp_divisibility(cfg, 3)


def test_tp_train_step_matches_single_device(setup):
    """dp=2 x tp=2 GSPMD step == unsharded step (f32, CPU)."""
    cfg, model, opt, ts = setup
    assert jax.device_count() == 8
    batch = tiny_batch(B=8, seed=5)
    rng = jax.random.PRNGKey(9)

    plain = jax.jit(make_train_step(model, opt, accum_grad=1))
    ts_a, report_a = plain(TrainState(*jax.tree.map(jnp.copy, tuple(ts))),
                           batch, rng)

    mesh = make_mesh_2d(2, 2)
    ts_b = TrainState(*jax.tree.map(jnp.copy, tuple(ts)))
    step = shard_train_step_tp(make_train_step(model, opt, accum_grad=1),
                               mesh, ts_b)
    with mesh:
        ts_b = TrainState(shard_pytree(ts_b.params, mesh),
                          ts_b.model_state, ts_b.opt_state, ts_b.step)
        ts_b, report_b = step(ts_b, batch, rng)

    np.testing.assert_allclose(float(report_a["loss"]),
                               float(report_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(report_a["grad_norm"]),
                               float(report_b["grad_norm"]), rtol=1e-4)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts_a.params, ts_b.params)
    # reduction-order noise amplified by Adam's rsqrt, same bound as the
    # dp-only test
    assert max(jax.tree.leaves(diffs)) < 5e-4

    # second step exercises the donated, already-sharded state
    with mesh:
        ts_b, report_b2 = step(ts_b, tiny_batch(B=8, seed=6), rng)
    assert np.isfinite(float(report_b2["loss"]))


def test_tp_sp_train_step_matches_single_device(setup):
    """Megatron-SP activation sharding is pure placement: dp=2 x tp=2 with
    sequence_parallel=True matches the unsharded step."""
    cfg, model, opt, ts = setup
    batch = tiny_batch(B=8, seed=7)
    rng = jax.random.PRNGKey(11)

    plain = jax.jit(make_train_step(model, opt, accum_grad=1))
    ts_a, report_a = plain(TrainState(*jax.tree.map(jnp.copy, tuple(ts))),
                           batch, rng)

    mesh = make_mesh_2d(2, 2)
    ts_b = TrainState(*jax.tree.map(jnp.copy, tuple(ts)))
    step = shard_train_step_tp(
        make_train_step(model, opt, accum_grad=1, sequence_parallel=True),
        mesh, ts_b)
    with mesh:
        ts_b = TrainState(shard_pytree(ts_b.params, mesh),
                          ts_b.model_state, ts_b.opt_state, ts_b.step)
        ts_b, report_b = step(ts_b, batch, rng)

    np.testing.assert_allclose(float(report_a["loss"]),
                               float(report_b["loss"]), rtol=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts_a.params, ts_b.params)
    assert max(jax.tree.leaves(diffs)) < 5e-4


def test_tp_inference_matches_single_device(setup):
    cfg, model, _, ts = setup
    B, T, L = 8, 8, 24
    g = np.random.default_rng(3)
    xs = jnp.asarray(g.integers(1, 68, (B, T)), jnp.int32)
    ilens = jnp.asarray(g.integers(T // 2, T + 1, (B,)), jnp.int32)
    alphas = jnp.ones((B,), jnp.float32)

    def infer(params, state, xs, ilens, alphas):
        mel, out_lens, _ = model.inference(params, state, xs, ilens,
                                           out_maxlen=L, alpha=alphas)
        return mel, out_lens

    mel_a, lens_a = jax.jit(infer)(ts.params, ts.model_state, xs, ilens, alphas)

    mesh = make_mesh_2d(2, 4)  # tp=4 > aheads: non-head-aligned still correct
    fn = shard_inference_fn_tp(infer, mesh, ts.params)
    with mesh:
        params_s = shard_pytree(ts.params, mesh)
        mel_b, lens_b = fn(params_s, ts.model_state, xs, ilens, alphas)

    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_b))
    np.testing.assert_allclose(np.asarray(mel_a), np.asarray(mel_b),
                               atol=2e-5, rtol=1e-5)


def test_tp_train_loop_smoke(tmp_path):
    """train() with tensor_parallel=2 runs on the virtual mesh end-to-end
    (mesh construction, state sharding, checkpointing of sharded params)."""
    from fastspeech2_tpu.config import Config, DataConfig
    from fastspeech2_tpu.data.dataset import write_fake_feature_store
    from fastspeech2_tpu.train.loop import train

    root = str(tmp_path / "store")
    filelist = write_fake_feature_store(root, n_utts=8, seed=2)
    cfg = small_cfg(accum_grad=1, batch_size=4, tensor_parallel=2,
                    save_interval=3, validation_step=100,
                    summary_interval=100)
    cfg = Config(model=cfg.model, train=cfg.train,
                 data=DataConfig(data_dir=root, train_filelist=filelist,
                                 valid_filelist=filelist))
    ts = train(cfg, "tp_smoke", str(tmp_path / "out"), max_steps=3,
               data_dir=root)
    assert int(ts.step) >= 3
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(ts.params))
