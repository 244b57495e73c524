"""Training-mode fused attention (custom VJP + in-kernel hash dropout):
interpret-mode parity vs a plain-JAX reference that shares the same mask
function, exact gradients at rate=0, and padded-region zero guarantees."""

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.ops.attention import init_mha, mha_apply
from fastspeech2_tpu.ops.masks import attention_mask
from fastspeech2_tpu.ops.pallas.attention_train import (
    _keep_mask, fused_attention_train, mha_fused_train_apply)


def _ref_attention(q, k, v, lengths, seed, rate):
    """Plain-JAX mirror of the kernel math (same hash mask when rate>0)."""
    B, H, T, dk = q.shape
    scale = 1.0 / np.sqrt(dk)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   precision=jax.lax.Precision.HIGHEST) * scale
    valid = attention_mask(lengths, T)[:, None, :, :]
    s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)
    e = jnp.exp(s - jnp.max(s, -1, keepdims=True)) * valid
    a = e / jnp.maximum(e.sum(-1, keepdims=True), jnp.finfo(jnp.float32).tiny)
    if rate > 0.0:
        keep = jnp.stack([
            jnp.stack([_keep_mask(seed[0], jnp.uint32(b), jnp.uint32(h),
                                  (T, T), rate) for h in range(H)])
            for b in range(B)])
        a = jnp.where(keep, a / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", a, v,
                      precision=jax.lax.Precision.HIGHEST)


def _qkv(rng, B=2, H=2, T=64, dk=8):
    q = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    return q, k, v


def test_train_attention_forward_and_grads(rng):
    q, k, v = _qkv(rng)
    lengths = jnp.asarray([64, 41], jnp.int32)
    seed = jnp.asarray([12345], jnp.int32)
    do = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    for rate in (0.0, 0.2):
        fused = lambda *a: fused_attention_train(*a, lengths, seed, rate, True)
        ref = lambda *a: _ref_attention(*a, lengths, seed, rate)
        np.testing.assert_allclose(np.asarray(fused(q, k, v)),
                                   np.asarray(ref(q, k, v)),
                                   rtol=1e-5, atol=1e-6)
        g_f = jax.grad(lambda *a: jnp.vdot(fused(*a), do), (0, 1, 2))(q, k, v)
        g_r = jax.grad(lambda *a: jnp.vdot(ref(*a), do), (0, 1, 2))(q, k, v)
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        # padded rows: zero output and exactly-zero grads
        assert np.all(np.asarray(fused(q, k, v))[1, :, 41:] == 0.0)
        for g in g_f:
            assert np.all(np.asarray(g)[1, :, 41:] == 0.0)


def test_train_attention_dropout_mask_properties():
    m1 = np.asarray(_keep_mask(jnp.int32(7), jnp.uint32(0), jnp.uint32(1),
                               (128, 128), 0.2))
    m2 = np.asarray(_keep_mask(jnp.int32(7), jnp.uint32(0), jnp.uint32(1),
                               (128, 128), 0.2))
    m3 = np.asarray(_keep_mask(jnp.int32(8), jnp.uint32(0), jnp.uint32(1),
                               (128, 128), 0.2))
    m4 = np.asarray(_keep_mask(jnp.int32(7), jnp.uint32(1), jnp.uint32(0),
                               (128, 128), 0.2))
    assert np.array_equal(m1, m2)            # reproducible (fwd == bwd)
    assert not np.array_equal(m1, m3)        # seed-dependent
    assert not np.array_equal(m1, m4)        # (b, h)-dependent
    assert abs(m1.mean() - 0.8) < 0.02       # keep-rate ~ 1 - rate


def test_mha_fused_train_apply_matches_xla_at_rate0(rng):
    B, T, D, H = 2, 32, 32, 2
    params = init_mha(jax.random.PRNGKey(0), D)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([32, 19], jnp.int32)
    key = jax.random.PRNGKey(3)

    out_tr = mha_fused_train_apply(params, x, lengths, H, key, 0.0,
                                   interpret=True)
    out_xla = mha_apply(params, x, x, x, attention_mask(lengths, T), H)
    np.testing.assert_allclose(np.asarray(out_tr)[0], np.asarray(out_xla)[0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_tr)[1, :19],
                               np.asarray(out_xla)[1, :19],
                               rtol=1e-5, atol=1e-5)

    # and it is differentiable end-to-end through the projections
    def loss(p):
        return jnp.sum(mha_fused_train_apply(p, x, lengths, H, key, 0.2,
                                             interpret=True) ** 2)

    g = jax.grad(loss)(params)
    for name in ("q", "k", "v", "out"):
        assert np.isfinite(np.asarray(g[name]["w"])).all()
        assert float(jnp.abs(g[name]["w"]).max()) > 0.0


def test_train_attention_packed_matches_unpacked(rng):
    """The head-packed training kernel (row-major (B, T, D), heads as
    D-slices -- no layout transposes) must match the (B, H, T, dk) kernel
    bit-for-bit in forward AND gradients, including the shared (seed, b, h)
    dropout hash, for rate 0 and rate > 0."""
    from fastspeech2_tpu.ops.pallas.attention_train import (
        fused_attention_train_packed)

    B, H, T, dk = 2, 2, 64, 8
    D = H * dk
    q, k, v = _qkv(rng, B=B, H=H, T=T, dk=dk)
    lengths = jnp.asarray([64, 37], jnp.int32)
    seed = jnp.asarray([991], jnp.int32)
    do = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)

    def pack(t):  # (B, H, T, dk) -> (B, T, H*dk)
        return jnp.transpose(t, (0, 2, 1, 3)).reshape(B, T, D)

    for rate in (0.0, 0.3):
        packed = lambda *a: fused_attention_train_packed(
            *a, lengths, seed, H, rate, True)
        unpacked = lambda *a: pack(fused_attention_train(
            *a, lengths, seed, rate, True))
        got = packed(pack(q), pack(k), pack(v))
        want = unpacked(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)

        g_p = jax.grad(lambda a, b, c: jnp.vdot(packed(a, b, c), do),
                       (0, 1, 2))(pack(q), pack(k), pack(v))
        g_u = jax.grad(lambda a, b, c: jnp.vdot(unpacked(a, b, c), do),
                       (0, 1, 2))(q, k, v)
        for a, b in zip(g_p, g_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(pack(b)),
                                       rtol=1e-5, atol=1e-6)
        # padded rows: zero output and exactly-zero grads
        assert np.all(np.asarray(got)[1, 37:] == 0.0)
        for g in g_p:
            assert np.all(np.asarray(g)[1, 37:] == 0.0)


def test_mha_fused_train_apply_packed_dispatch(rng, monkeypatch):
    """mha_fused_train_apply routes through the packed kernel when the flag
    is on (default) and produces the same output either way at rate=0."""
    from fastspeech2_tpu.ops import flags
    from fastspeech2_tpu.ops.pallas import attention_train as AT

    B, T, D, H = 2, 32, 32, 2
    params = init_mha(jax.random.PRNGKey(0), D)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([32, 19], jnp.int32)
    key = jax.random.PRNGKey(3)

    calls = []
    real = AT.fused_attention_train_packed

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(AT, "fused_attention_train_packed", spy)
    monkeypatch.setattr(flags, "FUSED_ATT_TRAIN_PACKED", True)
    out_p = mha_fused_train_apply(params, x, lengths, H, key, 0.0,
                                  interpret=True)
    assert calls, "packed kernel did not engage"

    monkeypatch.setattr(flags, "FUSED_ATT_TRAIN_PACKED", False)
    out_u = mha_fused_train_apply(params, x, lengths, H, key, 0.0,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                               rtol=1e-6, atol=1e-7)


def _split_path_mirror(params, p_ln, x, lengths, H, key_att, key_res,
                       rate_att, rate_res):
    """The exact split-path computation attn_block_train replaces:
    mha_fused_train_apply (interpret) + hash residual dropout + residual +
    post-LN, with the same two keys."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.nn import _hash_keep_mask, _key_to_seed

    att = mha_fused_train_apply(params, x, lengths, H, key_att, rate_att,
                                interpret=True)
    if rate_res > 0.0:
        keep = _hash_keep_mask(_key_to_seed(key_res), att.shape, rate_res)
        att = jnp.where(keep, att / (1.0 - rate_res), 0.0)
    return nn.layer_norm(p_ln, x + att)


def test_attn_block_train_matches_split_path(rng):
    """The fused training attention-half (QKV + attention dropout + out proj
    + residual dropout + residual + post-LN in one kernel) must match the
    split path it replaces -- including BIT-identical dropout masks from the
    same two PRNG keys -- in forward and in every gradient (params, x)."""
    from fastspeech2_tpu.ops.pallas.attention_train import (
        mha_fused_train_block_apply)

    B, T, D, H = 2, 64, 32, 2
    params = init_mha(jax.random.PRNGKey(5), D)
    p_ln = {"g": jnp.asarray(rng.normal(size=(D,)) * 0.2 + 1.0, jnp.float32),
            "b": jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)}
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([64, 41], jnp.int32)
    ka, kr = jax.random.split(jax.random.PRNGKey(9))

    for rate_att, rate_res in ((0.0, 0.0), (0.2, 0.2)):
        fused = mha_fused_train_block_apply(
            params, p_ln, x, lengths, H, ka, kr, rate_att, rate_res,
            interpret=True)
        split = _split_path_mirror(params, p_ln, x, lengths, H, ka, kr,
                                   rate_att, rate_res)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(split),
                                   rtol=2e-5, atol=2e-5)

        def loss_fused(p, pl_, xx):
            return jnp.sum(mha_fused_train_block_apply(
                p, pl_, xx, lengths, H, ka, kr, rate_att, rate_res,
                interpret=True) ** 2)

        def loss_split(p, pl_, xx):
            return jnp.sum(_split_path_mirror(
                p, pl_, xx, lengths, H, ka, kr, rate_att, rate_res) ** 2)

        gf = jax.grad(loss_fused, (0, 1, 2))(params, p_ln, x)
        gs = jax.grad(loss_split, (0, 1, 2))(params, p_ln, x)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_attn_block_train_engages_in_encoder(rng, monkeypatch):
    """encoder_apply routes the training post-LN attention half through
    attn_block_train when the flag is on, and the full-stack output matches
    the split path exactly (same rng schedule, bit-identical masks)."""
    from fastspeech2_tpu.models.encoder import (EncoderConfig, encoder_apply,
                                                init_encoder)
    from fastspeech2_tpu.ops import flags
    from fastspeech2_tpu.ops.pallas import attention_train as AT
    from jax.experimental.pallas import tpu as pltpu

    from fastspeech2_tpu.ops.precision import compute_dtype

    cfg = EncoderConfig(idim=40, attention_dim=256, attention_heads=2,
                        linear_units=64, num_blocks=1,
                        positionwise_conv_kernel_size=3)
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    xs = jnp.asarray(rng.integers(1, 40, (2, 16)), jnp.int32)
    lengths = jnp.asarray([16, 9], jnp.int32)
    from fastspeech2_tpu.ops.masks import attention_mask

    mask = attention_mask(lengths, 16)
    rng_key = jax.random.PRNGKey(3)

    calls = []
    real = AT.attn_block_train

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(AT, "attn_block_train", spy)

    def run(block_flag):
        monkeypatch.setattr(flags, "FUSED_ATT_TRAIN_BLOCK", block_flag)
        with pltpu.force_tpu_interpret_mode(), compute_dtype(jnp.bfloat16):
            return encoder_apply(params, cfg, xs, mask, rng=rng_key,
                                 deterministic=False, lengths=lengths,
                                 fused_attention=True)

    out_split = run(False)
    assert not calls
    out_block = run(True)
    assert calls, "attn_block_train did not engage"
    np.testing.assert_allclose(np.asarray(out_block), np.asarray(out_split),
                               rtol=2e-2, atol=2e-2)
