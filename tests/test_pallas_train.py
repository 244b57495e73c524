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
