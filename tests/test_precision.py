"""bf16 compute-dtype tests: numerics stay close to f32, dtype plumbing works."""

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.ops import nn
from fastspeech2_tpu.ops.precision import compute_dtype, current_compute_dtype


def test_context_nesting():
    assert current_compute_dtype() is None
    with compute_dtype(jnp.bfloat16):
        assert current_compute_dtype() == jnp.bfloat16
        with compute_dtype(None):
            assert current_compute_dtype() is None
        assert current_compute_dtype() == jnp.bfloat16
    assert current_compute_dtype() is None


def test_linear_bf16_close_to_f32(rng):
    p = nn.init_linear(jax.random.PRNGKey(0), 64, 32)
    x = jnp.asarray(rng.normal(size=(4, 10, 64)), jnp.float32)
    y32 = nn.linear(p, x)
    with compute_dtype(jnp.bfloat16):
        y16 = nn.linear(p, x)
    assert y16.dtype == jnp.float32  # output stays f32
    rel = float(jnp.max(jnp.abs(y16 - y32)) / jnp.max(jnp.abs(y32)))
    assert rel < 0.02, rel


def test_conv_bf16_close_to_f32(rng):
    p = nn.init_conv1d(jax.random.PRNGKey(1), 32, 16, 9)
    x = jnp.asarray(rng.normal(size=(2, 20, 32)), jnp.float32)
    y32 = nn.conv1d(p, x)
    with compute_dtype(jnp.bfloat16):
        y16 = nn.conv1d(p, x)
    assert y16.dtype == jnp.float32
    rel = float(jnp.max(jnp.abs(y16 - y32)) / jnp.max(jnp.abs(y32)))
    assert rel < 0.03, rel


def test_model_inference_bf16(rng):
    """Full model under bf16: same durations (duration rounding is robust),
    mel close to f32."""
    from conftest import small_cfg
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2

    cfg = small_cfg()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params["duration_predictor"]["out"]["b"] = (
        params["duration_predictor"]["out"]["b"] * 0 + 1.3)
    xs = jnp.asarray(rng.integers(1, 68, (2, 12)), jnp.int32)
    ilens = jnp.asarray([12, 8], jnp.int32)

    mel32, len32, d32 = model.inference(params, state, xs, ilens, out_maxlen=96)
    with compute_dtype(jnp.bfloat16):
        mel16, len16, d16 = model.inference(params, state, xs, ilens,
                                            out_maxlen=96)
    # durations can shift by rounding at bf16; lengths must stay in lockstep
    # with the durations actually predicted
    assert np.array_equal(np.asarray(d16).sum(1), np.asarray(len16))
    if np.array_equal(np.asarray(d16), np.asarray(d32)):
        err = float(jnp.max(jnp.abs(mel16 - mel32)))
        scale = float(jnp.max(jnp.abs(mel32)))
        assert err < 0.05 * max(scale, 1.0), (err, scale)


def test_f32_duration_head_in_bf16_path(rng, monkeypatch):
    """With flags.F32_DURATION on (default), the duration head inside the
    bf16 speed path runs in f32 with HIGHEST-precision dots: the spy must see
    an f32 input and no active compute dtype. Off restores the bf16 head.
    (VERDICT r4 next #2 -- the head's exp/round/clamp knife-edge.)"""
    from conftest import small_cfg
    from fastspeech2_tpu.models import fastspeech2 as F
    from fastspeech2_tpu.ops import flags

    cfg = small_cfg()
    model = F.FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    xs = jnp.asarray(rng.integers(1, 68, (2, 12)), jnp.int32)
    ilens = jnp.asarray([12, 7], jnp.int32)

    seen = []
    real = F.duration_inference_apply

    def spy(p, c, hs, tok_mask, **kw):
        seen.append((hs.dtype, current_compute_dtype()))
        return real(p, c, hs, tok_mask, **kw)

    monkeypatch.setattr(F, "duration_inference_apply", spy)

    monkeypatch.setattr(flags, "F32_DURATION", True)
    with compute_dtype(jnp.bfloat16):
        _, _, d_on = model.inference(params, state, xs, ilens, out_maxlen=96)
    assert seen[-1] == (jnp.float32, None), seen[-1]

    monkeypatch.setattr(flags, "F32_DURATION", False)
    with compute_dtype(jnp.bfloat16):
        model.inference(params, state, xs, ilens, out_maxlen=96)
    assert seen[-1][1] == jnp.bfloat16, seen[-1]

    # f32/HIGHEST head on the bf16 encoder output: durations must equal the
    # full-f32 path's whenever the encoder's bf16 rounding hasn't moved the
    # head input across a knife-edge -- exact on this tiny config
    _, _, d_f32 = model.inference(params, state, xs, ilens, out_maxlen=96)
    assert np.array_equal(np.asarray(d_on), np.asarray(d_f32))
