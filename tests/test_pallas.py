"""Pallas kernel tests (interpret mode on CPU): fused attention vs the XLA
fallback, including mask handling for padded rows."""

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.ops.attention import init_mha, mha_apply
from fastspeech2_tpu.ops.masks import attention_mask
from fastspeech2_tpu.ops.pallas.attention import fused_attention, mha_fused_apply


def test_fused_attention_matches_xla(rng):
    B, H, T, dk = 2, 2, 16, 8
    q = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    lengths = jnp.asarray([16, 9], jnp.int32)

    out = fused_attention(q, k, v, lengths, interpret=True)

    # XLA reference: masked softmax then PV
    from fastspeech2_tpu.ops.attention import masked_softmax
    mask = attention_mask(lengths, T)[:, None, :, :]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
    attn = masked_softmax(scores, mask)
    expect = jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)
    # padded query rows are exactly zero
    assert np.all(np.asarray(out)[1, :, 9:] == 0.0)



def test_fused_attention_query_blocked(rng):
    """block_q < T: per-block row masking and K/V reuse across query blocks
    match the single-block kernel and the XLA reference."""
    B, H, T, dk = 2, 2, 32, 8
    q = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, dk)), jnp.float32)
    lengths = jnp.asarray([32, 21], jnp.int32)  # 21: cuts inside a block

    blocked = fused_attention(q, k, v, lengths, interpret=True, block_q=8)
    whole = fused_attention(q, k, v, lengths, interpret=True, block_q=32)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(whole),
                               rtol=1e-6, atol=1e-6)

    from fastspeech2_tpu.ops.attention import masked_softmax
    mask = attention_mask(lengths, T)[:, None, :, :]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
    expect = jnp.einsum("bhqk,bhkd->bhqd", masked_softmax(scores, mask), v)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(blocked)[1, :, 21:] == 0.0)


def test_fused_attention_packed_matches_split(rng):
    """The head-packed (B,T,D) kernel == the (B,H,T,dk) kernel, including a
    non-128-divisible head dim (dk=24 here, dk=192 in the default decoder)
    and lengths that cut inside a query block."""
    from fastspeech2_tpu.ops.pallas.attention import fused_attention_packed

    B, H, T, dk = 3, 2, 32, 24
    D = H * dk
    q = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([32, 21, 1], jnp.int32)

    def split(x):
        return x.reshape(B, T, H, dk).transpose(0, 2, 1, 3)

    expect = fused_attention(split(q), split(k), split(v), lengths,
                             interpret=True)
    expect = expect.transpose(0, 2, 1, 3).reshape(B, T, D)
    for bq in (32, 8):
        out = fused_attention_packed(q, k, v, lengths, H, interpret=True,
                                     block_q=bq)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=1e-6, atol=1e-6)
    assert np.all(np.asarray(out)[1, 21:] == 0.0)


def test_mha_fused_matches_mha_apply(rng):
    B, T, D, H = 2, 12, 32, 2
    params = init_mha(jax.random.PRNGKey(0), D)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([12, 7], jnp.int32)

    out_fused = mha_fused_apply(params, x, lengths, H, interpret=True)
    out_xla = mha_apply(params, x, x, x, attention_mask(lengths, T), H)
    # valid rows agree; padded rows differ only by the output bias (the fused
    # path zeroes attention for them identically)
    np.testing.assert_allclose(np.asarray(out_fused)[0], np.asarray(out_xla)[0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_fused)[1, :7],
                               np.asarray(out_xla)[1, :7], rtol=1e-5, atol=1e-5)


def test_fused_ffn_matches_ffn_apply(rng):
    """Length-adaptive fused conv-FFN == the XLA conv path on a conv-masked
    input: boundary rows whose k=9 taps straddle the true length, bias-only
    rows in fully-dead blocks, and the k=1 second conv."""
    from fastspeech2_tpu.models.encoder import EncoderConfig, ffn_apply
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.pallas.ffn import ffn_fused_apply

    B, T, D, H, k = 3, 32, 16, 24, 9
    key = jax.random.PRNGKey(0)
    p = {"w1": nn.init_conv1d(jax.random.fold_in(key, 1), D, H, k),
         "w2": nn.init_conv1d(jax.random.fold_in(key, 2), H, D, 1)}
    cfg = EncoderConfig(idim=68, attention_dim=D, attention_heads=2,
                        linear_units=H, num_blocks=1,
                        positionwise_conv_kernel_size=k)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    # 13: cuts inside a block with live halo rows after it; 32: no padding
    lengths = jnp.asarray([32, 13, 1], jnp.int32)
    mask = jnp.arange(T)[None, :] < lengths[:, None]

    expect = ffn_apply(p, cfg, x, conv_mask=mask)
    got = ffn_fused_apply(p, x, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)

    # small blocks: exercises the dead-block (bias-only) kernel branch
    from fastspeech2_tpu.ops.pallas.ffn import fused_ffn
    got8 = fused_ffn(x, p["w1"]["w"], p["w1"]["b"], p["w2"]["w"],
                     p["w2"]["b"], lengths, interpret=True, block_t=8)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)

    # rows >= length+pad are the pure-bias constant, same as the XLA path
    assert np.allclose(np.asarray(got)[1, 13 + 4:],
                       np.asarray(expect)[1, 13 + 4:])


def test_fused_ffn_block_matches_xla_chain(rng):
    """The fused [LN -> conv-FFN -> +residual] block tail == the XLA chain."""
    from fastspeech2_tpu.models.encoder import EncoderConfig, ffn_apply
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.pallas.ffn import ffn_block_fused_apply

    B, T, D, H, k = 3, 32, 16, 24, 9
    key = jax.random.PRNGKey(0)
    p = {"w1": nn.init_conv1d(jax.random.fold_in(key, 1), D, H, k),
         "w2": nn.init_conv1d(jax.random.fold_in(key, 2), H, D, 1)}
    ln = {"g": jnp.asarray(rng.normal(1.0, 0.1, (D,)), jnp.float32),
          "b": jnp.asarray(rng.normal(0.0, 0.1, (D,)), jnp.float32)}
    cfg = EncoderConfig(idim=68, attention_dim=D, attention_heads=2,
                        linear_units=H, num_blocks=1,
                        positionwise_conv_kernel_size=k)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([32, 13, 1], jnp.int32)
    mask = jnp.arange(T)[None, :] < lengths[:, None]

    y = nn.layer_norm(ln, x)
    expect = x + ffn_apply(p, cfg, y, conv_mask=mask)
    got = ffn_block_fused_apply(ln, p, x, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_fused_postnet_matches_postnet_apply(rng):
    """Fused length-adaptive postnet == the XLA conv/BN/tanh chain with
    per-stage conv masking, including non-trivial BN running stats, the
    t<0 halo, boundary rows, and fully-dead blocks."""
    from fastspeech2_tpu.models.postnet import (PostnetConfig, init_postnet,
                                                postnet_apply)
    from fastspeech2_tpu.ops.pallas.postnet import postnet_fused_apply

    cfg = PostnetConfig(odim=16, n_layers=3, n_chans=24, n_filts=5)
    params, state = init_postnet(jax.random.PRNGKey(0), cfg)
    # non-trivial running stats (fresh init has mean 0 / var 1)
    for i, s in enumerate(state["bn"]):
        c = s["mean"].shape[0]
        s["mean"] = jnp.asarray(rng.normal(0, 0.5, (c,)), jnp.float32)
        s["var"] = jnp.asarray(rng.uniform(0.5, 2.0, (c,)), jnp.float32)

    B, L = 3, 32
    x = jnp.asarray(rng.normal(size=(B, L, cfg.odim)), jnp.float32)
    lengths = jnp.asarray([32, 13, 1], jnp.int32)
    mask = jnp.arange(L)[None, :] < lengths[:, None]

    expect, _ = postnet_apply(params, state, cfg, x, conv_mask=mask)
    got = postnet_fused_apply(params, state, cfg, x, lengths,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)

    from fastspeech2_tpu.ops.pallas.postnet import fused_postnet
    got8 = fused_postnet(
        x, [l["conv"]["w"] for l in params["layers"]],
        [s["mean"] for s in state["bn"]],
        [jax.lax.rsqrt(s["var"] + 1e-5) for s in state["bn"]],
        [l["bn"]["g"] for l in params["layers"]],
        [l["bn"]["b"] for l in params["layers"]],
        lengths, cd=jnp.float32, interpret=True, block_t=8)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def _xla_resstack(stacks, x, dilations):
    from fastspeech2_tpu.vocoder.melgan import _conv1d_reflect
    for d, stack in zip(dilations, stacks):
        y = jax.nn.leaky_relu(x, 0.2)
        y = _conv1d_reflect(stack["c1"], y, dilation=d)
        y = jax.nn.leaky_relu(y, 0.2)
        y = _conv1d_reflect(stack["c2"], y)
        x = x + y
    return x


def test_fused_resstack_matches_xla(rng):
    """Multi-tile case: S=384 -> tile 128, 3 chunks (left edge with per-layer
    reflection mirroring, one interior halo tile, right edge)."""
    from fastspeech2_tpu.ops.pallas.resstack import (resstack_fused,
                                                     resstack_tile,
                                                     stack_params)

    B, S, C = 2, 384, 8
    dilations = (1, 3, 9)
    stacks = []
    for _ in dilations:
        stacks.append({
            "c1": {"w": jnp.asarray(rng.normal(size=(3, C, C)) * 0.3,
                                    jnp.float32),
                   "b": jnp.asarray(rng.normal(size=(C,)), jnp.float32)},
            "c2": {"w": jnp.asarray(rng.normal(size=(1, C, C)) * 0.3,
                                    jnp.float32),
                   "b": jnp.asarray(rng.normal(size=(C,)), jnp.float32)},
        })
    x = jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32)

    assert resstack_tile(S) == 128
    out = resstack_fused(x, *stack_params(stacks), dilations=dilations,
                         interpret=True)
    expect = _xla_resstack(stacks, x, dilations)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_fused_resstack_single_tile(rng):
    """One chunk: both sequence-end mirrors act on the same tile."""
    from fastspeech2_tpu.ops.pallas.resstack import (resstack_fused,
                                                     stack_params)

    B, S, C = 1, 128, 8
    dilations = (1, 3, 9)
    stacks = [{
        "c1": {"w": jnp.asarray(rng.normal(size=(3, C, C)) * 0.3, jnp.float32),
               "b": jnp.asarray(rng.normal(size=(C,)), jnp.float32)},
        "c2": {"w": jnp.asarray(rng.normal(size=(1, C, C)) * 0.3, jnp.float32),
               "b": jnp.asarray(rng.normal(size=(C,)), jnp.float32)},
    } for _ in dilations]
    x = jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32)

    out = resstack_fused(x, *stack_params(stacks), dilations=dilations,
                         interpret=True)
    expect = _xla_resstack(stacks, x, dilations)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_melgan_fused_resstack_generator(rng):
    """Full generator with the fused stacks (interpret) == the XLA loop."""
    from fastspeech2_tpu.vocoder.melgan import (MelGANConfig, MelGANGenerator,
                                                init_melgan)

    cfg = MelGANConfig(n_mels=8, base_channels=32)
    params = init_melgan(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)

    ref = MelGANGenerator(cfg, fused_resstack=False)(params, mel)
    fused = MelGANGenerator(cfg, fused_resstack=True,
                            fused_interpret=True)(params, mel)
    assert fused.shape == ref.shape == (1, 16 * cfg.hop_length)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_stft_mel_matches_xla(rng):
    from fastspeech2_tpu.audio.stft import (MelSpectrogram,
                                            energy_from_magnitude,
                                            mel_filterbank)
    from fastspeech2_tpu.ops.pallas.stft import stft_mel_energy

    sr, n_fft, hop = 22050, 1024, 256
    B, N = 2, sr  # 1 s
    y = jnp.asarray(rng.normal(size=(B, N)) * 0.3, jnp.float32)

    ms = MelSpectrogram(sample_rate=sr, n_fft=n_fft, hop_length=hop)
    mel_ref, mag = ms(y)
    en_ref = energy_from_magnitude(mag)

    mel_basis = mel_filterbank(sr, n_fft, 80, 0.0, 8000.0)
    mel, en = stft_mel_energy(y, jnp.asarray(mel_basis), n_fft=n_fft,
                              hop_length=hop, interpret=True)

    assert mel.shape == mel_ref.shape and en.shape == en_ref.shape
    np.testing.assert_allclose(np.asarray(mel), np.asarray(mel_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(en), np.asarray(en_ref),
                               rtol=1e-4, atol=1e-4)


def _xla_adaptor_segment(params, cfg_v, hs, ds, tok_mask, L, pitch_bins,
                         energy_bins, nb=256):
    """The XLA inference frame-level segment (models/fastspeech2.py
    inference(), regulate_length -> predictors -> quantize -> embed -> mask),
    replicated op for op as the kernel's oracle."""
    from fastspeech2_tpu.models.predictors import variance_inference_apply
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.length_regulator import regulate_length
    from fastspeech2_tpu.ops.quantize import to_one_hot

    hs_e, frame_mask, out_lens = regulate_length(hs, ds, tok_mask, L)
    e_raw = variance_inference_apply(params["energy_predictor"], cfg_v, hs_e,
                                     conv_mask=frame_mask)
    p_raw = variance_inference_apply(params["pitch_predictor"], cfg_v, hs_e,
                                     conv_mask=frame_mask)
    hs2 = hs_e + nn.linear(params["pitch_embed"],
                           to_one_hot(p_raw, pitch_bins, nb))
    hs2 = hs2 + nn.linear(params["energy_embed"],
                          to_one_hot(e_raw, energy_bins, nb))
    hs2 = jnp.where(frame_mask[..., None], hs2, 0.0)
    return hs2, p_raw, e_raw, frame_mask, out_lens


def test_fused_variance_adaptor_matches_xla_segment(rng):
    """The fused adaptor kernel (expansion + both predictor stacks +
    bucketize/one-hot/embed + residual) == the XLA segment, including the
    all-zero-duration fallback row, a length cutting inside a block, and
    buffer clipping."""
    from fastspeech2_tpu.models.predictors import (PredictorConfig,
                                                   init_predictor)
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.length_regulator import expansion_indices
    from fastspeech2_tpu.ops.pallas.adaptor import variance_adaptor_fused_apply
    from fastspeech2_tpu.ops.quantize import linear_bins, log_bins

    B, T, D, L, nb = 4, 12, 16, 32, 16
    cfg_v = PredictorConfig(idim=D, n_chans=D, kernel_size=3)
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    params = {
        "pitch_predictor": init_predictor(ks[0], cfg_v),
        "energy_predictor": init_predictor(ks[1], cfg_v),
        "pitch_embed": nn.init_linear(ks[2], nb, D),
        "energy_embed": nn.init_linear(ks[3], nb, D),
    }
    pitch_bins = log_bins(71.0, 400.0, nb)
    energy_bins = linear_bins(0.0, 60.0, nb)

    ds = rng.integers(0, 6, (B, T)).astype(np.int32)
    ds[1] = 0                       # all-zero fallback row
    ds[2] = 9                       # total 108 > L: clipping row
    ilens = np.asarray([T, 7, T, 3], np.int32)
    tok_mask = jnp.asarray(np.arange(T)[None] < ilens[:, None])
    hs = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    ds = jnp.asarray(ds)

    expect, p_raw, e_raw, frame_mask, out_lens = _xla_adaptor_segment(
        params, cfg_v, hs, ds, tok_mask, L, pitch_bins, energy_bins, nb)

    idx, fm2, ol2 = expansion_indices(ds, tok_mask, L, T)
    np.testing.assert_array_equal(np.asarray(fm2), np.asarray(frame_mask))
    np.testing.assert_array_equal(np.asarray(ol2), np.asarray(out_lens))

    got, raw = variance_adaptor_fused_apply(
        params, cfg_v, hs, idx, ol2, pitch_bins, energy_bins, interpret=True)

    fm = np.asarray(frame_mask)
    # raw outputs match at valid frames (kernel zeroes invalid ones)
    np.testing.assert_allclose(np.asarray(raw)[:, 0][fm],
                               np.asarray(p_raw)[fm], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(raw)[:, 1][fm],
                               np.asarray(e_raw)[fm], rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(raw)[:, 0][~fm] == 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(got)[~fm] == 0.0)


def test_fused_variance_adaptor_small_blocks(rng):
    """block_l < L exercises halo rows across block boundaries and fully-dead
    blocks; must equal the whole-L call."""
    from fastspeech2_tpu.models.predictors import (PredictorConfig,
                                                   init_predictor)
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.length_regulator import expansion_indices
    from fastspeech2_tpu.ops.pallas import adaptor
    from fastspeech2_tpu.ops.quantize import linear_bins, log_bins

    B, T, D, L, nb = 3, 10, 8, 32, 16
    cfg_v = PredictorConfig(idim=D, n_chans=D, kernel_size=3)
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 4)
    params = {
        "pitch_predictor": init_predictor(ks[0], cfg_v),
        "energy_predictor": init_predictor(ks[1], cfg_v),
        "pitch_embed": nn.init_linear(ks[2], nb, D),
        "energy_embed": nn.init_linear(ks[3], nb, D),
    }
    pitch_bins = log_bins(71.0, 400.0, nb)
    energy_bins = linear_bins(0.0, 60.0, nb)

    ds = jnp.asarray(rng.integers(1, 4, (B, T)), jnp.int32)
    ilens = np.asarray([10, 5, 2], np.int32)
    tok_mask = jnp.asarray(np.arange(T)[None] < ilens[:, None])
    hs = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    idx, _, ol = expansion_indices(ds, tok_mask, L, T)

    args = dict(interpret=True)
    whole = adaptor.variance_adaptor_fused_apply(
        params, cfg_v, hs, idx, ol, pitch_bins, energy_bins, **args)

    import functools as ft
    orig = adaptor.fused_variance_adaptor
    blocked_fn = ft.partial(orig, block_l=8)
    adaptor.fused_variance_adaptor = blocked_fn
    try:
        blocked = adaptor.variance_adaptor_fused_apply(
            params, cfg_v, hs, idx, ol, pitch_bins, energy_bins, **args)
    finally:
        adaptor.fused_variance_adaptor = orig

    np.testing.assert_allclose(np.asarray(blocked[0]), np.asarray(whole[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(blocked[1]), np.asarray(whole[1]),
                               rtol=1e-6, atol=1e-6)


def test_fused_attention_res_matches_xla_segment(rng):
    """fused [attention -> out-proj -> +residual] == the XLA segment
    (mha oracle + nn.linear out projection + residual add), including rows
    past the true length (which must come out as residual + out-bias) and
    fully-dead query blocks."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.pallas.attention import mha_fused_res_apply

    B, H, T, dk = 3, 2, 32, 8
    D = H * dk
    params = init_mha(jax.random.PRNGKey(7), D, dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    residual = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([32, 21, 3], jnp.int32)

    mask = attention_mask(lengths, T)
    att = mha_apply(params, y, y, y, mask, H)
    expect = residual + att

    got = mha_fused_res_apply(params, y, residual, lengths, H,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)

    # rows past the true length: exactly residual + out bias
    bo = np.asarray(params["out"]["b"])
    np.testing.assert_allclose(np.asarray(got)[1, 21:],
                               np.asarray(residual)[1, 21:] + bo,
                               rtol=1e-6, atol=1e-6)

    # small blocks (dead-block path + boundary blocks) == whole-T call
    from fastspeech2_tpu.ops import precision
    from fastspeech2_tpu.ops.pallas.attention import (
        fused_attention_packed_res)

    q = nn.linear(params["q"], y)
    k = nn.linear(params["k"], y)
    v = nn.linear(params["v"], y)
    wo, bo2 = params["out"]["w"], params["out"]["b"].reshape(1, -1)
    whole = fused_attention_packed_res(q, k, v, residual, wo, bo2, lengths,
                                       H, interpret=True, block_q=32)
    blocked = fused_attention_packed_res(q, k, v, residual, wo, bo2, lengths,
                                         H, interpret=True, block_q=8)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(whole),
                               rtol=1e-6, atol=1e-6)


def test_fused_adaptor_through_inference_matches_xla_branch(monkeypatch):
    """Integration (ADVICE r3 #3): flip ONLY the FUSED_ADAPTOR kill switch and
    run the real ``FastSpeech2.inference`` twice -- fused kernel branch
    (interpret mode) vs the in-tree XLA branch. Unlike the kernel-vs-oracle
    tests above, the oracle here IS models/fastspeech2.py's own XLA segment,
    so it cannot drift from the production code. Everything upstream
    (encoder, durations) and downstream (decoder) is byte-identical between
    the runs, isolating the comparison to the adaptor segment."""
    from jax.experimental.pallas import tpu as pltpu

    import fastspeech2_tpu.ops.pallas.adaptor as adaptor_mod
    from fastspeech2_tpu.config import Config, ModelConfig
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.ops import flags
    from fastspeech2_tpu.ops.precision import compute_dtype

    cfg = Config(model=ModelConfig(adim=32, aheads=2, elayers=1, eunits=64,
                                   ddim=32, dlayers=1, dunits=64,
                                   postnet_layers=2, postnet_chans=16,
                                   positionwise_conv_kernel_size=3,
                                   duration_predictor_chans=16,
                                   fused_attention="on"))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    # bias durations up so the frame-level segment sees real expansion
    params["duration_predictor"]["out"]["b"] = (
        params["duration_predictor"]["out"]["b"] + 1.5)
    g = np.random.default_rng(0)
    B, T, L = 2, 12, 64
    xs = jnp.asarray(g.integers(1, 68, (B, T)), jnp.int32)
    ilens = jnp.asarray([T, 7], jnp.int32)

    kernel_calls = []
    real_fused = adaptor_mod.variance_adaptor_fused_apply

    def spy(*a, **k):
        kernel_calls.append(1)
        return real_fused(*a, **k)

    monkeypatch.setattr(adaptor_mod, "variance_adaptor_fused_apply", spy)

    def run(fused: bool):
        monkeypatch.setattr(flags, "FUSED_ADAPTOR", fused)
        with pltpu.force_tpu_interpret_mode(), compute_dtype(jnp.bfloat16):
            mel, lens, durs = model.inference(params, state, xs, ilens,
                                              out_maxlen=L)
        return np.asarray(mel), np.asarray(lens), np.asarray(durs)

    mel_f, lens_f, durs_f = run(True)
    assert kernel_calls, "fused adaptor branch did not engage"
    mel_x, lens_x, durs_x = run(False)
    assert len(kernel_calls) == 1, "kill switch off still hit the kernel"

    np.testing.assert_array_equal(lens_f, lens_x)
    np.testing.assert_array_equal(durs_f, durs_x)
    # both runs compute in bf16; the fused kernel may round differently
    assert np.abs(mel_f - mel_x).mean() < 0.02, np.abs(mel_f - mel_x).mean()
    assert np.abs(mel_f - mel_x).max() < 0.2, np.abs(mel_f - mel_x).max()


def test_fused_attention_res_ln_matches_res_plus_layernorm(rng):
    """The post-LN epilogue variant == [packed+res kernel -> nn.layer_norm],
    including dead q-blocks (rows past length: LN(res + out_bias))."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.pallas.attention import (
        fused_attention_packed_res, fused_attention_packed_res_ln)

    B, T, D, H = 3, 32, 64, 2
    g = rng
    q = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    k = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    v = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    res = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    wo = jnp.asarray(g.normal(size=(D, D)) * 0.1, jnp.float32)
    bo = jnp.asarray(g.normal(size=(1, D)), jnp.float32)
    gamma = jnp.asarray(g.normal(size=(D,)) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(g.normal(size=(D,)) * 0.1, jnp.float32)
    lengths = jnp.asarray([32, 13, 1], jnp.int32)

    base = fused_attention_packed_res(q, k, v, res, wo, bo, lengths, H,
                                      interpret=True, block_q=8)
    expect = nn.layer_norm({"g": gamma, "b": beta}, base)
    got = fused_attention_packed_res_ln(q, k, v, res, wo, bo, gamma, beta,
                                        lengths, H, interpret=True, block_q=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_qkv_res_ln_matches_projected_kernel(rng):
    """The QKV-folded post-LN kernel == [nn.linear Q/K/V projections ->
    packed+res+LN kernel] when the attention input and residual are the same
    tensor (the post-LN block contract), including dead q-blocks and the
    K/V-scratch reuse across a row's query blocks (block_q < T)."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.pallas.attention import (
        fused_attention_packed_qkv_res_ln, fused_attention_packed_res_ln)

    B, T, D, H = 3, 32, 64, 2
    g = rng
    key = jax.random.PRNGKey(11)
    params = init_mha(key, D, dtype=jnp.float32)
    x = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    gamma = jnp.asarray(g.normal(size=(D,)) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(g.normal(size=(D,)) * 0.1, jnp.float32)
    lengths = jnp.asarray([32, 13, 1], jnp.int32)

    q = nn.linear(params["q"], x)
    k = nn.linear(params["k"], x)
    v = nn.linear(params["v"], x)
    wo = params["out"]["w"]
    bo = params["out"]["b"].reshape(1, -1)
    expect = fused_attention_packed_res_ln(q, k, v, x, wo, bo, gamma, beta,
                                           lengths, H, interpret=True,
                                           block_q=8)

    bqkv = jnp.stack([params["q"]["b"], params["k"]["b"], params["v"]["b"]])
    got = fused_attention_packed_qkv_res_ln(
        x, params["q"]["w"], params["k"]["w"], params["v"]["w"], bqkv,
        wo, bo, gamma, beta, lengths, H, interpret=True, block_q=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)

    # whole-T blocks == small blocks (same scratch path, single q-block)
    whole = fused_attention_packed_qkv_res_ln(
        x, params["q"]["w"], params["k"]["w"], params["v"]["w"], bqkv,
        wo, bo, gamma, beta, lengths, H, interpret=True, block_q=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(whole),
                               rtol=1e-6, atol=1e-6)


def test_qkv_fold_vmem_guard(rng, monkeypatch):
    """The QKV fold's resident VMEM scales with T; shapes past the budget
    must fall back to the split [attn+res+LN] kernel instead of surfacing a
    Mosaic compile error from a lazy serving re-bucket (ADVICE r4 #1)."""
    from fastspeech2_tpu.ops.pallas import attention as A

    # default ladder (D=384 bf16): max_frames=2048 stays on the fold, a
    # user-raised 4096 re-bucket falls back
    assert A._qkv_fold_vmem_ok(2048, 384, jnp.bfloat16)
    assert not A._qkv_fold_vmem_ok(4096, 384, jnp.bfloat16)
    # f32 compute needs the fallback earlier (scratches double)
    assert not A._qkv_fold_vmem_ok(2048, 384, jnp.float32)

    # dispatch: when the guard rejects, mha_fused_block_ln_apply must route
    # through the split path and produce identical results
    B, T, D, H = 2, 32, 64, 2
    g = rng
    params = init_mha(jax.random.PRNGKey(3), D, dtype=jnp.float32)
    p_ln = {"g": jnp.ones((D,), jnp.float32),
            "b": jnp.zeros((D,), jnp.float32)}
    x = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([32, 9], jnp.int32)

    fold = A.mha_fused_block_ln_apply(params, p_ln, x, lengths, H,
                                      interpret=True)
    split_calls = []
    real_split = A.fused_attention_packed_res_ln

    def spy(*a, **k):
        split_calls.append(1)
        return real_split(*a, **k)

    monkeypatch.setattr(A, "fused_attention_packed_res_ln", spy)
    monkeypatch.setattr(A, "_qkv_fold_vmem_ok", lambda *a: False)
    via_split = A.mha_fused_block_ln_apply(params, p_ln, x, lengths, H,
                                           interpret=True)
    assert split_calls, "VMEM guard did not route to the split kernel"
    np.testing.assert_allclose(np.asarray(via_split), np.asarray(fold),
                               rtol=1e-5, atol=1e-5)


def test_fused_ffn_block_post_matches_xla_chain(rng):
    """Post-LN FFT-block tail kernel == mask -> conv-FFN -> +residual -> LN
    as separate XLA ops (ffn_fused_apply is itself oracle-tested above)."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.pallas.ffn import (ffn_fused_apply,
                                                fused_ffn_block_post)

    B, T, D, H, k = 3, 32, 16, 48, 9
    g = rng
    key = jax.random.PRNGKey(2)
    p = {"w1": {"w": jnp.asarray(g.normal(size=(k, D, H)) * 0.2, jnp.float32),
                "b": jnp.asarray(g.normal(size=(H,)), jnp.float32)},
         "w2": {"w": jnp.asarray(g.normal(size=(1, H, D)) * 0.2, jnp.float32),
                "b": jnp.asarray(g.normal(size=(D,)), jnp.float32)}}
    gamma = jnp.asarray(g.normal(size=(D,)) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(g.normal(size=(D,)) * 0.1, jnp.float32)
    x = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([32, 19, 2], jnp.int32)

    f = ffn_fused_apply(p, x, lengths, interpret=True)
    expect = nn.layer_norm({"g": gamma, "b": beta}, x + f)
    got = fused_ffn_block_post(x, gamma, beta, p["w1"]["w"], p["w1"]["b"],
                               p["w2"]["w"], p["w2"]["b"], lengths,
                               cd=jnp.float32, interpret=True, block_t=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_postln_fused_block_through_encoder_matches_xla(monkeypatch):
    """Integration: the post-LN fused attention+LN and FFN+LN epilogues
    engage through the real encoder_apply (default normalize_before=False)
    and agree with the pure-XLA path, both under the bf16 compute dtype
    (interpret mode on CPU). Spies prove both new kernels actually ran."""
    from jax.experimental.pallas import tpu as pltpu

    import fastspeech2_tpu.ops.pallas.attention as attn_mod
    import fastspeech2_tpu.ops.pallas.ffn as ffn_mod
    from fastspeech2_tpu.models.encoder import (EncoderConfig, encoder_apply,
                                                init_encoder)
    from fastspeech2_tpu.ops.masks import attention_mask, make_non_pad_mask
    from fastspeech2_tpu.ops.precision import compute_dtype

    # d_k = 256/2 = 128: the fused attention engages; post-LN default
    cfg = EncoderConfig(idim=40, attention_dim=256, attention_heads=2,
                        linear_units=64, num_blocks=1, input_layer="embed",
                        positionwise_conv_kernel_size=3)
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    g = np.random.default_rng(0)
    B, T = 2, 32
    xs = jnp.asarray(g.integers(1, 40, (B, T)), jnp.int32)
    ilens = jnp.asarray([T, 13], jnp.int32)
    mask = attention_mask(ilens, T)
    conv_mask = make_non_pad_mask(ilens, T)

    from fastspeech2_tpu.ops import flags

    attn_calls, qkv_calls, ffn_calls = [], [], []
    real_attn = attn_mod.fused_attention_packed_res_ln
    real_qkv = attn_mod.fused_attention_packed_qkv_res_ln
    real_ffn = ffn_mod.fused_ffn_block_post
    monkeypatch.setattr(attn_mod, "fused_attention_packed_res_ln",
                        lambda *a, **k: (attn_calls.append(1),
                                         real_attn(*a, **k))[1])
    monkeypatch.setattr(attn_mod, "fused_attention_packed_qkv_res_ln",
                        lambda *a, **k: (qkv_calls.append(1),
                                         real_qkv(*a, **k))[1])
    monkeypatch.setattr(ffn_mod, "fused_ffn_block_post",
                        lambda *a, **k: (ffn_calls.append(1),
                                         real_ffn(*a, **k))[1])

    def run(fused, qkv=False):
        monkeypatch.setattr(flags, "FUSED_ATT_QKV", qkv)
        with pltpu.force_tpu_interpret_mode(), compute_dtype(jnp.bfloat16):
            return np.asarray(encoder_apply(
                params, cfg, xs, mask, conv_mask=conv_mask, lengths=ilens,
                fused_attention=fused))

    out_fused = run(True)
    assert attn_calls and ffn_calls, "post-LN fused paths did not engage"
    assert not qkv_calls, "QKV variant must stay off when flagged off"
    n_attn, n_ffn = len(attn_calls), len(ffn_calls)
    out_xla = run(False)
    assert (len(attn_calls), len(ffn_calls)) == (n_attn, n_ffn), \
        "XLA run must not touch the fused kernels"
    # bf16 rounding differs between the paths; LN keeps scale ~1
    assert np.abs(out_fused - out_xla).mean() < 0.02
    assert np.abs(out_fused - out_xla).max() < 0.25

    # QKV-folded variant through the same encoder: engages instead of the
    # split kernel and agrees with both other paths
    out_qkv = run(True, qkv=True)
    assert qkv_calls, "QKV-folded path did not engage"
    assert len(attn_calls) == n_attn, "split kernel ran under the QKV flag"
    assert np.abs(out_qkv - out_xla).mean() < 0.02
    assert np.abs(out_qkv - out_xla).max() < 0.25
    assert np.abs(out_qkv - out_fused).mean() < 0.02
