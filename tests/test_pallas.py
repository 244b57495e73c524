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
