"""Audio DSP tests: STFT parity vs the reference's conv-Fourier formulation
(rebuilt in-test with torch as the oracle), mel filterbank properties, energy,
iSTFT round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fastspeech2_tpu.audio.griffin_lim import griffin_lim, istft
from fastspeech2_tpu.audio.stft import (
    MelSpectrogram,
    energy_from_magnitude,
    hann_window,
    mel_filterbank,
    stft_magnitude_phase,
)


def _reference_conv_stft(y: np.ndarray, n_fft=1024, hop=256, win=1024):
    """Oracle: the reference's conv-based STFT (utils/stft.py:44-110) --
    Fourier basis from np.fft.fft(np.eye), Hann-windowed, reflect pad, conv1d."""
    scale = n_fft / hop
    fourier_basis = np.fft.fft(np.eye(n_fft))
    cutoff = n_fft // 2 + 1
    fourier_basis = np.vstack(
        [np.real(fourier_basis[:cutoff]), np.imag(fourier_basis[:cutoff])]
    )
    forward_basis = torch.FloatTensor(fourier_basis[:, None, :])
    fft_window = torch.from_numpy(hann_window(win)).float()
    forward_basis *= fft_window

    x = torch.from_numpy(y).float()
    B, N = x.shape
    x = x.view(B, 1, N)
    x = F.pad(x.unsqueeze(1), (n_fft // 2, n_fft // 2, 0, 0), mode="reflect").squeeze(1)
    ft = F.conv1d(x, forward_basis, stride=hop, padding=0)
    real, imag = ft[:, :cutoff], ft[:, cutoff:]
    mag = torch.sqrt(real ** 2 + imag ** 2)
    phase = torch.atan2(imag, real)
    return mag.numpy(), phase.numpy()


@pytest.fixture
def wave(rng):
    t = np.arange(22050, dtype=np.float32) / 22050.0
    y = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.3 * np.sin(2 * np.pi * 660 * t)
         + 0.05 * rng.normal(size=t.shape)).astype(np.float32)
    return np.clip(y, -1, 1)[None, :]  # (1, N)


def test_stft_matches_reference_conv_formulation(wave):
    mag_ref, phase_ref = _reference_conv_stft(wave)
    mag, phase = stft_magnitude_phase(wave)
    assert mag.shape == mag_ref.shape
    np.testing.assert_allclose(np.asarray(mag), mag_ref, rtol=1e-4, atol=2e-3)
    # phase comparison away from near-zero magnitudes (atan2 unstable there)
    strong = mag_ref > 1e-2
    diff = np.abs(np.asarray(phase) - phase_ref)[strong]
    diff = np.minimum(diff, 2 * np.pi - diff)
    assert np.percentile(diff, 99) < 1e-2


def test_stft_matches_torch_stft(wave):
    """Independent oracle: torch.stft with identical conventions."""
    mag, _ = stft_magnitude_phase(wave)
    t = torch.stft(
        torch.from_numpy(wave), n_fft=1024, hop_length=256, win_length=1024,
        window=torch.from_numpy(hann_window(1024)),
        center=True, pad_mode="reflect", return_complex=True,
    ).abs().numpy()
    n = min(mag.shape[-1], t.shape[-1])
    np.testing.assert_allclose(np.asarray(mag)[..., :n], t[..., :n],
                               rtol=1e-4, atol=2e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # each filter is nonzero somewhere and unimodal-ish; peaks strictly increase
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) > 0)
    # no energy above fmax bin
    fft_freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, fft_freqs > 8000.0 + 30].max() == 0
    # slaney normalization: filter areas in Hz are ~1 (2/(width) * width/2)
    areas = (fb * np.gradient(fft_freqs)[None, :]).sum(1)
    np.testing.assert_allclose(areas[5:-5], 1.0, atol=0.08)


def test_mel_spectrogram_shapes_and_range(wave):
    mel_fn = MelSpectrogram()
    mel, mag = mel_fn(wave)
    assert mel.shape[1] == 80
    assert mel.shape[2] == mag.shape[2] == 22050 // 256 + 1
    m = np.asarray(mel)
    assert m.min() >= np.log(1e-5) - 1e-6  # clamp floor
    assert m.max() < 10


def test_mel_and_energy_bucketed_bit_exact():
    """The bucketed batched preprocessing path (one compile per padded
    length) sees sample-exact frame inputs, so outputs match the
    per-utterance transform to f32 ulp (XLA reduction order differs across
    batch shapes; measured max 1.4e-6 on log-mels) -- including awkward
    lengths (hop-aligned, off-by-one, shorter than the reflect pad)."""
    rng = np.random.default_rng(7)
    lens = [22050, 22051, 4096, 256 * 37 + 13, 511, 70000]
    wavs = [rng.uniform(-0.9, 0.9, size=(n,)).astype(np.float32)
            for n in lens]
    mel_fn = MelSpectrogram()
    got = mel_fn.mel_and_energy_bucketed(wavs, bucket=16384, max_batch=4)
    for w, (mel_b, e_b) in zip(wavs, got):
        mel_1, e_1 = mel_fn.mel_and_energy(jnp.asarray(w)[None])
        F = len(w) // 256 + 1
        assert mel_b.shape == (80, F) and e_b.shape == (F,)
        np.testing.assert_allclose(mel_b, np.asarray(mel_1)[0],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(e_b, np.asarray(e_1)[0],
                                   rtol=1e-5, atol=1e-5)


def test_energy(wave):
    _, mag = MelSpectrogram()(wave)
    e = energy_from_magnitude(mag)
    t = torch.norm(torch.from_numpy(np.asarray(mag)), dim=1).numpy()
    np.testing.assert_allclose(np.asarray(e), t, rtol=1e-5, atol=1e-5)


def test_istft_roundtrip(wave):
    mag, phase = stft_magnitude_phase(wave)
    rec = np.asarray(istft(mag, phase))
    n = min(rec.shape[1], wave.shape[1])
    # interior reconstruction (COLA) should be near-exact
    err = np.abs(rec[0, 1024:n - 1024] - wave[0, 1024:n - 1024])
    assert err.max() < 5e-3


def test_griffin_lim_reduces_error(wave):
    mag, _ = stft_magnitude_phase(wave)

    def rel_err(n_iters):
        rec = np.asarray(griffin_lim(mag, n_iters=n_iters))
        mag2, _ = stft_magnitude_phase(rec)
        n = min(mag.shape[-1], mag2.shape[-1])
        return (np.abs(np.asarray(mag2)[..., :n] - np.asarray(mag)[..., :n]).mean()
                / np.abs(np.asarray(mag)).mean())

    e0, e30 = rel_err(0), rel_err(30)
    assert e30 < 0.2, f"GL did not converge: {e30}"
    assert e30 < e0 / 2, f"GL barely improved: {e0} -> {e30}"
