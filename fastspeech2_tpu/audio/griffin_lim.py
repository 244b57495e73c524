"""Griffin-Lim phase recovery -- the fallback vocoder.

Reference: ``/root/reference/dataset/audio_processing.py:224-240`` iterates
``inverse -> transform`` 30 times over the conv-STFT pair (which hardcodes
.cuda()); here it's a jittable lax.fori_loop over the matmul STFT/iSTFT.

The iSTFT matches the reference's ``STFT.inverse`` semantics
(``utils/stft.py:112-151``): windowed overlap-add, division by the window
sum-square envelope where it is non-negligible, scaling by n_fft/hop, and
trimming n_fft//2 from both ends.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.audio.stft import hann_window, stft_magnitude_phase

Array = jax.Array


@functools.lru_cache(maxsize=8)
def _window_and_inv_basis(n_fft: int, win_length: int) -> np.ndarray:
    """(2*n_freq, n_fft) windowed inverse-DFT basis: [real | imag] -> frame."""
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    # one-sided inverse DFT with hermitian weights (DC/nyquist counted once)
    w = np.full((n_freq, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    inv = np.concatenate([np.cos(ang) * w, -np.sin(ang) * w], axis=0) / n_fft
    window = hann_window(win_length).astype(np.float64)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    return (inv * window[None, :]).astype(np.float32)


def _window_sumsquare(n_frames: int, n_fft: int, hop: int, win_length: int) -> np.ndarray:
    n = n_fft + hop * (n_frames - 1)
    win_sq = hann_window(win_length).astype(np.float64) ** 2
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win_sq = np.pad(win_sq, (lpad, n_fft - win_length - lpad))
    x = np.zeros(n)
    for i in range(n_frames):
        s = i * hop
        x[s : s + n_fft] += win_sq[: max(0, min(n_fft, n - s))]
    return x.astype(np.float32)


def istft(
    magnitude: Array, phase: Array,
    n_fft: int = 1024, hop_length: int = 256, win_length: int = 1024,
) -> Array:
    """(B, n_freq, T) magnitude+phase -> (B, N) waveform."""
    B, n_freq, T = magnitude.shape
    real = magnitude * jnp.cos(phase)
    imag = magnitude * jnp.sin(phase)
    spec = jnp.concatenate([real, imag], axis=1).transpose(0, 2, 1)  # (B,T,2F)
    inv = jnp.asarray(_window_and_inv_basis(n_fft, win_length))
    frames = jnp.einsum("btf,fn->btn", spec, inv,
                        preferred_element_type=jnp.float32)  # (B,T,n_fft)
    # overlap-add via scatter-add
    out_len = n_fft + hop_length * (T - 1)
    idx = (jnp.arange(T)[:, None] * hop_length + jnp.arange(n_fft)[None, :]).reshape(-1)
    sig = jax.vmap(lambda fr: jnp.zeros(out_len).at[idx].add(fr.reshape(-1)))(frames)
    # window sum-square normalization (utils/stft.py:124-146)
    wss = jnp.asarray(_window_sumsquare(T, n_fft, hop_length, win_length))
    tiny = jnp.asarray(np.finfo(np.float32).tiny * 10)
    # (no n_fft/hop rescale: the reference needs it only because its pinv-based
    # inverse basis carries a 1/scale factor, utils/stft.py:62-63,146)
    sig = jnp.where(wss[None, :] > tiny, sig / jnp.maximum(wss[None, :], tiny), sig)
    half = n_fft // 2
    return sig[:, half : out_len - half]


def griffin_lim(
    magnitude: Array, n_iters: int = 30,
    n_fft: int = 1024, hop_length: int = 256, win_length: int = 1024,
    seed: int = 0,
) -> Array:
    """(B, n_freq, T) magnitudes -> (B, N) waveform, 30 iterations by default
    (reference inference.py:195-199)."""
    key = jax.random.PRNGKey(seed)
    phase = jax.random.uniform(key, magnitude.shape, minval=-np.pi, maxval=np.pi)

    def body(_, carry):
        signal = istft(magnitude, carry, n_fft, hop_length, win_length)
        _, new_phase = stft_magnitude_phase(signal, n_fft, hop_length, win_length)
        # phase frames may exceed magnitude frames by edge effects; trim
        return new_phase[..., : magnitude.shape[-1]]

    phase = jax.lax.fori_loop(0, n_iters, body, phase)
    return istft(magnitude, phase, n_fft, hop_length, win_length)
