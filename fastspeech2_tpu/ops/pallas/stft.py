"""Fused STFT -> magnitude -> mel -> log-compress (+ energy) Pallas kernel.

The XLA path (audio/stft.py) materializes the framed signal -- a 4x blow-up of
the waveform (hop 256, n_fft 1024) -- plus the full magnitude spectrogram in
HBM. This kernel keeps everything for a block of frames in VMEM: the windowed
real-DFT matmuls, |.|, the mel projection, the log-clamp, and the per-frame
energy (reference pipeline: utils/stft.py:80-110,188-204 +
nvidia_preprocessing.py:39) all fuse into one pass.

Framing without gathers: with ``n_fft == 4 * hop`` (the reference's 1024/256),
frame f of the center-padded signal starts at sample ``f*hop`` -- so if the
padded signal is cut into hop-sized chunks ``C[k]``, frame f is the
concatenation ``C[f..f+3]`` and

    frames @ basis == sum_j  C[f+j] @ basis[j*hop:(j+1)*hop, :]

i.e. four MXU matmuls against hop-aligned shifted chunk views (cheap XLA
slices of one padded buffer). No strided gather ever exists.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_RATIO = 4  # n_fft // hop_length; the only case the reference uses


def _stft_mel_kernel(c0_ref, c1_ref, c2_ref, c3_ref, bre_ref, bim_ref,
                     mel_ref, out_mel_ref, out_en_ref, *, clip_val: float):
    # full-f32 MXU passes: inside Mosaic the default f32 dot is a truncated
    # bf16 decomposition, and the DFT sums cancel heavily -- quiet bins lose
    # ~3 decimal digits without HIGHEST (measured vs float64)
    hi = jax.lax.Precision.HIGHEST
    re = None
    im = None
    for j, c_ref in enumerate((c0_ref, c1_ref, c2_ref, c3_ref)):
        cj = c_ref[0]  # (FB, hop): chunk j of every frame in the block
        r = jax.lax.dot_general(cj, bre_ref[j], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=hi)
        i = jax.lax.dot_general(cj, bim_ref[j], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=hi)
        re = r if re is None else re + r
        im = i if im is None else im + i

    power = re * re + im * im              # (FB, n_freq)
    mag = jnp.sqrt(power)
    mel = jax.lax.dot_general(mag, mel_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=hi)
    out_mel_ref[0] = jnp.log(jnp.maximum(mel, clip_val))
    out_en_ref[0] = jnp.sqrt(jnp.sum(power, axis=-1, keepdims=True))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "clip_val",
                                             "interpret"))
def stft_mel_energy(
    y: Array, mel_basis: Array, *, n_fft: int = 1024, hop_length: int = 256,
    win_length: int = 1024, clip_val: float = 1e-5, interpret: bool = False,
) -> Tuple[Array, Array]:
    """(B, N) waveform -> (log-mel (B, n_mels, F), energy (B, F)) fused on TPU.

    Numerics match audio/stft.py's MelSpectrogram + energy_from_magnitude
    (tests/test_pallas.py). Requires n_fft == 4*hop (reference default).
    """
    from fastspeech2_tpu.audio.stft import _dft_basis

    if n_fft != _RATIO * hop_length:
        raise ValueError("fused STFT kernel assumes n_fft == 4*hop")
    B, N = y.shape
    n_freq = n_fft // 2 + 1
    n_mels = mel_basis.shape[0]
    F = N // hop_length + 1

    # frame block: bounds VMEM (chunks + spectra + bases fit in ~8 MB)
    FB = 256
    F_pad = -(-F // FB) * FB
    n_chunks = F_pad + _RATIO - 1
    # center reflect pad (n_fft//2 == 2 chunks) + zero tail to the chunk grid
    pad = n_fft // 2
    y_padded = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    tail = n_chunks * hop_length - y_padded.shape[1]
    y_padded = jnp.pad(y_padded, ((0, 0), (0, max(tail, 0))))
    y_padded = y_padded[:, : n_chunks * hop_length]
    chunks = y_padded.reshape(B, n_chunks, hop_length)
    # four hop-shifted views: Cj[:, f] == chunk f+j
    shifted = [chunks[:, j: j + F_pad, :] for j in range(_RATIO)]

    basis = _dft_basis(n_fft, win_length)  # (n_fft, 2*n_freq) [cos | -sin]
    bre = jnp.asarray(np.ascontiguousarray(
        basis[:, :n_freq].reshape(_RATIO, hop_length, n_freq)))
    bim = jnp.asarray(np.ascontiguousarray(
        basis[:, n_freq:].reshape(_RATIO, hop_length, n_freq)))
    melW = jnp.asarray(mel_basis, jnp.float32).T  # (n_freq, n_mels)

    sig_spec = pl.BlockSpec((1, FB, hop_length), lambda b, f: (b, f, 0),
                            memory_space=pltpu.VMEM)
    const3 = lambda shape: pl.BlockSpec(shape, lambda b, f: (0, 0, 0),
                                        memory_space=pltpu.VMEM)
    out_mel, out_en = pl.pallas_call(
        functools.partial(_stft_mel_kernel, clip_val=clip_val),
        grid=(B, F_pad // FB),
        in_specs=[
            sig_spec, sig_spec, sig_spec, sig_spec,
            const3((_RATIO, hop_length, n_freq)),
            const3((_RATIO, hop_length, n_freq)),
            pl.BlockSpec((n_freq, n_mels), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, FB, n_mels), lambda b, f: (b, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FB, 1), lambda b, f: (b, f, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, F_pad, n_mels), jnp.float32),
            jax.ShapeDtypeStruct((B, F_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*shifted, bre, bim, melW)
    # (B, n_mels, F) like the reference TacotronSTFT; drop padded tail frames
    return out_mel[:, :F, :].transpose(0, 2, 1), out_en[:, :F, 0]
