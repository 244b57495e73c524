"""Audio DSP: STFT, mel filterbank, energy, pitch, Griffin-Lim.

JAX/XLA implementations replacing the reference's conv-based torch STFT
(``/root/reference/utils/stft.py``) -- on TPU the framed STFT is a windowed
matmul against a DFT basis, which maps straight onto the MXU.
"""

from fastspeech2_tpu.audio.stft import (  # noqa: F401
    MelSpectrogram,
    energy_from_magnitude,
    hann_window,
    mel_filterbank,
    stft_magnitude_phase,
)
