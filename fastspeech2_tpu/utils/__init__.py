"""Shared utilities: plotting/TB image helpers."""

from fastspeech2_tpu.utils.plotting import (  # noqa: F401
    plot_spectrogram_to_numpy,
    plot_waveform_to_numpy,
)
