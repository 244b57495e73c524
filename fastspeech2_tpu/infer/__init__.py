"""Inference: text -> phonemes -> mel -> waveform pipeline and CLI."""

from fastspeech2_tpu.infer.synthesize import Synthesizer  # noqa: F401
