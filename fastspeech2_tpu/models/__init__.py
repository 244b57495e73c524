"""Model zoo: FastSpeech2 (text->mel) and its submodules, plus the MelGAN
vocoder generator in :mod:`fastspeech2_tpu.vocoder`."""

from fastspeech2_tpu.models.fastspeech2 import (  # noqa: F401
    FastSpeech2,
    init_fastspeech2,
)
