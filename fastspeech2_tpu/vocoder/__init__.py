"""Neural vocoder stage (downstream of text->mel, per BASELINE.json).

The reference pulls MelGAN from torch.hub at runtime
(``train_fastspeech.py:446``, ``inference.py:183``); here the generator is a
JAX implementation with a translator for that checkpoint format.
"""

from fastspeech2_tpu.vocoder.melgan import (  # noqa: F401
    MelGANConfig,
    MelGANGenerator,
    init_melgan,
    load_melgan,
    load_melgan_params,
    melgan_params_from_torch,
)
