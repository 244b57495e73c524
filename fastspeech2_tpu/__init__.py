"""TPU-native FastSpeech 2: a JAX/XLA/Pallas non-autoregressive text-to-mel framework.

Brand-new implementation with the capabilities of the PyTorch reference
``rishikksh20/FastSpeech2`` (see /root/reference), redesigned TPU-first:

- pure-functional model (params pytree + jitted apply) instead of an nn.Module tree
- static padded shapes + masks everywhere so the whole step jits
- gather-based length regulator instead of a host-side python repeat loop
- data parallelism over a ``jax.sharding.Mesh`` with psum collectives
- Pallas kernels for the hot fused ops, with XLA fallbacks

Subpackages:
    config    -- typed configuration (mirrors reference configs/default.yaml)
    text      -- phoneme/grapheme frontend (reference dataset/texts/)
    audio     -- STFT/mel/energy/pitch feature extraction (reference utils/stft.py)
    ops       -- masks, attention, conv-FFN, length regulator, quantization
    models    -- FastSpeech2 model: init/apply/inference/loss
    data      -- filelist parsing, feature store, bucketed batching
    train     -- optimizer (Noam), train step, checkpointing, metrics
    parallel  -- mesh construction and sharded train/infer steps
    compat    -- PyTorch checkpoint translation
    infer     -- end-to-end synthesis pipeline
    vocoder   -- MelGAN generator (downstream stage)
"""

__version__ = "0.1.0"

from fastspeech2_tpu.config import Config, load_config  # noqa: F401
