"""Core tensor ops: functional NN primitives, masks, attention, conv-FFN,
length regulation, and quantization -- the XLA compute path of the framework.

Pallas kernels for the hot fused ops live in :mod:`fastspeech2_tpu.ops.pallas`
with these XLA implementations as correctness fallbacks.
"""

from fastspeech2_tpu.ops.masks import (  # noqa: F401
    attention_mask,
    make_non_pad_mask,
    make_pad_mask,
)
from fastspeech2_tpu.ops.length_regulator import regulate_length  # noqa: F401
from fastspeech2_tpu.ops.quantize import bucketize, to_one_hot  # noqa: F401
