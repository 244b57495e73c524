"""Interop with the PyTorch reference: checkpoint/state_dict translation."""

from fastspeech2_tpu.compat.torch_loader import (  # noqa: F401
    load_torch_checkpoint,
    params_from_state_dict,
)
