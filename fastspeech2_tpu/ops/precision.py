"""Mixed-precision control: bf16 matmul operands with f32 accumulation.

TPU MXUs natively compute bf16 x bf16 -> f32; casting matmul/conv operands to
bf16 roughly doubles arithmetic throughput and halves weight bandwidth while
keeping accumulation, layernorms, softmax, and residuals in f32.

The compute dtype is a trace-time context: wrap the model call (inside jit) in
``compute_dtype(jnp.bfloat16)``. Default (None) is full f32 -- the parity
configs (BASELINE.json configs[0-2]) stay bit-faithful.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax.numpy as jnp

_state = threading.local()


def current_compute_dtype():
    return getattr(_state, "dtype", None)


@contextlib.contextmanager
def compute_dtype(dtype: Optional[jnp.dtype]):
    prev = getattr(_state, "dtype", None)
    _state.dtype = dtype
    try:
        yield
    finally:
        _state.dtype = prev
