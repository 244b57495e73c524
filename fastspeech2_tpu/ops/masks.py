"""Sequence masks (reference ``/root/reference/utils/util.py:153-376``).

All masks take a static ``maxlen`` so shapes stay fixed under jit (the reference
derives maxlen dynamically from the batch; we pad to bucketed static shapes --
SURVEY.md 7 "padded-shape discipline").

Convention: ``make_pad_mask`` is True at PADDED positions (reference semantics);
``make_non_pad_mask`` is its complement (True at valid positions).
"""

import jax
import jax.numpy as jnp

Array = jax.Array


def make_pad_mask(lengths: Array, maxlen: int) -> Array:
    """(B,) lengths -> (B, maxlen) bool, True where padded (pos >= length)."""
    pos = jnp.arange(maxlen, dtype=lengths.dtype)
    return pos[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths: Array, maxlen: int) -> Array:
    """(B,) lengths -> (B, maxlen) bool, True where valid (pos < length)."""
    return ~make_pad_mask(lengths, maxlen)


def attention_mask(lengths: Array, maxlen: int) -> Array:
    """(B,) lengths -> (B, maxlen, maxlen) bool self-attention mask.

    True where both query and key positions are valid -- the reference's
    ``_source_mask`` (``fastspeech.py:359-376``).
    """
    m = make_non_pad_mask(lengths, maxlen)
    return m[:, None, :] & m[:, :, None]
