"""Shared helpers for the length-adaptive Pallas kernels."""

from __future__ import annotations


def pick_block_t(T: int, candidates=(128, 64, 32, 16, 8)) -> int:
    """Time-block size: small enough that dead-block skipping tracks true
    lengths, large enough for MXU shape; whole-T if nothing divides."""
    for bt in candidates:
        if T % bt == 0:
            return bt
    return T
