"""Shared helpers for the length-adaptive Pallas kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ln_tile(t, g_ref, b_ref, eps: float):
    """In-kernel LayerNorm over the last axis of an f32 tile: the
    ops/nn.py:layer_norm formula (torch semantics, biased variance), with
    (1, D) gamma/beta refs. Shared by every kernel that fuses an LN into its
    epilogue/prologue so the formula cannot drift per kernel (the bf16/f32
    parity band would only catch it after the fact)."""
    mean = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(t - mean), axis=-1, keepdims=True)
    return (t - mean) * jax.lax.rsqrt(var + eps) * g_ref[0] + b_ref[0]


def pick_block_t(T: int, candidates=(128, 64, 32, 16, 8)) -> int:
    """Time-block size: small enough that dead-block skipping tracks true
    lengths, large enough for MXU shape; whole-T if nothing divides."""
    for bt in candidates:
        if T % bt == 0:
            return bt
    return T
