"""Fused masked self-attention as a Pallas TPU kernel.

One program per (batch, head): Q/K/V tiles live in VMEM, scores -> masked
softmax -> re-zero -> PV all happen on-chip, so the (T, T) attention matrix
never round-trips HBM (the XLA fallback in ops/attention.py materializes it
twice). Sequence lengths ride in as scalar prefetch and masks are built from
iota in-kernel -- no (B, T, T) mask tensor exists at all.

Numerics match ops/attention.py:masked_softmax (the reference's
masked_fill(-inf) -> softmax -> re-zero, core/attention.py:58-65): fully-padded
query rows produce exact zeros.

Sized for this model family (T <= ~896, d_k <= 192): a whole (T, d_k) head fits
comfortably in VMEM (~0.7 MB), so no K/V streaming is needed; the win is fusion,
not tiling. Used on the deterministic (inference) path; training keeps the XLA
fallback (attention dropout needs materialized weights for the VJP anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    b = pl.program_id(0)
    length = len_ref[b]
    q = q_ref[0, 0]  # (T, dk)
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    # Mosaic's default f32 dot truncates to a bf16 decomposition (see
    # ops/pallas/stft.py); parity-config (f32) runs need full precision,
    # bf16 speed-config operands already are the precision statement
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale  # (T, T)

    T = scores.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    valid = (row < length) & (col < length)

    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(valid, scores, neg)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m) * valid.astype(jnp.float32)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    attn = e / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)

    o_ref[0, 0] = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: Array, k: Array, v: Array, lengths: Array,
                    *, interpret: bool = False) -> Array:
    """(B, H, T, dk) Q/K/V + (B,) lengths -> (B, H, T, dk) attention output.

    Scale is 1/sqrt(dk) like the reference (core/attention.py:55-57).
    """
    B, H, T, dk = q.shape
    scale = 1.0 / float(np.sqrt(dk))
    spec = pl.BlockSpec((1, 1, T, dk), lambda b, h, lens: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )
    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, dk), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (T * T * dk * 2),
            bytes_accessed=4 * B * H * T * dk * 4,
            transcendentals=B * H * T * T,
        ),
    )(lengths.astype(jnp.int32), q, k, v)


def mha_fused_apply(params, x: Array, lengths: Array, n_heads: int,
                    *, interpret: bool = False) -> Array:
    """Full MHA (QKV projections + fused kernel + output projection) for the
    self-attention case. Drop-in for ops.attention.mha_apply on the
    deterministic path when a lengths vector describes the mask.

    Under a bf16 compute dtype the projections emit bf16 so the kernel's QK
    and PV matmuls run at full MXU rate, with the softmax kept in f32
    (flash-attention-style numerics)."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.precision import current_compute_dtype

    B, T, D = x.shape
    dk = D // n_heads
    dt = current_compute_dtype() or x.dtype

    def proj(p):
        return nn.linear(p, x, out_dtype=dt).reshape(
            B, T, n_heads, dk).transpose(0, 2, 1, 3)

    o = fused_attention(proj(params["q"]), proj(params["k"]), proj(params["v"]),
                        lengths, interpret=interpret)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
    return nn.linear(params["out"], o, out_dtype=x.dtype)
