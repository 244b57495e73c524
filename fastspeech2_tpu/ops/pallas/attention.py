"""Fused masked self-attention as a Pallas TPU kernel.

One program per (batch, head, query-block): the query block's full score rows
-> masked softmax -> re-zero -> PV all happen on-chip, so the (T, T)
attention matrix never round-trips HBM (the XLA fallback in ops/attention.py
materializes it twice). K and V stay whole per (batch, head) -- at this model
family's scale (T <= ~2048, d_k <= 192, bf16) a full (T, d_k) head is under
0.8 MB, so each query block sees every key and the softmax is exact per row
with no online-max accumulation. Blocking over query rows bounds the score
tile to (block_q, T) f32, keeping scoped VMEM well under the 16 MB limit at
any T the serving path produces (whole-T scores OOM'd at T=1536). The
query-block index is innermost in the grid, so Mosaic's pipeline keeps the
K/V blocks resident across a head's query blocks instead of re-fetching.

Sequence lengths ride in as scalar prefetch and masks are built from iota
in-kernel -- no (B, T, T) mask tensor exists at all.

Numerics match ops/attention.py:masked_softmax (the reference's
masked_fill(-inf) -> softmax -> re-zero, core/attention.py:58-65): fully-padded
query rows produce exact zeros.

Used on the deterministic (inference) path; training keeps the XLA fallback
(attention dropout needs materialized weights for the VJP anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 block_q: int):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    length = len_ref[b]
    q = q_ref[0, 0]  # (block_q, dk)
    k = k_ref[0, 0]  # (T, dk)
    v = v_ref[0, 0]

    # Mosaic's default f32 dot truncates to a bf16 decomposition (see
    # ops/pallas/stft.py); parity-config (f32) runs need full precision,
    # bf16 speed-config operands already are the precision statement
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale  # (block_q, T)

    T = scores.shape[1]
    row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, T), 1)
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


def _pick_block_q(T: int) -> int:
    # Whole-T when the f32 score tile fits the ~4 MB budget (a few live
    # copies fit the 16 MB scoped-VMEM limit with room for Q/K/V/O tiles;
    # measured fastest at the bench shape T=896); else the largest
    # power-of-two block dividing T that fits.
    if T * T * 4 <= 4 * 1024 * 1024:
        return T
    for bq in (1024, 512, 256, 128, 64, 32, 16, 8):
        if T % bq == 0 and bq * T * 4 <= 4 * 1024 * 1024:
            return bq
    return T


def _pick_block_q_adaptive(T: int) -> int:
    # for the length-adaptive packed kernel: blocks small enough that
    # dead-block skipping tracks true lengths (~1/7 of the padded buffer),
    # large enough for MXU shape; VMEM ceiling as in _pick_block_q
    for bq in (256, 224, 192, 160, 128, 96, 64, 32, 16, 8):
        if T % bq == 0 and bq * T * 4 <= 4 * 1024 * 1024:
            return bq
    return T


@functools.partial(jax.jit, static_argnames=("interpret", "block_q"))
def fused_attention(q: Array, k: Array, v: Array, lengths: Array,
                    *, interpret: bool = False,
                    block_q: int | None = None) -> Array:
    """(B, H, T, dk) Q/K/V + (B,) lengths -> (B, H, T, dk) attention output.

    Scale is 1/sqrt(dk) like the reference (core/attention.py:55-57).
    block_q overrides the query-block size (must divide T); default picks the
    largest VMEM-safe power of two.
    """
    B, H, T, dk = q.shape
    scale = 1.0 / float(np.sqrt(dk))
    bq = block_q if block_q is not None else _pick_block_q(T)
    assert T % bq == 0, (T, bq)
    qspec = pl.BlockSpec((1, 1, bq, dk), lambda b, h, i, lens: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, T, dk), lambda b, h, i, lens: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, T // bq),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
    )
    kernel = functools.partial(_attn_kernel, scale=scale, block_q=bq)
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


def _attn_kernel_packed(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        block_q: int, n_heads: int):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    length = len_ref[b]
    q = q_ref[0]  # (block_q, D) -- heads packed along the last axis
    k = k_ref[0]  # (T, D)
    v = v_ref[0]
    T, D = k.shape
    dk = D // n_heads

    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    @pl.when(qi * block_q >= length)
    def _dead_block():
        # every query row is past the true length: masked softmax re-zeroes
        # them exactly (see _attn_kernel), so skip both matmuls
        o_ref[0] = jnp.zeros((block_q, D), o_ref.dtype)

    @pl.when(qi * block_q < length)
    def _live_block():
        row = (qi * block_q
               + jax.lax.broadcasted_iota(jnp.int32, (block_q, T), 0))
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, T), 1)
        valid = (row < length) & (col < length)
        neg = jnp.finfo(jnp.float32).min

        # static python loop over heads: static lane-dim slices (Mosaic
        # relayouts in VREGs, no HBM traffic), and K/V are fetched once per
        # batch row instead of once per (batch, head)
        for h in range(n_heads):
            sl = slice(h * dk, (h + 1) * dk)
            scores = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ) * scale  # (block_q, T)

            s = jnp.where(valid, scores, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m) * valid.astype(jnp.float32)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            attn = e / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)

            o_ref[0, :, sl] = jax.lax.dot_general(
                attn.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "block_q"))
def fused_attention_packed(q: Array, k: Array, v: Array, lengths: Array,
                           n_heads: int, *, interpret: bool = False,
                           block_q: int | None = None) -> Array:
    """Head-packed fused attention: (B, T, D) Q/K/V with heads as contiguous
    D-slices (head h = columns [h*dk, (h+1)*dk)) -> (B, T, D) output.

    Same math as :func:`fused_attention`, but the QKV projection outputs feed
    the kernel in their natural row-major (B, T, D) layout and heads are
    sliced inside the kernel -- no (B,T,H,dk)<->(B,H,T,dk) transposes, which
    on TPU lower to layout-copy ops costing ~10% of the whole serving step at
    the bench shape (dk=192 is not 128-divisible, so the head axis cannot be
    a BlockSpec dimension either).
    """
    B, T, D = q.shape
    assert D % n_heads == 0, (D, n_heads)
    dk = D // n_heads
    scale = 1.0 / float(np.sqrt(dk))
    bq = block_q if block_q is not None else _pick_block_q_adaptive(T)
    assert T % bq == 0, (T, bq)
    qspec = pl.BlockSpec((1, bq, D), lambda b, i, lens: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T // bq),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
    )
    kernel = functools.partial(_attn_kernel_packed, scale=scale, block_q=bq,
                               n_heads=n_heads)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_heads * (T * T * dk * 2),
            bytes_accessed=4 * B * T * D * 4,
            transcendentals=B * n_heads * T * T,
        ),
    )(lengths.astype(jnp.int32), q, k, v)


def _attn_kernel_packed_res(len_ref, q_ref, k_ref, v_ref, res_ref, wo_ref,
                            bo_ref, o_ref, o_scr, *, scale: float,
                            block_q: int, n_heads: int):
    """:func:`_attn_kernel_packed` + output projection + residual add.

    The XLA tail this replaces (models/encoder.py fft_block:
    ``x = residual + dropout(out_proj(att))`` on the deterministic path) is
    two (B, T, D) HBM round-trips per block -- the out-proj dot and the
    residual add_convert fusion. Keeping them here costs one resident
    (D, D) weight tile and zero extra HBM traffic. Numerics replicate
    ops/nn.py:linear under a compute dtype: MXU f32 accumulation rounded to
    the compute dtype, widened to f32 for the bias add, residual added in
    f32. Rows past the true length come out as ``res + bias`` exactly like
    the XLA path (masked softmax re-zeroes them, the projection leaves the
    bias, the residual stream passes through)."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    length = len_ref[b]
    q = q_ref[0]  # (block_q, D)
    k = k_ref[0]  # (T, D)
    v = v_ref[0]
    T, D = k.shape
    dk = D // n_heads
    cd = q.dtype

    prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
            else jax.lax.Precision.DEFAULT)

    @pl.when(qi * block_q >= length)
    def _dead_block():
        o_ref[0] = (res_ref[0].astype(jnp.float32)
                    + bo_ref[0]).astype(o_ref.dtype)

    @pl.when(qi * block_q < length)
    def _live_block():
        out = _attn_res_tile(q, k, v, res_ref[0], wo_ref, bo_ref, o_scr,
                             length, qi, scale=scale, block_q=block_q,
                             n_heads=n_heads, prec=prec, cd=cd)
        o_ref[0] = out.astype(o_ref.dtype)


def _attn_res_tile(q, k, v, res, wo_ref, bo_ref, o_scr, length, qi, *,
                   scale, block_q, n_heads, prec, cd):
    """Live-block core shared by the +res and +res+LN kernels: masked
    per-head attention -> out projection -> +residual, returning the f32
    (block_q, D) tile."""
    T, D = k.shape
    dk = D // n_heads
    row = (qi * block_q
           + jax.lax.broadcasted_iota(jnp.int32, (block_q, T), 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, T), 1)
    valid = (row < length) & (col < length)
    neg = jnp.finfo(jnp.float32).min

    for h in range(n_heads):
        sl = slice(h * dk, (h + 1) * dk)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale  # (block_q, T)

        s = jnp.where(valid, scores, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m) * valid.astype(jnp.float32)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        attn = e / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)

        o_scr[:, sl] = jax.lax.dot_general(
            attn.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(cd)

    # ops/nn.py:linear bit-pattern: MXU f32 accumulation rounded to the
    # compute dtype, widened to f32 for the bias add; then the residual
    out = jax.lax.dot_general(
        o_scr[:], wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(cd).astype(jnp.float32) + bo_ref[0]
    return out + res.astype(jnp.float32)


def _attn_kernel_packed_res_ln(len_ref, q_ref, k_ref, v_ref, res_ref, wo_ref,
                               bo_ref, g_ref, be_ref, o_ref, o_scr, *,
                               scale: float, block_q: int, n_heads: int,
                               eps: float):
    """:func:`_attn_kernel_packed_res` + post-LN epilogue (the default
    post-LN FFT block's ``x = LN(residual + out_proj(att))``,
    models/encoder.py fft_block with normalize_before=False). The separate
    XLA LayerNorm pass this replaces reads and writes the full (B, T, D)
    f32 stream once per block; here the LN (f32, torch biased-variance, the
    ops/nn.py:layer_norm formula) runs on the VMEM-resident tile. Rows past
    the true length come out as ``LN(res + out_bias)``, exactly what the XLA
    chain computes for them."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    length = len_ref[b]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    cd = q.dtype

    prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def ln(t):
        from fastspeech2_tpu.ops.pallas.common import ln_tile

        return ln_tile(t, g_ref, be_ref, eps)

    @pl.when(qi * block_q >= length)
    def _dead_block():
        o_ref[0] = ln(res_ref[0].astype(jnp.float32)
                      + bo_ref[0]).astype(o_ref.dtype)

    @pl.when(qi * block_q < length)
    def _live_block():
        out = _attn_res_tile(q, k, v, res_ref[0], wo_ref, bo_ref, o_scr,
                             length, qi, scale=scale, block_q=block_q,
                             n_heads=n_heads, prec=prec, cd=cd)
        o_ref[0] = ln(out).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "block_q"))
def fused_attention_packed_res(q: Array, k: Array, v: Array, res: Array,
                               wo: Array, bo: Array, lengths: Array,
                               n_heads: int, *, interpret: bool = False,
                               block_q: int | None = None) -> Array:
    """Head-packed fused attention + output projection + residual add.

    Args:
        q/k/v: (B, T, D) projections, heads as contiguous D-slices.
        res: (B, T, D) f32 residual stream (the block input x).
        wo: (D, D) output projection weight in the compute dtype;
            bo (1, D) f32 bias.
        lengths: (B,) true sequence lengths.

    Returns:
        (B, T, D) f32 ``res + out_proj(attention)`` -- the full FFT-block
        attention half on the deterministic path.
    """
    B, T, D = q.shape
    assert D % n_heads == 0, (D, n_heads)
    dk = D // n_heads
    scale = 1.0 / float(np.sqrt(dk))
    bq = block_q if block_q is not None else _pick_block_q_adaptive(T)
    assert T % bq == 0, (T, bq)
    qspec = pl.BlockSpec((1, bq, D), lambda b, i, lens: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((D, D), lambda b, i, lens: (0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, D), lambda b, i, lens: (0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T // bq),
        in_specs=[qspec, kvspec, kvspec, qspec, wspec, bspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((bq, D), q.dtype)],
    )
    kernel = functools.partial(_attn_kernel_packed_res, scale=scale,
                               block_q=bq, n_heads=n_heads)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (n_heads * T * T * dk * 2 + T * D * D),
            bytes_accessed=6 * B * T * D * 4 + D * D * 2,
            transcendentals=B * n_heads * T * T,
        ),
    )(lengths.astype(jnp.int32), q, k, v,
      res.astype(jnp.float32), wo, bo.astype(jnp.float32))


def mha_fused_res_apply(params, x: Array, residual: Array, lengths: Array,
                        n_heads: int, *, interpret: bool = False) -> Array:
    """Full FFT-block attention half on the deterministic path:
    QKV projections (XLA) + fused [attention -> out projection -> +residual]
    kernel. Drop-in for ``residual + out_proj(fused_attention(...))`` when no
    tensor parallelism is active (the row-parallel out projection needs its
    psum between dot and residual under TP; tp>1 keeps the split path).

    Shards over a data-axis mesh via data_shard_map like the other
    batch-independent kernels."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.precision import current_compute_dtype
    from fastspeech2_tpu.parallel.sharding import (current_tp_mesh,
                                                   data_shard_map)

    dt = current_compute_dtype() or x.dtype

    def proj(p):
        return nn.linear(p, x, out_dtype=dt)

    q, k, v = proj(params["q"]), proj(params["k"]), proj(params["v"])
    wo = params["out"]["w"].astype(dt)
    bo = params["out"]["b"].reshape(1, -1)

    def call(q, k, v, res, lens, wo, bo):
        return fused_attention_packed_res(q, k, v, res, wo, bo, lens,
                                          n_heads, interpret=interpret)

    mesh = current_tp_mesh()
    if mesh is not None:
        call = data_shard_map(call, mesh, batched=(0, 1, 2, 3, 4))
    return call(q, k, v, residual, lengths, wo, bo)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "eps", "interpret", "block_q"))
def fused_attention_packed_res_ln(q: Array, k: Array, v: Array, res: Array,
                                  wo: Array, bo: Array, g: Array, be: Array,
                                  lengths: Array, n_heads: int, *,
                                  eps: float = 1e-5, interpret: bool = False,
                                  block_q: int | None = None) -> Array:
    """:func:`fused_attention_packed_res` + post-LN epilogue:
    ``LN(res + out_proj(attention))`` -- the COMPLETE attention half of a
    post-LN FFT block in one kernel. g/be: (D,) LayerNorm params."""
    B, T, D = q.shape
    assert D % n_heads == 0, (D, n_heads)
    dk = D // n_heads
    scale = 1.0 / float(np.sqrt(dk))
    bq = block_q if block_q is not None else _pick_block_q_adaptive(T)
    assert T % bq == 0, (T, bq)
    qspec = pl.BlockSpec((1, bq, D), lambda b, i, lens: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((D, D), lambda b, i, lens: (0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, D), lambda b, i, lens: (0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T // bq),
        in_specs=[qspec, kvspec, kvspec, qspec, wspec, bspec, bspec, bspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((bq, D), q.dtype)],
    )
    kernel = functools.partial(_attn_kernel_packed_res_ln, scale=scale,
                               block_q=bq, n_heads=n_heads, eps=eps)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (n_heads * T * T * dk * 2 + T * D * D),
            bytes_accessed=6 * B * T * D * 4 + D * D * 2,
            transcendentals=B * n_heads * T * T,
        ),
    )(lengths.astype(jnp.int32), q, k, v,
      res.astype(jnp.float32), wo, bo.astype(jnp.float32),
      g.reshape(1, D).astype(jnp.float32),
      be.reshape(1, D).astype(jnp.float32))


def mha_fused_res_ln_apply(params, p_ln, x: Array, residual: Array,
                           lengths: Array, n_heads: int, *,
                           interpret: bool = False) -> Array:
    """Post-LN FFT-block attention half on the deterministic path:
    ``LN(residual + out_proj(attention(x)))`` with the LN folded into the
    kernel epilogue (drop-in for mha_fused_res_apply followed by
    nn.layer_norm(norm1, .) when normalize_before=False). tp=1 only, like
    mha_fused_res_apply."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.precision import current_compute_dtype
    from fastspeech2_tpu.parallel.sharding import (current_tp_mesh,
                                                   data_shard_map)

    dt = current_compute_dtype() or x.dtype

    def proj(p):
        return nn.linear(p, x, out_dtype=dt)

    q, k, v = proj(params["q"]), proj(params["k"]), proj(params["v"])
    wo = params["out"]["w"].astype(dt)
    bo = params["out"]["b"].reshape(1, -1)

    def call(q, k, v, res, lens, wo, bo, g, be):
        return fused_attention_packed_res_ln(q, k, v, res, wo, bo, g, be,
                                             lens, n_heads,
                                             interpret=interpret)

    mesh = current_tp_mesh()
    if mesh is not None:
        call = data_shard_map(call, mesh, batched=(0, 1, 2, 3, 4))
    return call(q, k, v, residual, lengths, wo, bo, p_ln["g"], p_ln["b"])


def _attn_kernel_packed_qkv_res_ln(len_ref, x_ref, wq_ref, wk_ref, wv_ref,
                                   bqkv_ref, wo_ref, bo_ref, g_ref, be_ref,
                                   o_ref, k_s, v_s, o_scr, *, scale: float,
                                   block_q: int, n_heads: int, eps: float):
    """:func:`_attn_kernel_packed_res_ln` with the QKV projections folded in.

    Valid for post-LN blocks only, where the attention input and the
    residual stream are the SAME tensor x (models/encoder.py fft_block,
    normalize_before=False -- the default config): the kernel reads x once
    per batch row and produces ``LN(x + out_proj(attention(xWq, xWk, xWv)))``
    -- the complete attention half of the block. K/V are projected into VMEM
    scratch at the first query block of each batch row and stay resident for
    the row's remaining blocks (the TPU grid is sequential, so scratch
    persists across grid steps); the q/k/v streams never exist in HBM at
    all. Projection numerics replicate ops/nn.py:linear under a compute
    dtype: MXU f32 accumulation rounded to the compute dtype, widened to f32
    for the bias add, rounded back."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    length = len_ref[b]
    cd = wo_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def proj(xc, w, bias):
        y = jax.lax.dot_general(
            xc, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(cd)
        return (y.astype(jnp.float32) + bias).astype(cd)

    @pl.when(qi == 0)
    def _project_kv():
        xc = x_ref[0].astype(cd)  # (T, D)
        k_s[:] = proj(xc, wk_ref[:], bqkv_ref[1:2])
        v_s[:] = proj(xc, wv_ref[:], bqkv_ref[2:3])

    def ln(t):
        from fastspeech2_tpu.ops.pallas.common import ln_tile

        return ln_tile(t, g_ref, be_ref, eps)

    res = x_ref[0, pl.ds(qi * block_q, block_q)]  # (block_q, D) f32

    @pl.when(qi * block_q >= length)
    def _dead_block():
        o_ref[0] = ln(res.astype(jnp.float32) + bo_ref[0]).astype(o_ref.dtype)

    @pl.when(qi * block_q < length)
    def _live_block():
        q = proj(res.astype(cd), wq_ref[:], bqkv_ref[0:1])
        out = _attn_res_tile(q, k_s[:], v_s[:], res, wo_ref, bo_ref, o_scr,
                             length, qi, scale=scale, block_q=block_q,
                             n_heads=n_heads, prec=prec, cd=cd)
        o_ref[0] = ln(out).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "eps", "interpret", "block_q"))
def fused_attention_packed_qkv_res_ln(x: Array, wq: Array, wk: Array,
                                      wv: Array, bqkv: Array,
                                      wo: Array, bo: Array, g: Array,
                                      be: Array, lengths: Array, n_heads: int,
                                      *, eps: float = 1e-5,
                                      interpret: bool = False,
                                      block_q: int | None = None) -> Array:
    """Post-LN FFT-block attention half with in-kernel QKV projections:
    ``LN(x + out_proj(attention(xWq, xWk, xWv)))`` in ONE kernel.

    Args:
        x: (B, T, D) f32 block input == residual stream (post-LN only).
        wq/wk/wv: (D, D) projection weights in the compute dtype -- passed
            as three separate inputs so no per-call stacking copy exists
            in the serving program (the weight tiles ride straight from
            the params tree into VMEM).
        bqkv: (3, D) f32 stacked projection biases (4.6 KB -- the stack is
            noise next to the weight tiles).
        wo/bo/g/be: out projection + LayerNorm params as in
            :func:`fused_attention_packed_res_ln`.
    """
    B, T, D = x.shape
    assert D % n_heads == 0, (D, n_heads)
    dk = D // n_heads
    scale = 1.0 / float(np.sqrt(dk))
    bq = block_q if block_q is not None else _pick_block_q_adaptive(T)
    assert T % bq == 0, (T, bq)
    cd = wo.dtype
    xspec = pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, bq, D), lambda b, i, lens: (b, i, 0),
                         memory_space=pltpu.VMEM)
    bqkvspec = pl.BlockSpec((3, D), lambda b, i, lens: (0, 0),
                            memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((D, D), lambda b, i, lens: (0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, D), lambda b, i, lens: (0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T // bq),
        in_specs=[xspec, wspec, wspec, wspec, bqkvspec, wspec, bspec, bspec,
                  bspec],
        out_specs=ospec,
        scratch_shapes=[pltpu.VMEM((T, D), cd), pltpu.VMEM((T, D), cd),
                        pltpu.VMEM((bq, D), cd)],
    )
    kernel = functools.partial(_attn_kernel_packed_qkv_res_ln, scale=scale,
                               block_q=bq, n_heads=n_heads, eps=eps)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (n_heads * T * T * dk * 2 + 4 * T * D * D),
            bytes_accessed=2 * B * T * D * 4 + 4 * D * D * 2,
            transcendentals=B * n_heads * T * T,
        ),
    )(lengths.astype(jnp.int32), x.astype(jnp.float32),
      wq.astype(cd), wk.astype(cd), wv.astype(cd),
      bqkv.astype(jnp.float32), wo, bo.astype(jnp.float32),
      g.reshape(1, D).astype(jnp.float32),
      be.reshape(1, D).astype(jnp.float32))


def _qkv_fold_vmem_ok(T: int, D: int, cd) -> bool:
    """Does the QKV-folded kernel's resident VMEM fit at (T, D)?

    The fold keeps a full-row f32 x block, two (T, D) K/V scratches in the
    compute dtype, four (D, D) weight tiles, an o_scr/out tile and ~2 live
    (bq, T) f32 score copies resident at once. The re-bucket ladder grows T
    lazily in the serving delivery thread (infer/synthesize.py:_grow_l_pad),
    so an over-budget shape would surface as a runtime Mosaic compile error
    on a long utterance -- guard here and fall back to the split path (which
    holds no whole-row x or K/V scratch) instead. Default max_frames=2048 at
    D=384 bf16 is ~12 MB (fits); a user-raised 4096 re-bucket is ~18 MB
    (falls back)."""
    cdb = jnp.dtype(cd).itemsize
    bq = _pick_block_q_adaptive(T)
    resident = (T * D * 4 + 2 * T * D * cdb + 4 * D * D * cdb
                + bq * D * (cdb + 4) + 2 * bq * T * 4)
    return resident <= 14 * 2**20


def mha_fused_block_ln_apply(params, p_ln, x: Array, lengths: Array,
                             n_heads: int, *, interpret: bool = False) -> Array:
    """Post-LN FFT-block attention half with EVERYTHING in one kernel:
    QKV projections + attention + out projection + residual + LayerNorm,
    reading the block input x exactly once (drop-in for
    mha_fused_res_ln_apply on post-LN blocks; tp=1 only -- the projections
    are Megatron-sharded under TP)."""
    from fastspeech2_tpu.ops.precision import current_compute_dtype
    from fastspeech2_tpu.parallel.sharding import (current_tp_mesh,
                                                   data_shard_map)

    dt = current_compute_dtype() or x.dtype
    if not _qkv_fold_vmem_ok(x.shape[1], x.shape[2], dt):
        # split path: XLA QKV projections + fused [attn -> out -> +res -> LN]
        return mha_fused_res_ln_apply(params, p_ln, x, x, lengths, n_heads,
                                      interpret=interpret)
    wq = params["q"]["w"].astype(dt)
    wk = params["k"]["w"].astype(dt)
    wv = params["v"]["w"].astype(dt)
    bqkv = jnp.stack([params["q"]["b"], params["k"]["b"], params["v"]["b"]])
    wo = params["out"]["w"].astype(dt)
    bo = params["out"]["b"].reshape(1, -1)

    def call(x, lens, wq, wk, wv, bqkv, wo, bo, g, be):
        return fused_attention_packed_qkv_res_ln(
            x, wq, wk, wv, bqkv, wo, bo, g, be, lens, n_heads,
            interpret=interpret)

    mesh = current_tp_mesh()
    if mesh is not None:
        call = data_shard_map(call, mesh, batched=(0, 1))
    return call(x, lengths, wq, wk, wv, bqkv, wo, bo, p_ln["g"], p_ln["b"])


def fused_attention_packed_tp(q: Array, k: Array, v: Array, lengths: Array,
                              n_heads: int, mesh, *,
                              interpret: bool = False,
                              block_q: int | None = None) -> Array:
    """:func:`fused_attention_packed` partitioned over a device mesh via
    ``shard_map``: the batch axis shards over 'data' and -- under Megatron
    tensor parallelism -- the head-packed D axis shards over 'model', each
    shard computing its own whole heads (the D shard boundary IS a head
    boundary when tp | n_heads). Either axis may be absent from the mesh.

    GSPMD treats the kernel's custom call as opaque: without this wrapper it
    ALL-GATHERS the full batch onto every device and slices the result
    (measured 18 all-gathers in the compiled module on an 8-device data
    mesh), destroying data-parallel scaling. The shard_map makes the
    partitioning explicit and communication-free -- per-(batch, head) work is
    independent; under TP the psum stays where Megatron puts it, in the
    row-parallel output projection (parallel/sharding.py rules)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from fastspeech2_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS

    names = mesh.axis_names
    d_ax = DATA_AXIS if DATA_AXIS in names else None
    m_ax = MODEL_AXIS if MODEL_AXIS in names else None
    tp = int(mesh.shape[m_ax]) if m_ax else 1
    assert n_heads % tp == 0, (n_heads, tp)
    spec = P(d_ax, None, m_ax)

    def inner(q, k, v, lens):
        return fused_attention_packed(q, k, v, lens, n_heads // tp,
                                      interpret=interpret, block_q=block_q)

    return shard_map(inner, mesh=mesh,
                     in_specs=(spec, spec, spec, P(d_ax)),
                     out_specs=spec, check_vma=False)(q, k, v, lengths)


def mha_fused_apply(params, x: Array, lengths: Array, n_heads: int,
                    *, interpret: bool = False) -> Array:
    """Full MHA (QKV projections + fused kernel + output projection) for the
    self-attention case. Drop-in for ops.attention.mha_apply on the
    deterministic path when a lengths vector describes the mask.

    Under a bf16 compute dtype the projections emit bf16 so the kernel's QK
    and PV matmuls run at full MXU rate, with the softmax kept in f32
    (flash-attention-style numerics).

    Under an active tensor_parallel_attention context (head-divisible tp) the
    kernel is shard_mapped over the 'model' axis -- the projections stay
    plain matmuls that GSPMD shards per the Megatron rules."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.precision import current_compute_dtype
    from fastspeech2_tpu.parallel.sharding import current_tp_mesh, tp_degree

    dt = current_compute_dtype() or x.dtype

    def proj(p):
        return nn.linear(p, x, out_dtype=dt)

    q, k, v = proj(params["q"]), proj(params["k"]), proj(params["v"])
    mesh = current_tp_mesh()
    if mesh is not None:
        o = fused_attention_packed_tp(q, k, v, lengths, n_heads, mesh,
                                      interpret=interpret)
    else:
        o = fused_attention_packed(q, k, v, lengths, n_heads,
                                   interpret=interpret)
    return nn.linear(params["out"], o, out_dtype=x.dtype)
