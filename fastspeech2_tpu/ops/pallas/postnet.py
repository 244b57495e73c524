"""Fused, length-adaptive Tacotron-2 postnet as a Pallas TPU kernel.

The postnet (models/postnet.py, reference core/modules.py:251-359) is
n_layers chained [Conv1d(k=5, no bias) -> BatchNorm1d -> Tanh] stages (no
Tanh on the last) applied residually to the mel. The XLA path runs each
stage as a separate conv + BN + mask pass over the padded (B, L, C) buffer;
here the whole chain stays VMEM-resident per (batch row, time block): each
conv consumes its predecessor's registers (taps as shifted value-slice
matmuls), with the per-stage conv_mask re-zeroing applied in-register.

Blocks need a halo of sum_i (k_i-1)/2 rows per side (10 rows for 5 stages of
k=5); the input rides in once through a zero-padded whole-sequence scratch.
Time blocks entirely past a sequence's true length + halo short-circuit to
the constant all-zero-input BN affine row of the final stage -- FLOPs scale
with true lengths, not the padded buffer.

Numerics replicate the XLA chain under a bf16 compute dtype: conv operands
in cd with f32 MXU accumulation rounded to cd (the conv output) and widened
back to f32, BatchNorm evaluated in inference form ((x - mean) * rsqrt(var +
eps) * g + b, same association order as ops/nn.py:batch_norm), tanh in f32.
Deterministic (serving) path only; training keeps XLA (BN batch statistics +
dropout need the unfused graph).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastspeech2_tpu.ops.pallas.common import pick_block_t

Array = jax.Array


def _postnet_kernel(len_ref, x_ref, *args, n_layers: int, kernel: int,
                    block_t: int, cd):
    # args: w_0..w_{n-1}, mean_0.., inv_0.., g_0.., b_0.., o_ref, xpad_ref
    w_refs = args[:n_layers]
    mean_refs = args[n_layers:2 * n_layers]
    inv_refs = args[2 * n_layers:3 * n_layers]
    g_refs = args[3 * n_layers:4 * n_layers]
    b_refs = args[4 * n_layers:5 * n_layers]
    o_ref = args[5 * n_layers]
    xpad_ref = args[5 * n_layers + 1]

    b = pl.program_id(0)
    ti = pl.program_id(1)
    length = len_ref[b]
    L, C_in = x_ref.shape[1], x_ref.shape[2]
    pad = (kernel - 1) // 2
    halo = n_layers * pad
    t0 = ti * block_t

    @pl.when(ti == 0)
    def _fill_scratch():
        row = jax.lax.broadcasted_iota(jnp.int32, (L, C_in), 0)
        xpad_ref[halo:halo + L] = jnp.where(row < length, x_ref[0],
                                            0.0).astype(cd)
        zeros = jnp.zeros((halo, C_in), xpad_ref.dtype)
        xpad_ref[:halo] = zeros
        xpad_ref[halo + L:] = zeros

    def bn(h, i):
        # ops/nn.py:batch_norm inference form, same association order
        return (h - mean_refs[i][0]) * inv_refs[i][0] * g_refs[i][0] \
            + b_refs[i][0]

    @pl.when(t0 < length + halo)
    def _live_block():
        # rows [t0 - halo, t0 + block_t + halo) of x == scratch rows
        # [t0, t0 + block_t + 2*halo)
        v = xpad_ref[pl.ds(t0, block_t + 2 * halo)]
        rows = block_t + 2 * halo
        for i in range(n_layers):
            rows -= 2 * pad
            acc = jnp.zeros((rows, w_refs[i].shape[2]), jnp.float32)
            for j in range(kernel):
                acc += jax.lax.dot_general(
                    v[j:j + rows], w_refs[i][j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            h = bn(acc.astype(cd).astype(jnp.float32), i)
            if i < n_layers - 1:
                h = jnp.tanh(h)
                # conv_mask re-zeroing before the next conv: element e of v
                # is x row t0 - halo + (i+1)*pad*... -> base + e
                base = t0 - halo + (i + 1) * pad
                row = base + jax.lax.broadcasted_iota(
                    jnp.int32, h.shape, 0)
                # row < 0: halo rows before t=0 are implicit SAME zeros at
                # EVERY conv in the XLA chain, not BN-shifted values
                v = jnp.where((row >= 0) & (row < length), h,
                              0.0).astype(cd)
            else:
                o_ref[0] = h.astype(o_ref.dtype)

    @pl.when(t0 >= length + halo)
    def _dead_block():
        # all-zero input everywhere: each stage's input is re-masked to
        # zero, so the output is the final stage's zero-input BN affine row
        C_out = w_refs[n_layers - 1].shape[2]
        row = bn(jnp.zeros((1, C_out), jnp.float32), n_layers - 1)
        o_ref[0] = jnp.broadcast_to(row.astype(o_ref.dtype),
                                    (block_t, C_out))


@functools.partial(jax.jit, static_argnames=("interpret", "block_t",
                                             "cd"))
def fused_postnet(x: Array, weights, means, invs, gs, bs, lengths: Array,
                  *, cd=jnp.bfloat16, interpret: bool = False,
                  block_t: int | None = None) -> Array:
    """x (B, L, odim) f32 -> postnet residual (B, L, odim) f32.

    weights: list of (k, C_in, C_out) conv kernels (no bias); means/invs/
    gs/bs: per-stage BatchNorm running mean, rsqrt(var+eps), gamma, beta.
    """
    B, L, C = x.shape
    n_layers = len(weights)
    k = weights[0].shape[0]
    assert all(w.shape[0] == k for w in weights), [w.shape for w in weights]
    assert k % 2 == 1, k
    pad = (k - 1) // 2
    halo = n_layers * pad
    if block_t is None:
        # larger-first than the shared pick_block_t default: the postnet's
        # 10-row halo (5 stages x k=5) is recomputed per block, so bigger
        # blocks amortize it -- measured on v5e at the bench shape (L=896,
        # true lengths ~479): bt=224 288.5 us vs 128 337.9 / 64 422.2 /
        # 448 339.6 / 896 407.1 (scripts/measure_block_tunes.py, r4) --
        # past 224 the dead-block length-skipping loss outweighs the halo
        # amortization. 256/192 cover the r5 demand rungs (256-multiples,
        # where 224 doesn't divide): at L=768 bt=256 measured 291.7 us vs
        # 128's 328.1 (scripts/measure_rung_blocks.py, r5; FFN blocks
        # re-measured there too -- 128 stays its optimum).
        block_t = pick_block_t(L, candidates=(224, 256, 192, 128, 64, 32,
                                              16, 8))
    assert L % block_t == 0, (L, block_t)

    xspec = pl.BlockSpec((1, L, C), lambda b, i, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(s):
        return pl.BlockSpec(s, lambda b, i, lens: (0,) * len(s),
                            memory_space=pltpu.VMEM)

    C_out = weights[-1].shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, L // block_t),
        in_specs=([xspec] + [wspec(w.shape) for w in weights]
                  + [wspec((1, m.shape[0])) for m in means]
                  + [wspec((1, v.shape[0])) for v in invs]
                  + [wspec((1, g.shape[0])) for g in gs]
                  + [wspec((1, b.shape[0])) for b in bs]),
        out_specs=pl.BlockSpec((1, block_t, C_out),
                               lambda b, i, lens: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L + 2 * halo, C), cd)],
    )
    kern = functools.partial(_postnet_kernel, n_layers=n_layers, kernel=k,
                             block_t=block_t, cd=cd)
    flops = 2 * B * L * sum(k * w.shape[1] * w.shape[2] for w in weights)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, C_out), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * L * (C + C_out) * 4,
            transcendentals=B * L * (n_layers - 1) * C,
        ),
    )(lengths.astype(jnp.int32), x,
      *[w.astype(cd) for w in weights],
      *[m.reshape(1, -1).astype(jnp.float32) for m in means],
      *[v.reshape(1, -1).astype(jnp.float32) for v in invs],
      *[g.reshape(1, -1).astype(jnp.float32) for g in gs],
      *[b.reshape(1, -1).astype(jnp.float32) for b in bs])


def postnet_fused_apply(params, state, cfg, xs: Array, lengths: Array, *,
                        interpret: bool = False) -> Array:
    """Drop-in for models.postnet.postnet_apply on the deterministic
    (inference) path with batch norm, under a bf16 compute dtype. Returns
    the residual only (state is unchanged at inference)."""
    from fastspeech2_tpu.ops.precision import current_compute_dtype

    dt = current_compute_dtype() or xs.dtype
    eps = 1e-5
    weights = [layer["conv"]["w"] for layer in params["layers"]]
    means = [s["mean"] for s in state["bn"]]
    invs = [jax.lax.rsqrt(s["var"] + eps) for s in state["bn"]]
    gs = [layer["bn"]["g"] for layer in params["layers"]]
    bs = [layer["bn"]["b"] for layer in params["layers"]]

    from fastspeech2_tpu.parallel.sharding import (current_tp_mesh,
                                                   data_shard_map)

    def call(xs, weights, means, invs, gs, bs, lens):
        return fused_postnet(xs, weights, means, invs, gs, bs, lens,
                             cd=dt, interpret=interpret)

    mesh = current_tp_mesh()
    if mesh is not None:
        call = data_shard_map(call, mesh, batched=(0, 6))
    return call(xs.astype(jnp.float32), weights, means, invs, gs, bs, lengths)
