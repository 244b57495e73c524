"""Fused, length-adaptive conv-FFN (FastSpeech position-wise module) as a
Pallas TPU kernel.

The reference FFN is Conv1d(k=9, D->H) -> ReLU -> Conv1d(k=1, H->D)
(core/modules.py:204-248). XLA's implicit-GEMM conv already runs at the v5e
bf16 MXU roofline (~195 TF/s), so a fused kernel cannot beat it on padded
FLOPs -- but it CAN skip them: serving batches are padded to a static frame
capacity and only ~half the rows are real (bench workload: 53% occupancy).
This kernel blocks over time and, for any block entirely past a sequence's
true length (all conv taps zero), emits the constant bias-only row directly
-- one (1, H) x (H, D) matmul instead of (k+1) (block_t, ...) matmuls. FLOPs
scale with true lengths, not the padded buffer.

Within live blocks, the k=9 conv is k shifted (block_t, D) x (D, H) matmuls
over a zero-padded whole-sequence VMEM scratch (no im2col materialization),
then ReLU, then the k=1 conv as one matmul; the (T, H) hidden activation --
the largest tensor in the model -- never round-trips HBM.

Sequence lengths ride in as scalar prefetch: rows at or beyond a sequence's
true length are zeroed when the scratch is filled, which reproduces
ffn_apply's conv_mask semantics (zero conv inputs past the true length ==
torch's implicit SAME zero padding on unpadded inputs), and the halo rows
around t=0 / t=T are zero like SAME padding.

Numerics replicate ops/nn.py:conv1d's bf16 compute-dtype path: MXU f32
accumulation rounded to bf16 (the conv output), widened to f32 for the bias
add, rounded back to bf16, ReLU in bf16. Used on the deterministic (serving)
path under the bf16 speed config only -- the f32 parity path keeps the XLA
convs (full-precision dots), and training keeps XLA for the FFN VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastspeech2_tpu.ops.pallas.common import ln_tile, pick_block_t

Array = jax.Array


def _ffn_kernel(len_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                xpad_ref, *, kernel: int, block_t: int, out_dtype):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    length = len_ref[b]
    T, D = x_ref.shape[1], x_ref.shape[2]
    H = w1_ref.shape[2]
    pad = (kernel - 1) // 2
    cd = x_ref.dtype  # compute dtype (bf16 on the speed path)
    t0 = ti * block_t

    @pl.when(ti == 0)
    def _fill_scratch():
        row = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
        xpad_ref[pad:pad + T] = jnp.where(row < length, x_ref[0], 0)
        if pad:
            zeros = jnp.zeros((pad, D), xpad_ref.dtype)
            xpad_ref[:pad] = zeros
            xpad_ref[pad + T:] = zeros

    def conv_out(v, bias):
        # nn.conv1d bit-pattern: conv emits cd, widen to f32 for the bias
        # add (the caller rounds to the conv's out_dtype)
        return v.astype(cd).astype(jnp.float32) + bias

    @pl.when(t0 < length + pad)
    def _live_block():
        # one aligned dynamic load of block+halo (t0 is 8-aligned; Mosaic
        # rejects dynamic sublane starts like t0+j), then static value
        # slices per tap -- in-register shifts
        xw = xpad_ref[pl.ds(t0, block_t + 2 * pad)]
        acc = jnp.zeros((block_t, H), jnp.float32)
        for j in range(kernel):
            # rows t0+j-pad .. t0+j-pad+block_t of x, zeros outside
            acc += jax.lax.dot_general(
                xw[j:j + block_t], w1_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        h = jax.nn.relu(conv_out(acc, b1_ref[0]).astype(cd))
        y = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = conv_out(y, b2_ref[0]).astype(out_dtype)

    @pl.when(t0 >= length + pad)
    def _dead_block():
        # every conv tap is zero: the whole block is the constant bias row
        h = jax.nn.relu(conv_out(jnp.zeros((1, H), jnp.float32),
                                 b1_ref[0]).astype(cd))
        y = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        row = conv_out(y, b2_ref[0]).astype(out_dtype)
        o_ref[0] = jnp.broadcast_to(row, (block_t, w2_ref.shape[2]))


@functools.partial(jax.jit, static_argnames=("interpret", "block_t",
                                             "out_dtype"))
def fused_ffn(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
              lengths: Array, *, out_dtype=None, interpret: bool = False,
              block_t: int | None = None) -> Array:
    """(B, T, D) x + (k, D, H)/(H,) + (1, H, O)/(O,) conv-FFN -> (B, T, O).

    Rows >= lengths[b] are zeroed on input (conv_mask semantics); output rows
    there carry only the bias terms, exactly like the XLA path on a masked
    input.
    """
    B, T, D = x.shape
    k, _, H = w1.shape
    O = w2.shape[2]
    assert w2.shape[0] == 1 and w2.shape[1] == H, w2.shape
    out_dtype = out_dtype or x.dtype
    if block_t is None:
        block_t = pick_block_t(T)
    assert T % block_t == 0, (T, block_t)
    pad = (k - 1) // 2

    xspec = pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(s):
        return pl.BlockSpec(s, lambda b, i, lens: (0,) * len(s),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T // block_t),
        in_specs=[xspec, wspec(w1.shape), wspec((1, H)), wspec(w2.shape),
                  wspec((1, O))],
        out_specs=pl.BlockSpec((1, block_t, O), lambda b, i, lens: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T + 2 * pad, D), x.dtype)],
    )
    kern = functools.partial(_ffn_kernel, kernel=k, block_t=block_t,
                             out_dtype=out_dtype)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, O), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (k * D * H + H * O),
            bytes_accessed=(B * T * (D + O) * 2
                            + (k * D * H + H * O) * 2),
            transcendentals=0,
        ),
    )(lengths.astype(jnp.int32), x, w1,
      b1.reshape(1, H).astype(jnp.float32), w2,
      b2.reshape(1, O).astype(jnp.float32))


def ffn_fused_apply(p, x: Array, lengths: Array, *, out_dtype=None,
                    interpret: bool = False) -> Array:
    """Drop-in for models.encoder.ffn_apply (conv1d variant, deterministic
    path) under a bf16 compute dtype: casts operands like ops/nn.py then runs
    the fused kernel."""
    from fastspeech2_tpu.ops.precision import current_compute_dtype
    from fastspeech2_tpu.parallel.sharding import (current_tp_mesh,
                                                   data_shard_map)

    dt = current_compute_dtype() or x.dtype

    def call(x, w1, b1, w2, b2, lens):
        return fused_ffn(x, w1, b1, w2, b2, lens,
                         out_dtype=out_dtype or x.dtype, interpret=interpret)

    mesh = current_tp_mesh()
    if mesh is not None:
        call = data_shard_map(call, mesh, batched=(0, 5))
    return call(x.astype(dt), p["w1"]["w"].astype(dt), p["w1"]["b"],
                p["w2"]["w"].astype(dt), p["w2"]["b"], lengths)


def _ffn_block_kernel(len_ref, x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, xpad_ref, *, kernel: int, block_t: int,
                      eps: float, cd):
    """Pre-LN FFT-block second half: o = x + FFN(mask(LN(x)))."""
    b = pl.program_id(0)
    ti = pl.program_id(1)
    length = len_ref[b]
    T, D = x_ref.shape[1], x_ref.shape[2]
    H = w1_ref.shape[2]
    pad = (kernel - 1) // 2
    t0 = ti * block_t

    @pl.when(ti == 0)
    def _fill_scratch():
        # LayerNorm (f32, torch biased-variance semantics) -> conv_mask
        # zeroing -> compute-dtype cast, whole sequence once per batch row
        y = ln_tile(x_ref[0], g_ref, be_ref, eps)
        row = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
        xpad_ref[pad:pad + T] = jnp.where(row < length, y, 0.0).astype(cd)
        if pad:
            zeros = jnp.zeros((pad, D), xpad_ref.dtype)
            xpad_ref[:pad] = zeros
            xpad_ref[pad + T:] = zeros

    def conv_out(v, bias):
        return v.astype(cd).astype(jnp.float32) + bias

    @pl.when(t0 < length + pad)
    def _live_block():
        xw = xpad_ref[pl.ds(t0, block_t + 2 * pad)]
        acc = jnp.zeros((block_t, H), jnp.float32)
        for j in range(kernel):
            acc += jax.lax.dot_general(
                xw[j:j + block_t], w1_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        h = jax.nn.relu(conv_out(acc, b1_ref[0]).astype(cd))
        y = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # conv2's out_dtype is the (f32) stream dtype: no cd rounding
        o_ref[0] = x_ref[0, pl.ds(t0, block_t)] + conv_out(y, b2_ref[0])

    @pl.when(t0 >= length + pad)
    def _dead_block():
        h = jax.nn.relu(conv_out(jnp.zeros((1, H), jnp.float32),
                                 b1_ref[0]).astype(cd))
        y = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = x_ref[0, pl.ds(t0, block_t)] + conv_out(y, b2_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret", "block_t", "eps",
                                             "cd"))
def fused_ffn_block(x: Array, g: Array, beta: Array, w1: Array, b1: Array,
                    w2: Array, b2: Array, lengths: Array, *, eps: float = 1e-5,
                    cd=jnp.bfloat16, interpret: bool = False,
                    block_t: int | None = None) -> Array:
    """x (B, T, D) f32 residual stream -> x + conv-FFN(mask(LN(x))).

    Fuses the pre-LN FFT-block second half (models/encoder.py: norm2 ->
    ffn_apply -> residual add) into one kernel: the separate f32 LayerNorm
    pass over the (B, T, D) stream, the conv-mask select, the bf16 casts and
    the residual add all disappear into VMEM. Same length-adaptive dead-block
    skipping as :func:`fused_ffn`.
    """
    B, T, D = x.shape
    k, _, H = w1.shape
    assert w2.shape == (1, H, D), (w2.shape, x.shape)
    if block_t is None:
        block_t = pick_block_t(T)
    assert T % block_t == 0, (T, block_t)
    pad = (k - 1) // 2

    xspec = pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(s):
        return pl.BlockSpec(s, lambda b, i, lens: (0,) * len(s),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T // block_t),
        in_specs=[xspec, wspec((1, D)), wspec((1, D)), wspec(w1.shape),
                  wspec((1, H)), wspec(w2.shape), wspec((1, D))],
        out_specs=pl.BlockSpec((1, block_t, D), lambda b, i, lens: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T + 2 * pad, D), cd)],
    )
    kern = functools.partial(_ffn_block_kernel, kernel=k, block_t=block_t,
                             eps=eps, cd=cd)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (k * D * H + H * D),
            bytes_accessed=B * T * D * 8 + (k * D * H + H * D) * 2,
            transcendentals=0,
        ),
    )(lengths.astype(jnp.int32), x,
      g.reshape(1, D).astype(jnp.float32),
      beta.reshape(1, D).astype(jnp.float32),
      w1, b1.reshape(1, H).astype(jnp.float32),
      w2, b2.reshape(1, D).astype(jnp.float32))


def _ffn_block_post_kernel(len_ref, x_ref, g_ref, be_ref, w1_ref, b1_ref,
                           w2_ref, b2_ref, o_ref, xpad_ref, *, kernel: int,
                           block_t: int, eps: float, cd):
    """Post-LN FFT-block second half: o = LN(x + FFN(mask(x))).

    The default (normalize_before=False) twin of :func:`_ffn_block_kernel`:
    no LN on the conv input (the stream was normalized by the attention
    half), and the trailing residual add + LayerNorm -- two full (B, T, D)
    f32 HBM round-trips as XLA fusions -- fold into the block epilogue. LN
    is row-wise over D, so it needs no halo and runs on the VMEM-resident
    output tile (f32, torch biased-variance, the ops/nn.py:layer_norm
    formula). Rows past the true length come out as LN(x + bias_row),
    exactly like the XLA chain on a conv-masked input."""
    b = pl.program_id(0)
    ti = pl.program_id(1)
    length = len_ref[b]
    T, D = x_ref.shape[1], x_ref.shape[2]
    H = w1_ref.shape[2]
    pad = (kernel - 1) // 2
    t0 = ti * block_t

    @pl.when(ti == 0)
    def _fill_scratch():
        row = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
        xpad_ref[pad:pad + T] = jnp.where(row < length,
                                          x_ref[0], 0.0).astype(cd)
        if pad:
            zeros = jnp.zeros((pad, D), xpad_ref.dtype)
            xpad_ref[:pad] = zeros
            xpad_ref[pad + T:] = zeros

    def conv_out(v, bias):
        return v.astype(cd).astype(jnp.float32) + bias

    def ln(t):
        return ln_tile(t, g_ref, be_ref, eps)

    @pl.when(t0 < length + pad)
    def _live_block():
        xw = xpad_ref[pl.ds(t0, block_t + 2 * pad)]
        acc = jnp.zeros((block_t, H), jnp.float32)
        for j in range(kernel):
            acc += jax.lax.dot_general(
                xw[j:j + block_t], w1_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        h = jax.nn.relu(conv_out(acc, b1_ref[0]).astype(cd))
        y = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = ln(x_ref[0, pl.ds(t0, block_t)] + conv_out(y, b2_ref[0]))

    @pl.when(t0 >= length + pad)
    def _dead_block():
        h = jax.nn.relu(conv_out(jnp.zeros((1, H), jnp.float32),
                                 b1_ref[0]).astype(cd))
        y = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = ln(x_ref[0, pl.ds(t0, block_t)] + conv_out(y, b2_ref[0]))


@functools.partial(jax.jit, static_argnames=("interpret", "block_t", "eps",
                                             "cd"))
def fused_ffn_block_post(x: Array, g: Array, beta: Array, w1: Array,
                         b1: Array, w2: Array, b2: Array, lengths: Array, *,
                         eps: float = 1e-5, cd=jnp.bfloat16,
                         interpret: bool = False,
                         block_t: int | None = None) -> Array:
    """x (B, T, D) f32 stream -> LN(x + conv-FFN(mask(x))) -- the post-LN
    FFT-block second half in one kernel (see _ffn_block_post_kernel)."""
    B, T, D = x.shape
    k, _, H = w1.shape
    assert w2.shape == (1, H, D), (w2.shape, x.shape)
    if block_t is None:
        block_t = pick_block_t(T)
    assert T % block_t == 0, (T, block_t)
    pad = (k - 1) // 2

    xspec = pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(s):
        return pl.BlockSpec(s, lambda b, i, lens: (0,) * len(s),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T // block_t),
        in_specs=[xspec, wspec((1, D)), wspec((1, D)), wspec(w1.shape),
                  wspec((1, H)), wspec(w2.shape), wspec((1, D))],
        out_specs=pl.BlockSpec((1, block_t, D), lambda b, i, lens: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T + 2 * pad, D), cd)],
    )
    kern = functools.partial(_ffn_block_post_kernel, kernel=k,
                             block_t=block_t, eps=eps, cd=cd)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (k * D * H + H * D),
            bytes_accessed=B * T * D * 8 + (k * D * H + H * D) * 2,
            transcendentals=0,
        ),
    )(lengths.astype(jnp.int32), x.astype(jnp.float32),
      g.reshape(1, D).astype(jnp.float32),
      beta.reshape(1, D).astype(jnp.float32),
      w1, b1.reshape(1, H).astype(jnp.float32),
      w2, b2.reshape(1, D).astype(jnp.float32))


def ffn_block_post_apply(p_ln, p_ffn, x: Array, lengths: Array, *,
                         interpret: bool = False) -> Array:
    """Drop-in for the deterministic POST-LN block tail
    ``LN(x + ffn_apply(p_ffn, x, conv_mask))`` under a bf16 compute dtype."""
    from fastspeech2_tpu.ops.precision import current_compute_dtype
    from fastspeech2_tpu.parallel.sharding import (current_tp_mesh,
                                                   data_shard_map)

    dt = current_compute_dtype() or x.dtype

    def call(x, g, b, w1, b1, w2, b2, lens):
        return fused_ffn_block_post(x, g, b, w1, b1, w2, b2, lens,
                                    cd=dt, interpret=interpret)

    mesh = current_tp_mesh()
    if mesh is not None:
        call = data_shard_map(call, mesh, batched=(0, 7))
    return call(
        x.astype(jnp.float32), p_ln["g"], p_ln["b"],
        p_ffn["w1"]["w"].astype(dt), p_ffn["w1"]["b"],
        p_ffn["w2"]["w"].astype(dt), p_ffn["w2"]["b"], lengths).astype(x.dtype)


def ffn_block_fused_apply(p_ln, p_ffn, x: Array, lengths: Array, *,
                          interpret: bool = False) -> Array:
    """Drop-in for the deterministic pre-LN block tail
    ``x + ffn_apply(p_ffn, LN(x), conv_mask)`` under a bf16 compute dtype."""
    from fastspeech2_tpu.ops.precision import current_compute_dtype
    from fastspeech2_tpu.parallel.sharding import (current_tp_mesh,
                                                   data_shard_map)

    dt = current_compute_dtype() or x.dtype

    def call(x, g, b, w1, b1, w2, b2, lens):
        return fused_ffn_block(x, g, b, w1, b1, w2, b2, lens,
                               cd=dt, interpret=interpret)

    mesh = current_tp_mesh()
    if mesh is not None:
        call = data_shard_map(call, mesh, batched=(0, 7))
    return call(
        x.astype(jnp.float32), p_ln["g"], p_ln["b"],
        p_ffn["w1"]["w"].astype(dt), p_ffn["w1"]["b"],
        p_ffn["w2"]["w"].astype(dt), p_ffn["w2"]["b"], lengths).astype(x.dtype)
