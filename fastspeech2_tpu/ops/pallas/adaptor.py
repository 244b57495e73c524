"""Fused, length-adaptive variance adaptor (frame-level serving segment) as a
Pallas TPU kernel.

The serving step's inference path between the encoder and the decoder is a
chain of small frame-level ops over (B, L, D) tensors (reference
fastspeech.py:210-228): length-regulator expansion (gather), the pitch and
energy VariancePredictor conv stacks (core/variance_predictor.py:7-95),
bucketize + one-hot quantization (:154-159,227-232), the two 256->adim
embedding projections, and the residual adds. On the round-3 per-op profile
(PARITY.md) this segment is pure XLA residue: every intermediate -- the 29 MB
f32 expanded states, four conv outputs, LayerNorms, one-hots -- round-trips
HBM, and none of the ops individually exceeds 2% of the step.

This kernel runs the whole segment out of VMEM per batch row:

  expansion (one-hot selection matmul, f32-exact via Precision.HIGHEST)
  -> [pitch, energy] x (conv k=3 -> ReLU -> LN(1e-12) -> mask -> conv k=3
     -> ReLU -> LN -> linear head)
  -> bucketize (compare-count, identical formula to ops/quantize.bucketize)
  -> one-hot @ embedding table (MXU)
  -> hs + pitch_embed + energy_embed, frame-masked

with the same length-adaptive blocking as ops/pallas/ffn.py: blocks wholly
past a sequence's true length skip all FLOPs and emit zeros (the XLA path's
final frame-mask zeroes those rows too, so this is exact, not approximate).

Numerics replicate the XLA bf16 speed path op for op: conv/dot MXU f32
accumulation rounded to the compute dtype, widened to f32 for bias adds,
ReLU and LayerNorm in f32 (see ops/nn.py conv1d/linear). The expansion
residual is bit-exact (a one-hot f32 selection at HIGHEST precision ==
the gather). Inference-only: training quantizes ground-truth targets on a
different path and keeps XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastspeech2_tpu.ops.pallas.common import pick_block_t

Array = jax.Array


def _adaptor_kernel(len_ref, hs_ref, idx_ref, w1_ref, b1_ref, g1_ref, be1_ref,
                    w2_ref, b2_ref, g2_ref, be2_ref, wo_ref, bo_ref, bins_ref,
                    embw_ref, embb_ref, o_ref, raw_ref, e32_ref, xpad_ref, *,
                    kernel: int, block_l: int, cd, ln_eps: float):
    b = pl.program_id(0)
    li = pl.program_id(1)
    length = len_ref[b]
    T, D = hs_ref.shape[1], hs_ref.shape[2]
    L = idx_ref.shape[1]
    C = w1_ref.shape[3]
    nbins = bins_ref.shape[1]
    pad = (kernel - 1) // 2
    l0 = li * block_l

    @pl.when(li == 0)
    def _expand():
        # one-hot selection matmul == the regulate_length gather, f32-exact
        # at HIGHEST (Mosaic's default f32 dot is bf16-pass approximate)
        rows = jax.lax.broadcasted_iota(jnp.int32, (L, T), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)
        sel = ((cols == idx_ref[0]) & (rows < length)).astype(jnp.float32)
        e32_ref[:] = jax.lax.dot_general(
            sel, hs_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        xpad_ref[2 * pad:2 * pad + L] = e32_ref[:].astype(cd)
        if pad:
            zeros = jnp.zeros((2 * pad, D), xpad_ref.dtype)
            xpad_ref[:2 * pad] = zeros
            xpad_ref[2 * pad + L:] = zeros

    def conv_out(v, bias):
        # ops/nn.py conv1d/linear bit-pattern: MXU f32 accumulation rounded
        # to the compute dtype, widened to f32 for the bias add
        return v.astype(cd).astype(jnp.float32) + bias

    def ln(v, g, beta):
        mean = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mean), axis=-1, keepdims=True)
        return (v - mean) * jax.lax.rsqrt(var + ln_eps) * g + beta

    @pl.when(l0 < length)
    def _live_block():
        ext = block_l + 2 * pad
        # conv1 runs over an extended block (halo of `pad` rows each side) so
        # conv2's taps never cross a block boundary; xpad row r holds masked
        # expanded frame r - 2*pad, so extended row r maps to frame
        # l0 - pad + r
        xw = xpad_ref[pl.ds(l0, block_l + 4 * pad)]
        jrow = l0 - pad + jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0)
        live = (jrow >= 0) & (jrow < length)
        jctr = l0 + jax.lax.broadcasted_iota(jnp.int32, (block_l, 1), 0)
        in_len = jctr < length

        out = e32_ref[pl.ds(l0, block_l)]
        raws = []
        for p in range(2):  # 0 = pitch, 1 = energy (reference add order)
            acc = jnp.zeros((ext, C), jnp.float32)
            for j in range(kernel):
                acc += jax.lax.dot_general(
                    xw[j:j + ext], w1_ref[p, j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            h = ln(jax.nn.relu(conv_out(acc, b1_ref[p])), g1_ref[p],
                   be1_ref[p])
            # conv_mask before conv2 (predictor_apply re-masks each layer);
            # also zeroes the r = -1 phantom row of the first block
            h = jnp.where(live, h, 0.0).astype(cd)
            acc2 = jnp.zeros((block_l, C), jnp.float32)
            for j in range(kernel):
                acc2 += jax.lax.dot_general(
                    h[j:j + block_l], w2_ref[p, j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            h2 = ln(jax.nn.relu(conv_out(acc2, b2_ref[p])), g2_ref[p],
                    be2_ref[p])
            # scalar head: f32 products of compute-dtype values, sum rounded
            # like the XLA bf16 dot's result dtype, widened for the bias
            y = jnp.sum(h2.astype(cd).astype(jnp.float32)
                        * wo_ref[p].astype(jnp.float32), axis=-1,
                        keepdims=True)
            raw = conv_out(y, bo_ref[0, p])  # (block_l, 1) f32
            raws.append(jnp.where(in_len, raw, 0.0))
            # bucketize: #(bins < raw), 'left' semantics == ops/quantize;
            # the +inf pad lane never counts
            bidx = jnp.sum((bins_ref[p] < raw).astype(jnp.int32), axis=-1,
                           keepdims=True)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (block_l, nbins), 1)
                      == bidx).astype(cd)
            emb = jax.lax.dot_general(
                onehot, embw_ref[p], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out += conv_out(emb, embb_ref[p])
        o_ref[0] = jnp.where(in_len, out, 0.0)
        raw_ref[0] = jnp.concatenate(raws, axis=1).T  # (2, block_l)

    @pl.when(l0 >= length)
    def _dead_block():
        # the XLA path frame-masks hs2, and raw is defined as masked: zeros
        o_ref[0] = jnp.zeros((block_l, D), o_ref.dtype)
        raw_ref[0] = jnp.zeros((2, block_l), raw_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_l", "cd",
                                             "ln_eps"))
def fused_variance_adaptor(
    hs: Array, idx: Array, out_lens: Array, w1: Array, b1: Array, g1: Array,
    be1: Array, w2: Array, b2: Array, g2: Array, be2: Array, wo: Array,
    bo: Array, bins: Array, emb_w: Array, emb_b: Array, *,
    cd=jnp.float32, ln_eps: float = 1e-12, interpret: bool = False,
    block_l: int | None = None,
) -> tuple[Array, Array]:
    """Fused expansion + pitch/energy predictors + quantize/embed + residual.

    Args:
        hs: (B, T, D) f32 encoder states.
        idx: (B, L) int32 expansion indices
            (ops.length_regulator.expansion_indices).
        out_lens: (B,) int32 true frame lengths.
        w1/w2: (2, k, D|C, C) conv weights, [pitch, energy]-stacked, compute
            dtype; b1/b2 (2, C) f32 biases; g1/be1/g2/be2 (2, C) f32 LN
            params; wo (2, C) compute-dtype head weights, bo (1, 2) f32.
        bins: (2, n_bins) f32 bucket edges, last lane padded with +inf
            (n_bins - 1 real edges).
        emb_w: (2, n_bins, D) compute-dtype embedding tables, emb_b (2, D)
            f32.

    Returns:
        (hs2 (B, L, D) f32 -- expanded + pitch_embed + energy_embed, zeroed at
         frames >= out_lens; raw (B, 2, L) f32 -- predictor raw outputs
         [pitch, energy], zeroed at frames >= out_lens (the XLA path leaves
         boundary-spill junk there; both are discarded downstream)).
    """
    B, T, D = hs.shape
    L = idx.shape[1]
    two, k, _, C = w1.shape
    assert two == 2 and w2.shape == (2, k, C, C), (w1.shape, w2.shape)
    nbins = bins.shape[1]
    assert emb_w.shape == (2, nbins, D), emb_w.shape
    if block_l is None:
        # whole-row when VMEM stays comfortable: the (L, C) conv matmuls at
        # M=L utilize the MXU far better than M=128 blocks, outweighing the
        # dead-block length-skipping whole-row gives up (measured on v5e at
        # the bench shape: 454 -> 388 us/call, serving step -1.0%; PARITY.md
        # "Round-4 block-shape tunes"). The (B, 2, L) raw-output block's
        # last-dim constraint (%128 == 0 or == L) is trivially satisfied by
        # whole-row. Past L=1024 the f32 scratches approach the VMEM budget
        # and low-occupancy skipping matters more -- keep 128 blocks.
        block_l = L if L <= 1024 else pick_block_t(L)
    assert L % block_l == 0, (L, block_l)
    pad = (k - 1) // 2

    def wspec(s, space=pltpu.VMEM):
        return pl.BlockSpec(s, lambda b, i, lens: (0,) * len(s),
                            memory_space=space)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, L // block_l),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # idx rides as a column (L, 1) so the selection compare is
            # sublane-oriented without a lane->sublane relayout in-kernel
            pl.BlockSpec((1, L, 1), lambda b, i, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(w1.shape), wspec((2, C)), wspec((2, C)), wspec((2, C)),
            wspec(w2.shape), wspec((2, C)), wspec((2, C)), wspec((2, C)),
            wspec((2, C)), wspec((1, 2), pltpu.SMEM), wspec((2, nbins)),
            wspec(emb_w.shape), wspec((2, D)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_l, D), lambda b, i, lens: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, block_l), lambda b, i, lens: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((L, D), jnp.float32),
                        pltpu.VMEM((L + 4 * pad, D), cd)],
    )
    kern = functools.partial(_adaptor_kernel, kernel=k, block_l=block_l,
                             cd=cd, ln_eps=ln_eps)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, L, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, 2, L), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * (T * D + 2 * (k * D * C + k * C * C + C
                                            + nbins * D)),
            bytes_accessed=(B * (T * D + L * D * 2) * 4
                            + 2 * (k * D * C + k * C * C + nbins * D) * 2),
            transcendentals=0,
        ),
    )(out_lens.astype(jnp.int32), hs.astype(jnp.float32),
      idx.astype(jnp.int32)[..., None], w1, b1.astype(jnp.float32),
      g1.astype(jnp.float32), be1.astype(jnp.float32), w2,
      b2.astype(jnp.float32), g2.astype(jnp.float32),
      be2.astype(jnp.float32), wo, bo.astype(jnp.float32),
      bins.astype(jnp.float32), emb_w, emb_b.astype(jnp.float32))


def variance_adaptor_fused_apply(params, pred_cfg, hs: Array, idx: Array,
                                 out_lens: Array, pitch_bins, energy_bins, *,
                                 interpret: bool = False):
    """Drop-in for the inference frame-level segment in models/fastspeech2.py
    (regulate_length gather -> variance_inference_apply x2 -> to_one_hot ->
    embeds -> residual -> frame mask) under a bf16 compute dtype. params is
    the model params dict; pred_cfg the shared PredictorConfig. Returns
    (hs2 (B, L, D) f32, raw (B, 2, L) f32)."""
    from fastspeech2_tpu.ops.precision import current_compute_dtype
    from fastspeech2_tpu.parallel.sharding import (current_tp_mesh,
                                                   data_shard_map)

    dt = current_compute_dtype() or hs.dtype
    pp, ep = params["pitch_predictor"], params["energy_predictor"]

    def stack(f):
        return jnp.stack([f(pp), f(ep)])

    w1 = stack(lambda p: p["convs"][0]["conv"]["w"]).astype(dt)
    b1 = stack(lambda p: p["convs"][0]["conv"]["b"])
    g1 = stack(lambda p: p["convs"][0]["ln"]["g"])
    be1 = stack(lambda p: p["convs"][0]["ln"]["b"])
    w2 = stack(lambda p: p["convs"][1]["conv"]["w"]).astype(dt)
    b2 = stack(lambda p: p["convs"][1]["conv"]["b"])
    g2 = stack(lambda p: p["convs"][1]["ln"]["g"])
    be2 = stack(lambda p: p["convs"][1]["ln"]["b"])
    wo = stack(lambda p: p["out"]["w"][:, 0]).astype(dt)
    bo = stack(lambda p: p["out"]["b"][0]).reshape(1, 2)
    pad = jnp.full((1,), jnp.inf, jnp.float32)
    bins = jnp.stack([
        jnp.concatenate([jnp.asarray(pitch_bins, jnp.float32), pad]),
        jnp.concatenate([jnp.asarray(energy_bins, jnp.float32), pad]),
    ])
    emb_w = jnp.stack([params["pitch_embed"]["w"],
                       params["energy_embed"]["w"]]).astype(dt)
    emb_b = jnp.stack([params["pitch_embed"]["b"],
                       params["energy_embed"]["b"]])

    def call(hs, idx, lens, w1, b1, g1, be1, w2, b2, g2, be2, wo, bo, bins,
             emb_w, emb_b):
        return fused_variance_adaptor(
            hs, idx, lens, w1, b1, g1, be1, w2, b2, g2, be2, wo, bo, bins,
            emb_w, emb_b, cd=dt, interpret=interpret)

    mesh = current_tp_mesh()
    if mesh is not None:
        call = data_shard_map(call, mesh, batched=(0, 1, 2))
    return call(hs.astype(jnp.float32), idx, out_lens, w1, b1, g1, be1, w2,
                b2, g2, be2, wo, bo, bins, emb_w, emb_b)
