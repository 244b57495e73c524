"""FFT-block (feed-forward Transformer) encoder/decoder stack.

Behavioral contract from the reference ``/root/reference/core/encoder.py``:

- input layer: token embedding ("embed", used by the text encoder,
  ``fastspeech.py:65-67``) or Linear->LayerNorm->Dropout->ReLU ("linear", the
  decoder's nonstandard ordering, ``core/encoder.py:118-125``), each followed by
  (scaled) sinusoidal positional encoding (``core/embedding.py``);
- N blocks of [self-attention + positionwise FFN] with pre/post-LN selected by
  ``normalize_before`` (default False => post-LN, ``configs/default.yaml:62-63``)
  and optional ``concat_after`` linear;
- FFN is either conv1d k=9 -> ReLU -> dropout -> conv1d k=1 ("conv1d",
  ``core/modules.py:204-248``) or Linear->ReLU->dropout->Linear ("linear");
- a final LayerNorm only when ``normalize_before`` (``core/encoder.py:201-202``).

LayerNorms here use torch's default eps=1e-5 (``core/encoder.py:37-38``).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.ops import nn
from fastspeech2_tpu.ops.attention import init_mha, mha_apply

Array = jax.Array


@dataclass(frozen=True)
class EncoderConfig:
    idim: int                      # vocab size (embed) or input feature dim (linear)
    attention_dim: int = 256
    attention_heads: int = 2
    linear_units: int = 1024
    num_blocks: int = 4
    dropout_rate: float = 0.2
    positional_dropout_rate: float = 0.2
    attention_dropout_rate: float = 0.2
    input_layer: str = "embed"     # "embed" | "linear"
    use_scaled_pos_enc: bool = True
    normalize_before: bool = False
    concat_after: bool = False
    positionwise_layer_type: str = "conv1d"  # "conv1d" | "linear"
    positionwise_conv_kernel_size: int = 9
    padding_idx: int = 0
    max_pos_len: int = 5000


@functools.lru_cache(maxsize=8)
def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """Absolute sinusoidal PE table (reference core/embedding.py:48-66)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def init_ffn(key, cfg: EncoderConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    d, h = cfg.attention_dim, cfg.linear_units
    if cfg.positionwise_layer_type == "conv1d":
        return {
            "w1": nn.init_conv1d(k1, d, h, cfg.positionwise_conv_kernel_size, dtype=dtype),
            "w2": nn.init_conv1d(k2, h, d, 1, dtype=dtype),
        }
    elif cfg.positionwise_layer_type == "linear":
        return {
            "w1": nn.init_linear(k1, d, h, dtype),
            "w2": nn.init_linear(k2, h, d, dtype),
        }
    raise ValueError(f"unknown positionwise_layer_type {cfg.positionwise_layer_type}")


def ffn_apply(p, cfg: EncoderConfig, x: Array, *, rng=None, deterministic=True,
              conv_mask: Optional[Array] = None) -> Array:
    """conv_mask (B, T) bool: zero conv inputs at invalid rows so a padded
    static buffer sees zeros exactly like torch's implicit SAME padding would
    (used by exact-unpadded inference; None replicates the reference's batched
    pad-leak semantics). The k=1 conv and linear FFN are row-local."""
    from fastspeech2_tpu.ops.precision import current_compute_dtype

    # under a bf16 compute dtype keep the wide intermediate (eunits, the
    # biggest activation in the model) in bf16: relu/dropout are exact in
    # bf16 and the f32 round-trip between the two matmuls costs ~1 ms per
    # layer at (32, 896, 1024) on a v5e
    mid = current_compute_dtype() or x.dtype
    if cfg.positionwise_layer_type == "conv1d":
        if conv_mask is not None:
            x = jnp.where(conv_mask[..., None], x, 0.0)
        h = jax.nn.relu(nn.conv1d(p["w1"], x, out_dtype=mid))
        h = nn.dropout(rng, h, cfg.dropout_rate, deterministic=deterministic)
        return nn.conv1d(p["w2"], h, out_dtype=x.dtype)
    h = jax.nn.relu(nn.linear(p["w1"], x, out_dtype=mid))
    h = nn.dropout(rng, h, cfg.dropout_rate, deterministic=deterministic)
    return nn.linear(p["w2"], h, out_dtype=x.dtype)


def init_encoder(key, cfg: EncoderConfig, init_alpha: float = 1.0, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_blocks + 2)
    params = {}
    if cfg.input_layer == "embed":
        params["embed"] = nn.init_embedding(
            keys[0], cfg.idim, cfg.attention_dim, padding_idx=cfg.padding_idx, dtype=dtype
        )
    elif cfg.input_layer == "linear":
        params["input_linear"] = nn.init_linear(keys[0], cfg.idim, cfg.attention_dim, dtype)
        params["input_ln"] = nn.init_layer_norm(cfg.attention_dim, dtype)
    else:
        raise ValueError(f"unknown input_layer {cfg.input_layer}")
    if cfg.use_scaled_pos_enc:
        params["alpha"] = jnp.asarray(init_alpha, dtype)
    layers = []
    for i in range(cfg.num_blocks):
        ka, kf, kc = jax.random.split(keys[i + 1], 3)
        layer = {
            "attn": init_mha(ka, cfg.attention_dim, dtype),
            "ffn": init_ffn(kf, cfg, dtype),
            "norm1": nn.init_layer_norm(cfg.attention_dim, dtype),
            "norm2": nn.init_layer_norm(cfg.attention_dim, dtype),
        }
        # the reference always allocates concat_linear (core/encoder.py:44);
        # we only create it when used, and the ckpt translator drops unused ones
        if cfg.concat_after:
            layer["concat"] = nn.init_linear(kc, 2 * cfg.attention_dim, cfg.attention_dim, dtype)
        layers.append(layer)
    params["layers"] = layers
    if cfg.normalize_before:
        params["after_norm"] = nn.init_layer_norm(cfg.attention_dim, dtype)
    return params


def _positional_encode(params, cfg: EncoderConfig, x: Array, *, rng, deterministic) -> Array:
    """(Scaled) PE add: scaled => x + alpha*pe (core/embedding.py:105-120);
    plain => x*sqrt(d) + pe (:68-80). Then positional dropout."""
    pe = jnp.asarray(sinusoid_table(cfg.max_pos_len, cfg.attention_dim)[: x.shape[1]],
                     dtype=x.dtype)
    if cfg.use_scaled_pos_enc:
        x = x + params["alpha"] * pe
    else:
        x = x * math.sqrt(cfg.attention_dim) + pe
    return nn.dropout(rng, x, cfg.positional_dropout_rate, deterministic=deterministic)


def encoder_apply(
    params,
    cfg: EncoderConfig,
    xs: Array,
    mask: Optional[Array],
    *,
    rng: Optional[Array] = None,
    deterministic: bool = True,
    conv_mask: Optional[Array] = None,
    lengths: Optional[Array] = None,
    fused_attention: bool = False,
    remat: bool = False,
) -> Array:
    """Run the FFT-block stack.

    Args:
        xs: (B, T) int token ids for input_layer="embed", else (B, T, idim).
        mask: (B, T, T) bool self-attention mask (True=valid) or None.
        conv_mask: (B, T) bool row validity for exact-unpadded conv masking.
        lengths: (B,) true lengths; required for fused_attention.
        fused_attention: use the Pallas fused-attention kernel (deterministic
            path only -- attention dropout needs the XLA path).
        remat: rematerialize each FFT block in the backward pass
            (jax.checkpoint) -- activation memory drops from O(num_blocks)
            stored intermediates to one residual stream per block boundary,
            at the cost of recomputing each block's forward during backprop.
    Returns:
        (B, T, attention_dim) hidden states.
    """
    from fastspeech2_tpu.ops.precision import current_compute_dtype

    # fused kernel only for MXU-friendly head dims (d_k >= 128; tiny head
    # dims compile poorly in Mosaic) and only under the bf16 speed config:
    # f32 needs Precision.HIGHEST inside Mosaic for parity (see
    # ops/pallas/attention.py), whose multi-pass scratch overflows VMEM at
    # T=896 -- and the f32 XLA path is full-precision and equally fast
    d_k = cfg.attention_dim // cfg.attention_heads
    speed_path = (fused_attention and lengths is not None
                  and current_compute_dtype() == jnp.bfloat16)
    # tensor parallelism (parallel/sharding.tensor_parallel_attention
    # context): the attention kernels run shard_mapped over the 'model' axis
    # when tp divides the head count; otherwise fall back to XLA attention,
    # which GSPMD partitions. The fused FFN/postnet kernels stay off under TP
    # -- their weights are Megatron-sharded and XLA's convs were already at
    # the MXU roofline (the Pallas FFN win is length-adaptive inference).
    from fastspeech2_tpu.parallel.sharding import tp_degree

    tp = tp_degree()
    fusable = (speed_path and d_k >= 128
               and (tp == 1 or cfg.attention_heads % tp == 0))
    use_fused = fusable and deterministic
    # fused [attention -> out-proj -> +residual] variant: tp=1 only (the
    # row-parallel out projection's psum must precede the residual under TP).
    # Kill switch read once at import (ops/flags.py): trace-time branch, so
    # the env var must be set before the first compile in the process.
    from fastspeech2_tpu.ops import flags

    use_fused_res = (use_fused and not cfg.concat_after and tp == 1
                     and flags.FUSED_ATT_RES)
    # the fused conv-FFN has no head-dim constraint, but it always applies
    # conv-mask (zeroed-past-length) semantics — engage it only when the
    # caller asked for those (exact-unpadded inference), never silently
    # replacing the reference's batched pad-leak eval semantics
    use_fused_ffn = (speed_path and deterministic and conv_mask is not None
                     and tp == 1)
    # training variant: custom-VJP kernel with in-kernel hash dropout; whole-T
    # per program, so only for T within its VMEM budget (attention_train.MAX_T)
    from fastspeech2_tpu.ops.pallas.attention_train import MAX_T

    use_fused_train = (fusable and not deterministic and rng is not None
                       and xs.shape[1] <= MAX_T)
    n_rngs = 2 + 4 * cfg.num_blocks
    rngs = (jax.random.split(rng, n_rngs) if rng is not None
            else [None] * n_rngs)
    r = iter(rngs)

    if cfg.input_layer == "embed":
        x = nn.embedding(params["embed"], xs)
    else:
        # nonstandard Linear->LN->Dropout->ReLU ordering (core/encoder.py:118-125)
        x = nn.linear(params["input_linear"], xs)
        x = nn.layer_norm(params["input_ln"], x)
        x = nn.dropout(next(r), x, cfg.dropout_rate, deterministic=deterministic)
        x = jax.nn.relu(x)
    if cfg.input_layer == "embed":
        next(r)  # keep rng schedule aligned across input layer types
    x = _positional_encode(params, cfg, x, rng=next(r), deterministic=deterministic)

    # Megatron-SP activation sharding at block boundaries (no-op unless a
    # parallel.sharding.sequence_sharding context is active at trace time)
    from fastspeech2_tpu.parallel.sharding import constrain_seq

    x = constrain_seq(x)

    def fft_block(layer, x, brngs):
        """One FFT block (pre/post-LN attn + conv-FFN). mask/conv_mask/lengths
        are closed over; brngs carries this block's 4 dropout keys in the
        fixed schedule order so remat on/off is bit-identical."""
        r = iter(brngs)
        residual = x
        y = nn.layer_norm(layer["norm1"], x) if cfg.normalize_before else x
        # int8-quantized attention projections ({"q","s"} leaves, ops/quant8)
        # previously forced the split path and cost the int8 tier its speed
        # rationale (r4: 0.93x bf16). Now the weight tiles are DEQUANTIZED
        # on the fly (w ~= q * s, a few KB of VPU work per layer) and the
        # res/QKV mega-kernels run exactly as in the bf16 tier: attention
        # weights stay int8 in HBM (half memory), attention numerics improve
        # (activations keep full precision; W8A8 only ever bought speed on
        # the FFN convs, quant8.py docstring). All four leaves are checked
        # because the mega-kernels read q/k/v/out weights directly -- a
        # partially quantized layer must still take the split path.
        attn_q8 = all("q" in layer["attn"][k_]
                      for k_ in ("q", "k", "v", "out"))
        attn_dense = all("w" in layer["attn"][k_]
                         for k_ in ("q", "k", "v", "out"))
        attn_p = layer["attn"]
        if use_fused_res and attn_q8:
            from fastspeech2_tpu.ops.quant8 import dequantize_linear_params

            attn_p = {k_: dequantize_linear_params(v)
                      for k_, v in layer["attn"].items()}
        ran_fused_res = use_fused_res and (attn_dense or attn_q8)
        if ran_fused_res:
            # fused [attention -> out-proj -> +residual]: the XLA residual
            # add + out-proj round-trips fold into the kernel (tp=1 only --
            # the row-parallel out projection needs its psum before the
            # residual under TP). Post-LN configs (the default) also fold
            # the trailing LayerNorm into the kernel epilogue.
            if cfg.normalize_before:
                from fastspeech2_tpu.ops.pallas.attention import (
                    mha_fused_res_apply)

                x = mha_fused_res_apply(attn_p, y, residual, lengths,
                                        cfg.attention_heads)
            elif flags.FUSED_ATT_QKV:
                # post-LN: attention input == residual (y is x), so the QKV
                # projections fold into the kernel too -- the whole block
                # half reads x once (q/k/v never exist in HBM)
                from fastspeech2_tpu.ops.pallas.attention import (
                    mha_fused_block_ln_apply)

                x = mha_fused_block_ln_apply(attn_p, layer["norm1"],
                                             residual, lengths,
                                             cfg.attention_heads)
            else:
                from fastspeech2_tpu.ops.pallas.attention import (
                    mha_fused_res_ln_apply)

                x = mha_fused_res_ln_apply(attn_p, layer["norm1"], y,
                                           residual, lengths,
                                           cfg.attention_heads)
            next(r)  # attention-dropout + residual-dropout keys: identity on
            next(r)  # this deterministic path; keep the schedule aligned
            att = None
        elif use_fused:
            from fastspeech2_tpu.ops.pallas.attention import mha_fused_apply

            att = mha_fused_apply(layer["attn"], y, lengths, cfg.attention_heads)
            next(r)
        elif use_fused_train:
            # A fused training attention-HALF kernel (QKV + attention +
            # out-proj + residual dropout + residual + post-LN in one
            # forward, XLA-recompute backward via custom VJP) was built,
            # verified bit-equivalent, measured at the full-size step and
            # REJECTED: 36.6 -> 40.2 ms/step (+9.8%). The train step is
            # compute-bound (convs at the MXU roofline), so recompute-
            # backward trades HBM it doesn't need for FLOPs it can't afford
            # -- the backward re-ran a full attention forward plus three
            # projections to save ~0.5 ms of forward glue. PARITY.md r5.
            from fastspeech2_tpu.ops.pallas.attention_train import (
                mha_fused_train_apply)

            att = mha_fused_train_apply(
                layer["attn"], y, lengths, cfg.attention_heads,
                next(r), cfg.attention_dropout_rate)
        else:
            att = mha_apply(
                layer["attn"], y, y, y, mask, cfg.attention_heads,
                dropout_rate=cfg.attention_dropout_rate, dropout_key=next(r),
                deterministic=deterministic,
            )
        if att is not None:
            if cfg.concat_after:
                x = residual + nn.linear(
                    layer["concat"], jnp.concatenate([y, att], axis=-1))
                next(r)
            else:
                x = residual + nn.dropout(next(r), att, cfg.dropout_rate,
                                          deterministic=deterministic)
        if not cfg.normalize_before and not ran_fused_res:
            # post-LN; the fused-res path already applied it in-kernel
            x = nn.layer_norm(layer["norm1"], x)

        fuse_ffn = (use_fused_ffn and cfg.positionwise_layer_type == "conv1d"
                    and cfg.positionwise_conv_kernel_size % 2 == 1
                    and "q" not in layer["ffn"]["w1"])
        if fuse_ffn and cfg.normalize_before:
            from fastspeech2_tpu.ops.pallas.ffn import ffn_block_fused_apply

            # length-adaptive fused [LN -> conv-FFN -> +residual] block tail:
            # skips time blocks past each sequence's true length and keeps
            # the LN/mask/casts/residual in VMEM (ops/pallas/ffn.py)
            x = ffn_block_fused_apply(layer["norm2"], layer["ffn"], x,
                                      lengths)
            next(r)
            next(r)
        elif fuse_ffn:
            from fastspeech2_tpu.ops.pallas.ffn import ffn_block_post_apply

            # post-LN (default) twin: [conv-FFN -> +residual -> LN] in one
            # kernel -- the trailing residual add + LayerNorm XLA fusions
            # (two full-stream f32 HBM round-trips) fold into the epilogue
            x = ffn_block_post_apply(layer["norm2"], layer["ffn"], x,
                                     lengths)
            next(r)
            next(r)
        else:
            residual = x
            y = nn.layer_norm(layer["norm2"], x) if cfg.normalize_before else x
            f = ffn_apply(layer["ffn"], cfg, y, rng=next(r),
                          deterministic=deterministic,
                          conv_mask=conv_mask)
            x = residual + nn.dropout(next(r), f, cfg.dropout_rate,
                                      deterministic=deterministic)
            if not cfg.normalize_before:
                x = nn.layer_norm(layer["norm2"], x)
        return x

    if remat:
        # memory-for-FLOPs trade (jax.checkpoint): each block's internals are
        # recomputed in backward instead of stored. Composes with the fused
        # custom-VJP training attention (its fwd is what gets replayed).
        fft_block = jax.checkpoint(fft_block)
    for i, layer in enumerate(params["layers"]):
        x = fft_block(layer, x, tuple(rngs[2 + 4 * i: 6 + 4 * i]))
        x = constrain_seq(x)

    if cfg.normalize_before:
        x = nn.layer_norm(params["after_norm"], x)
    return x
