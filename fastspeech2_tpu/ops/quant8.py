"""int8 (W8A8) serving quantization.

An opt-in speed tier below bf16 for inference/serving: the v5e MXU runs
s8 x s8 -> s32 at ~2x the bf16 rate (measured on this chip: 371 vs 193 T/s on
a (28672,2304)x(2304,1024) matmul; the k=9 FFN conv lowered to an im2col int8
matmul runs 299 T/s vs 151 bf16 -- lax.conv in int8 only reaches 189).

Scheme (standard dynamic W8A8):
- weights: symmetric per-output-channel int8 (scale = amax/127 per out channel),
  computed once at load time by :func:`quantize_model_params`;
- activations: symmetric per-tensor int8, quantized dynamically in-graph
  (one max-abs reduce -- bandwidth-trivial next to the matmul it feeds);
- accumulation in int32 on the MXU, dequantized in the f32 epilogue where the
  bias is added (XLA fuses this into the matmul).

Quantization is a property of the params pytree: a quantized layer's dict has
keys {"q", "s"[, "b"]} instead of {"w"[, "b"]}, and ``ops.nn.linear`` /
``ops.nn.conv1d`` dispatch on that. Only the MXU-heavy encoder/decoder weights
(attention q/k/v/out projections and FFN convs) are quantized; embeddings,
predictors, postnet, and feat_out stay in high precision -- they are a few
percent of the FLOPs and carry most of the output sensitivity.

The reference has no quantized path (torch 1.6, fp32-only inference); this is
a TPU-native extra, exposed as ``Synthesizer(int8=True)`` / ``synth --int8`` /
``serve --int8``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_QMAX = 127.0


def quantize_weight(w: Array, reduce_axes) -> tuple[Array, Array]:
    """Symmetric per-output-channel int8: returns (q int8, scale f32).

    ``reduce_axes``: axes folded into each output channel's scale (all axes
    except the out-channel axis). Scale shape keeps singleton reduced axes
    dropped -- callers get a 1-D (out,) scale.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    s = jnp.maximum(amax, jnp.finfo(jnp.float32).tiny) / _QMAX
    q = jnp.clip(jnp.round(w / s), -_QMAX, _QMAX).astype(jnp.int8)
    return q, s.reshape(-1)


def dynamic_quantize(x: Array) -> tuple[Array, Array]:
    """Symmetric per-tensor int8 of an activation, in-graph (scale is a traced
    scalar). Zero inputs quantize to exact zero."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    s = jnp.maximum(amax, jnp.finfo(jnp.float32).tiny) / _QMAX
    q = jnp.clip(jnp.round(xf / s), -_QMAX, _QMAX).astype(jnp.int8)
    return q, s


def quantize_linear_params(p: dict) -> dict:
    """{"w": (in,out)[, "b"]} -> {"q", "s"[, "b"]}."""
    q, s = quantize_weight(p["w"], reduce_axes=(0,))
    out = {"q": q, "s": s}
    if "b" in p:
        out["b"] = p["b"].astype(jnp.float32)
    return out


def quantize_conv1d_params(p: dict) -> dict:
    """{"w": (k,in,out)[, "b"]} -> {"q", "s"[, "b"]}."""
    q, s = quantize_weight(p["w"], reduce_axes=(0, 1))
    out = {"q": q, "s": s}
    if "b" in p:
        out["b"] = p["b"].astype(jnp.float32)
    return out


def is_quantized(p: dict) -> bool:
    return isinstance(p, dict) and "q" in p


def dequantize_linear_params(p: dict) -> dict:
    """{"q", "s"[, "b"]} -> {"w" f32[, "b"]}: w = q * s (per-out-channel).

    Used by the serving mega-kernels (models/encoder.py): attention weights
    stay int8 in HBM and are expanded on the fly each call -- a few KB of
    VPU work against the multi-MB activation streams -- so the int8 tier
    keeps the fused [QKV->attention->out-proj->residual->LN] kernels instead
    of falling back to the split path. Attention numerics under this scheme
    are W8 (quantized weights, full-precision activations): strictly closer
    to f32 than the W8A8 int8_linear chain."""
    out = {"w": p["q"].astype(jnp.float32) * p["s"]}
    if "b" in p:
        out["b"] = p["b"]
    return out


def int8_linear(p: dict, x: Array, *, out_dtype=None) -> Array:
    xq, sx = dynamic_quantize(x)
    y = lax.dot_general(xq, p["q"],
                        (((xq.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * p["s"])
    if "b" in p:
        y = y + p["b"]
    return y.astype(out_dtype or x.dtype)


def int8_conv1d(p: dict, x: Array, *, padding: str = "SAME",
                out_dtype=None) -> Array:
    """SAME-padded stride-1 conv over NLC int8 activations.

    k>1 lowers to an im2col int8 matmul: lax.conv in int8 does not engage the
    v5e's full int8 MXU mode (189 T/s) while the flat matmul does (299 T/s).
    Symmetric quantization makes zero-padding exact, and the single per-tensor
    activation scale factors out of the int32 accumulation, so this is
    bit-identical to the int8 conv.
    """
    if padding != "SAME":
        raise NotImplementedError("int8 conv1d supports SAME padding only")
    k = p["q"].shape[0]
    if k % 2 == 0:
        # symmetric (k-1)//2 padding below assumes odd kernels (the model's
        # FFN convs are k=9/k=1); even k would need (lo, hi) = ((k-1)//2,
        # k//2) padding -- fail loudly instead of a shape error mid-trace
        raise NotImplementedError(
            f"int8 conv1d supports odd kernels only, got k={k}")
    xq, sx = dynamic_quantize(x)
    if k == 1:
        y = lax.dot_general(xq, p["q"][0], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    else:
        L = xq.shape[1]
        pad = (k - 1) // 2
        xp = jnp.pad(xq, ((0, 0), (pad, pad), (0, 0)))
        cols = jnp.concatenate([xp[:, j:j + L, :] for j in range(k)], axis=-1)
        cin, cout = p["q"].shape[1], p["q"].shape[2]
        y = lax.dot_general(cols, p["q"].reshape(k * cin, cout),
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * p["s"])
    if "b" in p:
        y = y + p["b"]
    return y.astype(out_dtype or x.dtype)


def _quantize_ffn(ffn: dict) -> dict:
    out = {}
    for name, p in ffn.items():
        out[name] = (quantize_conv1d_params(p) if p["w"].ndim == 3
                     else quantize_linear_params(p))
    return out


def quantize_encoder_params(enc: dict) -> dict:
    """Quantize one FFT-block stack's attention projections + FFNs; input
    layer / norms / alpha stay untouched."""
    out = dict(enc)
    layers = []
    for layer in enc["layers"]:
        nl = dict(layer)
        nl["attn"] = {k: quantize_linear_params(v)
                      for k, v in layer["attn"].items()}
        nl["ffn"] = _quantize_ffn(layer["ffn"])
        layers.append(nl)
    out["layers"] = layers
    return out


def quantize_model_params(params: dict) -> dict:
    """FastSpeech2 params tree -> int8-serving tree (encoder + decoder FFT
    stacks quantized; everything else passed through by reference)."""
    out = dict(params)
    for name in ("encoder", "decoder"):
        if name in params:
            out[name] = quantize_encoder_params(params[name])
    return out
