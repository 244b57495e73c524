"""Functional NN primitives with PyTorch-compatible numerics.

Params are plain dicts of jnp arrays. Weight layouts are JAX-idiomatic
(``linear``: (in, out); ``conv1d``: (k, in, out); activations are NLC) -- the
translation from torch layouts lives in :mod:`fastspeech2_tpu.compat.torch_loader`.

Initializers replicate torch defaults ("pytorch" init in the reference,
``core/modules.py:51-57`` -- i.e. the module defaults):
Linear/Conv1d ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias;
Embedding ~ N(0,1) with the padding row zeroed; LayerNorm gamma=1 beta=0.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": _uniform(kw, (in_dim, out_dim), bound, dtype),
        "b": _uniform(kb, (out_dim,), bound, dtype),
    }


def init_conv1d(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True,
                dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel)
    p = {"w": _uniform(kw, (kernel, in_ch, out_ch), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), bound, dtype)
    return p


def init_embedding(key, vocab: int, dim: int, padding_idx: Optional[int] = None,
                   dtype=jnp.float32):
    w = jax.random.normal(key, (vocab, dim), dtype)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"w": w}


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def init_batch_norm(dim: int, dtype=jnp.float32):
    """Returns (params, state): affine params and running statistics."""
    params = {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


# ---------------------------------------------------------------------------
# apply helpers
# ---------------------------------------------------------------------------

def linear(p, x: Array, *, out_dtype=None) -> Array:
    """x @ w + b over the last axis (bf16 operands under a compute_dtype
    context -- ops/precision.py).

    Under a compute dtype the matmul runs fully in that dtype (TPU MXUs still
    accumulate in f32 internally and round at the output) and the bias is
    added in f32. A mixed bf16-operand/f32-output matmul would break
    differentiation: its transpose rule feeds the f32 cotangent into a conv/
    dot against the bf16 weight, which lax rejects.

    out_dtype: result dtype; defaults to x.dtype. Chained matmul/relu stacks
    pass the compute dtype here so intermediates skip the f32 round-trip.

    Params quantized by ops/quant8.py ({"q","s"[, "b"]} instead of {"w"[, "b"]})
    dispatch to the int8 MXU path. Measured end-to-end serving throughput on a
    v5e is PARITY with bf16 (1.00x at the bench workload -- the serving step
    is attention/bandwidth-bound, not matmul-peak-bound; scripts/measure_int8.py,
    PARITY.md), so W8A8 is a weight-memory lever, not a speed tier.
    """
    if "q" in p:
        from fastspeech2_tpu.ops.quant8 import int8_linear

        return int8_linear(p, x, out_dtype=out_dtype)
    from fastspeech2_tpu.ops.precision import current_compute_dtype

    dt = current_compute_dtype()
    if dt is None:
        y = jnp.dot(x, p["w"], preferred_element_type=x.dtype) + p["b"]
    else:
        y = jnp.dot(x.astype(dt), p["w"].astype(dt))
        y = y.astype(jnp.float32) + p["b"]
    return y.astype(out_dtype or x.dtype)


def conv1d(p, x: Array, *, padding: str = "SAME", out_dtype=None) -> Array:
    """1-D convolution over NLC activations with (k, in, out) weights.

    'SAME' matches torch Conv1d with padding=(k-1)//2 for odd k (the only case
    the reference uses: k in {1,3,5,9}). Precision/out_dtype and int8-dispatch
    semantics as in :func:`linear`.
    """
    if "q" in p:
        from fastspeech2_tpu.ops.quant8 import int8_conv1d

        return int8_conv1d(p, x, padding=padding, out_dtype=out_dtype)
    from fastspeech2_tpu.ops.precision import current_compute_dtype

    dt = current_compute_dtype()
    xc = x if dt is None else x.astype(dt)
    wc = p["w"] if dt is None else p["w"].astype(dt)
    y = lax.conv_general_dilated(
        xc, wc, window_strides=(1,), padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if dt is not None:
        y = y.astype(jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(out_dtype or x.dtype)


def embedding(p, ids: Array) -> Array:
    return jnp.take(p["w"], ids, axis=0)


def layer_norm(p, x: Array, *, eps: float = 1e-5) -> Array:
    """LayerNorm over the last axis (torch semantics: biased variance)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = lax.rsqrt(var + eps)
    return (x - mean) * inv * p["g"] + p["b"]


def batch_norm(params, state, x: Array, *, training: bool, momentum: float = 0.1,
               eps: float = 1e-5):
    """BatchNorm1d over NLC activations, normalizing per channel (last axis).

    Returns (y, new_state). In training mode, batch statistics are used and
    running stats updated with torch's convention (running_var uses the
    unbiased batch variance).
    """
    if training:
        n = x.shape[0] * x.shape[1]
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.mean(jnp.square(x - mean), axis=(0, 1))  # biased, for normalization
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * lax.rsqrt(var + eps) * params["g"] + params["b"]
    return y, new_state


def _hash_mix(x):
    """lowbias32 integer finalizer -- ~6 VPU ops, good avalanche."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _hash_keep_mask(seed: Array, shape, rate: float) -> Array:
    """Counter-based keep mask: keep where hash(linear index ^ seed) clears
    the rate threshold. A pure function of (seed, position)."""
    idx = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for axis in range(len(shape) - 1, -1, -1):
        idx = idx + lax.broadcasted_iota(jnp.uint32, shape, axis) * jnp.uint32(stride)
        stride *= shape[axis]
    bits = _hash_mix(idx ^ _hash_mix(seed))
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return bits >= thresh


def _key_to_seed(key: Array) -> Array:
    """Scalar u32 seed from a PRNG key WITHOUT running the threefry core --
    split() already decorrelates sibling keys, so mixing the raw key words is
    enough entropy to seed the position hash."""
    kd = key
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    kd = kd.astype(jnp.uint32).ravel()
    return kd[0] * jnp.uint32(0x9E3779B9) ^ kd[-1]


def dropout(key: Optional[Array], x: Array, rate: float, *, deterministic: bool) -> Array:
    """Inverted dropout (torch semantics: scale by 1/(1-rate) at train time).

    Under a compute-dtype (bf16 speed) context the bernoulli mask comes from a
    counter-based hash instead of threefry: generating threefry bits for every
    activation element costs hundreds of VPU ops/element and measurably blocks
    the MXU pipeline when XLA fuses it into conv/matmul epilogues (v5e train
    step profile: the four decoder FFN dropout+conv fusions ran at 36 TF/s vs
    190 for their dropout-free twins). The hash mask is ~10 VPU ops/element,
    deterministic per (key, position), and statistically iid for this purpose.
    The f32 parity path keeps jax.random.bernoulli semantics.
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    from fastspeech2_tpu.ops.precision import current_compute_dtype

    if current_compute_dtype() is not None:
        mask = _hash_keep_mask(_key_to_seed(key), x.shape, rate)
    else:
        mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
