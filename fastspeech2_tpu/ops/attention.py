"""Multi-head self-attention (XLA path).

Numerics match the reference's ``MultiHeadedAttention``
(``/root/reference/core/attention.py:30-74``): scale by 1/sqrt(d_k), fill masked
scores with -inf before softmax, then re-zero masked attention weights. The -inf
fill + re-zero is implemented as a safe masked softmax (identical results for
partially-masked rows; fully-padded query rows produce exact zeros instead of
the reference's NaN-then-overwritten values).

A Pallas flash-attention kernel (ops/pallas/attention.py) replaces this on the
hot path; this implementation remains the correctness fallback.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from fastspeech2_tpu.ops import nn

Array = jax.Array


def init_mha(key, n_feat: int, dtype=jnp.float32):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": nn.init_linear(kq, n_feat, n_feat, dtype),
        "k": nn.init_linear(kk, n_feat, n_feat, dtype),
        "v": nn.init_linear(kv, n_feat, n_feat, dtype),
        "out": nn.init_linear(ko, n_feat, n_feat, dtype),
    }


def masked_softmax(scores: Array, mask: Optional[Array]) -> Array:
    """Softmax over the last axis with torch masked_fill(-inf) semantics.

    mask: bool, True at VALID positions, broadcastable to ``scores``.
    Masked positions get exactly 0 attention; rows with no valid positions
    (fully padded queries) are all-zero.
    """
    if mask is None:
        return jax.nn.softmax(scores, axis=-1)
    neg = jnp.finfo(scores.dtype).min
    s = jnp.where(mask, scores, neg)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m) * mask.astype(scores.dtype)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(denom, jnp.finfo(scores.dtype).tiny)


def mha_apply(
    params,
    query: Array,
    key: Array,
    value: Array,
    mask: Optional[Array],
    n_heads: int,
    *,
    dropout_rate: float = 0.0,
    dropout_key: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """Scaled dot-product multi-head attention.

    Args:
        query/key/value: (B, T, D) activations.
        mask: (B, Tq, Tk) bool, True at valid positions, or None.
        n_heads: head count H; d_k = D // H.
    """
    B, Tq, D = query.shape
    d_k = D // n_heads

    def split(x, p):
        y = nn.linear(p, x)
        return y.reshape(B, -1, n_heads, d_k).transpose(0, 2, 1, 3)  # (B,H,T,dk)

    q = split(query, params["q"])
    k = split(key, params["k"])
    v = split(value, params["v"])

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(d_k, dtype=jnp.float32)
    )
    attn = masked_softmax(scores, None if mask is None else mask[:, None, :, :])
    attn = attn.astype(query.dtype)
    attn = nn.dropout(dropout_key, attn, dropout_rate, deterministic=deterministic)
    x = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
    x = x.astype(query.dtype).transpose(0, 2, 1, 3).reshape(B, Tq, D)
    return nn.linear(params["out"], x)
