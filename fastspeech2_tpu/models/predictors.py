"""Duration / pitch / energy predictors (the variance adaptor's heads).

Contract from the reference:

- DurationPredictor (``core/duration_modeling/duration_predictor.py``):
  n_layers x [Conv1d(k)->ReLU->LayerNorm(eps=1e-12 over channels)->Dropout]
  -> Linear(chans, 1) -> (B, T). Trains in log domain; at inference converts
  ``clamp(round(exp(x) - 1), min=0)`` (:77-81). Padded outputs zeroed.
- VariancePredictor (``core/variance_predictor.py:7-95``): identical stack
  (out dim 1, dropout 0.5 by default), raw linear-domain output.
- Energy/PitchPredictor add quantization bins; predicted (or ground-truth)
  values are bucketized and one-hot encoded for the embedding projections
  (:154-159, :227-232).

The channel-dim LayerNorm in the reference normalizes over channels at each
time step (``core/modules.py:112-120``) -- with NLC activations that is a plain
last-axis LayerNorm here, eps=1e-12.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from fastspeech2_tpu.ops import nn

Array = jax.Array

_LN_EPS = 1e-12  # reference core/modules.py:115


@dataclass(frozen=True)
class PredictorConfig:
    idim: int = 256
    n_layers: int = 2
    n_chans: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.5
    offset: float = 1.0


def init_predictor(key, cfg: PredictorConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.n_layers + 1)
    convs = []
    for i in range(cfg.n_layers):
        in_ch = cfg.idim if i == 0 else cfg.n_chans
        convs.append({
            "conv": nn.init_conv1d(keys[i], in_ch, cfg.n_chans, cfg.kernel_size, dtype=dtype),
            "ln": nn.init_layer_norm(cfg.n_chans, dtype),
        })
    return {"convs": convs, "out": nn.init_linear(keys[-1], cfg.n_chans, 1, dtype)}


def predictor_apply(
    params, cfg: PredictorConfig, xs: Array,
    *, rng: Optional[Array] = None, deterministic: bool = True,
    conv_mask: Optional[Array] = None,
) -> Array:
    """Conv stack -> scalar head. xs (B, T, idim) -> (B, T) raw (log-domain for
    durations, linear-domain for pitch/energy).

    conv_mask (B, T): zero each conv's input at invalid rows (exact-unpadded
    inference mode; see models/fastspeech2.py docstring)."""
    rngs = (jax.random.split(rng, cfg.n_layers) if rng is not None
            else [None] * cfg.n_layers)
    h = xs
    for layer, r in zip(params["convs"], rngs):
        if conv_mask is not None:
            h = jnp.where(conv_mask[..., None], h, 0.0)
        h = jax.nn.relu(nn.conv1d(layer["conv"], h))
        h = nn.layer_norm(layer["ln"], h, eps=_LN_EPS)
        h = nn.dropout(r, h, cfg.dropout_rate, deterministic=deterministic)
    return nn.linear(params["out"], h)[..., 0]


def duration_train_apply(params, cfg, hs, tok_mask, **kw) -> Array:
    """Log-domain durations, padded positions zeroed (reference :83-85)."""
    out = predictor_apply(params, cfg, hs, **kw)
    return jnp.where(tok_mask, out, 0.0)


def duration_inference_apply(params, cfg, hs, tok_mask, **kw) -> Array:
    """Linear-domain integer durations (reference :77-85)."""
    out = predictor_apply(params, cfg, hs, **kw)
    d = jnp.maximum(jnp.round(jnp.exp(out) - cfg.offset), 0.0)
    return jnp.where(tok_mask, d, 0.0).astype(jnp.int32)


def variance_train_apply(params, cfg, hs, frame_mask, **kw) -> Array:
    """Raw-domain prediction, padded frames zeroed (variance_predictor.py:75-78)."""
    out = predictor_apply(params, cfg, hs, **kw)
    return jnp.where(frame_mask, out, 0.0)


def variance_inference_apply(params, cfg, hs, alpha: float = 1.0, **kw) -> Array:
    """Raw-domain prediction, unmasked (variance_predictor.py:80-95)."""
    return predictor_apply(params, cfg, hs, **kw) * alpha
