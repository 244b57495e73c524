"""Tacotron-2 postnet: residual mel refiner.

Contract (reference ``/root/reference/core/modules.py:251-359``):
(n_layers-1) x [Conv1d(k, bias=False) -> BatchNorm1d -> Tanh -> Dropout]
then a final Conv1d -> BatchNorm1d -> Dropout (no Tanh). Applied residually:
``after = before + postnet(before)`` (``fastspeech.py:236-238``).

BatchNorm carries running statistics: params/state are split, and apply
returns the updated state in training mode.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fastspeech2_tpu.ops import nn

Array = jax.Array


@dataclass(frozen=True)
class PostnetConfig:
    odim: int = 80
    n_layers: int = 5
    n_chans: int = 256
    n_filts: int = 5
    dropout_rate: float = 0.5
    use_batch_norm: bool = True


def init_postnet(key, cfg: PostnetConfig, dtype=jnp.float32):
    """Returns (params, state)."""
    keys = jax.random.split(key, cfg.n_layers)
    layers, states = [], []
    for i in range(cfg.n_layers):
        in_ch = cfg.odim if i == 0 else cfg.n_chans
        out_ch = cfg.odim if i == cfg.n_layers - 1 else cfg.n_chans
        layer = {"conv": nn.init_conv1d(keys[i], in_ch, out_ch, cfg.n_filts,
                                        bias=False, dtype=dtype)}
        if cfg.use_batch_norm:
            bn_p, bn_s = nn.init_batch_norm(out_ch, dtype)
            layer["bn"] = bn_p
            states.append(bn_s)
        layers.append(layer)
    return {"layers": layers}, {"bn": states}


def postnet_apply(
    params, state, cfg: PostnetConfig, xs: Array,
    *, rng: Optional[Array] = None, training: bool = False,
    conv_mask: Optional[Array] = None,
) -> Tuple[Array, dict]:
    """xs (B, L, odim) -> (residual (B, L, odim), new_state).

    conv_mask (B, L): zero each conv's input at invalid rows (exact-unpadded
    inference mode; see models/fastspeech2.py docstring)."""
    rngs = (jax.random.split(rng, cfg.n_layers) if rng is not None
            else [None] * cfg.n_layers)
    h = xs
    new_bn = []
    for i, (layer, r) in enumerate(zip(params["layers"], rngs)):
        if conv_mask is not None:
            h = jnp.where(conv_mask[..., None], h, 0.0)
        h = nn.conv1d(layer["conv"], h)
        if cfg.use_batch_norm:
            h, s = nn.batch_norm(layer["bn"], state["bn"][i], h, training=training)
            new_bn.append(s)
        if i < cfg.n_layers - 1:
            h = jnp.tanh(h)
        h = nn.dropout(r, h, cfg.dropout_rate, deterministic=not training)
    return h, {"bn": new_bn}
