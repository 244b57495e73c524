"""Transformer weight-init variants (reference ``core/modules.py:51-81``).

The reference's ``initialize(model, init_type)`` applies, for any init_type
other than ``"pytorch"`` (which keeps torch module defaults):

1. every parameter with ``dim > 1`` -> xavier_uniform / xavier_normal /
   kaiming_uniform / kaiming_normal (kaiming with ``nonlinearity="relu"``,
   i.e. gain sqrt(2), fan_in mode); unknown names raise;
2. every ``dim == 1`` parameter -> zero;
3. Embedding and LayerNorm modules -> ``reset_parameters()`` (Embedding back
   to N(0,1) with the padding row zeroed; LayerNorm back to gamma=1, beta=0).

Behavioral quirk replicated on purpose: **BatchNorm1d is NOT in the reset
list**, so step 2 leaves postnet BN gamma/beta at zero -- the postnet residual
starts exactly at 0 and BN affine params must learn away from it. The scaled-PE
alpha is 0-dim, untouched by either loop, and set explicitly afterwards
(``fastspeech.py:378-387``).

Fan semantics match ``torch.nn.init._calculate_fan_in_and_fan_out`` on the
*torch* layouts; our layouts are transposed (linear (in, out); conv1d
(k, in, out)), so fans are read off our shapes accordingly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

INIT_TYPES = ("pytorch", "xavier_uniform", "xavier_normal",
              "kaiming_uniform", "kaiming_normal")


def _fans(shape):
    """(fan_in, fan_out) for our layouts: 2-D = linear (in, out);
    3-D = conv1d (k, in, out) with receptive field k."""
    if len(shape) == 2:
        return shape[0], shape[1]
    if len(shape) == 3:
        return shape[0] * shape[1], shape[0] * shape[2]
    raise ValueError(f"no fan semantics for shape {shape}")


def _draw(key, shape, init_type: str, dtype):
    fan_in, fan_out = _fans(shape)
    if init_type == "xavier_uniform":
        a = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)
    if init_type == "xavier_normal":
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)
    # kaiming with nonlinearity="relu": gain = sqrt(2), fan_in mode
    if init_type == "kaiming_uniform":
        bound = math.sqrt(2.0) * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    if init_type == "kaiming_normal":
        std = math.sqrt(2.0) / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)
    raise ValueError("Unknown initialization: " + init_type)


def apply_transformer_init(key, params, init_type: str):
    """Re-draw a torch-default params pytree per the reference's
    ``initialize()``. Returns a new pytree; ``init_type="pytorch"`` is the
    identity (reference ``core/modules.py:57-58``)."""
    if init_type == "pytorch":
        return params
    if init_type not in INIT_TYPES:
        raise ValueError("Unknown initialization: " + init_type)

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, max(len(leaves), 1))
    out = []
    for k, (path, leaf) in zip(keys, leaves):
        names = [getattr(p, "key", None) for p in path]
        name = names[-1]
        if name == "w" and leaf.ndim > 1:
            if len(names) >= 2 and names[-2] == "embed":
                # Embedding: xavier'd then reset to N(0,1) w/ zero padding row
                # (reference step 3) == our default draw; keep it.
                out.append(leaf)
            else:
                out.append(_draw(k, leaf.shape, init_type, leaf.dtype))
        elif name == "g":
            if "bn" in names:
                # the BatchNorm quirk: zeroed, never reset (module docstring)
                out.append(jnp.zeros_like(leaf))
            else:
                out.append(jnp.ones_like(leaf))  # LayerNorm reset
        elif name == "b" and leaf.ndim == 1:
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)  # 0-dim alpha etc.
    return jax.tree_util.tree_unflatten(treedef, out)
