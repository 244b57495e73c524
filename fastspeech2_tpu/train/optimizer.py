"""Noam-scheduled Adam (reference ``/root/reference/core/optimizer.py``).

lr(step) = factor * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)
with Adam(betas=(0.9, 0.98), eps=1e-9) and global-norm clipping 1.0 applied
before the update (reference ``train_fastspeech.py:123-131``). Steps are
1-based like the reference's ``NoamOpt._step``.

Non-finite gradients skip the update entirely, replicating the reference's
NaN-grad-norm step skip (train_fastspeech.py:127-128). Implemented as a
single global-norm finiteness gate with elementwise selects rather than
``optax.apply_if_finite``: the latter isfinite-reduces every gradient leaf
and wraps the update in a lax.cond, which together cost ~5 ms/step (12%) on
a v5e; one scalar check (CSE'd with the clipping norm) plus fused selects is
equivalent for every gradient that can clip (NaN/inf propagates into the
global norm) and nearly free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from fastspeech2_tpu.config import Config


def noam_schedule(d_model: int, warmup: int, factor: float):
    def lr(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return factor * d_model ** -0.5 * jnp.minimum(s ** -0.5, s * warmup ** -1.5)
    return lr


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    m = cfg.model
    schedule = noam_schedule(m.adim, m.transformer_warmup_steps, m.transformer_lr)

    def scaled_schedule(count):
        return schedule(count + 1)  # optax count starts at 0; NoamOpt at 1

    # train.weight_decay: the reference's default.yaml defines 0.001 but its
    # get_std_opt never passes it to Adam (core/optimizer.py:59-68) -- a
    # silent dead knob there. Here it is real: AdamW-style decoupled decay
    # (added after the Adam moment rescale, before the LR scale, so decay is
    # scheduled by the same Noam LR). 0.0 (the default) adds no op.
    decay = [optax.add_decayed_weights(cfg.train.weight_decay)] \
        if cfg.train.weight_decay else []
    inner = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9),
        *decay,
        optax.scale_by_learning_rate(scaled_schedule),
    )
    # note: optax.flatten (one concatenated optimizer vector) was measured
    # and rejected -- it cuts the per-leaf reduction kernels but the
    # ravel/unravel copies and the monolithic moment update cost more than
    # they save (38.8 -> 40.1 ms/step at full size on a v5e)
    return clip_and_skip_nonfinite(cfg.train.grad_clip, inner)


def clip_and_skip_nonfinite(
    max_norm: float, inner: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Global-norm clipping fused with the non-finite step skip.

    Computes the gradient global norm ONCE and uses it for (a) torch-style
    clipping ``g * min(1, max_norm/norm)``, (b) the reference's NaN-grad-norm
    step skip (train_fastspeech.py:123-128), and (c) reporting -- the norm is
    exposed as state["grad_norm"] so the train step does not recompute the
    161-leaf reduction. See module docstring for why this replaces
    optax.apply_if_finite + clip_by_global_norm."""

    def init(params):
        return {"inner": inner.init(params),
                "grad_norm": jnp.zeros([], jnp.float32),
                "notfinite_count": jnp.zeros([], jnp.int32)}

    def update(updates, state, params=None):
        norm = optax.global_norm(updates)
        finite = jnp.isfinite(norm)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
        clipped = jax.tree.map(lambda u: u * scale, updates)
        new_updates, new_inner = inner.update(clipped, state["inner"], params)
        sel = lambda n, o: jnp.where(finite, n, o)
        return (
            jax.tree.map(lambda u: jnp.where(finite, u, jnp.zeros_like(u)),
                         new_updates),
            {"inner": jax.tree.map(sel, new_inner, state["inner"]),
             "grad_norm": norm,
             "notfinite_count": state["notfinite_count"] + (1 - finite)},
        )

    return optax.GradientTransformation(init, update)
