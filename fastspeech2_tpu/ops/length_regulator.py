"""Jit-compatible length regulator.

The reference expands phoneme states frame-by-frame with a host-side Python loop
(``/root/reference/core/duration_modeling/length_regulator.py:60-95``) -- a
structural bottleneck. Here the expansion is a single gather: for output frame j,
the source phoneme index is the number of duration-cumsum entries <= j, i.e.
``searchsorted(cumsum(d), j, side='right')``. With the dataset invariant
sum(durations) == mel frames (``dataset/dataloader.py:63-65``) this is exact.

Replicated quirks:
- durations are zeroed at padded token positions;
- a sequence whose durations sum to 0 falls back to duration 1 per valid token
  (reference :86-88);
- output frames beyond the expanded length are zero-filled, matching the
  reference's ``pad_2d_tensor(xs, 0.0)`` (:65) -- this matters because the
  decoder conv-FFN (k=9) reads across the boundary.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def effective_durations(ds: Array, tok_mask: Array) -> Array:
    """Masking + all-zero fallback shared by the expansion and the demand
    check: durations are zeroed at padded positions, and a sequence whose
    durations sum to 0 falls back to 1 frame per valid token (reference
    length_regulator.py:86-88). Single source of truth -- the serving
    saturation check (infer/synthesize.py) computes its pre-clip frame
    demand through THIS function inside the same jit, so it can never drift
    from what ``expansion_indices`` actually expands."""
    ds = jnp.where(tok_mask, ds, 0).astype(jnp.int32)
    total = jnp.sum(ds, axis=-1, keepdims=True)
    return jnp.where(total == 0, tok_mask.astype(jnp.int32), ds)


def frame_demand(ds: Array, tok_mask: Array) -> Array:
    """Exact pre-clip frame demand per row: sum of the effective durations.
    ``out_lens`` alone cannot distinguish an exact fit from a clipped row
    (it is min(demand, out_maxlen), expansion_indices:45)."""
    return jnp.sum(effective_durations(ds, tok_mask), axis=-1)


def expansion_indices(
    ds: Array, tok_mask: Array, out_maxlen: int, num_tokens: int,
) -> Tuple[Array, Array, Array]:
    """The gather plan of :func:`regulate_length`, without the gather.

    Returns (idx (B, L) int32 source-token index per frame, frame_mask (B, L)
    bool, out_lens (B,) int32). Exposed separately so fused kernels
    (ops/pallas/adaptor.py) can do the expansion in VMEM.
    """
    ds = effective_durations(ds, tok_mask)

    cum = jnp.cumsum(ds, axis=-1)  # (B, T)
    # clip to the static buffer: frames past out_maxlen don't exist, and
    # callers slice mel[:, :out_lens] -- an unclipped length would silently
    # over-report (e.g. long utterances under alpha > 1 speed control)
    out_lens = jnp.minimum(cum[:, -1], out_maxlen)
    frames = jnp.arange(out_maxlen, dtype=jnp.int32)  # (L,)
    # idx[b, j] = #{i : cum[b, i] <= j}  == searchsorted(cum[b], j, 'right')
    idx = jnp.sum(cum[:, None, :] <= frames[None, :, None], axis=-1)  # (B, L)
    idx = jnp.minimum(idx, num_tokens - 1)
    frame_mask = frames[None, :] < out_lens[:, None]
    return idx, frame_mask, out_lens


def regulate_length(
    hs: Array, ds: Array, tok_mask: Array, out_maxlen: int,
    pad_to_token: bool = False,
) -> Tuple[Array, Array, Array]:
    """Expand phoneme-level states to frame level by durations.

    Args:
        hs: (B, T, D) phoneme states.
        ds: (B, T) integer durations.
        tok_mask: (B, T) bool, True at valid tokens.
        out_maxlen: static frame-axis length L of the output.
        pad_to_token: if True, out-of-range frames gather the last valid token
            instead of being zeroed (not reference behavior; off by default).

    Returns:
        (expanded (B, L, D), frame_mask (B, L) bool, out_lens (B,) int32)
    """
    idx, frame_mask, out_lens = expansion_indices(
        ds, tok_mask, out_maxlen, hs.shape[1])
    expanded = jnp.take_along_axis(hs, idx[..., None], axis=1)  # (B, L, D)
    if not pad_to_token:
        expanded = jnp.where(frame_mask[..., None], expanded, 0.0)
    return expanded, frame_mask, out_lens


def scale_durations(ds: Array, alpha) -> Array:
    """Speed control: round(d * alpha) (reference length_regulator.py:57-59).

    alpha may be a python float (static), a traced scalar, or a per-row (B,)
    vector -- traced alphas keep the jit cache warm across requests with
    different speeds, and a vector lets one batch mix per-utterance speeds.
    """
    if isinstance(alpha, (int, float)):
        if alpha == 1.0:
            return ds
        alpha = jnp.float32(alpha)
    alpha = jnp.asarray(alpha, jnp.float32)
    if alpha.ndim == 1:  # (B,) -> broadcast over the token axis
        alpha = alpha[:, None]
    return jnp.round(ds.astype(jnp.float32) * alpha).astype(jnp.int32)
