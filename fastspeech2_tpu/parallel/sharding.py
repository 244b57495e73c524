"""Tensor parallelism: Megatron-style GSPMD sharding over a 2-D (data, model)
mesh.

The reference has no model sharding of any kind (SURVEY.md 2.8) and at 25.6M
params none is *needed* -- but a TPU-native framework should still offer it:
with it, the same train step scales over `dp x tp` pod slices, activations
shrink per chip, and the FFN/attention weight matrices stay MXU-tiled per
shard. The design is the standard Megatron split expressed as GSPMD sharding
annotations (no manual collectives -- XLA inserts the all-reduces over ICI):

- attention Q/K/V projections: output (head) dim sharded over 'model';
- attention output projection: input (head) dim sharded -> psum at the output;
- FFN first matmul/conv (d -> eunits): output channels sharded;
- FFN second matmul/conv (eunits -> d): input channels sharded -> psum;
- everything else (embeddings, layernorms, predictors, postnet, feat_out)
  is replicated -- those are <10% of FLOPs and parameters.

Sequence parallelism (Megatron-SP) is implemented below (`sequence_sharding`):
the between-block residual stream shards its time axis over the TP axis.
Pipeline/expert parallelism are deliberately absent: the model has 8 FFT
blocks and no MoE, so PP/EP have nothing to cut, and sequences are <= ~900
frames (SURVEY.md 5 "long-context: none") -- DP x TP x SP covers every real
deployment of this model family.

Rules are *path-based* (the trailing dict keys identify a projection), so the
same function shards the params tree, the gradient tree, and the Adam moment
trees inside ``optax`` state without knowing their wrappers.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey

DATA_AXIS = "data"
MODEL_AXIS = "model"

# ---------------------------------------------------------------------------
# sequence parallelism (Megatron-SP): between-block activation sharding
# ---------------------------------------------------------------------------

_SEQ = threading.local()


@contextmanager
def sequence_sharding(spec: Optional[P]):
    """Trace-time context: FFT-block residual streams get
    ``with_sharding_constraint(x, spec)`` at block boundaries
    (models/encoder.py). The Megatron-SP spec is
    ``P('data', 'model', None)`` -- the (B, T, D) stream's time axis shards
    over the TP axis, so the LN/dropout/residual segments between the
    attention/FFN matmuls hold 1/tp of the activations per chip; GSPMD
    all-gathers T into the attention/conv blocks and reduce-scatters out of
    them. Pure placement: numerics are unchanged (tests/test_parallel_tp.py).

    Same trace-time-context pattern as ops/precision.compute_dtype.
    """
    prev = getattr(_SEQ, "spec", None)
    _SEQ.spec = spec
    try:
        yield
    finally:
        _SEQ.spec = prev


def constrain_seq(x):
    """Apply the active sequence-sharding constraint (no-op outside the
    sequence_sharding context)."""
    spec = getattr(_SEQ, "spec", None)
    if spec is None:
        return x
    return jax.lax.with_sharding_constraint(x, spec)


_TP = threading.local()


@contextmanager
def tensor_parallel_attention(mesh: Optional[Mesh]):
    """Trace-time context: the fused Pallas attention entry points
    (ops/pallas/attention.py, attention_train.py) wrap their kernels in a
    ``shard_map`` over this mesh's 'model' axis instead of emitting a plain
    custom call GSPMD cannot partition. With head-aligned TP (tp | n_heads)
    the head-packed (B, T, D) layout shards cleanly on D: each model shard
    holds whole heads, so per-shard attention is exact with zero extra
    communication (the psum stays where Megatron puts it -- in the output
    projection's contraction). Same trace-time-context pattern as
    sequence_sharding above."""
    prev = getattr(_TP, "mesh", None)
    _TP.mesh = mesh
    try:
        yield
    finally:
        _TP.mesh = prev


def current_tp_mesh() -> Optional[Mesh]:
    """The active tensor_parallel_attention mesh, or None."""
    return getattr(_TP, "mesh", None)


def data_shard_map(fn, mesh: Mesh, batched):
    """shard_map ``fn`` over the mesh's 'data' axis: positional args whose
    index is in ``batched`` shard on their leading axis, everything else
    (weights, scale vectors, lists thereof) replicates. Returns ``fn``
    unchanged when the mesh has no 'data' axis.

    Why: Pallas kernels are custom calls GSPMD treats as opaque -- on a
    multi-device mesh it ALL-GATHERS their sharded operands onto every
    device and slices the result (measured 18 all-gathers around one
    attention kernel on an 8-device data mesh). Per-(batch) kernel work is
    independent, so an explicit batch-axis shard_map is communication-free.
    """
    if DATA_AXIS not in mesh.axis_names:
        return fn
    from jax import shard_map

    batched = frozenset(batched)

    def wrapped(*args):
        in_specs = tuple(
            jax.tree.map(lambda _: P(DATA_AXIS) if i in batched else P(), a)
            for i, a in enumerate(args))
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=P(DATA_AXIS), check_vma=False)(*args)

    return wrapped


def tp_degree() -> int:
    """'model'-axis size of the active kernel mesh (1 when inactive or when
    the mesh is data-only)."""
    mesh = current_tp_mesh()
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return 1
    return int(mesh.shape[MODEL_AXIS])


def make_mesh_2d(dp: int, tp: int, devices=None) -> Mesh:
    """(dp, tp) mesh with axes ('data', 'model').

    The model axis is the *minor* (fastest-varying) axis so TP collectives
    ride the tightest ICI neighborhoods on real slices.
    """
    if devices is None:
        devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=(DATA_AXIS, MODEL_AXIS))


def _pspec_for_path(path, leaf) -> P:
    """Megatron rule for one leaf, identified by its trailing dict keys.

    Works on any pytree whose FFT-block subtrees end in
    ``...['attn'][{'q','k','v','out'}][{'w','b'}]`` and
    ``...['ffn'][{'w1','w2'}][{'w','b'}]`` (the layout of
    models/encoder.py:init_encoder) -- params, grads, and Adam moments alike.
    """
    if getattr(leaf, "ndim", 0) == 0:
        return P()
    keys = [k.key for k in path if isinstance(k, DictKey)]
    for owner in ("attn", "ffn"):
        if owner in keys:
            sub = tuple(keys[keys.index(owner) + 1:])
            break
    else:
        return P()
    if owner == "attn" and len(sub) == 2:
        proj, wb = sub
        if proj in ("q", "k", "v"):
            if wb == "w":
                return P(None, MODEL_AXIS)          # (d, d) -> head dim
            if wb == "b":
                return P(MODEL_AXIS)
        elif proj == "out":
            if wb == "w":
                return P(MODEL_AXIS, None)          # contract sharded heads
            # bias replicated (added after the psum)
    elif owner == "ffn" and len(sub) == 2:
        which, wb = sub
        if which == "w1":
            if wb == "w":
                return (P(None, None, MODEL_AXIS) if leaf.ndim == 3  # conv (k,d,h)
                        else P(None, MODEL_AXIS))                    # linear (d,h)
            if wb == "b":
                return P(MODEL_AXIS)
        elif which == "w2" and wb == "w":
            return (P(None, MODEL_AXIS, None) if leaf.ndim == 3      # conv (1,h,d)
                    else P(MODEL_AXIS, None))                        # linear (h,d)
    return P()


def tree_pspecs(tree):
    """PartitionSpec pytree matching ``tree`` under the Megatron rules."""
    return jax.tree_util.tree_map_with_path(_pspec_for_path, tree)


def tree_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for ``tree`` on ``mesh`` (replicated everywhere
    except the FFT-block projections)."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s), tree_pspecs(tree))


def shard_pytree(tree, mesh: Mesh):
    """device_put ``tree`` with its Megatron shardings."""
    return jax.tree.map(jax.device_put, tree, tree_shardings(tree, mesh))


def check_tp_divisibility(cfg, tp: int) -> None:
    """TP must divide every sharded dim; head-aligned TP (tp | aheads) keeps
    the (B,T,D)->(B,T,H,dk) reshape communication-free."""
    m = cfg.model
    for name, dim in [("adim", m.adim), ("ddim", m.ddim),
                      ("eunits", m.eunits), ("dunits", m.dunits)]:
        if dim % tp:
            raise ValueError(f"tensor_parallel={tp} does not divide {name}={dim}")


def shard_train_step_tp(train_step, mesh: Mesh, ts):
    """Jit a train step over a 2-D (data, model) mesh: batch sharded over
    'data', FFT-block weights/grads/moments sharded over 'model' per the
    Megatron rules, everything else replicated. ``ts`` is a concrete
    TrainState used only to derive the sharding pytree.

    Fused Pallas attention composes with TP when tp | n_heads: pass the mesh
    as ``make_train_step(..., tp_mesh=mesh)`` and the kernels run inside a
    shard_map over 'model' (tensor_parallel_attention above) instead of
    emitting a custom call GSPMD cannot partition. Non-head-aligned tp falls
    back to the XLA attention path (models/encoder.py gates it).
    """
    from fastspeech2_tpu.train.step import buffer_donation_is_cheap

    ts_shardings = tree_shardings(ts, mesh)
    data = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(ts_shardings, data, repl),
        out_shardings=(ts_shardings, repl),
        donate_argnums=(0,) if buffer_donation_is_cheap() else (),
    )


def shard_inference_fn_tp(infer_fn, mesh: Mesh, params):
    """Jit an inference fn (params, state, xs, ilens, alphas) -> outputs over
    a 2-D mesh: batch over 'data', FFT-block weights over 'model'."""
    p_shardings = tree_shardings(params, mesh)
    data = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        infer_fn,
        in_shardings=(p_shardings, repl, data, data, data),
        out_shardings=data,
    )
