"""The jitted training step: grad accumulation, clipping, NaN-skip, data
parallelism via GSPMD sharding annotations.

TPU-first redesign of the reference loop body (``train_fastspeech.py:88-131``):
instead of a Python micro-batch loop with ``.backward()`` every iteration, the
whole accumulation window is one jitted step -- a ``lax.scan`` over micro-batches
accumulating gradients on-device, then clip -> Noam-Adam -> apply. Under a
``jax.sharding.Mesh`` the batch axis is sharded over devices; XLA's SPMD
partitioner inserts the psum gradient all-reduce over ICI automatically
(SURVEY.md 2.8).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastspeech2_tpu.models.fastspeech2 import Batch, FastSpeech2

Array = jax.Array


class TrainState(NamedTuple):
    params: dict
    model_state: dict      # postnet BatchNorm running stats
    opt_state: optax.OptState
    step: Array            # int32 scalar


def make_train_step(model: FastSpeech2, optimizer: optax.GradientTransformation,
                    accum_grad: int = 1, bf16: bool = False,
                    sequence_parallel: bool = False, tp_mesh=None):
    """Build the (unjitted) train step fn: (TrainState, Batch, rng) ->
    (TrainState, report-dict).

    The incoming Batch is the full accumulation window; leaves are reshaped to
    (accum_grad, micro_batch, ...) and scanned. Each micro-batch loss is scaled
    by 1/accum_grad like the reference (train_fastspeech.py:109-119).

    bf16 (cfg.train.bf16): matmul/conv operands in bf16 with f32 accumulation
    for forward AND backward, while master params, optimizer state, losses,
    layernorms, and softmax stay f32 -- the standard TPU mixed-precision
    recipe. Default off = reference-parity f32 numerics. Measured on a v5e at
    the full model size: f32 and plain-XLA bf16 both run ~42-43 ms/step with
    losses equal to 6 significant digits (XLA already lowers f32 matmuls onto
    the MXU efficiently); bf16 additionally enables the fused Pallas training
    attention (ops/pallas/attention_train.py) and hash-mask dropout
    (ops/nn.py:dropout), which together bring the step to ~23 ms (1.9x).
    Post-change profile: the k=9 conv-FFN matmuls dominate at ~190 TF/s --
    MXU roofline -- so the remaining time is real model FLOPs.
    """
    from fastspeech2_tpu.ops.precision import compute_dtype
    from fastspeech2_tpu.parallel.sharding import (
        DATA_AXIS, MODEL_AXIS, sequence_sharding, tensor_parallel_attention)

    # Megatron-SP: shard the (B, T, D) residual streams' time axis over the
    # TP axis between blocks (parallel/sharding.py:sequence_sharding). Only
    # meaningful under a 2-D mesh (shard_train_step_tp).
    seq_spec = P(DATA_AXIS, MODEL_AXIS, None) if sequence_parallel else None

    def loss_fn(params, model_state, micro: Batch, rng):
        # tp_mesh: fused Pallas attention shard_maps over its 'model' axis
        # (head-divisible TP keeps the kernels; parallel/sharding.py)
        with compute_dtype(jnp.bfloat16 if bf16 else None), \
                sequence_sharding(seq_spec), \
                tensor_parallel_attention(tp_mesh):
            loss, report, new_state = model.forward(
                params, model_state, micro, rng=rng, training=True)
        return loss / accum_grad, (report, new_state)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(ts: TrainState, batch: Batch, rng: Array):
        if accum_grad == 1:
            # no accumulation: skip the scan wrapper (a 1-iteration scan still
            # zero-initializes and copies the whole grad pytree)
            (_, (reports, new_model_state)), grads = grad_fn(
                ts.params, ts.model_state, batch, rng)
        else:
            micros = jax.tree.map(
                lambda x: x.reshape(
                    (accum_grad, x.shape[0] // accum_grad) + x.shape[1:]),
                batch)

            def micro_step(carry, inp):
                grads_acc, model_state = carry
                micro, mrng = inp
                (_, (report, new_state)), grads = grad_fn(
                    ts.params, model_state, micro, mrng)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, new_state), report

            zeros = jax.tree.map(jnp.zeros_like, ts.params)
            rngs = jax.random.split(rng, accum_grad)
            (grads, new_model_state), reports = jax.lax.scan(
                micro_step, (zeros, ts.model_state), (micros, rngs))

        updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        report = jax.tree.map(jnp.mean, reports)
        # the framework optimizer (train/optimizer.py) exposes the global
        # grad norm in its dict-shaped state; a plain optax transform (also a
        # legal `optimizer` argument) has tuple state and no norm to report
        if isinstance(new_opt_state, dict) and "grad_norm" in new_opt_state:
            report["grad_norm"] = new_opt_state["grad_norm"]
        new_ts = TrainState(new_params, new_model_state, new_opt_state, ts.step + 1)
        return new_ts, report

    return train_step


def make_eval_step(model: FastSpeech2):
    """Teacher-forced validation step (no dropout, BN running stats)."""

    def eval_step(ts: TrainState, batch: Batch):
        loss, report, _ = model.forward(ts.params, ts.model_state, batch,
                                        training=False)
        return report

    return eval_step


def buffer_donation_is_cheap() -> bool:
    """Whether donating the TrainState to the step is free (normal PJRT) or
    pathological. Remote-tunneled backends (platform_version contains
    'axon') round-trip donated arguments through the host on EVERY call --
    measured 12 s vs 21 ms wall per train step at the full model size on a
    tunneled v5e. Donation is only a memory optimization (avoids holding two
    copies of params+opt state during the step, ~300 MB at 25.6M params), so
    skip it on such backends."""
    try:
        import jax.extend.backend as jeb

        pv = getattr(jeb.get_backend(), "platform_version", "") or ""
    except Exception:
        pv = ""
    return "axon" not in pv.lower()


def shard_train_step(train_step, mesh: Mesh):
    """Jit a train step with GSPMD data-parallel shardings: state replicated,
    batch sharded on its leading axis over the 'data' mesh axis."""
    donate = (0,) if buffer_donation_is_cheap() else ()
    if mesh.devices.size == 1:
        # sharding annotations are a no-op on one device, and on tunneled
        # backends committed in/out shardings cost a round-trip per pytree
        # leaf per call (measured 1.4 s vs 21 ms wall per step)
        return jax.jit(train_step, donate_argnums=donate)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=donate,
    )


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the visible devices (SURVEY.md 2.8: the
    25.6M-param model replicates; only the batch shards)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=("data",))
