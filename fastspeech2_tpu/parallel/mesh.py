"""Mesh utilities: multi-host init, batch sharding, sharded inference.

TPU-native replacement for the distributed layer the reference lacks
(SURVEY.md 2.8): ``jax.distributed.initialize`` for multi-host process setup,
a 1-D ``Mesh('data')``, NamedSharding placement for host-local batches, and
GSPMD-sharded inference. Gradient all-reduce (psum) is inserted by the SPMD
partitioner inside the jitted train step (train/step.py:shard_train_step).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize JAX's multi-host runtime (no-op for single-process runs).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU multi-process simulation.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def shard_batch(batch, mesh: Mesh):
    """Place a host-local batch with its leading axis sharded over 'data'.

    Multi-process: each host contributes its local batch as one slab of the
    global array (global batch = per-host batch x process_count, concatenated
    in process order) -- the TPU-native equivalent of the reference's single
    DataLoader feeding a single device. Single-process: plain device_put.
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        import numpy as np

        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def gather_to_host(tree, mesh: Mesh):
    """Host-local numpy copies of a (possibly sharded) global pytree.

    A collective: EVERY process must call it (it jits an identity with
    replicated output sharding, which makes XLA all-gather sharded leaves
    cross-host). Use before host-side work on globally-sharded state --
    checkpointing, validation on a local jit, plotting. Single-process:
    plain device_get.
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    repl = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: repl, tree)
    gathered = jax.jit(lambda t: t, out_shardings=shardings)(tree)
    return jax.tree.map(np.asarray, gathered)


def shard_inference_fn(infer_fn, mesh: Mesh, n_replicated: int = 2,
                       n_data: int = 3):
    """Jit an inference fn (*replicated_args, *batch_args) -> outputs with
    the batch axis sharded over 'data' and the first ``n_replicated`` args
    (params/state/vocoder-params pytrees) replicated; the trailing ``n_data``
    args (xs/ilens/alphas -- or hs/d_outs/ilens/alphas for the demand-sized
    decode half) shard on their leading axis. The batch size must be a
    multiple of the mesh size; alphas is a per-row (B,) vector that shards
    with the batch (traced, so no recompile per speed value)."""
    if mesh.devices.size == 1:
        # no-op shardings on one device; committed in/out shardings cost a
        # per-leaf host round-trip per call on tunneled backends
        # (train/step.py:buffer_donation_is_cheap)
        return jax.jit(infer_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        infer_fn,
        in_shardings=(repl,) * n_replicated + (data,) * n_data,
        out_shardings=data,
    )
