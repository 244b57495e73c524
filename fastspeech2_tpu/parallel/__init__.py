"""Parallelism: device meshes and sharded train/infer steps.

The model is ~25M params, so the scaling story is pure data parallelism over a
1-D mesh (SURVEY.md 2.8): params replicated, batch sharded, gradient psum over
ICI inserted by the SPMD partitioner. Multi-host init goes through
``jax.distributed.initialize`` (see ``initialize_multihost``).
"""

from fastspeech2_tpu.train.step import make_mesh, shard_train_step  # noqa: F401
from fastspeech2_tpu.parallel.mesh import (  # noqa: F401
    initialize_multihost,
    shard_batch,
    shard_inference_fn,
)
