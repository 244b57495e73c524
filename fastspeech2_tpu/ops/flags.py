"""Process-wide kill switches for the fused serving kernels.

Read ONCE at import time, deliberately: these values choose a branch at
*trace* time inside jitted model code and are not part of the jit cache key,
so flipping an environment variable after the first compile in a process
would silently have no effect (doubly so with the persistent compilation
cache, where the traced choice outlives even the process). Importing them as
module constants makes the contract explicit: **set the env var before the
first fastspeech2_tpu import**, not per call.

Tests that need to exercise both branches in one process monkeypatch these
attributes and build fresh (uncached) jit closures.
"""

import os

#: engage the fused variance-adaptor mega-kernel (ops/pallas/adaptor.py) on
#: the bf16 serving path. FS2_FUSED_ADAPTOR=off disables.
FUSED_ADAPTOR: bool = os.environ.get("FS2_FUSED_ADAPTOR", "on") != "off"

#: engage the fused [attention -> out-proj -> +residual] serving kernel
#: (ops/pallas/attention.py). FS2_FUSED_ATT_RES=off disables.
FUSED_ATT_RES: bool = os.environ.get("FS2_FUSED_ATT_RES", "on") != "off"

#: fold the QKV projections into the post-LN fused attention kernel
#: (ops/pallas/attention.py:fused_attention_packed_qkv_res_ln) so the
#: q/k/v streams never round-trip HBM. Measured on a v5e at the bench
#: workload: serving step 7.234 -> 6.559 ms/call (-9.3%), KEPT (PARITY.md,
#: "Round-4 QKV fold"). FS2_FUSED_ATT_QKV=off disables.
FUSED_ATT_QKV: bool = os.environ.get("FS2_FUSED_ATT_QKV", "on") != "off"
