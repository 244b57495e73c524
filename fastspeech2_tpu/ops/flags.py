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

#: head-packed training attention kernels (ops/pallas/attention_train.py:
#: fused_attention_train_packed): Q/K/V stay in row-major (B, T, D) with
#: heads as D-slices, eliminating the 4 layout transposes per layer (plus
#: backward mirrors) the (B, H, T, dk) kernels need around the projections.
#: Measured on v5e at the full-size train step (B=16, T=128, L=896):
#: 18.84 -> 18.05 ms/step (-4.2%, region clock, bench --train flag A/B;
#: op-level interleaved A/B scripts/measure_train_packed.py agreed at
#: -4.1%), KEPT (PARITY.md r5). FS2_FUSED_ATT_TRAIN_PACKED=off disables.
FUSED_ATT_TRAIN_PACKED: bool = (
    os.environ.get("FS2_FUSED_ATT_TRAIN_PACKED", "on") != "off")


#: size the serving frame buffer from the EXACT per-batch frame demand
#: instead of the frames-per-token heuristic: the serving call splits into
#: an encode program (encoder + duration head -> demand) and a decode
#: program dispatched on the smallest 256-frame rung >= the batch's demand
#: (infer/synthesize.py). Attacks the measured 0.53 frame-buffer occupancy
#: -- decoder attention score/context dots span the full padded L (VERDICT
#: r4 next #1). Unlike the other flags this is host-side dispatch logic,
#: not a trace-time branch; it exists as an env kill switch for A/B and
#: rollback. FS2_DEMAND_SIZED=off disables.
DEMAND_SIZED: bool = os.environ.get("FS2_DEMAND_SIZED", "on") != "off"

#: run the duration head in f32 with Precision.HIGHEST dots inside the bf16
#: speed path (models/fastspeech2.py:inference). The head's exp/round/clamp
#: (reference duration_predictor.py:77-81) sits on a rounding knife-edge:
#: bf16 head numerics flipped 3/5 parity sentences by +-1-3 frames
#: (BENCH_r04.json duration_match 2/5), shifting every downstream frame. The
#: head is ~0.1% of serving FLOPs, so full precision there is free.
#: FS2_F32_DURATION=off disables (restores the pure-bf16 head).
F32_DURATION: bool = os.environ.get("FS2_F32_DURATION", "on") != "off"
