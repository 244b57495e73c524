"""Device-side A/B: QKV projections folded into the post-LN attention kernel
(ops/pallas/attention.py:fused_attention_packed_qkv_res_ln) vs the kept
split path (XLA projections + fused_attention_packed_res_ln).

Same keep-or-revert methodology as measure_serving_candidates.py: full
serving step at the bench workload, profiler device-op totals, interleaved
rounds so drift can't masquerade as a win.

    python scripts/measure_qkv_fold.py [--reps 8] [--rounds 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from measure_serving_candidates import device_total_ms  # noqa: E402
from profile_serving import build_workload  # noqa: E402


def build_variant(qkv: bool):
    from fastspeech2_tpu.ops import flags

    prev = flags.FUSED_ATT_QKV
    flags.FUSED_ATT_QKV = qkv  # trace-time branch: force the trace NOW,
    try:
        infer, args = build_workload()  # while the flag holds this value
        jax.block_until_ready(infer(*args))
    finally:
        flags.FUSED_ATT_QKV = prev  # don't leak the override to later traces
    return infer, args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}")
    results = {"split": [], "qkv": []}
    variants = {"split": build_variant(False), "qkv": build_variant(True)}
    for r in range(args.rounds):
        for name in ("split", "qkv") if r % 2 == 0 else ("qkv", "split"):
            fn, wargs = variants[name]
            ms = device_total_ms(fn, wargs, args.reps, f"qkvfold_{name}_{r}")
            results[name].append(ms)
            print(f"  round {r} {name:5s}: {ms:.3f} ms/call (device)")
    import numpy as np

    s, q = np.median(results["split"]), np.median(results["qkv"])
    print(f"median split={s:.3f} ms  qkv-folded={q:.3f} ms  "
          f"delta={100 * (q - s) / s:+.1f}%")


if __name__ == "__main__":
    from bench import _enable_compile_cache

    _enable_compile_cache()  # reuse bench-compiled steps
    main()
