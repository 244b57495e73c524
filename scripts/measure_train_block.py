"""Device-side A/B: fused training attention-half block kernel
(attn_block_train: QKV + attention dropout + out proj + residual dropout +
residual + post-LN in ONE forward, XLA-recompute backward) vs the split
training path (VERDICT r4 next #3).

Full-size train step (B=16, T=128, L=896, bf16), profiler device-op totals,
interleaved rounds (PARITY.md keep-or-revert discipline).

    python scripts/measure_train_block.py [--reps 4] [--rounds 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from measure_train_packed import build_step as _build_step  # noqa: E402
from measure_train_packed import device_step_ms  # noqa: E402


def build_step(block: bool):
    from fastspeech2_tpu.ops import flags

    prev = flags.FUSED_ATT_TRAIN_BLOCK
    flags.FUSED_ATT_TRAIN_BLOCK = block  # trace-time branch
    try:
        # baseline = the kept r5 default (packed train attention ON); the
        # block kernel supersedes the attention path entirely when engaged
        return _build_step(True)
    finally:
        flags.FUSED_ATT_TRAIN_BLOCK = prev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}")
    variants = {"packed": build_step(False), "block": build_step(True)}
    results = {n: [] for n in variants}
    for r in range(args.rounds):
        order = ["packed", "block"] if r % 2 == 0 else ["block", "packed"]
        for n in order:
            step_fn, ts, batch = variants[n]
            ms, ts = device_step_ms(step_fn, ts, batch, args.reps,
                                    f"trainblock_{n}_{r}")
            variants[n] = (step_fn, ts, batch)
            results[n].append(ms)
            print(f"  round {r} {n:5s}: {ms:.3f} ms/step (device)")
    s, b = np.median(results["packed"]), np.median(results["block"])
    print(f"median packed={s:.3f} ms  block={b:.3f} ms  "
          f"delta={100 * (b - s) / s:+.1f}%")


if __name__ == "__main__":
    from bench import _enable_compile_cache

    _enable_compile_cache()  # reuse bench-compiled steps
    main()
