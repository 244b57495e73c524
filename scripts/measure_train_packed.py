"""Device-side A/B: head-packed training attention (no layout transposes)
vs the (B, H, T, dk) transposing kernels (VERDICT r4 next #3).

Full-size train step (B=16, T=128, L=896, bf16, forward+backward+clip+Noam
-- the exact bench.py --train shape), profiler device-op totals, interleaved
rounds (PARITY.md keep-or-revert discipline).

    python scripts/measure_train_packed.py [--reps 4] [--rounds 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

def build_step(packed: bool):
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.models.fastspeech2 import Batch, FastSpeech2
    from fastspeech2_tpu.ops import flags
    from fastspeech2_tpu.train.optimizer import make_optimizer
    from fastspeech2_tpu.train.step import TrainState, make_train_step

    prev = flags.FUSED_ATT_TRAIN_PACKED
    flags.FUSED_ATT_TRAIN_PACKED = packed  # trace-time branch
    try:
        cfg = Config()
        bf16 = jax.default_backend() == "tpu"
        model = FastSpeech2(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        opt = make_optimizer(cfg)
        ts = TrainState(params, state, opt.init(params), jnp.int32(0))
        B, T, L = 16, 128, 896
        g = np.random.default_rng(0)
        ds = np.full((B, T), L // T, np.int32)
        batch = Batch(
            xs=jnp.asarray(g.integers(1, 68, (B, T)), jnp.int32),
            ilens=jnp.asarray(np.full((B,), T, np.int32)),
            ys=jnp.asarray(g.normal(size=(B, L, 80)), jnp.float32),
            olens=jnp.asarray(np.full((B,), L, np.int32)),
            ds=jnp.asarray(ds),
            es=jnp.asarray(g.uniform(0, 130, (B, L)), jnp.float32),
            ps=jnp.asarray(g.uniform(71, 676, (B, L)), jnp.float32))
        step_fn = jax.jit(make_train_step(model, opt, accum_grad=1,
                                          bf16=bf16))
        ts, report = step_fn(ts, batch, jax.random.PRNGKey(1))  # compile
        jax.block_until_ready(report["loss"])
        return step_fn, ts, batch
    finally:
        flags.FUSED_ATT_TRAIN_PACKED = prev


def device_step_ms(step_fn, ts, batch, reps, tag):
    """Device-op total per step; threads the TrainState through the window
    (the step may donate its input buffers), returns (ms, new_ts)."""
    import shutil
    import time

    from profile_serving import device_op_table

    d = f"/tmp/fs2_ab_{tag}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    rngs = jax.random.split(jax.random.PRNGKey(2), reps)
    with jax.profiler.trace(d):
        for i in range(reps):
            ts, report = step_fn(ts, batch, rngs[i])
        float(np.asarray(report["loss"]))
    time.sleep(1.0)
    table = device_op_table(d)
    return sum(us for us, _ in table.values()) / reps / 1000.0, ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}")
    variants = {"unpacked": build_step(False), "packed": build_step(True)}
    results = {n: [] for n in variants}
    for r in range(args.rounds):
        order = (["unpacked", "packed"] if r % 2 == 0
                 else ["packed", "unpacked"])
        for n in order:
            step_fn, ts, batch = variants[n]
            ms, ts = device_step_ms(step_fn, ts, batch, args.reps,
                                    f"trainpack_{n}_{r}")
            variants[n] = (step_fn, ts, batch)
            results[n].append(ms)
            print(f"  round {r} {n:8s}: {ms:.3f} ms/step (device)")
    u, p = np.median(results["unpacked"]), np.median(results["packed"])
    print(f"median unpacked={u:.3f} ms  packed={p:.3f} ms  "
          f"delta={100 * (p - u) / u:+.1f}%")


if __name__ == "__main__":
    from bench import _enable_compile_cache

    _enable_compile_cache()  # reuse bench-compiled steps
    main()
