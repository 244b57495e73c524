"""Device-side A/B of serving-step optimization candidates (VERDICT r2 #8).

Measures with the profiler's device op table (wall over the axon tunnel is
dispatch noise), following the keep-or-revert discipline in PARITY.md:

1. length-regulator expansion: dynamic row gather (current default) vs
   one-hot selection matmul. MEASURED (v5e, reps=8, full serving step):
   gather 15.857 ms vs onehot 15.893 ms total device time per call --
   neutral within noise; the candidate (commit cc471f8) was reverted and
   this A/B now only re-measures the kept gather path.
2. variance predictors: two separate conv stacks vs one stacked run
   (channels concatenated, grouped second conv) -- isolated sub-computation.
   MEASURED (v5e, B=32 L=896 bf16): separate 0.739 ms vs stacked 1.518 ms
   -- REJECTED, 2.1x slower (the grouped conv + interleaved per-half LN
   reshapes defeat XLA's fusion of the separate stacks).

    python scripts/measure_serving_candidates.py [--reps 8]
"""

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_serving import build_workload, device_op_table  # noqa: E402


def device_total_ms(fn, args, reps, tag):
    """Total device-op time per call, from a fresh profiler trace."""
    out = fn(*args)
    jax.block_until_ready(out)
    d = f"/tmp/fs2_ab_{tag}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    with jax.profiler.trace(d):
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[-1])
    time.sleep(1.0)
    table = device_op_table(d)
    return sum(us for us, _ in table.values()) / reps / 1000.0


def ab_length_regulator(reps):
    # The one-hot candidate was reverted after measuring neutral (docstring);
    # this now re-measures the kept gather path only, as a regression anchor.
    infer, wargs = build_workload()
    ms = device_total_ms(infer, wargs, reps, "lr_gather")
    print(f"  serving step, LR=gather (kept): {ms:.3f} ms/call (device)")
    return {"gather": ms}


def ab_variance_pair(reps):
    from fastspeech2_tpu.models.predictors import (PredictorConfig,
                                                   init_predictor,
                                                   predictor_apply)
    from fastspeech2_tpu.ops import nn

    cfg = PredictorConfig()
    ke, kp = jax.random.split(jax.random.PRNGKey(0))
    pe = init_predictor(ke, cfg)
    pp = init_predictor(kp, cfg)
    B, L, D = 32, 896, 256
    hs = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), jnp.bfloat16)

    from fastspeech2_tpu.ops.precision import compute_dtype

    @jax.jit
    def separate(pe, pp, hs):
        with compute_dtype(jnp.bfloat16):  # mirror the serving speed config
            return (predictor_apply(pe, cfg, hs),
                    predictor_apply(pp, cfg, hs))

    # stacked: conv1 out-channels concatenated; conv2 grouped (2 groups);
    # per-half LN via a (B, L, 2, C) reshape; per-half linear head
    c = cfg.n_chans

    def stack(pe, pp):
        w1 = jnp.concatenate([pe["convs"][0]["conv"]["w"],
                              pp["convs"][0]["conv"]["w"]], axis=-1)
        b1 = jnp.concatenate([pe["convs"][0]["conv"]["b"],
                              pp["convs"][0]["conv"]["b"]])
        w2 = jnp.concatenate([pe["convs"][1]["conv"]["w"],
                              pp["convs"][1]["conv"]["w"]], axis=-1)
        b2 = jnp.concatenate([pe["convs"][1]["conv"]["b"],
                              pp["convs"][1]["conv"]["b"]])
        ln = [jnp.stack([pe["convs"][i]["ln"][k], pp["convs"][i]["ln"][k]])
              for i in range(2) for k in ("g", "b")]
        wo = jnp.stack([pe["out"]["w"][:, 0], pp["out"]["w"][:, 0]])
        bo = jnp.stack([pe["out"]["b"][0], pp["out"]["b"][0]])
        return w1, b1, w2, b2, ln, wo, bo

    def half_ln(h, g, b, eps=1e-12):
        # h (B, L, 2, C): normalize each half over C
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + eps) * g + b

    @jax.jit
    def stacked(pe, pp, hs):
        w1, b1, w2, b2, ln, wo, bo = stack(pe, pp)
        h = jax.lax.conv_general_dilated(
            hs, w1.astype(hs.dtype), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC")) + b1.astype(hs.dtype)
        h = jax.nn.relu(h)
        h = h.reshape(B, L, 2, c)
        h = half_ln(h, ln[0], ln[1])  # (2, C) broadcasts over (B, L, 2, C)
        h = h.reshape(B, L, 2 * c)
        h = jax.lax.conv_general_dilated(
            h, w2.astype(h.dtype), (1,), "SAME", feature_group_count=2,
            dimension_numbers=("NWC", "WIO", "NWC")) + b2.astype(h.dtype)
        h = jax.nn.relu(h)
        h = h.reshape(B, L, 2, c)
        h = half_ln(h, ln[2], ln[3])
        return jnp.einsum("blgc,gc->blg", h, wo.astype(h.dtype)) + bo

    a = separate(pe, pp, hs)
    b = stacked(pe, pp, hs)
    err = max(float(jnp.max(jnp.abs(a[0] - b[..., 0]))),
              float(jnp.max(jnp.abs(a[1] - b[..., 1]))))
    print(f"  variance pair max|sep - stacked| = {err:.3e}")

    t_sep = device_total_ms(lambda *x: separate(*x), (pe, pp, hs), reps, "vp_sep")
    t_stk = device_total_ms(lambda *x: stacked(*x), (pe, pp, hs), reps, "vp_stk")
    print(f"  separate {t_sep:.3f} ms  stacked {t_stk:.3f} ms")
    return {"separate_ms": t_sep, "stacked_ms": t_stk, "max_err": err}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--skip_lr", action="store_true")
    ap.add_argument("--skip_vp", action="store_true")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()} {jax.devices()[0].device_kind}")
    if not args.skip_lr:
        print("[1] length-regulator expansion A/B (full serving step)")
        ab_length_regulator(args.reps)
    if not args.skip_vp:
        print("[2] variance-predictor pair A/B (isolated)")
        ab_variance_pair(args.reps)


if __name__ == "__main__":
    from bench import _enable_compile_cache

    _enable_compile_cache()  # reuse bench-compiled steps
    main()
