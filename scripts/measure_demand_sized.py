"""Device-side A/B: demand-sized decode buckets vs the single-program
heuristic frame buffer (VERDICT r4 next #1).

Variants, all on the bench serving workload (full-size model, B=32,
valid-filelist phonemes, bf16-on-TPU):

  A "fused896":  one jit, out_maxlen=896 (the r4 bench headline shape).
  B "demand":    encode program -> host reads the exact per-batch frame
                 demand -> decode program on the smallest 256-frame rung
                 covering it (what infer/synthesize.py does with
                 flags.DEMAND_SIZED). The demand read happens every rep,
                 exactly like serving; the device-op clock is unaffected by
                 the host gap (in the double-buffered server the gap
                 overlaps the other in-flight batch's compute).
  C "demand2":   like B but the decode runs as TWO sub-batches split at the
                 demand median, each on its own rung (decode bucketing) --
                 rows are length-sorted so the short half stops paying the
                 long half's padded columns.

Methodology: profiler device-op totals per call, interleaved rounds
(PARITY.md keep-or-revert discipline).

    python scripts/measure_demand_sized.py [--reps 8] [--rounds 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from measure_serving_candidates import device_total_ms  # noqa: E402


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def build(variant: str):
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.data.filelist import parse_filelist
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.ops.length_regulator import frame_demand
    from fastspeech2_tpu.ops.masks import make_non_pad_mask
    from fastspeech2_tpu.ops.precision import compute_dtype
    from fastspeech2_tpu.text import phonemes_to_sequence

    cfg = Config()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params["duration_predictor"]["out"]["b"] = (
        jnp.full_like(params["duration_predictor"]["out"]["b"], 1.87))
    entries = parse_filelist("/root/reference/filelists/valid_filelist.txt")
    seqs = [np.asarray(phonemes_to_sequence(e.phonemes), np.int32)
            for e in entries]
    B, T, L = 32, 128, 896
    xs = np.zeros((B, T), np.int32)
    ilens = np.zeros((B,), np.int32)
    for i in range(B):
        s = seqs[i % len(seqs)][:T]
        xs[i, : len(s)] = s
        ilens[i] = len(s)
    xs, ilens = jnp.asarray(xs), jnp.asarray(ilens)
    bf16 = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if bf16 else None

    if variant == "fused896":

        @jax.jit
        def infer(params, state, xs, ilens):
            with compute_dtype(dt):
                mel, out_lens, _ = model.inference(params, state, xs, ilens,
                                                   out_maxlen=L)
            return mel, out_lens

        return infer, (params, state, xs, ilens)

    @jax.jit
    def enc(params, xs, ilens):
        with compute_dtype(dt):
            hs, d_outs = model.encode(params, xs, ilens)
            dem = frame_demand(d_outs, make_non_pad_mask(ilens, xs.shape[1]))
        return hs, d_outs, dem

    dec_cache = {}

    def dec_fn(l_pad, b):
        if (l_pad, b) not in dec_cache:

            @jax.jit
            def dec(params, state, hs, d_outs, ilens):
                with compute_dtype(dt):
                    mel, out_lens = model.decode_frames(
                        params, state, hs, d_outs, ilens, out_maxlen=l_pad)
                return mel, out_lens
            dec_cache[(l_pad, b)] = dec
        return dec_cache[(l_pad, b)]

    if variant == "demand":

        def infer(params, state, xs, ilens):
            hs, d_outs, dem = enc(params, xs, ilens)
            rung = min(_round_up(int(np.asarray(dem).max()), 256), 2048)
            return dec_fn(rung, B)(params, state, hs, d_outs, ilens)

        return infer, (params, state, xs, ilens)

    if variant in ("demand2", "demand3"):
        # decode bucketing: sort rows by demand, split into equal groups,
        # decode each on its own rung (2-way: the kept serving default;
        # 3-way: measures whether a third bucket pays for its extra
        # dispatch + jit shapes)
        n_groups = int(variant[-1])

        def infer(params, state, xs, ilens):
            hs, d_outs, dem = enc(params, xs, ilens)
            dem = np.asarray(dem)
            order = np.argsort(dem)
            groups = np.array_split(order, n_groups)
            outs = []
            for g in groups:
                rung = min(_round_up(int(dem[g].max()), 256), 2048)
                gi = jnp.asarray(g)
                outs.append(dec_fn(rung, len(g))(
                    params, state, jnp.take(hs, gi, axis=0),
                    jnp.take(d_outs, gi, axis=0), jnp.take(ilens, gi)))
            return outs

        return infer, (params, state, xs, ilens)

    raise ValueError(variant)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--variants", default="fused896,demand,demand2")
    args = ap.parse_args()
    names = args.variants.split(",")

    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}")
    variants = {n: build(n) for n in names}
    # report the workload's demand stats once
    fn, wargs = variants[names[-1]]
    from fastspeech2_tpu.ops.length_regulator import frame_demand  # noqa
    results = {n: [] for n in names}
    for r in range(args.rounds):
        order = names if r % 2 == 0 else names[::-1]
        for n in order:
            fn, wargs = variants[n]
            ms = device_total_ms(fn, wargs, args.reps, f"demand_{n}_{r}")
            results[n].append(ms)
            print(f"  round {r} {n:9s}: {ms:.3f} ms/call (device)")
    meds = {n: float(np.median(v)) for n, v in results.items()}
    base = meds.get("fused896") or list(meds.values())[0]
    for n, m in meds.items():
        print(f"median {n:9s} = {m:.3f} ms  ({100 * (m - base) / base:+.1f}%"
              " vs fused896)")


if __name__ == "__main__":
    from bench import _enable_compile_cache

    _enable_compile_cache()  # reuse bench-compiled steps
    main()
