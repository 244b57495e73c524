"""Measure the W8A8 int8 serving tier on the real chip (VERDICT r1 item 3).

Reports, at the bench.py serving workload (valid-filelist phonemes cycled to
batch 32, full-size model, pinned duration bias):

- throughput: f32 / bf16 / int8 mel-frames/s on this chip;
- mel deviation: int8 and bf16 vs the f32 "highest"-precision reference on
  the 5-sentence parity set (per-sentence MAE / max-abs, frame-count drift).

Results are recorded in PARITY.md; rerun with
``python scripts/measure_int8.py``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.config import Config
from fastspeech2_tpu.data.filelist import parse_filelist
from fastspeech2_tpu.infer.synthesize import Synthesizer
from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
from fastspeech2_tpu.text import phonemes_to_sequence

SENTENCES = 5  # parity-set size (PARITY.md mel-parity methodology)


def main():
    cfg = Config()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params["duration_predictor"]["out"]["b"] = (
        jnp.full_like(params["duration_predictor"]["out"]["b"], 1.87))

    entries = parse_filelist("/root/reference/filelists/valid_filelist.txt")
    seqs = [np.asarray(phonemes_to_sequence(e.phonemes), np.int32)
            for e in entries]
    bench_batch = [seqs[i % len(seqs)][:128] for i in range(32)]
    parity_set = seqs[:SENTENCES]

    from fastspeech2_tpu.ops.precision import compute_dtype
    from fastspeech2_tpu.ops.quant8 import quantize_model_params

    params_q = jax.device_get(jax.jit(quantize_model_params)(params))

    # device-resident throughput (bench.py methodology: inputs stay on
    # device, block on the device result -- mel_from_token_batch would pull
    # (32, L, 80) f32 to the host through the tunnel every rep and measure
    # transfers, not compute)
    B, T, L = 32, 128, 896
    xs = np.zeros((B, T), np.int32)
    ilens = np.zeros((B,), np.int32)
    for i, s in enumerate(bench_batch):
        xs[i, : len(s)] = s
        ilens[i] = len(s)
    xs, ilens = jnp.asarray(xs), jnp.asarray(ilens)

    def make_infer(p, dt):
        @jax.jit
        def infer(xs, ilens):
            with compute_dtype(dt):
                return model.inference(p, state, xs, ilens, out_maxlen=L)
        return infer

    tiers_fns = {
        "f32": make_infer(params, None),
        "bf16": make_infer(params, jnp.bfloat16),
        "int8": make_infer(params_q, jnp.bfloat16),
    }
    out = {}
    for name, fn in tiers_fns.items():
        mel, out_lens, _ = fn(xs, ilens)
        jax.block_until_ready(mel)
        frames = int(np.asarray(out_lens).sum())
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            mel, out_lens, _ = fn(xs, ilens)
        jax.block_until_ready(mel)
        dt = time.perf_counter() - t0
        out[name] = {"mel_frames_per_s": round(frames * reps / dt, 1)}

    # mel parity set (host pulls are fine here; exact-unpadded => batch-safe)
    mels = {}
    for name, kw in (("f32", dict(matmul_precision="highest")),
                     ("bf16", dict(bf16=True)),
                     ("int8", dict(bf16=True, int8=True))):
        s = Synthesizer(model, params, state, **kw)
        pm, pl = s.mel_from_token_batch(parity_set)
        mels[name] = [pm[i, : pl[i]] for i in range(SENTENCES)]

    for name in ("bf16", "int8"):
        maes, maxes, drift = [], [], 0
        for a, b in zip(mels[name], mels["f32"]):
            n = min(a.shape[0], b.shape[0])
            drift += abs(a.shape[0] - b.shape[0])
            d = np.abs(np.asarray(a[:n], np.float32) - np.asarray(b[:n], np.float32))
            maes.append(float(d.mean()))
            maxes.append(float(d.max()))
        out[name]["mel_mae_vs_f32"] = round(float(np.mean(maes)), 5)
        out[name]["mel_maxabs_vs_f32"] = round(float(np.max(maxes)), 4)
        out[name]["frame_drift_vs_f32"] = int(drift)
    out["int8_vs_bf16_speedup"] = round(
        out["int8"]["mel_frames_per_s"] / out["bf16"]["mel_frames_per_s"], 3)

    # many-model consolidation (VERDICT r4 next #4): bytes per RESIDENT model
    # instance, the int8 tier's memory pitch, measured -- analytically from
    # the pytrees and, when the backend exposes allocator stats, as the
    # on-device bytes_in_use delta of 4 fresh copies.
    def nbytes(tree):
        return sum(int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
                   for x in jax.tree.leaves(tree))

    out["model_bytes_f32"] = nbytes(params)
    out["model_bytes_int8"] = nbytes(params_q)
    out["consolidation_ratio"] = round(nbytes(params) / nbytes(params_q), 3)
    try:
        dev = jax.devices()[0]
        base = dev.memory_stats()["bytes_in_use"]
        copies = [jax.tree.map(
            lambda x: jax.device_put(np.array(x, copy=True)), params_q)
            for _ in range(4)]
        jax.block_until_ready(copies)
        out["int8_bytes_in_use_per_copy"] = int(
            (dev.memory_stats()["bytes_in_use"] - base) / 4)
        del copies
    except Exception as e:
        out["memory_stats"] = f"unavailable: {type(e).__name__}"
    out["device"] = str(jax.devices()[0].device_kind)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    from bench import _enable_compile_cache

    _enable_compile_cache()  # reuse bench-compiled steps
    main()
