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
import time

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

    tiers = {
        "f32": dict(matmul_precision="highest"),
        "bf16": dict(bf16=True),
        "int8": dict(bf16=True, int8=True),
    }
    out = {}
    mels = {}
    for name, kw in tiers.items():
        s = Synthesizer(model, params, state, **kw)
        mel, lens = s.mel_from_token_batch(bench_batch)  # compile+warmup
        frames = int(lens.sum())
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            mel, lens = s.mel_from_token_batch(bench_batch)
        dt = time.perf_counter() - t0
        out[name] = {"mel_frames_per_s": round(frames * reps / dt, 1)}
        # parity mels, one utterance per row (exact-unpadded => batch-safe)
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
    out["device"] = str(jax.devices()[0].device_kind)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
