"""Benchmark: batched free-running inference throughput on one chip.

Workload: the 10 LJSpeech valid_filelist utterances (real phoneme sequences)
cycled to batch 32, full-size model (default config), duration-predictor bias
pinned so random-init durations are realistic (~5-6 frames/token -- the same
trick is applied to the reference torch baseline in BASELINE_MEASURED.json, so
both sides synthesize comparable frame counts).

Prints ONE JSON line: mel-frames/s/chip with vs_baseline = ratio over the
reference PyTorch CPU implementation on identical inputs.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.data.filelist import parse_filelist
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.text import phonemes_to_sequence

    cfg = Config()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    # realistic durations from a random init (see module docstring)
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
    xs = jnp.asarray(xs)
    ilens = jnp.asarray(ilens)

    # speed config: bf16 matmul operands / f32 accumulation (+fused Pallas
    # attention via fused_attention="auto" on TPU). Parity configs and tests
    # stay f32 -- ops/precision.py, tests/test_precision.py.
    from fastspeech2_tpu.ops.precision import compute_dtype

    bf16 = jax.default_backend() == "tpu"

    @jax.jit
    def infer(params, state, xs, ilens):
        with compute_dtype(jnp.bfloat16 if bf16 else None):
            mel, out_lens, _ = model.inference(params, state, xs, ilens,
                                               out_maxlen=L)
        return mel, out_lens

    mel, out_lens = infer(params, state, xs, ilens)  # compile + warmup
    jax.block_until_ready(mel)
    frames_per_call = int(np.asarray(out_lens).sum())

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        mel, out_lens = infer(params, state, xs, ilens)
    jax.block_until_ready(mel)
    dt = time.perf_counter() - t0

    fps = frames_per_call * reps / dt
    audio_sps = fps * cfg.audio.hop_length / cfg.audio.sample_rate

    baseline_fps = 0.0
    try:
        with open("BASELINE_MEASURED.json") as f:
            baseline_fps = json.load(f)["torch_cpu_mel_frames_per_s"]
    except Exception:
        pass
    vs = fps / baseline_fps if baseline_fps else 0.0

    print(json.dumps({
        "metric": "inference_mel_frames_per_s_per_chip_b32",
        "value": round(fps, 1),
        "unit": "mel-frames/s",
        "vs_baseline": round(vs, 2),
        "extra": {
            "audio_seconds_per_s": round(audio_sps, 2),
            "frames_per_call": frames_per_call,
            "platform": str(jax.devices()[0].platform),
            "device": str(jax.devices()[0].device_kind),
        },
    }))


if __name__ == "__main__":
    main()
