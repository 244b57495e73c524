"""A/B: synchronous vs double-buffered serving dispatch (VERDICT r3 next #3).

Workload = bench.py's serving micro-batch (B=32 real phoneme sequences,
full-size model, bf16 speed path). Mode "sync" finishes batch k's
device->host transfer before dispatching k+1 (the round-3 Batcher);
mode "pipelined" dispatches k+1 first (the Synthesizer *_async split the
round-4 Batcher uses). Delivered throughput = host-received mel frames / s
wall, the serving tier's honest number on any dispatch-costly link.

Run on the tunneled chip: python scripts/measure_double_buffer.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.data.filelist import parse_filelist
    from fastspeech2_tpu.infer.synthesize import Synthesizer
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.text import phonemes_to_sequence

    cfg = Config()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params["duration_predictor"]["out"]["b"] = (
        jnp.full_like(params["duration_predictor"]["out"]["b"], 1.87))

    entries = parse_filelist("/root/reference/filelists/valid_filelist.txt")
    seqs = [np.asarray(phonemes_to_sequence(e.phonemes), np.int32)
            for e in entries]
    batch = [seqs[i % len(seqs)][:128] for i in range(32)]

    synth = Synthesizer(model, params, state,
                        bf16=jax.default_backend() == "tpu")
    # warmup/compile
    mel, lens = synth.mel_from_token_batch(batch)
    frames = int(lens.sum())
    print(f"frames/batch: {frames}", file=sys.stderr)

    reps = 8
    rounds = 5  # interleaved A/B rounds; tunnel round-trip cost drifts
    out = {"sync": [], "pipelined": []}

    def run_sync():
        for _ in range(reps):
            synth.mel_from_token_batch_async(batch)()

    def run_pipelined():
        inflight = None
        for _ in range(reps):
            nxt = synth.mel_from_token_batch_async(batch)
            if inflight is not None:
                inflight()
            inflight = nxt
        inflight()

    for r in range(rounds):
        for name, fn in (("sync", run_sync), ("pipelined", run_pipelined)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            fps = round(frames * reps / dt, 1)
            out[name].append(fps)
            print(f"round {r} {name}: {fps} frames/s wall", file=sys.stderr)
    med = {k: float(np.median(v)) for k, v in out.items()}
    med["pipelined_over_sync"] = round(med["pipelined"] / med["sync"], 4)
    print(json.dumps({"windows": out, **med}))


if __name__ == "__main__":
    main()
