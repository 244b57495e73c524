"""Block-shape tunes at the r5 demand rungs (VERDICT r4 next #1 follow-up).

The r4 tunes picked block sizes that divide L=896 (postnet bt=224); the
demand-sized dispatch decodes at 256-multiples (512/768/1024...), where 224
does not divide and the pickers fall back to 128 -- the L=768 roofline run
measured postnet at 328 us (63% MXU) vs 288 us (75%) at the 896/224 shape.
This measures postnet and conv-FFN block_t in {128, 192, 256} at L=768
(the bench workload's long rung), whole-step + per-kernel device time,
interleaved rounds.

    python scripts/measure_rung_blocks.py [--reps 8] [--rounds 2]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

L_RUNG = 768


def build_inputs():
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.data.filelist import parse_filelist
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
    B, T = 32, 128
    xs = np.zeros((B, T), np.int32)
    ilens = np.zeros((B,), np.int32)
    for i in range(B):
        s = seqs[i % len(seqs)][:T]
        xs[i, : len(s)] = s
        ilens[i] = len(s)
    return model, params, state, jnp.asarray(xs), jnp.asarray(ilens)


def run_variant(model, params, state, xs, ilens, reps):
    from fastspeech2_tpu.ops.precision import compute_dtype

    def infer(params, state, xs, ilens):
        with compute_dtype(jnp.bfloat16):
            mel, out_lens, _ = model.inference(params, state, xs, ilens,
                                               out_maxlen=L_RUNG)
        return mel, out_lens

    fn = jax.jit(infer)
    mel, out_lens = fn(params, state, xs, ilens)
    jax.block_until_ready(mel)
    tdir = tempfile.mkdtemp(prefix="rungblocks_")
    with jax.profiler.trace(tdir):
        for _ in range(reps):
            mel, out_lens = fn(params, state, xs, ilens)
        np.asarray(out_lens)
    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pnames = {e["pid"]: e["args"].get("name", "") for e in events
              if e.get("ph") == "M" and e.get("name") == "process_name"}
    kern = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pnames.get(e.get("pid"), "")
        if "TPU" not in pname and "/device:" not in pname:
            continue
        n = e.get("name", "")
        if n.startswith("jit_infer"):
            total += e["dur"]
        if n.startswith(("fused_postnet", "fused_ffn")):
            kern[n] += e["dur"] / reps
    dec_ffn = sum(v for k, v in kern.items()
                  if k.startswith("fused_ffn") and v >= 300)
    return {
        "step_ms": round(total / reps / 1000.0, 3),
        "postnet_us": round(kern.get("fused_postnet.1", 0.0), 1),
        "dec_ffn_us_total": round(dec_ffn, 1),
    }


def main():
    import fastspeech2_tpu.ops.pallas.ffn as ffn_mod
    import fastspeech2_tpu.ops.pallas.postnet as postnet_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    model, params, state, xs, ilens = build_inputs()
    orig_pn = postnet_mod.pick_block_t
    orig_ffn = ffn_mod.pick_block_t

    def variants():
        yield "baseline_128", {}
        for bt in (192, 256):
            yield f"postnet_bt={bt}", {
                "pn": lambda T, candidates=None, bt=bt:
                    bt if T == L_RUNG else orig_pn(T, candidates or
                                                   (224, 128, 64, 32, 16, 8))}
        for bt in (192, 256):
            yield f"ffn_bt={bt}", {
                "ffn": lambda T, bt=bt:
                    bt if T == L_RUNG else orig_ffn(T)}

    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}  L={L_RUNG}")
    results = defaultdict(list)
    vlist = list(variants())
    for r in range(args.rounds):
        order = vlist if r % 2 == 0 else vlist[::-1]
        for name, patch in order:
            postnet_mod.pick_block_t = patch.get("pn", orig_pn)
            ffn_mod.pick_block_t = patch.get("ffn", orig_ffn)
            jax.clear_caches()  # pickers resolve at trace time
            try:
                out = run_variant(model, params, state, xs, ilens, args.reps)
            finally:
                postnet_mod.pick_block_t = orig_pn
                ffn_mod.pick_block_t = orig_ffn
            results[name].append(out)
            print(f"  round {r} {name:16s}: step {out['step_ms']:7.3f} ms  "
                  f"postnet {out['postnet_us']:6.1f} us  "
                  f"dec-ffn {out['dec_ffn_us_total']:7.1f} us")
    print()
    for name, runs in results.items():
        med = {k: float(np.median([r[k] for r in runs])) for k in runs[0]}
        print(f"median {name:16s}: step {med['step_ms']:7.3f} ms  "
              f"postnet {med['postnet_us']:6.1f} us  "
              f"dec-ffn {med['dec_ffn_us_total']:7.1f} us")


if __name__ == "__main__":
    from bench import _enable_compile_cache

    _enable_compile_cache()
    main()
