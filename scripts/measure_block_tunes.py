"""Measure-and-revert block-shape tunes for the non-FFN serving kernels
(VERDICT r3 next #5), one tune per kernel on its binding axis.

Candidates (from scripts/kernel_rooflines.py):
- dec attention+res (39.8% MXU): q-block 224 -> {112, 128}. Smaller q-blocks
  track true lengths tighter (live rows = ceil(len/bq)*bq), cutting the
  wasted full-T score/context FLOPs of mostly-dead blocks.
- variance adaptor (36.4% MXU): block_l 128 -> {64, 256}. Per-block VPU
  segments (LN, bucketize, relu) serialize against the MXU; fewer, larger
  blocks amortize them -- or smaller blocks track lengths tighter.
- postnet (61.2% MXU): block_t 128 -> {256}. Same trade.

Each variant retraces the serving step with the picker monkeypatched and
reports the targeted kernel's device us/call plus the whole-step device
ms/call from a fresh profiler trace.

    python scripts/measure_block_tunes.py
"""

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
    B, T, L = 32, 128, 896
    xs = np.zeros((B, T), np.int32)
    ilens = np.zeros((B,), np.int32)
    for i in range(B):
        s = seqs[i % len(seqs)][:T]
        xs[i, : len(s)] = s
        ilens[i] = len(s)
    return cfg, model, params, state, jnp.asarray(xs), jnp.asarray(ilens), L


def run_variant(model, params, state, xs, ilens, L, reps=8):
    from fastspeech2_tpu.ops.precision import compute_dtype

    def infer(params, state, xs, ilens):
        with compute_dtype(jnp.bfloat16):
            mel, out_lens, _ = model.inference(params, state, xs, ilens,
                                               out_maxlen=L)
        return mel, out_lens

    fn = jax.jit(infer)
    mel, out_lens = fn(params, state, xs, ilens)
    jax.block_until_ready(mel)
    tdir = tempfile.mkdtemp(prefix="blocktune_")
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
        if n.startswith(("fused_attention", "fused_postnet",
                         "fused_variance")):
            kern[n] += e["dur"] / reps
    dec_att = sum(v for k, v in kern.items()
                  if k.startswith("fused_attention") and v >= 100)
    return {
        "step_ms": round(total / reps / 1000.0, 3),
        "dec_attn_us_total": round(dec_att, 1),
        "adaptor_us": round(kern.get("fused_variance_adaptor.1", 0.0), 1),
        "postnet_us": round(kern.get("fused_postnet.1", 0.0), 1),
    }


def main():
    import fastspeech2_tpu.ops.pallas.adaptor as adaptor_mod
    import fastspeech2_tpu.ops.pallas.attention as attn_mod
    import fastspeech2_tpu.ops.pallas.postnet as postnet_mod

    cfg, model, params, state, xs, ilens, L = build_inputs()
    orig_attn = attn_mod._pick_block_q_adaptive
    orig_ad = adaptor_mod.pick_block_t
    orig_pn = postnet_mod.pick_block_t

    def variants():
        # L=896 = 2^7 x 7: block candidates must divide it (64/112/128/224/448)
        yield "postnet_bt=224b", {"pn": lambda T: 224}  # repeatability
        yield "postnet_bt=448", {"pn": lambda T: 448}
        yield "postnet_bt=896", {"pn": lambda T: 896}

    out = {}
    for name, patch in variants():
        attn_mod._pick_block_q_adaptive = patch.get("attn", orig_attn)
        adaptor_mod.pick_block_t = patch.get("ad", orig_ad)
        postnet_mod.pick_block_t = patch.get("pn", orig_pn)
        # the kernel entry points are themselves @jax.jit with the block size
        # resolved at trace time: without a cache clear every variant hits
        # the baseline's cached executable and the patch is invisible
        jax.clear_caches()
        try:
            out[name] = run_variant(model, params, state, xs, ilens, L)
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
        print(name, out[name], file=sys.stderr)
    attn_mod._pick_block_q_adaptive = orig_attn
    adaptor_mod.pick_block_t = orig_ad
    postnet_mod.pick_block_t = orig_pn
    print(json.dumps(out))


if __name__ == "__main__":
    main()
