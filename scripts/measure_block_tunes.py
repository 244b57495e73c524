"""Measure-and-revert block-shape tunes for the non-FFN serving kernels
(VERDICT r3 next #5), one tuning axis per kernel.

Variant set (select by name on the CLI; default runs all):
- dec attention+res: q-block 224 (baseline) vs {112, 128, 448}. Smaller
  q-blocks track true lengths tighter but amortize the K/V pipeline worse.
- variance adaptor: block_l 128 vs {64, 448} -- NOTE the (B, 2, L)
  raw-output block constrains block_l to multiples of 128 dividing L, so
  these lower as errors at L=896; kept here to document the constraint.
- postnet: block_t 224 (adopted r4) vs {64, 128, 448, 896} -- the 10-row
  halo amortization trade.

Each variant retraces the serving step with the picker monkeypatched
(jax.clear_caches() per variant -- the pickers resolve at trace time) and
reports the targeted kernel's device us/call plus the whole-step device
ms/call from a fresh profiler trace. r4 verdicts live in PARITY.md.

    python scripts/measure_block_tunes.py [variant ...]
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

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*",
                    help="subset of variant names to run (default: all)")
    cli = ap.parse_args()

    def all_variants():
        # L=896 = 2^7 x 7: block candidates must divide it (64/112/128/224/
        # 448); the adaptor additionally needs block_l % 128 == 0 for its
        # (B, 2, L) raw-output block, leaving 128 the only legal size.
        # Measured r4 verdicts are in PARITY.md ("Round-4 block-shape
        # tunes"): postnet 224 KEPT (288.5 us vs 128's 337.9); everything
        # else rejected or illegal.
        yield "baseline", {}
        yield "attn_bq=112", {"attn": lambda T: 112 if T == 896
                              else orig_attn(T)}
        yield "attn_bq=128", {"attn": lambda T: 128 if T == 896
                              else orig_attn(T)}
        yield "attn_bq=448", {"attn": lambda T: 448 if T == 896
                              else orig_attn(T)}
        yield "adaptor_bl=64", {"ad": lambda T, candidates=None: 64}
        yield "adaptor_bl=448", {"ad": lambda T, candidates=None: 448}
        # 896 (whole row) is the only OTHER divisor of L=896 that satisfies
        # the (B, 2, L) raw-output block's %128 constraint besides 128
        yield "adaptor_bl=896", {"ad": lambda T, candidates=None: 896}
        yield "postnet_bt=64", {"pn": lambda T, candidates=None: 64}
        yield "postnet_bt=128", {"pn": lambda T, candidates=None: 128}
        yield "postnet_bt=224", {"pn": lambda T, candidates=None: 224}
        yield "postnet_bt=448", {"pn": lambda T, candidates=None: 448}
        yield "postnet_bt=896", {"pn": lambda T, candidates=None: 896}

    def variants():
        for name, patch in all_variants():
            if not cli.variants or name in cli.variants:
                yield name, patch

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
