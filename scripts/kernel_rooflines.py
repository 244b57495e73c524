"""Per-kernel roofline table for the serving Pallas tier (VERDICT r3 next #5).

For each fused kernel at the bench shape (B=32, T=128, L=896, true lengths
from the valid-filelist workload) this computes analytic FLOPs and HBM bytes
from the kernels' actual blocking/copy behavior, measures device time per
kernel from a fresh profiler trace, and prints achieved TF/s, achieved GB/s,
and which roofline binds (v5e: 197 TF/s bf16, ~819 GB/s HBM; ridge ~240
FLOP/byte).

Byte model notes (from the kernel sources):
- attention (ops/pallas/attention.py): grid (B, T//bq); q/res/out blocks copy
  for EVERY grid step (dead blocks skip compute, not copies); K/V BlockSpecs
  index only on b, so Mosaic's pipeline elides re-fetch across consecutive
  q-blocks of one row -> K/V ride in once per row.
- ffn/adaptor/postnet: time-blocked with whole-row scratch; input rides in
  once per row, outputs copy per block.

FLOP model notes:
- attention live q-blocks span the FULL padded T in the score/context dots
  (masked); q-block liveness tracks true lengths at block_q granularity.
- ffn/adaptor/postnet FLOPs scale with true lengths at block granularity.

    python scripts/kernel_rooflines.py [--reps 8]
"""

import argparse
import glob
import gzip
import json
import math
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TF = 197e12     # v5e bf16 MXU
PEAK_GB = 819e9      # v5e HBM


def build(frames: int = 896):
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.data.filelist import parse_filelist
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
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
    B, T, L = 32, 128, frames
    xs = np.zeros((B, T), np.int32)
    ilens = np.zeros((B,), np.int32)
    for i in range(B):
        s = seqs[i % len(seqs)][:T]
        xs[i, : len(s)] = s
        ilens[i] = len(s)
    xs, ilens = jnp.asarray(xs), jnp.asarray(ilens)

    def infer(params, state, xs, ilens):
        with compute_dtype(jnp.bfloat16):
            mel, out_lens, durs = model.inference(params, state, xs, ilens,
                                                  out_maxlen=L)
        return mel, out_lens

    fn = jax.jit(infer)
    mel, out_lens = fn(params, state, xs, ilens)
    jax.block_until_ready(mel)
    return cfg, fn, (params, state, xs, ilens), np.asarray(ilens), \
        np.asarray(out_lens), (B, T, L)


def profile_kernels(fn, args, reps):
    tdir = tempfile.mkdtemp(prefix="rooflines_")
    with jax.profiler.trace(tdir):
        for _ in range(reps):
            mel, out_lens = fn(*args)
        np.asarray(out_lens)
    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pnames = {e["pid"]: e["args"].get("name", "") for e in events
              if e.get("ph") == "M" and e.get("name") == "process_name"}
    out = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pnames.get(e.get("pid"), "")
        if "TPU" not in pname and "/device:" not in pname:
            continue
        n = e.get("name", "")
        if n.startswith(("fused_attention", "fused_ffn", "fused_postnet",
                         "fused_variance")):
            out[n] += e["dur"] / reps
    return dict(out)


def ceil_blocks(lens, blk):
    return np.ceil(np.asarray(lens, np.float64) / blk)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--frames", type=int, default=896,
                    help="decoder frame-buffer size; pass a demand rung "
                         "(e.g. 768) to profile the shapes the r5 "
                         "demand-sized dispatch actually runs")
    args = ap.parse_args()

    cfg, fn, fnargs, ilens, out_lens, (B, T, L) = build(args.frames)
    times = profile_kernels(fn, fnargs, args.reps)
    m = cfg.model

    from fastspeech2_tpu.ops.pallas.attention import _pick_block_q_adaptive
    from fastspeech2_tpu.ops.pallas.common import pick_block_t

    rows = []

    def add(name, us, flops, gbytes, note=""):
        if not us:
            return
        tf = flops / (us * 1e-6) / 1e12
        gb = gbytes / (us * 1e-6) / 1e9
        bind = ("MXU" if tf / (PEAK_TF / 1e12) > gb / (PEAK_GB / 1e9)
                else "HBM")
        rows.append((name, us, tf, 100 * tf / (PEAK_TF / 1e12), gb,
                     100 * gb / (PEAK_GB / 1e9), bind, note))

    def attn_model(lens, Tpad, D, bq, qkv=True):
        live_rows = (ceil_blocks(lens, bq) * bq)
        # scores + context span full padded T per live q-row; out-proj D x D
        flops = float(np.sum(live_rows) * (4 * Tpad * D + 2 * D * D))
        if qkv:
            # QKV folded in-kernel (r4, fused_attention_packed_qkv_res_ln):
            # q proj per live row; K/V proj whole-T per batch row (scratch)
            flops += float(np.sum(live_rows)) * 2 * D * D
            flops += B * Tpad * 2 * 2 * D * D
            # x rides in once per row (f32) and the LN'd output writes f32;
            # q/k/v never touch HBM
            gbytes = 2.0 * B * Tpad * D * 4.0
        else:
            # split path: q/res/out copy for all blocks; K/V once per row
            gbytes = (3 * B * Tpad * D + 2 * B * Tpad * D) * 2.0
        return flops, gbytes

    def convstack_flops_per_frame():
        # adaptor: 2 predictors x (2 conv k=3 C->C) + heads + 2 embeds +
        # expansion one-hot (T-span selection matmul)
        C, D, nb = 256, m.adim, m.variance_n_bins
        conv = 2 * (2 * 2 * 3 * D * C)  # both predictors, both convs (D==C)
        heads = 2 * 2 * C
        embed = 2 * 2 * nb * D
        expand = 2 * T * D
        return conv + heads + embed + expand

    def postnet_flops_per_frame():
        pc, pk, pl_, odim = m.postnet_chans, m.postnet_filts, \
            m.postnet_layers, cfg.audio.num_mels
        return 2 * pk * (odim * pc + (pl_ - 2) * pc * pc + pc * odim)

    def ffn_flops_per_frame(D, H, k):
        return 2 * (k * D * H + H * D)

    # the attention FLOP/byte model must match the kernel variant that
    # actually ran: the QKV fold is flag-gated (ops/flags.py), engages only
    # on post-LN configs (pre-LN keeps the +res kernel), and int8 params
    # force the split path (models/encoder.py attn_dense guard)
    from fastspeech2_tpu.ops import flags

    params = fnargs[0]
    # dense OR fully-quantized attention both run the QKV fold now (int8
    # weight tiles dequantize on the fly, models/encoder.py); only a
    # partially quantized layer falls to the split path
    fold_ok = all(
        all("w" in layer["attn"][k_] for k_ in ("q", "k", "v", "out"))
        or all("q" in layer["attn"][k_] for k_ in ("q", "k", "v", "out"))
        for stack in ("encoder", "decoder")
        for layer in params[stack]["layers"])
    post_ln = not (m.encoder_normalize_before or m.decoder_normalize_before)
    qkv = bool(flags.FUSED_ATT_QKV) and fold_ok and post_ln
    attn_label = "attention+qkv+res+LN" if qkv else "attention+res+LN"

    # encoder kernels (token axis: lens = ilens, pad T=128)
    bq_e = _pick_block_q_adaptive(T)
    f, by = attn_model(ilens, T, m.adim, bq_e, qkv=qkv)
    add(f"enc {attn_label} (x4)",
        sum(v for k_, v in times.items()
            if k_.startswith("fused_attention") and v < 100) / 4,
        f, by, f"bq={bq_e}")
    bt_e = pick_block_t(T)
    live_e = float(np.sum(ceil_blocks(ilens, bt_e) * bt_e))
    # post-LN block-tail kernels (r4): x rides in f32 (4B) and the LN'd
    # output writes f32 -- the residual/LN glue's HBM traffic moved in-kernel
    add("enc conv-FFN+LN (x4)",
        sum(v for k_, v in times.items()
            if k_.startswith("fused_ffn") and v < 400) / 4,
        live_e * ffn_flops_per_frame(m.adim, m.eunits,
                                     m.positionwise_conv_kernel_size),
        B * T * m.adim * (4 + 4) + live_e * m.adim * 2,
        f"bt={bt_e}")

    # decoder kernels (frame axis: lens = out_lens, pad L=896)
    bq_d = _pick_block_q_adaptive(L)
    f, by = attn_model(out_lens, L, m.ddim, bq_d, qkv=qkv)
    add(f"dec {attn_label} (x4)",
        sum(v for k_, v in times.items()
            if k_.startswith("fused_attention") and v >= 100) / 4,
        f, by, f"bq={bq_d}")
    bt_d = pick_block_t(L)
    live_d = float(np.sum(ceil_blocks(out_lens, bt_d) * bt_d))
    add("dec conv-FFN+LN (x4)",
        sum(v for k_, v in times.items()
            if k_.startswith("fused_ffn") and v >= 400) / 4,
        live_d * ffn_flops_per_frame(m.ddim, m.dunits,
                                     m.positionwise_conv_kernel_size),
        B * L * m.ddim * (4 + 4) + live_d * m.ddim * 2,
        f"bt={bt_d}")

    # mirror the kernel's own picker (ops/pallas/adaptor.py): whole-row for
    # L <= 1024, else 128 blocks -- the liveness model must use the block
    # size that actually ran (whole-row gives up dead-block skipping, so
    # every live row pays the full L)
    bl_a = L if L <= 1024 else bt_d
    live_a = float(np.sum(ceil_blocks(out_lens, bl_a) * bl_a))
    add("variance adaptor", times.get("fused_variance_adaptor.1", 0),
        live_a * convstack_flops_per_frame(),
        (B * T * m.adim * 2  # hs in, once per row
         + B * L * m.adim * 2 * 2  # out f32... out is f32: 4 bytes
         ) * 1.0 + B * L * 4, f"bl={bl_a}")

    bt_pn = pick_block_t(L, candidates=(224, 256, 192, 128, 64, 32, 16, 8))
    live_pn = float(np.sum(ceil_blocks(out_lens, bt_pn) * bt_pn))
    add("postnet", times.get("fused_postnet.1", 0),
        live_pn * postnet_flops_per_frame(),
        (B * L * cfg.audio.num_mels * (2 + 4)) * 1.0, f"bt={bt_pn}")

    print(f"{'kernel':26s} {'us/call':>8s} {'TF/s':>7s} {'%MXU':>6s} "
          f"{'GB/s':>7s} {'%HBM':>6s}  bind  note")
    for r in rows:
        print(f"{r[0]:26s} {r[1]:8.1f} {r[2]:7.1f} {r[3]:6.1f} "
              f"{r[4]:7.1f} {r[5]:6.1f}  {r[6]:4s}  {r[7]}")
    print(json.dumps({r[0]: {"us": round(r[1], 1), "tf_s": round(r[2], 1),
                             "pct_mxu": round(r[3], 1),
                             "gb_s": round(r[4], 1),
                             "pct_hbm": round(r[5], 1), "bind": r[6]}
                      for r in rows}))


if __name__ == "__main__":
    main()
