"""Benchmark: serving + training throughput on one chip.

Serving workload: the 10 LJSpeech valid_filelist utterances (real phoneme
sequences) cycled to batch 32, full-size model (default config),
duration-predictor bias pinned so random-init durations are realistic
(~5-6 frames/token -- the same trick is applied to the reference torch
baseline in BASELINE_MEASURED.json, so both sides synthesize comparable
frame counts).

Training workload: one full-size bf16 train step (B=16, T=128, L=896,
forward+backward+clip+Noam update -- the exact shape of
BASELINE_MEASURED.json's ``torch_cpu_train_step_s`` measurement).

Prints ONE JSON line: serving mel-frames/s/chip with vs_baseline = ratio over
the reference PyTorch CPU implementation on identical inputs; the training
numbers ride in ``extra`` (train_step_ms, train_vs_baseline). ``--train``
emits the training metric as its own single JSON line instead.

Timing methodology (round 3): on TPU, each timed window runs ``reps``
dispatches under a ``jax.profiler`` trace and reads the executable's
``jit_*`` region durations from the device track -- contiguous device
timestamps including all inter-op gaps -- medianed over 5 windows with IQR
reported. Device regions are the only dispatch-noise-free clock on this
harness: the axon tunnel's per-round-trip cost varies 1.5-30 ms session to
session for identical HLO (verified: 8 back-to-back dispatches execute
gap-free at identical region durations on the device track, so the number
equals what an accelerator-attached host gets; a chained lax.scan window
measured the same per-call device time). Host-inclusive wall-clock
throughput over the tunnel stays recorded as ``serving_fps_wall`` /
``train_step_ms_wall``. On CPU (no device track) wall-clock is used.
"""

import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def _device_region_ms(trace_dir: str, expect_calls: int = 0):
    """Total ``jit_*`` region time (ms) on the device track of the trace in
    ``trace_dir``, with the per-workload call count.

    Sums ALL jit_* device groups (ADVICE r3 #2): a step that lowers to more
    than one executable (e.g. a donation split) contributes every piece, so
    the device time cannot silently undercount. When ``expect_calls`` is
    given, only groups whose call count equals it are summed -- each
    executable of a multi-part step runs once per step, while a stray
    one-off jit (a re-traced executable, a helper run once inside the
    window) has a different count and would otherwise inflate the sum.
    Stray groups above 1% of the matching time drop the window entirely
    (they could be real step components with k != 1 dispatches per step --
    excluding them would undercount, keeping them would inflate; neither is
    attributable), trivial strays are excluded with a note, and a window
    with no matching group is reported unusable (None) rather than
    returning a number whose denominator is wrong. Returns
    (total_ms, n_calls) or (None, 0) when no device track exists (CPU)."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        return None, 0
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pnames = {e["pid"]: e["args"].get("name", "") for e in events
              if e.get("ph") == "M" and e.get("name") == "process_name"}
    groups = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if not name.startswith("jit_"):
            continue
        pname = pnames.get(e.get("pid"), "")
        if "TPU" not in pname and "/device:" not in pname:
            continue
        groups[name][0] += e["dur"]
        groups[name][1] += 1
    if not groups:
        return None, 0
    if expect_calls:
        stray = {k: v for k, v in groups.items() if v[1] != expect_calls}
        groups = {k: v for k, v in groups.items() if v[1] == expect_calls}
        if not groups:
            print(f"bench: trace in {trace_dir} has no jit_* group with "
                  f"{expect_calls} device calls; window dropped",
                  file=sys.stderr)
            return None, 0
        if stray:
            # a stray group is usually a one-off helper jit (microseconds);
            # but if its time is a real fraction of the step, excluding it
            # would UNDERCOUNT the step (e.g. a component executable that
            # runs k != 1 times per step, or a clipped first dispatch) --
            # drop the window instead of risking an overstated metric
            stray_us = sum(v[0] for v in stray.values())
            match_us = sum(v[0] for v in groups.values())
            desc = ", ".join(f"{k} (n={v[1]}, {v[0]/1e3:.2f} ms)"
                             for k, v in stray.items())
            if stray_us > 0.01 * match_us:
                print(f"bench: stray device groups [{desc}] carry "
                      f"{100 * stray_us / match_us:.1f}% of the "
                      f"{expect_calls}-call window in {trace_dir}; window "
                      "dropped (cannot attribute)", file=sys.stderr)
                return None, 0
            print(f"bench: excluding trivial stray device groups [{desc}] "
                  f"from the {expect_calls}-call window in {trace_dir}",
                  file=sys.stderr)
    total_us = sum(v[0] for v in groups.values())
    n = max(v[1] for v in groups.values())
    return total_us / 1000.0, n


def _baseline(key):
    try:
        with open("BASELINE_MEASURED.json") as f:
            return json.load(f).get(key, 0.0)
    except Exception:
        return 0.0


#: dense peak FLOP/s by TPU generation (bf16 MXU; public spec sheets). The
#: bench speed path runs bf16 matmuls, so MFU = achieved / bf16 peak.
_PEAK_BF16 = (
    ("v6", 918e12), ("trillium", 918e12),
    ("v5p", 459e12),
    ("v5 lite", 197e12), ("v5e", 197e12), ("v5litepod", 197e12),
    ("v4", 275e12),
)


def peak_flops_per_s() -> float:
    """bf16 peak of the attached chip, or 0.0 when unknown (CPU: no MFU)."""
    if jax.default_backend() != "tpu":
        return 0.0
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_BF16:
        if sub in kind:
            return peak
    return 0.0


def model_flops(cfg, token_lens, frame_lens) -> float:
    """Analytic forward FLOPs (2 x MAC) of one batched inference call, on the
    TRUE lengths (the length-adaptive kernels skip padding, so useful FLOPs
    is the honest numerator for MFU). Counts every matmul/conv: FFT blocks
    (QKV/out projections, scores+context, conv-FFN k x 1), decoder input
    linear, duration/energy/pitch predictors, one-hot variance embeddings,
    feat_out, postnet. Elementwise/LN/softmax FLOPs are omitted (<1%)."""
    m = cfg.model
    da, dd = m.adim, m.ddim
    k = m.positionwise_conv_kernel_size
    eu, du = m.eunits, m.dunits
    dc = m.duration_predictor_chans
    vc, vbins = 256, m.variance_n_bins  # variance_predictor.py:103-109
    pc, pk, pl = m.postnet_chans, m.postnet_filts, m.postnet_layers
    odim = cfg.audio.num_mels
    total = 0.0
    for T, L in zip(np.asarray(token_lens), np.asarray(frame_lens)):
        T, L = float(T), float(L)
        # encoder FFT blocks
        total += m.elayers * 2 * (4 * da * da * T + 2 * T * T * da
                                  + (k * da * eu + eu * da) * T)
        # duration predictor: 2 conv(k=3) + linear head
        total += 2 * (3 * da * dc + 3 * dc * dc + dc) * T
        # variance predictors (energy + pitch) on frames
        total += 2 * 2 * (3 * da * vc + 3 * vc * vc + vc) * L
        # one-hot pitch/energy embeddings: (L, n_bins) @ (n_bins, adim)
        total += 2 * 2 * vbins * da * L
        # decoder input linear + FFT blocks
        total += 2 * da * dd * L
        total += m.dlayers * 2 * (4 * dd * dd * L + 2 * L * L * dd
                                  + (k * dd * du + du * dd) * L)
        # feat_out + postnet (pl convs: odim->pc, (pl-2)x pc->pc, pc->odim)
        total += 2 * dd * odim * L
        total += 2 * pk * (odim * pc + (pl - 2) * pc * pc + pc * odim) * L
    return total


def _median_iqr(xs):
    xs = np.asarray(xs, np.float64)
    q1, med, q3 = np.percentile(xs, [25, 50, 75])
    return float(med), float(q3 - q1)


def bench_train():
    """Full-size train-step timing; returns (step_ms, vs_baseline, extra)."""
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.models.fastspeech2 import Batch, FastSpeech2
    from fastspeech2_tpu.train.optimizer import make_optimizer
    from fastspeech2_tpu.train.step import TrainState, make_train_step

    cfg = Config()
    bf16 = jax.default_backend() == "tpu"
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    ts = TrainState(params, state, opt_state, jnp.int32(0))

    B, T, L = 16, 128, 896
    g = np.random.default_rng(0)
    ilens = np.full((B,), T, np.int32)
    olens = np.full((B,), L, np.int32)
    xs = g.integers(1, 68, (B, T)).astype(np.int32)
    ds = np.full((B, T), L // T, np.int32)  # sums exactly to L per row
    ys = g.normal(size=(B, L, 80)).astype(np.float32)
    es = g.uniform(0.0, 130.0, (B, L)).astype(np.float32)
    ps = g.uniform(71.0, 676.0, (B, L)).astype(np.float32)
    batch = Batch(xs=jnp.asarray(xs), ilens=jnp.asarray(ilens),
                  ys=jnp.asarray(ys), olens=jnp.asarray(olens),
                  ds=jnp.asarray(ds), es=jnp.asarray(es), ps=jnp.asarray(ps))

    step_fn = jax.jit(make_train_step(model, optimizer, accum_grad=1,
                                      bf16=bf16))
    windows, reps = 5, 4
    # pre-split keys: a fold_in inside the timing loop would add a separate
    # tiny dispatch per step (measured +60 ms/step over the axon tunnel)
    rngs = list(jax.random.split(jax.random.PRNGKey(1), windows * reps + 1))
    ts, report = step_fn(ts, batch, rngs[0])  # compile + warmup
    float(np.asarray(report["loss"]))

    # device-region timing per window (see module docstring): dispatches
    # pipeline, the trace's jit_* region durations are device timestamps,
    # so the window is immune to the tunnel's per-round-trip cost. Device-
    # and wall-clocked windows are never mixed in one median (ADVICE r3 #2):
    # the headline is the device median when ANY device windows exist
    # (clock="device"), else the wall median (CPU; clock="wall").
    dev_windows, wall_ms, final_loss, i = [], [], 0.0, 0
    for w in range(windows):
        tdir = tempfile.mkdtemp(prefix=f"bench_train_w{w}_")
        t0 = time.perf_counter()
        with jax.profiler.trace(tdir):
            for _ in range(reps):
                i += 1
                ts, report = step_fn(ts, batch, rngs[i])
            # force the final result with a real device->host read:
            # block_until_ready alone can return EARLY on tunneled backends
            # (verify skill: a 42 ms step once "measured" 2.9 ms that way)
            final_loss = float(np.asarray(report["loss"]))
        wall_ms.append((time.perf_counter() - t0) / reps * 1000.0)
        dev_ms, n = _device_region_ms(tdir, expect_calls=reps)
        if dev_ms:
            dev_windows.append(dev_ms / n)
    window_ms = dev_windows if dev_windows else wall_ms
    step_ms, iqr_ms = _median_iqr(window_ms)
    wall_step_ms, _ = _median_iqr(wall_ms)
    clock = "device" if dev_windows else "wall"

    base_s = _baseline("torch_cpu_train_step_s")
    vs = (base_s * 1000.0) / step_ms if base_s else 0.0
    frames_per_s = B * L / (step_ms / 1000.0)
    # fwd + bwd ~= 3x forward FLOPs; the train batch is fully dense
    # (ilens=T, olens=L), so padded == useful
    flops_step = 3.0 * model_flops(cfg, [T] * B, [L] * B)
    peak = peak_flops_per_s()
    extra = {
        "train_mel_frames_per_s": round(frames_per_s, 1),
        "train_shape": f"B{B}xT{T}xL{L}",
        "bf16": bf16,
        "final_loss": round(final_loss, 4),
        "train_step_ms_windows": [round(w, 2) for w in window_ms],
        "train_step_ms_iqr": round(iqr_ms, 2),
        "train_step_ms_wall": round(wall_step_ms, 2),
        "train_clock": clock,
        "train_windows_used": f"{len(window_ms)}/{windows}",
        "train_flops_per_step": flops_step,
    }
    if peak:
        extra["mfu_train"] = round(flops_step / (step_ms / 1e3) / peak, 4)
    return step_ms, vs, extra


def bench_correctness(model, params, state):
    """On-chip compiled-kernel correctness artifact (VERDICT r3 next #1).

    Runs the 5-sentence parity set (PARITY.md methodology, same set as
    scripts/measure_int8.py) through BOTH serving tiers: the bf16 speed path
    with every fused Pallas kernel engaged -- compiled for the real chip,
    NOT interpret mode -- and the f32 matmul_precision="highest" XLA path.
    Emits the numeric deviation next to the speed numbers so a Mosaic or
    compiler regression that corrupts kernel output can never hide behind a
    fast number. Numerics contract: reference core/attention.py:58-65
    (mask -> -inf -> softmax -> re-zero) and fastspeech.py:192-238.

    TPU only: on CPU the fused kernels don't engage (fused_attention="auto")
    so the comparison would not exercise the compiled kernel path.
    """
    from fastspeech2_tpu.data.filelist import parse_filelist
    from fastspeech2_tpu.infer.synthesize import Synthesizer
    from fastspeech2_tpu.text import phonemes_to_sequence

    entries = parse_filelist("/root/reference/filelists/valid_filelist.txt")
    parity_set = [np.asarray(phonemes_to_sequence(e.phonemes), np.int32)
                  for e in entries[:5]]

    speed = Synthesizer(model, params, state, bf16=True)
    ref = Synthesizer(model, params, state, matmul_precision="highest")
    mel_s, len_s = speed.mel_from_token_batch(parity_set)
    mel_r, len_r = ref.mel_from_token_batch(parity_set)

    maes, maxes, matched_maes, dur_match = [], [], [], 0
    for i in range(len(parity_set)):
        ls, lr = int(len_s[i]), int(len_r[i])
        n = min(ls, lr)
        d = np.abs(mel_s[i, :n].astype(np.float64)
                   - mel_r[i, :n].astype(np.float64))
        maes.append(float(d.mean()))
        maxes.append(float(d.max()))
        if ls == lr:
            # frame-aligned: deviation here is PURE kernel/precision
            # numerics. Sentences whose duration rounding flipped at a bf16
            # knife-edge shift all downstream frames, so their pointwise
            # diff measures alignment, not correctness -- they are tracked
            # by duration_match instead.
            dur_match += 1
            matched_maes.append(float(d.mean()))
    out = {
        "mel_mae_bf16_vs_f32": round(float(np.mean(maes)), 5),
        "mel_maxabs_bf16_vs_f32": round(float(np.max(maxes)), 5),
        "mel_mae_duration_matched": (round(float(np.mean(matched_maes)), 5)
                                     if matched_maes else None),
        "duration_match": f"{dur_match}/{len(parity_set)}",
        "parity_frames_bf16": [int(x) for x in len_s],
        "parity_frames_f32": [int(x) for x in len_r],
    }

    # wav-tier band (VERDICT r4 next #7): the fused text->wav program
    # (acoustic + MelGAN + int16 PCM in ONE device call, every Pallas kernel
    # engaged, bf16) vs the f32/HIGHEST XLA vocoding of the same stand-in
    # generator. log-mel spectral distance via compat.golden.log_mel_distance
    # -- the domain the published golden wavs are compared in
    # (tests/test_golden_wav.py), so a Mosaic/vocoder-kernel regression
    # shows up here every round even without the unmounted hub weights.
    try:
        from fastspeech2_tpu.compat.golden import log_mel_distance
        from fastspeech2_tpu.vocoder.melgan import (MelGANConfig,
                                                    MelGANGenerator,
                                                    init_melgan)

        vcfg = MelGANConfig(base_channels=32)  # stand-in width; same graph
        gen = MelGANGenerator(vcfg)
        vparams = init_melgan(jax.random.PRNGKey(7), vcfg)
        speed.attach_vocoder(gen, vparams)
        ref.attach_vocoder(gen, vparams)
        _, wav_s, wl_s = speed.wav_from_token_batch(parity_set)
        _, wav_r, wl_r = ref.wav_from_token_batch(parity_set)
        l1s, matched_l1s = [], []
        for i in range(len(parity_set)):
            a = wav_s[i, : int(wl_s[i])].astype(np.float32) / 32768.0
            b = wav_r[i, : int(wl_r[i])].astype(np.float32) / 32768.0
            d = log_mel_distance(a, b)
            l1s.append(d["log_mel_l1"])
            if int(wl_s[i]) == int(wl_r[i]):
                matched_l1s.append(d["log_mel_l1"])
        out["wav_logmel_l1_bf16_vs_f32"] = round(float(np.mean(l1s)), 5)
        out["wav_logmel_l1_duration_matched"] = (
            round(float(np.mean(matched_l1s)), 5) if matched_l1s else None)
        out["wav_band_vocoder"] = f"melgan_standin_b{vcfg.base_channels}"

        # isolated vocoder-tier band: the SAME f32 mel through the fused
        # bf16 resstack-kernel generator vs the f32 XLA generator. The
        # end-to-end numbers above confound acoustic-mel deviation with
        # vocoder numerics through a chaotic random-init generator; this one
        # moves only when the vocoder tier itself (Mosaic resstack kernel /
        # bf16 cast chain) regresses.
        from fastspeech2_tpu.infer.synthesize import mel_floor_mask, pcm16

        gen_bf = MelGANGenerator(vcfg, bf16=True)
        gen_f32 = MelGANGenerator(vcfg, fused_resstack=False)
        mel_in = mel_floor_mask(jnp.asarray(mel_r), jnp.asarray(len_r))
        wav_bf = np.asarray(jax.jit(
            lambda p, m: pcm16(gen_bf(p, m)))(vparams, mel_in))
        wav_f32 = np.asarray(jax.jit(
            lambda p, m: pcm16(gen_f32(p, m)))(vparams, mel_in))
        hop = vcfg.hop_length
        voc_l1 = [log_mel_distance(
            wav_bf[i, : int(len_r[i]) * hop].astype(np.float32) / 32768.0,
            wav_f32[i, : int(len_r[i]) * hop].astype(np.float32) / 32768.0,
        )["log_mel_l1"] for i in range(len(parity_set))]
        out["voc_logmel_l1_bf16_vs_f32"] = round(float(np.mean(voc_l1)), 5)
    except Exception as e:  # the wav band must never take down the bench
        out["wav_band_error"] = f"{type(e).__name__}: {e}"
    return out


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
    windows, reps = 5, 8
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
    #
    # Serving runs the DEMAND-SIZED dispatch the serving tier uses
    # (infer/synthesize.py, flags.DEMAND_SIZED; VERDICT r4 next #1): an
    # encode program computes the exact per-row frame demand, the host
    # splits the batch at the demand median, and each half decodes on the
    # smallest 256-frame rung covering it. Measured on v5e: -7.9% device
    # time vs the old single-program L=896 buffer
    # (scripts/measure_demand_sized.py). Each dec jit gets a distinct
    # __name__ (and takes its row gather in-jit) so the device-track
    # attribution sees one jit_* group per program, each called once per
    # serving call.
    from fastspeech2_tpu.ops import make_non_pad_mask
    from fastspeech2_tpu.ops.length_regulator import frame_demand
    from fastspeech2_tpu.ops.precision import compute_dtype

    bf16 = jax.default_backend() == "tpu"
    cdt = jnp.bfloat16 if bf16 else None

    def enc_serve(params, xs, ilens):
        with compute_dtype(cdt):
            hs, d_outs = model.encode(params, xs, ilens)
            dem = frame_demand(d_outs, make_non_pad_mask(ilens, xs.shape[1]))
        return hs, d_outs, dem

    enc = jax.jit(enc_serve)
    dec_cache = {}

    def dec_for(l_pad: int, gathered: bool):
        key = (l_pad, gathered)
        if key not in dec_cache:
            if gathered:

                def dec(params, state, hs, d_outs, ilens, rows):
                    with compute_dtype(cdt):
                        return model.decode_frames(
                            params, state, jnp.take(hs, rows, axis=0),
                            jnp.take(d_outs, rows, axis=0),
                            jnp.take(ilens, rows), out_maxlen=l_pad)
            else:

                def dec(params, state, hs, d_outs, ilens):
                    with compute_dtype(cdt):
                        return model.decode_frames(
                            params, state, hs, d_outs, ilens,
                            out_maxlen=l_pad)
            dec.__name__ = f"dec_l{l_pad}"
            dec_cache[key] = jax.jit(dec)
        return dec_cache[key]

    def _rung(demand_max: int) -> int:
        return min(-(-max(int(demand_max), 1) // 256) * 256, 2048)

    def infer(params, state, xs, ilens):
        """One serving call: enc -> demand -> median-split decode."""
        hs, d_outs, dem = enc(params, xs, ilens)
        dem = np.asarray(dem)
        order = np.argsort(dem, kind="stable")
        halves = [order[: B // 2], order[B // 2:]]
        rungs = [_rung(dem[g].max()) for g in halves]
        if rungs[0] == rungs[1]:
            mel, out_lens = dec_for(rungs[1], False)(
                params, state, hs, d_outs, ilens)
            return [(np.arange(B), mel, out_lens)]
        return [(g, *dec_for(r, True)(params, state, hs, d_outs, ilens,
                                      jnp.asarray(g)))
                for g, r in zip(halves, rungs)]

    outs = infer(params, state, xs, ilens)  # compile + warmup
    jax.block_until_ready([o[1] for o in outs])
    out_lens_h = np.zeros((B,), np.int64)
    for g, _, lens_g in outs:
        out_lens_h[g] = np.asarray(lens_g)
    serve_rungs = sorted(mel.shape[1] for _, mel, _ in outs)
    frames_per_call = int(out_lens_h.sum())
    flops_per_call = model_flops(cfg, np.asarray(ilens), out_lens_h)

    # device-region timing per window (see module docstring): the `reps`
    # dispatches pipeline and execute back-to-back on the device; the
    # trace's jit_infer region durations are contiguous device timestamps,
    # immune to the tunnel's per-round-trip cost
    dev_fps, wall_fps = [], []
    for w in range(windows):
        tdir = tempfile.mkdtemp(prefix=f"bench_serve_w{w}_")
        t0 = time.perf_counter()
        with jax.profiler.trace(tdir):
            for _ in range(reps):
                outs = infer(params, state, xs, ilens)
            # np.asarray forces a real device->host read of the final output
            # (block_until_ready can return early on tunneled backends)
            np.asarray(outs[-1][2])
        dt = time.perf_counter() - t0
        wall_fps.append(frames_per_call * reps / dt)
        dev_ms, n = _device_region_ms(tdir, expect_calls=reps)
        if dev_ms:
            dev_fps.append(frames_per_call * n / (dev_ms / 1000.0))
    # device- and wall-clocked windows never share a median (ADVICE r3 #2)
    window_fps = dev_fps if dev_fps else wall_fps
    fps, fps_iqr = _median_iqr(window_fps)
    wall_fps_med, _ = _median_iqr(wall_fps)
    serve_clock = "device" if dev_fps else "wall"
    audio_sps = fps * cfg.audio.hop_length / cfg.audio.sample_rate

    baseline_fps = _baseline("torch_cpu_mel_frames_per_s")
    vs = fps / baseline_fps if baseline_fps else 0.0
    peak = peak_flops_per_s()

    train_ms, train_vs, train_extra = bench_train()

    # per-round on-chip correctness band next to the speed numbers
    correctness = bench_correctness(model, params, state) if bf16 else {}

    extra = {
        "audio_seconds_per_s": round(audio_sps, 2),
        "frames_per_call": frames_per_call,
        "platform": str(jax.devices()[0].platform),
        "device": str(jax.devices()[0].device_kind),
        "serving_fps_windows": [round(f, 1) for f in window_fps],
        "serving_fps_iqr": round(fps_iqr, 1),
        "serving_fps_wall": round(wall_fps_med, 1),
        "serving_clock": serve_clock,
        "serving_windows_used": f"{len(window_fps)}/{windows}",
        "serving_flops_per_call": flops_per_call,
        "serving_decode_rungs": serve_rungs,
        "train_step_ms": round(train_ms, 2),
        "train_vs_baseline": round(train_vs, 1),
        **train_extra,
        **correctness,
    }
    if peak:
        extra["mfu_serving"] = round(
            flops_per_call * (fps / frames_per_call) / peak, 4)
        extra["peak_bf16_flops_per_s"] = peak
    print(json.dumps({
        "metric": "inference_mel_frames_per_s_per_chip_b32",
        "value": round(fps, 1),
        "unit": "mel-frames/s",
        "vs_baseline": round(vs, 2),
        "extra": extra,
    }))


def _enable_compile_cache():
    """Persistent compilation cache: full-size compiles over the axon tunnel
    take 10-20 min; cached reloads make repeat bench runs start in seconds."""
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax_comp_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the bench over it


if __name__ == "__main__":
    _enable_compile_cache()
    if "--train" in sys.argv[1:]:
        step_ms, vs, extra = bench_train()
        print(json.dumps({
            "metric": "train_step_ms_full_size_b16",
            "value": round(step_ms, 2),
            "unit": "ms/step",
            "vs_baseline": round(vs, 1),
            "extra": extra,
        }))
    else:
        main()
