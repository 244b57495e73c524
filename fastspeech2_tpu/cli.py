"""Command-line entry points (the reference's per-script CLIs as subcommands).

    python -m fastspeech2_tpu preprocess -d WAV_DIR -c CONFIG     (nvidia_preprocessing.py)
    python -m fastspeech2_tpu stats -c CONFIG                     (compute_statistics.py)
    python -m fastspeech2_tpu train -c CONFIG -n NAME -o OUTDIR   (train_fastspeech.py)
    python -m fastspeech2_tpu synth -p CKPT --text "..." -o OUT   (inference.py)
    python -m fastspeech2_tpu evaluate -p CKPT -c CONFIG          (evaluation.py)
    python -m fastspeech2_tpu export -p CKPT -o OUT               (export_torchscript.py)
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys

import numpy as np


def _setup_logging(outdir: str | None = None, name: str = "run"):
    handlers = [logging.StreamHandler()]
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(outdir, f"{name}.log")))
    logging.basicConfig(level=logging.INFO, handlers=handlers,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")


def cmd_preprocess(args):
    """wav -> (mel, energy, pitch) .npy per utterance (nvidia_preprocessing.py)."""
    from scipy.io.wavfile import read as read_wav

    from fastspeech2_tpu.audio.pitch import extract_pitch
    from fastspeech2_tpu.audio.stft import MelSpectrogram
    from fastspeech2_tpu.config import load_config

    cfg = load_config(args.config)
    a = cfg.audio
    mel_fn = MelSpectrogram(a.sample_rate, a.n_fft, a.hop_length, a.win_length,
                            a.n_mels, a.fmin, a.fmax)
    out_root = args.out or cfg.data.data_dir
    for sub in ("mels", "energy", "pitch"):
        os.makedirs(os.path.join(out_root, sub), exist_ok=True)
    # -d overrides; otherwise data.wav_dir from the config (the reference
    # carries wav_dir in default.yaml:3 but never reads it -- here it is the
    # documented fallback so the knob is live, not decorative).
    wav_root = args.data_path or cfg.data.wav_dir
    wavs = sorted(glob.glob(os.path.join(wav_root, "**", "*.wav"),
                            recursive=True))
    if not wavs:
        # exiting 0 with empty mels/energy/pitch dirs would surface much
        # later as an inexplicably empty feature store at train time
        raise SystemExit(
            f"preprocess: no .wav files under {wav_root!r} "
            "(pass -d or set data.wav_dir in the config)")
    logging.info("preprocessing %d wavs -> %s", len(wavs), out_root)
    # chunked + length-bucketed: mel/energy run as batched device calls with
    # a handful of static shapes (one jit compile per bucket, not per unique
    # wav length -- see MelSpectrogram.mel_and_energy_bucketed); pitch stays
    # per-utterance host DIO exactly like the reference's pyworld call
    CHUNK = 64
    for c in range(0, len(wavs), CHUNK):
        paths = wavs[c : c + CHUNK]
        signals = []
        for path in paths:
            sr, wav = read_wav(path)
            if wav.dtype == np.int16:
                wav = wav / 32768.0
            elif wav.dtype == np.int32:
                wav = wav / 2147483648.0
            assert sr == a.sample_rate, f"{path}: sr {sr} != {a.sample_rate}"
            wav = wav.astype(np.float32)
            if a.peak_norm:  # normalise to the peak of each wav file
                peak = np.abs(wav).max()
                if peak > 0:
                    wav = wav / peak
            signals.append(wav)
        feats = mel_fn.mel_and_energy_bucketed(signals)
        for path, wav, (mel, e) in zip(paths, signals, feats):
            p = extract_pitch(wav, a.sample_rate, a.hop_length)
            p = p[: mel.shape[1]]
            utt = os.path.basename(path).split(".")[0]
            np.save(os.path.join(out_root, "mels", f"{utt}.npy"), mel)
            np.save(os.path.join(out_root, "energy", f"{utt}.npy"), e)
            np.save(os.path.join(out_root, "pitch", f"{utt}.npy"),
                    p.astype(np.float64))


def cmd_stats(args):
    """Dataset e/p statistics to paste into the config (compute_statistics.py)."""
    from fastspeech2_tpu.config import load_config
    from fastspeech2_tpu.data.dataset import remove_outlier

    cfg = load_config(args.config)
    root = args.data_dir or cfg.data.data_dir
    # emit the exact config keys the user pastes into the data: section
    # (reference compute_statistics.py:40-65 + README.md:36-46: the config's
    # e_min/p_min are the NONZERO minima; mean/std over nonzero values)
    out = {}
    for kind, mean_key, cfg_key in (("energy", "e", "e"), ("pitch", "f0", "p")):
        vecs = []
        for f in sorted(glob.glob(os.path.join(root, kind, "*.npy"))):
            vecs.append(remove_outlier(np.load(f)))
        if not vecs:
            logging.warning("no %s files under %s", kind, root)
            continue
        nz = np.concatenate([v[v != 0.0] for v in vecs])
        if nz.size == 0:
            logging.warning("all %s values zero after outlier filtering", kind)
            continue
        out[f"{mean_key}_mean"] = float(nz.mean())
        out[f"{mean_key}_std"] = float(nz.std())
        out[f"{cfg_key}_min"] = float(min(v[v > 0].min() for v in vecs
                                          if (v > 0).any()))
        out[f"{cfg_key}_max"] = float(max(v.max() for v in vecs))
        np.save(os.path.join(root, f"{mean_key}_mean.npy"),
                np.float32(out[f"{mean_key}_mean"]))
        np.save(os.path.join(root, f"{mean_key}_std.npy"),
                np.float32(out[f"{mean_key}_std"]))
    # drift check: the data: section records these stats (the reference's
    # yaml carries LJSpeech's; compute_statistics.py:38-64 prints them for
    # pasting back). A large mismatch means the config was written for a
    # different dataset than the feature store -- the quantizer bin edges
    # (p_min/p_max/e_min/e_max) would then be wrong for this data.
    for key, cfg_val in (("e_mean", cfg.data.e_mean), ("e_std", cfg.data.e_std),
                         ("f0_mean", cfg.data.f0_mean),
                         ("f0_std", cfg.data.f0_std),
                         ("e_min", cfg.data.e_min), ("e_max", cfg.data.e_max),
                         ("p_min", cfg.data.p_min), ("p_max", cfg.data.p_max)):
        if key in out and cfg_val and \
                abs(out[key] - cfg_val) > 0.25 * max(abs(cfg_val), 1e-6):
            logging.warning(
                "config data.%s=%.4g but this dataset measures %.4g "
                "(>25%% off) -- update the data: section or the "
                "pitch/energy bins will misquantize", key, cfg_val, out[key])
    print(json.dumps(out, indent=1))


def cmd_train(args):
    from fastspeech2_tpu.config import load_config
    from fastspeech2_tpu.train.loop import train

    _setup_logging(args.outdir, args.name)
    cfg = load_config(args.config)
    train(cfg, args.name, args.outdir, resume_path=args.checkpoint_path,
          max_steps=args.max_steps, data_dir=args.data_dir,
          profile_dir=args.profile_dir)


def cmd_gta(args):
    """Ground-truth-aligned mel dump for vocoder finetuning (working version
    of the reference's broken create_gta)."""
    import jax

    from fastspeech2_tpu.config import Config, load_config
    from fastspeech2_tpu.data.dataset import TTSDataset
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.train.checkpoint import (load_checkpoint,
                                                  load_checkpoint_meta)
    from fastspeech2_tpu.train.gta import generate_gta

    _setup_logging(None)
    if args.config:
        cfg = load_config(args.config)
    else:  # rebuild from the checkpoint's embedded config (== hp_str)
        cfg = Config.from_yaml(load_checkpoint_meta(args.checkpoint_path)["hp_yaml"])
    model = FastSpeech2(cfg)
    p0, s0 = model.init(jax.random.PRNGKey(0))
    params, state, _, _, cfg = load_checkpoint(args.checkpoint_path, p0, s0)
    ds = TTSDataset(args.data_dir or cfg.data.data_dir,
                    args.filelist or cfg.data.train_filelist,
                    cfg.train.use_phonemes, cfg.data.tts_cleaner_names)
    generate_gta(model, jax.tree.map(np.asarray, params), state, ds, args.out)


def cmd_synth(args):
    from fastspeech2_tpu.infer.synthesize import Synthesizer, vocode, write_wav
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.train.checkpoint import load_checkpoint_meta
    from fastspeech2_tpu.config import Config, load_config

    _setup_logging(args.out, "synth")
    import jax

    if args.checkpoint_path and args.checkpoint_path.endswith((".pth", ".pyt", ".pt")):
        from fastspeech2_tpu.compat.torch_loader import load_torch_checkpoint

        cfg = load_config(args.config) if args.config else None
        params, state, cfg, _ = load_torch_checkpoint(args.checkpoint_path, cfg)
        model = FastSpeech2(cfg)
        params = jax.tree.map(np.asarray, params)
    elif args.checkpoint_path:
        meta = load_checkpoint_meta(args.checkpoint_path)
        cfg = Config.from_yaml(meta["hp_yaml"])
        model = FastSpeech2(cfg)
        p0, s0 = model.init(jax.random.PRNGKey(0))
        from fastspeech2_tpu.train.checkpoint import load_checkpoint

        params, state, _, _, _ = load_checkpoint(args.checkpoint_path, p0, s0)
    else:  # random init (smoke runs)
        cfg = load_config(args.config)
        model = FastSpeech2(cfg)
        params, state = model.init(jax.random.PRNGKey(0))

    synth = Synthesizer(model, params, state,
                        matmul_precision=getattr(args, "precision", "highest"),
                        int8=getattr(args, "int8", False))
    if args.phonemes:
        mel = synth.synth_phonemes(args.text, alpha=args.alpha)
        stats = {"frames": int(mel.shape[0])}
    else:
        mel, stats = synth.synth_text(args.text, alpha=args.alpha)
    logging.info("synthesized %s frames (%s)", mel.shape[0], stats)
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "mel.npy"), mel.T)  # (n_mels, L) like the ref
    try:  # mel.png artifact (reference inference.py:177-178); best-effort
        from fastspeech2_tpu.utils.plotting import save_spectrogram_png

        save_spectrogram_png(mel.T, os.path.join(args.out, "mel.png"))
    except Exception as exc:
        logging.warning("mel.png not written: %s", exc)
    vocoder = None
    vocoder_path = getattr(args, "vocoder", None) or cfg.train.vocoder_checkpoint
    if vocoder_path:
        from fastspeech2_tpu.vocoder import detect_vocoder_kind, load_vocoder

        kind = detect_vocoder_kind(vocoder_path)
        vocoder = load_vocoder(vocoder_path, kind=kind)
        logging.info("vocoding with %s checkpoint %s", kind, vocoder_path)
    wav = vocode(mel, cfg, vocoder=vocoder)
    write_wav(os.path.join(args.out, "test_tts.wav"), wav, cfg.audio.sample_rate)
    logging.info("wrote %s", os.path.join(args.out, "test_tts.wav"))


def cmd_serve(args):
    """Micro-batching HTTP synthesis server (infer/server.py)."""
    import jax

    from fastspeech2_tpu.config import Config, load_config
    from fastspeech2_tpu.infer.server import serve
    from fastspeech2_tpu.infer.synthesize import Synthesizer
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.train.checkpoint import (load_checkpoint,
                                                  load_checkpoint_meta)

    _setup_logging(None)
    if args.checkpoint_path:
        cfg = Config.from_yaml(
            load_checkpoint_meta(args.checkpoint_path)["hp_yaml"])
        model = FastSpeech2(cfg)
        p0, s0 = model.init(jax.random.PRNGKey(0))
        params, state, _, _, _ = load_checkpoint(args.checkpoint_path, p0, s0)
    else:  # random init (smoke runs)
        cfg = load_config(args.config)
        model = FastSpeech2(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
    mesh = None
    if jax.device_count() > 1:  # data-parallel inference across local chips
        from fastspeech2_tpu.train.step import make_mesh

        mesh = make_mesh(jax.device_count())
        logging.info("serving data-parallel over %d devices", jax.device_count())
    synth = Synthesizer(model, params, state,
                        bf16=jax.default_backend() == "tpu", mesh=mesh,
                        int8=getattr(args, "int8", False))
    vocoder_path = getattr(args, "vocoder", None) or cfg.train.vocoder_checkpoint
    if vocoder_path:
        from fastspeech2_tpu.vocoder import detect_vocoder_kind

        kind = detect_vocoder_kind(vocoder_path)
        if kind == "melgan":
            # Fused tts: MelGAN runs inside the same device computation as
            # the acoustic model (no host round-trip for the mel, one
            # dispatch per micro-batch instead of one per wav request).
            from fastspeech2_tpu.vocoder import (MelGANGenerator,
                                                 load_melgan_params)

            gen = MelGANGenerator(bf16=(jax.default_backend() == "tpu"))
            synth.attach_vocoder(gen, load_melgan_params(vocoder_path))
            logging.info("serving wav fused with MelGAN checkpoint %s",
                         vocoder_path)
        else:
            # WaveGlow draws per-request noise -> runs as its own device
            # program after the acoustic model, not fused.
            from fastspeech2_tpu.vocoder import load_waveglow

            synth.attach_vocoder_fn(load_waveglow(
                vocoder_path, bf16=(jax.default_backend() == "tpu")))
            logging.info("serving wav with WaveGlow checkpoint %s",
                         vocoder_path)
    if getattr(args, "warmup", False):
        import time as _time

        t0 = _time.perf_counter()
        n = synth.warmup(batch_sizes=(1, args.max_batch))
        logging.info("warmed %d serving shapes in %.1fs",
                     n, _time.perf_counter() - t0)
    serve(synth, cfg, host=args.host, port=args.port,
          max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)


def cmd_evaluate(args):
    import jax

    from fastspeech2_tpu.config import Config, load_config
    from fastspeech2_tpu.data.dataset import TTSDataset
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.train.checkpoint import (load_checkpoint,
                                                  load_checkpoint_meta)
    from fastspeech2_tpu.train.loop import evaluate_predictors
    from fastspeech2_tpu.train.step import TrainState

    _setup_logging(None)
    if args.config:
        cfg = load_config(args.config)
    else:  # rebuild from the checkpoint's embedded config (== hp_str)
        cfg = Config.from_yaml(load_checkpoint_meta(args.checkpoint_path)["hp_yaml"])
    model = FastSpeech2(cfg)
    p0, s0 = model.init(jax.random.PRNGKey(0))
    params, state, _, step, cfg = load_checkpoint(args.checkpoint_path, p0, s0)
    ts = TrainState(params, state, None, step)
    valid = TTSDataset(args.data_dir or cfg.data.data_dir, cfg.data.valid_filelist,
                       cfg.train.use_phonemes, cfg.data.tts_cleaner_names)
    print(json.dumps(evaluate_predictors(model, ts, valid), indent=1))


def cmd_convert(args):
    """Bidirectional checkpoint conversion by extension: .npz <-> .pth/.pyt.

    Our .npz -> reference torch format (compat/torch_saver.py) so models
    trained here deploy on the reference; reference .pth -> our .npz
    (compat/torch_loader.py) for the other direction.
    """
    import jax

    from fastspeech2_tpu.config import Config, load_config
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2

    _setup_logging(None)
    src, dst = args.checkpoint_path, args.out
    torch_exts = (".pth", ".pyt", ".pt")
    if src.endswith(".npz") and dst.endswith(torch_exts):
        from fastspeech2_tpu.compat.torch_saver import save_torch_checkpoint
        from fastspeech2_tpu.train.checkpoint import (load_checkpoint,
                                                      load_checkpoint_meta)

        meta = load_checkpoint_meta(src)
        cfg = Config.from_yaml(meta["hp_yaml"])
        model = FastSpeech2(cfg)
        p0, s0 = model.init(jax.random.PRNGKey(0))
        params, state, _, step, _ = load_checkpoint(src, p0, s0)
        save_torch_checkpoint(dst, jax.device_get(params),
                              jax.device_get(state), cfg, step=step)
        logging.info("wrote reference-format checkpoint %s (step %d)", dst, step)
    elif src.endswith(torch_exts) and dst.endswith(".npz"):
        from fastspeech2_tpu.compat.torch_loader import load_torch_checkpoint
        from fastspeech2_tpu.train.checkpoint import save_checkpoint

        cfg = load_config(args.config) if args.config else None
        params, state, cfg, step = load_torch_checkpoint(src, cfg)
        save_checkpoint(dst, params, state, None, step, cfg)
        logging.info("wrote native checkpoint %s (step %d)", dst, step)
    else:
        raise SystemExit(
            f"unsupported conversion {src} -> {dst}: use .npz <-> .pth/.pyt")


def cmd_average(args):
    """Average N same-config checkpoints into one deployment checkpoint
    (train/checkpoint.py:average_checkpoints). The reference has no
    equivalent; standard ESPnet/fairseq-style deployment step."""
    from fastspeech2_tpu.train.checkpoint import average_checkpoints

    _setup_logging(None)
    if len(args.checkpoints) < 2:  # a 1-file glob is a usage error, not a bug
        raise SystemExit("average: need at least 2 checkpoints "
                         f"(got {args.checkpoints})")
    step = average_checkpoints(args.checkpoints, args.out)
    logging.info("wrote %s (uniform average of %d checkpoints, step %d)",
                 args.out, len(args.checkpoints), step)


def cmd_golden(args):
    """Released-checkpoint golden comparison (compat/golden.py): load a
    reference .pth/.pyt, synthesize the README sentence exactly like
    reference inference.py, and report MAE vs sample/generated_mel_58k.npy --
    or, with --vocoder, the fused text->wav path's spectral distance vs the
    published sample wav (reference inference.py:183-193)."""
    import json

    from fastspeech2_tpu.compat.golden import (
        GOLDEN_TEXT, compare_to_golden, compare_to_golden_wav,
        find_released_checkpoint, synth_wav_with_torch_checkpoints,
        synth_with_torch_checkpoint)

    _setup_logging(None)
    ckpt = args.checkpoint_path or find_released_checkpoint()
    if not ckpt:
        raise SystemExit(
            "no released checkpoint found: pass -p, set FS2_RELEASED_CKPT, "
            "or drop one under checkpoints/released/")
    phoneme_strs = args.phonemes.split("|") if args.phonemes else None
    if args.vocoder:
        from fastspeech2_tpu.vocoder import detect_vocoder_kind

        kind = detect_vocoder_kind(args.vocoder)
        wav, sr, step = synth_wav_with_torch_checkpoints(
            ckpt, args.vocoder, kind=kind, text=args.text or GOLDEN_TEXT,
            phoneme_strs=phoneme_strs)
        if args.out_wav:
            from scipy.io.wavfile import write as write_wav

            write_wav(args.out_wav, sr,
                      (np.clip(wav, -1.0, 1.0) * 32767).astype(np.int16))
        report = compare_to_golden_wav(wav, sr, kind,
                                       golden_path=args.golden_wav)
        report.update(ckpt=ckpt, vocoder=args.vocoder, kind=kind, step=step)
        if args.out_wav:
            report["out_wav"] = args.out_wav
    else:
        mel, cfg, step = synth_with_torch_checkpoint(
            ckpt, text=args.text or GOLDEN_TEXT, phoneme_strs=phoneme_strs)
        report = compare_to_golden(mel, args.golden)
        report.update(ckpt=ckpt, step=step)
    print(json.dumps(report, indent=1))


def cmd_export(args):
    from fastspeech2_tpu.infer.export import export_inference

    _setup_logging(None)
    export_inference(args.checkpoint_path, args.out, config_path=args.config,
                     batch=args.batch, max_tokens=args.max_tokens,
                     max_frames=args.max_frames, bf16=args.bf16,
                     matmul_precision=args.precision,
                     int8=getattr(args, "int8", False),
                     vocoder_path=getattr(args, "vocoder", None))


def setup_compile_cache(cache_dir: str) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``: compiled XLA
    programs are reused across process restarts, cutting the 20-40 s
    cold-start jit of serve/synth/train. (The reference's TorchScript export
    is its only compiled-artifact reuse; here every entry point gets it.)"""
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    # cache even fast compiles: the tiny-entry/tiny-time heuristics exist for
    # shared caches, not a user-requested local one
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main(argv=None):
    p = argparse.ArgumentParser(prog="fastspeech2_tpu")
    p.add_argument("--compile_cache", default=None, metavar="DIR",
                   help="persistent XLA compilation-cache directory (reuses "
                        "compiled programs across restarts; place before the "
                        "subcommand)")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("preprocess")
    sp.add_argument("-d", "--data_path", default=None,
                    help="wav root; defaults to data.wav_dir from the config")
    sp.add_argument("-c", "--config", default=None)
    sp.add_argument("-o", "--out", default=None)
    sp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("stats")
    sp.add_argument("-c", "--config", default=None)
    sp.add_argument("-d", "--data_dir", default=None)
    sp.set_defaults(fn=cmd_stats)

    sp = sub.add_parser("train")
    sp.add_argument("-c", "--config", default=None)
    sp.add_argument("-n", "--name", default="fastspeech2")
    sp.add_argument("-o", "--outdir", default="./out")
    sp.add_argument("-p", "--checkpoint_path", default=None)
    sp.add_argument("-d", "--data_dir", default=None)
    sp.add_argument("--max_steps", type=int, default=None)
    sp.add_argument("--profile_dir", default=None,
                    help="capture a jax.profiler trace here")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("gta")
    sp.add_argument("-p", "--checkpoint_path", required=True)
    sp.add_argument("-c", "--config", default=None)
    sp.add_argument("-d", "--data_dir", default=None)
    sp.add_argument("--filelist", default=None)
    sp.add_argument("-o", "--out", required=True)
    sp.set_defaults(fn=cmd_gta)

    sp = sub.add_parser("synth")
    sp.add_argument("-p", "--checkpoint_path", default=None)
    sp.add_argument("-c", "--config", default=None)
    sp.add_argument("--text", required=True)
    sp.add_argument("--phonemes", action="store_true",
                    help="treat --text as a space-joined phoneme string")
    sp.add_argument("--alpha", type=float, default=1.0)
    sp.add_argument("--int8", action="store_true",
                    help="W8A8 int8 serving: quantize encoder/decoder matmul "
                         "weights to int8 (~2x bf16 MXU rate on v5e)")
    sp.add_argument("--precision", default="highest",
                    choices=("default", "highest"),
                    help="matmul precision for f32 inference; 'highest' keeps "
                         "TPU dots in full f32 for reference-grade mel parity "
                         "(no-op on CPU)")
    sp.add_argument("--vocoder", default=None,
                    help="local seungwonpark-format MelGAN checkpoint; the "
                         "reference fetches the same weights via torch.hub "
                         "(else Griffin-Lim fallback)")
    sp.add_argument("-o", "--out", default="./synth_out")
    sp.set_defaults(fn=cmd_synth)

    sp = sub.add_parser("serve")
    sp.add_argument("-p", "--checkpoint_path", default=None)
    sp.add_argument("-c", "--config", default=None)
    sp.add_argument("--host", default="0.0.0.0")
    sp.add_argument("--port", type=int, default=8000)
    sp.add_argument("--max_batch", type=int, default=16)
    sp.add_argument("--max_wait_ms", type=float, default=5.0)
    sp.add_argument("--int8", action="store_true",
                    help="W8A8 int8 serving for the acoustic model")
    sp.add_argument("--vocoder", default=None,
                    help="local MelGAN checkpoint for wav responses "
                         "(else Griffin-Lim)")
    sp.add_argument("--warmup", action="store_true",
                    help="pre-compile every pow2 batch bucket up to "
                         "--max_batch at common token lengths before binding "
                         "the port; unusual token lengths still pay a "
                         "first-request jit")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("evaluate")
    sp.add_argument("-p", "--checkpoint_path", required=True)
    sp.add_argument("-c", "--config", default=None)
    sp.add_argument("-d", "--data_dir", default=None)
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("convert")
    sp.add_argument("-p", "--checkpoint_path", required=True)
    sp.add_argument("-o", "--out", required=True)
    sp.add_argument("-c", "--config", default=None,
                    help="override config for .pth sources (default: the "
                         "checkpoint's embedded hp_str)")
    sp.set_defaults(fn=cmd_convert)

    sp = sub.add_parser("average")
    sp.add_argument("checkpoints", nargs="+",
                    help="two or more .npz checkpoints of the same config")
    sp.add_argument("-o", "--out", required=True)
    sp.set_defaults(fn=cmd_average)

    sp = sub.add_parser("golden")
    sp.add_argument("-p", "--checkpoint_path", default=None,
                    help="released reference .pth/.pyt (default: search "
                         "FS2_RELEASED_CKPT / checkpoints/released/)")
    sp.add_argument("--text", default=None,
                    help="input text (default: the README golden sentence)")
    sp.add_argument("--phonemes", default=None,
                    help="'|'-separated per-sentence phoneme strings to "
                         "bypass g2p (reproduce the exact 2020 g2p_en "
                         "tokenization)")
    from fastspeech2_tpu.compat.golden import GOLDEN_MEL_PATH

    sp.add_argument("--golden", default=GOLDEN_MEL_PATH)
    sp.add_argument("--vocoder", default=None,
                    help="hub-format MelGAN/WaveGlow checkpoint: compare the "
                         "fused text->wav output against the published "
                         "sample wav instead of the golden mel")
    sp.add_argument("--golden_wav", default=None,
                    help="override the published sample wav to compare "
                         "against (default: sample_74k_{melgan,waveglow}.wav)")
    sp.add_argument("--out_wav", default=None,
                    help="also write the synthesized wav here")
    sp.set_defaults(fn=cmd_golden)

    sp = sub.add_parser("export")
    sp.add_argument("-p", "--checkpoint_path", default=None)
    sp.add_argument("-c", "--config", default=None)
    sp.add_argument("-o", "--out", required=True)
    sp.add_argument("--batch", type=int, default=1)
    sp.add_argument("--max_tokens", type=int, default=192)
    sp.add_argument("--max_frames", type=int, default=1024)
    sp.add_argument("--bf16", action="store_true",
                    help="bake the bf16 MXU speed path into the artifact")
    sp.add_argument("--precision", default="default",
                    choices=("default", "highest"),
                    help="matmul precision baked into the artifact; "
                         "'highest' = full-f32 dots (TPU parity-grade)")
    sp.add_argument("--int8", action="store_true",
                    help="bake W8A8 int8 encoder/decoder matmuls into the "
                         "artifact (serving speed tier)")
    sp.add_argument("--vocoder", default=None,
                    help="MelGAN checkpoint to bake in: the artifact then "
                         "emits (mel, wav int16, out_lens) as one program")
    sp.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    if args.compile_cache:
        setup_compile_cache(args.compile_cache)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
