"""Released-checkpoint golden-mel harness.

The reference ships a golden artifact: ``sample/generated_mel_58k.npy`` --
the (80, 423) float32 mel its 58k-step released checkpoint produced for the
README example sentence (``/root/reference/README.md:57``,
``inference.py:143-178``). The released ``.pyt``/``.pth`` files themselves
live on Google Drive and are not mounted in this environment, so the
comparison cannot run hermetically -- but the moment a checkpoint file is
provided, :func:`synth_with_torch_checkpoint` + ``tests/test_golden_mel.py``
turn the north-star claim into a push-button check:

    FS2_RELEASED_CKPT=/path/to/ckpt.pyt python -m pytest tests/test_golden_mel.py -v

This module mirrors the reference's inference entry exactly
(``inference.py:133-178``): load checkpoint -> rebuild hparams from the
embedded ``hp_str`` -> paragraph split on '.' -> clean + g2p -> per-sentence
``model.inference`` -> concatenate sentence mels.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import numpy as np

GOLDEN_MEL_PATH = "/root/reference/sample/generated_mel_58k.npy"

#: the README example sentence (/root/reference/README.md:57) -- the input the
#: released checkpoints are demonstrated on and the presumed golden-mel input
GOLDEN_TEXT = ("ModuleList can be indexed like a regular Python list but "
               "modules it contains are properly registered.")

#: places a released checkpoint is looked for, in order (first match wins);
#: FS2_RELEASED_CKPT overrides
_CKPT_GLOBS = [
    "/root/repo/checkpoints/released/*.p*t*",
    "/root/checkpoints/*.p*t*",
    "/root/reference/checkpoints/**/*.p*t*",
]


def find_released_checkpoint() -> Optional[str]:
    """Path of a released reference checkpoint, or None if none is mounted."""
    env = os.environ.get("FS2_RELEASED_CKPT")
    if env:
        if not os.path.exists(env):
            # an explicitly-set path must not degrade into a silent skip of
            # the very check the env var exists to run
            raise FileNotFoundError(
                f"FS2_RELEASED_CKPT={env!r} does not exist")
        return env
    for pattern in _CKPT_GLOBS:
        hits = sorted(glob.glob(pattern, recursive=True))
        if hits:
            return hits[0]
    return None


def synth_with_torch_checkpoint(
    ckpt_path: str,
    text: str = GOLDEN_TEXT,
    phoneme_strs: Optional[List[str]] = None,
    g2p=None,
) -> Tuple[np.ndarray, object, int]:
    """Reference-format checkpoint + text -> (mel (n_mels, frames), cfg, step).

    Follows ``/root/reference/inference.py:133-178``: the config is rebuilt
    from the checkpoint's embedded ``hp_str`` (handles the released-checkpoint
    ddim/feat_out/56-symbol quirks, SURVEY.md 2.1), each '.'-separated
    sentence is cleaned + g2p'd + synthesized independently, and the sentence
    mels are concatenated along time. The returned layout is (n_mels, frames)
    to match ``sample/generated_mel_58k.npy``.

    phoneme_strs: optional pre-computed space-joined phoneme strings (one per
    sentence), bypassing g2p -- for reproducing the exact g2p_en tokenization
    the golden mel was generated with when g2p_en is unavailable.
    """
    import jax
    import jax.numpy as jnp

    from fastspeech2_tpu.compat.torch_loader import load_torch_checkpoint
    from fastspeech2_tpu.infer.synthesize import Synthesizer
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.text.g2p import preprocess_text, process_paragraph

    params, state, cfg, step = load_torch_checkpoint(ckpt_path)
    model = FastSpeech2(cfg)
    # "highest" matmul precision: <=1.2e-5 max-abs mel agreement vs torch-CPU
    # on v5e (PARITY.md) -- the parity configuration, not the speed one
    synth = Synthesizer(model, jax.tree.map(jnp.asarray, params),
                        jax.tree.map(jnp.asarray, state),
                        matmul_precision="highest")
    if phoneme_strs is None:
        sentences = [s for s in process_paragraph(text) if s.strip()]
        phoneme_strs = [preprocess_text(s, g2p=g2p) for s in sentences]
    mels = [synth.synth_phonemes(p) for p in phoneme_strs if p]
    if not mels:
        raise ValueError(f"input produced no phonemes: {text!r}")
    mel = np.concatenate(mels, axis=0)  # (frames, n_mels)
    return mel.T.astype(np.float32), cfg, step


# -- golden WAV (vocoded audio) harness ---------------------------------------
#
# The reference also publishes vocoded audio for its released checkpoints
# (``/root/reference/sample/sample_74k_melgan.wav`` etc., reference
# ``inference.py:183-193``: MelGAN pulled from torch.hub). These mirror the
# golden-mel flow on the wav side: released acoustic checkpoint + hub-format
# vocoder checkpoint -> fused text->wav -> spectral distance vs the published
# sample. Auto-skipping tests live in tests/test_golden_wav.py; one-command:
#
#   FS2_RELEASED_CKPT=... FS2_MELGAN_CKPT=... python -m pytest tests/test_golden_wav.py -v

GOLDEN_WAVS = {
    "melgan": "/root/reference/sample/sample_74k_melgan.wav",
    "waveglow": "/root/reference/sample/sample_74k_waveglow.wav",
}

_VOCODER_ENV = {"melgan": "FS2_MELGAN_CKPT", "waveglow": "FS2_WAVEGLOW_CKPT"}
_VOCODER_GLOBS = {
    "melgan": ["/root/repo/checkpoints/melgan/*.p*t*",
               "/root/checkpoints/melgan*.p*t*"],
    "waveglow": ["/root/repo/checkpoints/waveglow/*.p*t*",
                 "/root/checkpoints/waveglow*.p*t*"],
}


def find_vocoder_checkpoint(kind: str) -> Optional[str]:
    """Path of a vocoder checkpoint of the given kind, or None.

    ``FS2_MELGAN_CKPT`` / ``FS2_WAVEGLOW_CKPT`` override; an explicitly-set
    path that doesn't exist raises rather than silently skipping."""
    env = os.environ.get(_VOCODER_ENV[kind])
    if env:
        if not os.path.exists(env):
            raise FileNotFoundError(f"{_VOCODER_ENV[kind]}={env!r} does not exist")
        return env
    for pattern in _VOCODER_GLOBS[kind]:
        hits = sorted(glob.glob(pattern, recursive=True))
        if hits:
            return hits[0]
    return None


def synth_wav_with_torch_checkpoints(
    acoustic_ckpt: str,
    vocoder_ckpt: str,
    kind: str = "auto",
    text: str = GOLDEN_TEXT,
    phoneme_strs: Optional[List[str]] = None,
    g2p=None,
    melgan_cfg=None,
) -> Tuple[np.ndarray, int, int]:
    """Reference acoustic checkpoint + hub-format vocoder checkpoint + text
    -> (wav float32 [-1,1], sample_rate, step).

    Mirrors the reference's full audio path (``inference.py:133-201``): config
    from the embedded ``hp_str``, per-sentence synthesis, sentence wavs
    concatenated. MelGAN runs on the fused text->wav device path
    (``Synthesizer.attach_vocoder``); WaveGlow (noise-sampling) runs as its
    own device program (``attach_vocoder_fn``).

    melgan_cfg: a ``vocoder.MelGANConfig`` for non-default generators (the
    stand-in test checkpoints are narrower than the hub's base=512).
    """
    import jax
    import jax.numpy as jnp

    from fastspeech2_tpu.compat.torch_loader import load_torch_checkpoint
    from fastspeech2_tpu.infer.synthesize import Synthesizer
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.text import phonemes_to_sequence
    from fastspeech2_tpu.text.g2p import preprocess_text, process_paragraph
    from fastspeech2_tpu.vocoder import detect_vocoder_kind

    params, state, cfg, step = load_torch_checkpoint(acoustic_ckpt)
    model = FastSpeech2(cfg)
    synth = Synthesizer(model, jax.tree.map(jnp.asarray, params),
                        jax.tree.map(jnp.asarray, state),
                        matmul_precision="highest")
    if kind == "auto":
        kind = detect_vocoder_kind(vocoder_ckpt)
    if kind == "melgan":
        from fastspeech2_tpu.vocoder import MelGANGenerator, load_melgan_params
        from fastspeech2_tpu.vocoder.melgan import melgan_config_from_checkpoint

        mcfg = (melgan_cfg if melgan_cfg is not None
                else melgan_config_from_checkpoint(vocoder_ckpt))
        synth.attach_vocoder(MelGANGenerator(mcfg),
                             load_melgan_params(vocoder_ckpt, mcfg))
    elif kind == "waveglow":
        from fastspeech2_tpu.vocoder import load_waveglow

        synth.attach_vocoder_fn(load_waveglow(vocoder_ckpt))
    else:
        raise ValueError(f"unknown vocoder kind {kind!r}")

    if phoneme_strs is None:
        sentences = [s for s in process_paragraph(text) if s.strip()]
        phoneme_strs = [preprocess_text(s, g2p=g2p) for s in sentences]
    pieces = []
    for p in phoneme_strs:
        if not p:
            continue
        seq = np.asarray(phonemes_to_sequence(p), np.int32)
        _, wav, wav_lens = synth.wav_from_token_batch([seq])
        pieces.append(np.asarray(wav[0, : int(wav_lens[0])]))
    if not pieces:
        raise ValueError(f"input produced no phonemes: {text!r}")
    wav = np.concatenate(pieces)
    if wav.dtype == np.int16:  # the fused MelGAN path emits int16 PCM
        wav = wav.astype(np.float32) / 32768.0
    return wav.astype(np.float32), cfg.audio.sample_rate, step


def log_mel_distance(wav_a: np.ndarray, wav_b: np.ndarray,
                     sample_rate: int = 22050) -> dict:
    """Spectral distance between two waveforms: L1/RMS over log-mel frames
    (the domain the acoustic model is trained in), computed with the
    framework's own reference-parity mel extractor over the overlapping
    prefix. Also reports the duration ratio -- a tokenization drift shows up
    there, not in the spectral numbers."""
    from fastspeech2_tpu.audio.stft import MelSpectrogram

    mel_fn = MelSpectrogram(sample_rate, 1024, 256, 1024, 80, 0.0, 8000.0)

    def logmel(w):
        m, _ = mel_fn.mel_and_energy(np.asarray(w, np.float32)[None])
        return np.asarray(m)[0]  # (n_mels, frames)

    a, b = logmel(wav_a), logmel(wav_b)
    frames = min(a.shape[1], b.shape[1])
    d = a[:, :frames] - b[:, :frames]
    return {
        "frames_compared": int(frames),
        "duration_ratio": float(len(wav_a) / max(len(wav_b), 1)),
        "log_mel_l1": float(np.mean(np.abs(d))),
        "log_mel_rms": float(np.sqrt(np.mean(d ** 2))),
    }


def compare_to_golden_wav(wav: np.ndarray, sample_rate: int,
                          kind: str = "melgan",
                          golden_path: Optional[str] = None) -> dict:
    """Spectral-distance report of a synthesized wav vs the published sample
    (``sample_74k_melgan.wav`` / ``sample_74k_waveglow.wav``)."""
    from scipy.io.wavfile import read as read_wav

    path = golden_path or GOLDEN_WAVS[kind]
    sr, golden = read_wav(path)
    if golden.dtype == np.int16:
        golden = golden / 32768.0
    report = {"golden_path": path, "golden_sr": int(sr),
              "sr_match": int(sr) == int(sample_rate),
              "golden_samples": int(len(golden)), "samples": int(len(wav))}
    report.update(log_mel_distance(wav, golden.astype(np.float32), sample_rate))
    return report


def compare_to_golden(mel: np.ndarray,
                      golden_path: str = GOLDEN_MEL_PATH) -> dict:
    """MAE/shape report of an (n_mels, frames) mel vs the golden artifact.

    When frame counts differ (a g2p tokenization drift changes predicted
    durations), the MAE is computed over the overlapping prefix so the number
    is still informative; ``frames_match`` records whether the comparison is
    the exact golden contract.
    """
    golden = np.load(golden_path)
    frames = min(mel.shape[1], golden.shape[1])
    mae = float(np.mean(np.abs(mel[:, :frames] - golden[:, :frames])))
    return {
        "mel_shape": tuple(mel.shape),
        "golden_shape": tuple(golden.shape),
        "frames_match": mel.shape == golden.shape,
        "mae_overlap": mae,
        "max_abs_overlap": float(
            np.max(np.abs(mel[:, :frames] - golden[:, :frames]))),
    }
