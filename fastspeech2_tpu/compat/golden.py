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
