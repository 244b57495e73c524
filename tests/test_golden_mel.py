"""Golden-mel parity harness against released reference checkpoints.

The released .pyt/.pth checkpoints (reference README.md:57,64) are not
mounted in this environment, so the golden comparison vs
``sample/generated_mel_58k.npy`` cannot execute hermetically. This file makes
it push-button the moment a checkpoint lands:

- the *mechanics* are exercised unconditionally with a locally-built stand-in
  checkpoint saved in the reference's exact on-disk format
  (``train_fastspeech.py:229-239``: dict with model/optim/step/hp_str/githash)
  and verified against the live torch oracle;
- the *golden* tests auto-activate when a released checkpoint is found (env
  ``FS2_RELEASED_CKPT`` or the standard checkpoint dirs --
  compat/golden.py:_CKPT_GLOBS) and assert vs the golden mel artifact.

One-command invocation (documented in PARITY.md):

    FS2_RELEASED_CKPT=/path/ckpt.pyt python -m pytest tests/test_golden_mel.py -v
"""

import dataclasses
import sys
import types

import numpy as np
import pytest
import torch

from fastspeech2_tpu.compat.golden import (
    GOLDEN_MEL_PATH,
    GOLDEN_TEXT,
    compare_to_golden,
    find_released_checkpoint,
    synth_with_torch_checkpoint,
)
from fastspeech2_tpu.config import Config

REF = "/root/reference"


def _ref_feed_forward_transformer():
    for mod in ("librosa", "g2p_en", "pyworld"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from fastspeech import FeedForwardTransformer

    return FeedForwardTransformer


class _Dot(dict):
    __getattr__ = dict.__getitem__


def _ns(d):
    if isinstance(d, dict):
        return _Dot({k: _ns(v) for k, v in d.items()})
    return d


def test_golden_mechanics_with_standin_checkpoint(tmp_path):
    """End-to-end harness mechanics on a reference-format checkpoint file:
    torch.save -> load_torch_checkpoint (config rebuilt from hp_str) -> text
    frontend -> batched inference -> mel allclose vs the torch oracle run on
    the identical token sequences."""
    FeedForwardTransformer = _ref_feed_forward_transformer()

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, elayers=1, dlayers=1))
    torch.manual_seed(3)
    ref_model = FeedForwardTransformer(68, 80, _ns(cfg.to_dict()))
    ref_model.eval()
    # pin the duration bias so a random init predicts a few frames per token
    with torch.no_grad():
        ref_model.duration_predictor.linear.bias.fill_(1.3)

    # the reference's exact checkpoint format (train_fastspeech.py:229-239)
    ckpt = tmp_path / "standin_58k_steps.pyt"
    torch.save({
        "model": ref_model.state_dict(),
        "optim": {},
        "step": 58000,
        "hp_str": cfg.to_yaml(),
        "githash": "deadbeef",
    }, str(ckpt))

    from fastspeech2_tpu.text import phonemes_to_sequence
    from fastspeech2_tpu.text.g2p import preprocess_text, process_paragraph

    sentences = [s for s in process_paragraph(GOLDEN_TEXT) if s.strip()]
    phoneme_strs = [preprocess_text(s) for s in sentences]

    mel, loaded_cfg, step = synth_with_torch_checkpoint(
        str(ckpt), phoneme_strs=phoneme_strs)
    assert step == 58000
    assert loaded_cfg.model.elayers == 1  # config came from hp_str, not defaults
    assert mel.shape[0] == 80 and mel.shape[1] > 0

    # oracle: the reference's own synth() path on identical tokens
    # (inference.py:111-130,170-176)
    oracle = []
    with torch.no_grad():
        for p in phoneme_strs:
            ids = np.asarray(phonemes_to_sequence(p), np.int64)
            oracle.append(ref_model.inference(torch.from_numpy(ids)).numpy().T)
    oracle_mel = np.concatenate(oracle, axis=1)

    assert mel.shape == oracle_mel.shape, (
        f"frame count diverges: ours {mel.shape} vs oracle {oracle_mel.shape}")
    np.testing.assert_allclose(mel, oracle_mel, rtol=1e-4, atol=2e-4)


def test_standin_checkpoint_via_cli_synth(tmp_path):
    """The `synth -p ckpt.pth` CLI path (cli.py) consumes a reference-format
    checkpoint end-to-end: text in, mel.npy + wav out."""
    FeedForwardTransformer = _ref_feed_forward_transformer()

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, elayers=1, dlayers=1))
    torch.manual_seed(5)
    ref_model = FeedForwardTransformer(68, 80, _ns(cfg.to_dict()))
    with torch.no_grad():
        ref_model.duration_predictor.linear.bias.fill_(1.3)
    ckpt = tmp_path / "standin.pyt"
    torch.save({"model": ref_model.state_dict(), "step": 7,
                "hp_str": cfg.to_yaml()}, str(ckpt))

    from fastspeech2_tpu.cli import main

    out = tmp_path / "out"
    main(["synth", "-p", str(ckpt), "--text", "printing is an art.",
          "--out", str(out)])
    mel = np.load(out / "mel.npy")
    assert mel.shape[0] == 80 and mel.shape[1] > 0
    assert (out / "test_tts.wav").exists()


_RELEASED = find_released_checkpoint()


@pytest.mark.skipif(_RELEASED is None, reason=(
    "no released reference checkpoint mounted; set FS2_RELEASED_CKPT or drop "
    "one under checkpoints/released/ to activate the golden-mel comparison"))
def test_released_checkpoint_synthesizes():
    """A released checkpoint loads through the interop path and synthesizes a
    sane mel for the README sentence; MAE vs the golden artifact is reported
    regardless of g2p frontend availability."""
    mel, cfg, step = synth_with_torch_checkpoint(_RELEASED)
    assert mel.shape[0] == cfg.audio.num_mels
    assert np.all(np.isfinite(mel))
    # log-mel range sanity: floor is log(1e-5) ~= -11.5
    assert mel.min() >= np.log(1e-5) - 1e-3 and mel.max() < 5.0
    report = compare_to_golden(mel)
    print(f"\ngolden-mel report (ckpt={_RELEASED}, step={step}): {report}")


def _exact_frontend_phonemes():
    """The exact g2p_en tokenization the golden mel was generated with:
    from FS2_GOLDEN_PHONEMES (a '|'-separated list of space-joined per-sentence
    phoneme strings) or live g2p_en when importable. None when unavailable."""
    import os

    env = os.environ.get("FS2_GOLDEN_PHONEMES")
    if env:
        return env.split("|")
    return None  # no env override: the harness runs live g2p_en itself


@pytest.mark.skipif(_RELEASED is None, reason=(
    "no released reference checkpoint mounted (FS2_RELEASED_CKPT)"))
def test_released_checkpoint_golden_mel_allclose():
    """THE north-star check (BASELINE configs[0-2]): released 58k checkpoint +
    README sentence => allclose vs sample/generated_mel_58k.npy.

    Requires the exact g2p frontend (g2p_en importable, or the original
    phoneme strings via FS2_GOLDEN_PHONEMES) -- the hermetic lexicon g2p can
    tokenize differently, which changes predicted durations and frame counts.
    """
    try:
        import g2p_en  # noqa: F401
        have_g2p = True
    except ImportError:
        have_g2p = False
    phoneme_strs = _exact_frontend_phonemes()
    if phoneme_strs is None and not have_g2p:
        pytest.skip("exact frontend unavailable: install g2p_en or set "
                    "FS2_GOLDEN_PHONEMES to the original tokenization")

    mel, _, step = synth_with_torch_checkpoint(
        _RELEASED, phoneme_strs=phoneme_strs)
    report = compare_to_golden(mel)
    print(f"\ngolden-mel allclose report (step={step}): {report}")
    assert report["frames_match"], (
        f"frame count diverges from golden: {report} -- is this the 58k "
        f"checkpoint? (golden mel is the 58k-step artifact)")
    golden = np.load(GOLDEN_MEL_PATH)
    np.testing.assert_allclose(mel, golden, rtol=1e-4, atol=2e-4)


def test_golden_cli_with_standin_checkpoint(tmp_path, capsys):
    """`golden -p ckpt` prints the MAE report JSON for any reference-format
    checkpoint (the push-button CLI for the released-checkpoint check)."""
    import json

    FeedForwardTransformer = _ref_feed_forward_transformer()
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, elayers=1, dlayers=1))
    torch.manual_seed(9)
    ref_model = FeedForwardTransformer(68, 80, _ns(cfg.to_dict()))
    with torch.no_grad():
        ref_model.duration_predictor.linear.bias.fill_(1.3)
    ckpt = tmp_path / "standin.pyt"
    torch.save({"model": ref_model.state_dict(), "step": 58000,
                "hp_str": cfg.to_yaml()}, str(ckpt))

    from fastspeech2_tpu.cli import main

    main(["golden", "-p", str(ckpt)])
    report = json.loads(capsys.readouterr().out)
    assert report["step"] == 58000
    assert report["golden_shape"] == [80, 423]
    assert np.isfinite(report["mae_overlap"])
