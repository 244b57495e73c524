"""The demo walkthrough executes hermetically, and the committed notebook is
exactly what its generator produces (no silent drift between the .py twin,
the generator, and demo.ipynb). The reference ships its demo as a Colab
notebook that needs Google Drive checkpoints + pip installs
(demo_fastspeech2.ipynb); ours must run end-to-end in CI."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def test_demo_py_runs_end_to_end(tmp_path):
    """examples/demo.py: dataset -> train -> checkpoint reload -> synth ->
    wav, in a fresh interpreter exactly as a user would run it."""
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "demo.py"),
         "--workdir", str(tmp_path), "--steps", "8"],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "trained 8 steps" in out.stdout
    mel = np.load(tmp_path / "mel.npy")
    assert mel.shape[0] == 80 and mel.shape[1] > 0
    assert np.all(np.isfinite(mel))
    wav_path = tmp_path / "demo.wav"
    assert wav_path.exists() and wav_path.stat().st_size > 44
    from scipy.io.wavfile import read as read_wav

    sr, wav = read_wav(str(wav_path))
    assert sr == 22050 and len(wav) > 0
    # the checkpoint landed where the demo says it does
    assert os.listdir(tmp_path / "checkpoints" / "demo")


def test_committed_notebook_matches_generator(tmp_path):
    """make_demo_nb.py regenerated in a scratch dir must byte-match the
    committed examples/demo.ipynb -- otherwise the notebook drifted from its
    generator (or vice versa) and one of them is stale."""
    pytest.importorskip("nbformat")
    shutil.copy(os.path.join(EXAMPLES, "make_demo_nb.py"),
                tmp_path / "make_demo_nb.py")
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, str(tmp_path / "make_demo_nb.py")],
                         env=env, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    regenerated = (tmp_path / "demo.ipynb").read_bytes()
    committed = open(os.path.join(EXAMPLES, "demo.ipynb"), "rb").read()
    assert regenerated == committed, (
        "examples/demo.ipynb != make_demo_nb.py output -- regenerate the "
        "notebook (python examples/make_demo_nb.py) or update the generator")


def test_notebook_cells_mirror_demo_py():
    """Every import the notebook's code cells make exists in demo.py too --
    the twins exercise the same API surface (a rename that breaks one must
    break both)."""
    nb = json.load(open(os.path.join(EXAMPLES, "demo.ipynb")))
    nb_code = "\n".join("".join(c["source"]) for c in nb["cells"]
                        if c["cell_type"] == "code")
    demo_py = open(os.path.join(EXAMPLES, "demo.py")).read()
    nb_imports = {ln.strip() for ln in nb_code.splitlines()
                  if ln.strip().startswith("from fastspeech2_tpu")}
    assert nb_imports, "notebook has no framework imports?"
    for imp in nb_imports:
        assert imp in demo_py, f"notebook-only import: {imp}"
