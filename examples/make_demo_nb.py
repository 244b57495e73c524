"""Regenerate examples/demo.ipynb (the notebook twin of demo.py -- the
reference ships its walkthrough as ``demo_fastspeech2.ipynb``)."""

import os

import nbformat as nbf

nb = nbf.v4.new_notebook()
cells = []

cells.append(nbf.v4.new_markdown_cell("""\
# fastspeech2_tpu — end-to-end demo

The TPU-native FastSpeech 2 walkthrough (the PyTorch reference ships this as
`demo_fastspeech2.ipynb`): build a dataset → train → reload the checkpoint →
synthesize a mel → vocode to a wav.

Runs hermetically on CPU or a TPU chip with a synthetic feature store. For
real speech, build an LJSpeech feature store with
`python -m fastspeech2_tpu preprocess` + `stats`, point the config at it, and
translate a reference checkpoint with `fastspeech2_tpu.compat.torch_loader`."""))

cells.append(nbf.v4.new_code_cell("""\
import os

import jax
import numpy as np

WORKDIR = "/tmp/fs2_demo_nb"
STEPS = 12
os.makedirs(WORKDIR, exist_ok=True)
print(jax.devices())"""))

cells.append(nbf.v4.new_markdown_cell(
    "## 1. Dataset + config\n\nA tiny synthetic feature store (mels, "
    "energy, pitch, MFA-style filelist) and a small model config."))

cells.append(nbf.v4.new_code_cell("""\
from fastspeech2_tpu.config import Config, config_from_dict
from fastspeech2_tpu.data.dataset import write_fake_feature_store

data = os.path.join(WORKDIR, "data")
filelist = write_fake_feature_store(data, n_utts=16, seed=0)
d = Config().to_dict()
d["model"].update(adim=64, ddim=64, aheads=2, elayers=2, dlayers=2,
                  eunits=128, dunits=128)
d["data"].update(data_dir=data, train_filelist=filelist, valid_filelist=filelist)
d["train"].update(batch_size=4, accum_grad=1, summary_interval=4,
                  validation_step=10**9, save_interval=STEPS)
cfg = config_from_dict(d)
cfg.model.adim, cfg.model.elayers"""))

cells.append(nbf.v4.new_markdown_cell(
    "## 2. Train\n\nData-parallel over however many devices are visible "
    "(1-D `Mesh`, psum gradient all-reduce inserted by the SPMD "
    "partitioner)."))

cells.append(nbf.v4.new_code_cell("""\
from fastspeech2_tpu.train.loop import train

ts = train(cfg, "demo", WORKDIR, max_steps=STEPS)
print(f"trained {int(ts.step)} steps on {jax.device_count()} device(s)")"""))

cells.append(nbf.v4.new_markdown_cell(
    "## 3. Reload the checkpoint\n\nCheckpoints are `.npz` with an embedded "
    "config snapshot (the reference's `hp_str` equivalent)."))

cells.append(nbf.v4.new_code_cell("""\
from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
from fastspeech2_tpu.train.checkpoint import load_checkpoint

ckpt_dir = os.path.join(WORKDIR, "checkpoints", "demo")
path = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])
model = FastSpeech2(cfg)
p0, s0 = model.init(jax.random.PRNGKey(0))
params, state, _, step, cfg = load_checkpoint(path, p0, s0)
print(f"loaded {path} (step {step})")"""))

cells.append(nbf.v4.new_markdown_cell(
    "## 4. Synthesize\n\nPhonemes → mel → Griffin-Lim wav. For neural "
    "vocoding pass a MelGAN or WaveGlow checkpoint to `vocode()` via "
    "`vocoder.load_vocoder(path)` (auto-detects the family; the reference "
    "demo pulls the same two vocoders from torch.hub), or use "
    "`Synthesizer.attach_vocoder` for MelGAN's fused one-device-call path. "
    "`alpha` controls speech speed per utterance."))

cells.append(nbf.v4.new_code_cell("""\
from fastspeech2_tpu.infer.synthesize import Synthesizer, vocode, write_wav

synth = Synthesizer(model, jax.tree.map(np.asarray, params), state)
mel = synth.synth_phonemes("HH AH L OW W ER L D", alpha=1.0)  # (L, 80)
wav = vocode(mel, cfg)
write_wav(os.path.join(WORKDIR, "demo.wav"), wav, cfg.audio.sample_rate)
mel.shape, wav.shape"""))

cells.append(nbf.v4.new_code_cell("""\
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, ax = plt.subplots(figsize=(8, 3))
ax.imshow(mel.T, origin="lower", aspect="auto", interpolation="none")
ax.set_xlabel("frame"); ax.set_ylabel("mel bin")
fig.savefig(os.path.join(WORKDIR, "mel.png"), dpi=100)
print("wrote", os.path.join(WORKDIR, "mel.png"))"""))

cells.append(nbf.v4.new_markdown_cell("""\
## Going further

- `python -m fastspeech2_tpu serve -p CKPT --vocoder melgan.pt|waveglow.pt` —
  micro-batching HTTP server; concurrent requests (even with different
  speeds) share one padded device call; with MelGAN, mel→wav is fused
  on-device.
- `python -m fastspeech2_tpu export -p CKPT -o model.stablehlo` — AOT serving
  artifact; alpha is a runtime input.
- `docs/MIGRATION.md` — the workflow map for users of the PyTorch reference."""))

nb["cells"] = cells
for i, cell in enumerate(nb["cells"]):
    cell["id"] = f"cell-{i:02d}"  # deterministic: byte-reproducible output
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}
out = os.path.join(os.path.dirname(__file__), "demo.ipynb")
with open(out, "w") as f:
    nbf.write(nb, f)
print("wrote", out)
