"""End-to-end walkthrough (the reference ships this as a Colab notebook,
``demo_fastspeech2.ipynb``): dataset -> training -> synthesis -> wav.

Runs hermetically on CPU or a TPU chip with a synthetic feature store; swap
in a real LJSpeech feature store (``python -m fastspeech2_tpu preprocess``)
and a translated reference checkpoint (``compat.torch_loader``) for real
speech.

    python examples/demo.py --workdir /tmp/fs2_demo
"""

import argparse
import os

import jax
import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/fs2_demo")
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from fastspeech2_tpu.config import Config, config_from_dict
    from fastspeech2_tpu.data.dataset import write_fake_feature_store
    from fastspeech2_tpu.infer.synthesize import Synthesizer, vocode, write_wav
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.train.checkpoint import load_checkpoint
    from fastspeech2_tpu.train.loop import train

    # 1. a tiny dataset + config (use `preprocess` + `stats` for real data)
    data = os.path.join(args.workdir, "data")
    filelist = write_fake_feature_store(data, n_utts=16, seed=0)
    d = Config().to_dict()
    d["model"].update(adim=64, ddim=64, aheads=2, elayers=2, dlayers=2,
                      eunits=128, dunits=128)
    d["data"].update(data_dir=data, train_filelist=filelist,
                     valid_filelist=filelist)
    d["train"].update(batch_size=4, accum_grad=1, summary_interval=4,
                      validation_step=10 ** 9, save_interval=args.steps)
    cfg = config_from_dict(d)

    # 2. train a few steps (data-parallel over however many devices exist)
    ts = train(cfg, "demo", args.workdir, max_steps=args.steps)
    print(f"trained {int(ts.step)} steps on {jax.device_count()} device(s)")

    # 3. reload the checkpoint the way deployment would
    ckpts = sorted(os.listdir(os.path.join(args.workdir, "checkpoints", "demo")))
    path = os.path.join(args.workdir, "checkpoints", "demo", ckpts[-1])
    model = FastSpeech2(cfg)
    p0, s0 = model.init(jax.random.PRNGKey(0))
    params, state, _, step, cfg = load_checkpoint(path, p0, s0)
    print(f"loaded {path} (step {step})")

    # 4. synthesize: phonemes -> mel -> Griffin-Lim wav (pass a MelGAN
    #    checkpoint to vocode() for neural vocoding)
    synth = Synthesizer(model, jax.tree.map(np.asarray, params), state)
    mel = synth.synth_phonemes("HH AH L OW W ER L D")  # (L, 80)
    np.save(os.path.join(args.workdir, "mel.npy"), mel.T)  # (80, L) like ref
    wav = vocode(mel, cfg)
    write_wav(os.path.join(args.workdir, "demo.wav"), wav,
              cfg.audio.sample_rate)
    print(f"mel {mel.T.shape} -> {args.workdir}/demo.wav")


if __name__ == "__main__":
    main()
