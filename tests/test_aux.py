"""Tests for auxiliary subsystems: plotting, audio processing helpers, GTA
generation, ljspeech metadata, CMUdict, metrics writer."""

import json
import os

import jax
import numpy as np

from fastspeech2_tpu.audio.processing import (
    amp_to_db,
    db_to_amp,
    decode_mu_law,
    encode_16bits,
    encode_mu_law,
    float_2_label,
    label_2_float,
    normalize_db,
)
from fastspeech2_tpu.data.ljspeech import read_metadata
from fastspeech2_tpu.text.cmudict import CMUDict
from fastspeech2_tpu.train.metrics import MetricsWriter, Throughput
from fastspeech2_tpu.utils.plotting import (
    plot_spectrogram_to_numpy,
    plot_waveform_to_numpy,
)


def test_mu_law_roundtrip(rng):
    x = rng.uniform(-0.99, 0.99, 256).astype(np.float32)
    mu = 2 ** 9
    y = encode_mu_law(x, mu)
    x2 = decode_mu_law(y, mu, from_labels=True)
    np.testing.assert_allclose(x2, x, atol=2e-2)


def test_label_float_roundtrip(rng):
    x = rng.uniform(-1, 1, 64).astype(np.float32)
    lab = float_2_label(x, 9)
    np.testing.assert_allclose(label_2_float(lab, 9), x, atol=1e-6)


def test_amp_db_roundtrip():
    x = np.array([1e-4, 0.1, 1.0, 10.0], np.float32)
    np.testing.assert_allclose(db_to_amp(amp_to_db(x)), x, rtol=1e-5)
    n = normalize_db(amp_to_db(x) - 20, -100.0)
    assert np.all((n >= 0) & (n <= 1))


def test_encode_16bits():
    assert encode_16bits(np.array([2.0]))[0] == 2 ** 15 - 1
    assert encode_16bits(np.array([-2.0]))[0] == -(2 ** 15)


def test_plot_helpers():
    img = plot_spectrogram_to_numpy(np.random.default_rng(0).normal(size=(80, 50)))
    assert img.ndim == 3 and img.shape[0] == 3 and img.dtype == np.uint8
    img2 = plot_waveform_to_numpy(np.random.default_rng(0).normal(size=(1000,)))
    assert img2.ndim == 3 and img2.shape[0] == 3


def test_ljspeech_metadata(tmp_path):
    with open(tmp_path / "metadata.csv", "w", encoding="utf-8") as f:
        f.write("LJ001-0001|Printing, in|Printing, in the only sense\n")
        f.write("LJ001-0002|short|short text\n")
    ids, texts = read_metadata(str(tmp_path))
    assert ids == ["LJ001-0001", "LJ001-0002"]
    assert texts[0] == "Printing, in the only sense"


def test_cmudict():
    lines = [
        ";;; comment",
        "HELLO  HH AH0 L OW1",
        "HELLO(1)  HH EH0 L OW1",
        "WORLD  W ER1 L D",
        "BAD$ENTRY  X Y Z",
    ]
    d = CMUDict(lines)
    assert len(d) == 2
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("WORLD") == ["W ER1 L D"]
    assert d.lookup("missing") is None


def test_metrics_writer_and_throughput(tmp_path):
    m = MetricsWriter(str(tmp_path), use_tensorboard=False)
    m.scalars(10, {"loss": 1.5})
    m.image(10, "x/img", np.zeros((3, 4, 4), np.uint8))  # no-op without TB
    m.close()
    recs = [json.loads(l) for l in open(m.path)]
    assert recs[0]["main/loss"] == 1.5

    t = Throughput()
    t.add(2205)
    r = t.report()
    assert r["mel_frames_per_s"] > 0
    assert abs(r["audio_seconds_per_s"] / r["mel_frames_per_s"]
               - 256 / 22050) < 1e-9


def test_gta_generation(tmp_path):
    from fastspeech2_tpu.data.dataset import TTSDataset, write_fake_feature_store
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.train.gta import generate_gta
    from conftest import small_cfg

    root = str(tmp_path / "store")
    filelist = write_fake_feature_store(root, n_utts=5, seed=2)
    ds = TTSDataset(root, filelist)
    cfg = small_cfg()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    out = str(tmp_path / "gta")
    n = generate_gta(model, params, state, ds, out, batch_size=2)
    assert n == 5
    for i in range(5):
        u = ds[i]
        mel = np.load(os.path.join(out, f"{u.utt_id}.npy"))
        assert mel.shape == (80, u.mel.shape[0])


def test_display_helpers(capsys):
    from fastspeech2_tpu.utils.display import (progbar, simple_table, stream,
                                               time_since)
    import time as _time

    bar = progbar(25, 100, size=16)
    assert bar.startswith("|####") and bar.endswith("| 25/100")
    assert progbar(0, 0).endswith("0/0")  # no div-by-zero
    table = simple_table([("Steps", 1000), ("Batch", 16)])
    lines = table.splitlines()
    assert len(lines) == 5 and "Steps" in lines[1] and "16" in lines[3]
    assert all(len(l) == len(lines[0]) for l in lines)
    stream("hello")
    assert capsys.readouterr().out == "\rhello"
    assert time_since(_time.time() - 5).endswith("s")
    assert "m" in time_since(_time.time() - 90)
    assert "h" in time_since(_time.time() - 7200)
