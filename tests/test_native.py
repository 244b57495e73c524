"""Native C++ tier: DIO-style F0 estimator (fastspeech2_tpu/native/dio.cc).

The reference reaches WORLD's DIO through pyworld
(/root/reference/dataset/audio_processing.py:54-70); here the equivalent is
the framework's own C++ implementation, built with g++ and bound via ctypes.
These are behavioral tests on synthetic signals with known ground truth.
"""

import numpy as np
import pytest

from fastspeech2_tpu import native

SR, HOP = 22050, 256

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _t(seconds=2.0):
    return np.arange(int(SR * seconds)) / SR


def _mid(f0):
    return f0[20:-20]


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_pure_sine(freq):
    f0 = native.dio(np.sin(2 * np.pi * freq * _t()).astype(np.float32), SR, HOP)
    v = _mid(f0)
    assert (v > 0).mean() > 0.99
    assert abs(np.median(v[v > 0]) - freq) / freq < 0.01


def test_harmonic_rich_tracks_fundamental_not_harmonics():
    t = _t()
    w = sum((1 / k) * np.sin(2 * np.pi * 150 * k * t) for k in range(1, 8))
    f0 = native.dio(w.astype(np.float32), SR, HOP)
    v = _mid(f0)
    assert (v > 0).mean() > 0.99
    assert abs(np.median(v[v > 0]) - 150) < 3  # not 300/450 (octave errors)


def test_f0_ramp_with_envelope():
    """Speech-shaped: gliding F0, decaying harmonics, amplitude envelope."""
    t = _t()
    f_t = 120 + 130 * np.clip((t - 0.2) / 1.6, 0, 1)
    phase = 2 * np.pi * np.cumsum(f_t) / SR
    env = np.clip(np.sin(np.pi * np.clip((t - 0.1) / 1.8, 0, 1)), 0, None)
    w = env * sum((0.8 ** k) * np.sin((k + 1) * phase) for k in range(6))
    f0 = native.dio(w.astype(np.float32), SR, HOP)
    ft = f_t[::HOP][: len(f0)]
    tt = t[::HOP][: len(f0)]
    idx = (tt > 0.4) & (tt < 1.6)
    rel = np.abs(f0[idx] - ft[idx]) / ft[idx]
    assert (f0[idx] > 0).all()
    assert np.median(rel) < 0.02


def test_silence_is_unvoiced():
    f0 = native.dio(np.zeros(SR, np.float32), SR, HOP)
    assert (f0 == 0).all()


def test_voiced_unvoiced_segmentation():
    t = _t()
    w = np.sin(2 * np.pi * 180 * t)
    third = len(w) // 3
    w[third: 2 * third] = 0.0
    f0 = native.dio(w.astype(np.float32), SR, HOP)
    fthird = len(f0) // 3
    assert (f0[5: fthird - 5] > 0).mean() > 0.95
    assert (f0[fthird + 5: 2 * fthird - 5] == 0).mean() > 0.95
    assert (f0[2 * fthird + 5: -5] > 0).mean() > 0.95


def test_noise_mostly_unvoiced():
    w = np.random.default_rng(0).normal(0, 0.3, SR * 2).astype(np.float32)
    f0 = native.dio(w, SR, HOP)
    assert (f0 > 0).mean() < 0.4  # amplitude-blind interval metrics; WORLD
    # also over-voices raw noise -- downstream outlier removal handles it


def test_frame_count_matches_python_contract():
    """Same frame count as the pure-Python fallback: len//hop + 1."""
    for n in (1000, 22050, 22050 * 3 + 17):
        w = np.sin(2 * np.pi * 200 * np.arange(n) / SR).astype(np.float32)
        assert len(native.dio(w, SR, HOP)) == n // HOP + 1


def test_extract_pitch_routes_to_native(monkeypatch):
    """audio.pitch.extract_pitch uses the native path when pyworld is absent."""
    import builtins

    from fastspeech2_tpu.audio import pitch as pitch_mod

    real_import = builtins.__import__

    def no_pyworld(name, *a, **k):
        if name == "pyworld":
            raise ImportError("forced for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_pyworld)
    w = np.sin(2 * np.pi * 220 * _t(1.0))
    f0 = pitch_mod.extract_pitch(w, SR, HOP)
    assert f0.dtype == np.float64
    v = f0[10:-10]
    assert abs(np.median(v[v > 0]) - 220) < 3


def test_bad_args_rejected():
    w = np.zeros(100, np.float32)
    with pytest.raises(RuntimeError):
        native.dio(w, SR, HOP, f0_floor=800.0, f0_ceil=71.0)
