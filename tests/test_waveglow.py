"""WaveGlow vocoder tests: polyphase upsampler vs torch ConvTranspose1d,
full inference parity vs an independent torch implementation of the NVIDIA
WaveGlow infer path (built here module-by-module, weight-normed), weight-norm
folding, legacy per-layer cond convs, and config inference from shapes."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fastspeech2_tpu.vocoder.waveglow import (
    WaveGlow,
    WaveGlowConfig,
    _upsample_polyphase,
    init_waveglow,
    load_waveglow,
    waveglow_config_from_state_dict,
    waveglow_params_from_torch,
)

CFG = WaveGlowConfig(
    n_mels=10, n_flows=4, n_group=8, n_early_every=2, n_early_size=2,
    wn_layers=2, wn_channels=16, wn_kernel=3, upsample_kernel=32,
    hop_length=8)


def test_flow_channel_schedule():
    assert CFG.flow_channels == (8, 8, 6, 6)
    assert CFG.n_remaining == 6
    full = WaveGlowConfig()
    assert full.flow_channels == (8, 8, 8, 8, 6, 6, 6, 6, 4, 4, 4, 4)
    assert full.n_remaining == 4


def test_upsample_polyphase_matches_torch_conv_transpose(rng):
    # NVIDIA's upsampler: ConvTranspose1d(kernel=4*stride, stride, pad=0),
    # tail-trimmed by kernel - stride
    stride, k = 8, 32
    tconv = torch.nn.ConvTranspose1d(10, 10, k, stride=stride)
    x = rng.normal(size=(2, 6, 10)).astype(np.float32)
    with torch.no_grad():
        full = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    expect = full[:, :, : -(k - stride)]
    p = {"w": jnp.asarray(tconv.weight.detach().numpy()),
         "b": jnp.asarray(tconv.bias.detach().numpy())}
    ours = np.asarray(_upsample_polyphase(p, jnp.asarray(x), stride))
    assert ours.shape == (2, 6 * stride, 10)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), expect, atol=1e-5)


# ---------------------------------------------------------------------------
# Independent torch oracle (NVIDIA glow.py architecture, arXiv 1811.00002)
# ---------------------------------------------------------------------------


class _TorchWN(torch.nn.Module):
    def __init__(self, n_half, cond_channels, n_layers, n_channels, kernel,
                 fused_cond=True):
        super().__init__()
        wnorm = torch.nn.utils.weight_norm
        self.n_layers, self.n_channels = n_layers, n_channels
        self.fused_cond = fused_cond
        # NVIDIA weight-norms start (raw checkpoints carry start.weight_v/g);
        # end is a plain zero-init conv
        self.start = wnorm(torch.nn.Conv1d(n_half, n_channels, 1))
        self.end = torch.nn.Conv1d(n_channels, 2 * n_half, 1)
        if fused_cond:
            self.cond_layer = wnorm(
                torch.nn.Conv1d(cond_channels, 2 * n_channels * n_layers, 1))
        else:
            self.cond_layers = torch.nn.ModuleList(
                wnorm(torch.nn.Conv1d(cond_channels, 2 * n_channels, 1))
                for _ in range(n_layers))
        self.in_layers = torch.nn.ModuleList()
        self.res_skip_layers = torch.nn.ModuleList()
        for i in range(n_layers):
            d = 2 ** i
            self.in_layers.append(wnorm(torch.nn.Conv1d(
                n_channels, 2 * n_channels, kernel, dilation=d,
                padding=(kernel * d - d) // 2)))
            rs = 2 * n_channels if i < n_layers - 1 else n_channels
            self.res_skip_layers.append(wnorm(torch.nn.Conv1d(
                n_channels, rs, 1)))

    def forward(self, audio, spect):
        audio = self.start(audio)
        output = torch.zeros_like(audio)
        n = self.n_channels
        if self.fused_cond:
            spect = self.cond_layer(spect)
        for i in range(self.n_layers):
            cond = (spect[:, i * 2 * n:(i + 1) * 2 * n]
                    if self.fused_cond else self.cond_layers[i](spect))
            ia = self.in_layers[i](audio) + cond
            acts = torch.tanh(ia[:, :n]) * torch.sigmoid(ia[:, n:])
            rs = self.res_skip_layers[i](acts)
            if i < self.n_layers - 1:
                audio = audio + rs[:, :n]
                output = output + rs[:, n:]
            else:
                output = output + rs
        return self.end(output)


class _TorchWaveGlow(torch.nn.Module):
    def __init__(self, cfg: WaveGlowConfig, fused_cond=True, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.cfg = cfg
        self.upsample = torch.nn.ConvTranspose1d(
            cfg.n_mels, cfg.n_mels, cfg.upsample_kernel,
            stride=cfg.hop_length)
        self.WN = torch.nn.ModuleList()
        self.convinv = torch.nn.ModuleList()
        for c in cfg.flow_channels:
            self.WN.append(_TorchWN(
                c // 2, cfg.n_mels * cfg.n_group, cfg.wn_layers,
                cfg.wn_channels, cfg.wn_kernel, fused_cond=fused_cond))
            holder = torch.nn.Module()
            holder.conv = torch.nn.Conv1d(c, c, 1, bias=False)
            w = torch.linalg.qr(torch.randn(c, c))[0]
            if torch.det(w) < 0:
                w[:, 0] = -w[:, 0]
            holder.conv.weight.data = w[:, :, None]
            self.convinv.append(holder)

    @torch.no_grad()
    def infer(self, mel, zs, sigma=1.0):
        """mel (B, n_mels, T); zs: channels-first noise tensors in draw
        order (initial z, then one per early re-injection in reverse)."""
        cfg = self.cfg
        spect = self.upsample(mel)
        spect = spect[:, :, : -(cfg.upsample_kernel - cfg.hop_length)]
        g = cfg.n_group
        spect = spect.unfold(2, g, g).permute(0, 2, 1, 3)
        spect = spect.contiguous().view(
            spect.size(0), spect.size(1), -1).permute(0, 2, 1)
        zi = iter(zs)
        audio = sigma * next(zi)
        for k in reversed(range(cfg.n_flows)):
            n_half = audio.size(1) // 2
            a0, a1 = audio[:, :n_half], audio[:, n_half:]
            out = self.WN[k](a0, spect)
            b, s = out[:, :n_half], out[:, n_half:]
            a1 = (a1 - b) / torch.exp(s)
            audio = torch.cat([a0, a1], 1)
            w_inv = self.convinv[k].conv.weight[..., 0].double().inverse()
            audio = torch.nn.functional.conv1d(
                audio, w_inv.float()[:, :, None])
            if k % cfg.n_early_every == 0 and k > 0:
                audio = torch.cat([sigma * next(zi), audio], 1)
        return audio.permute(0, 2, 1).contiguous().view(audio.size(0), -1)


def _draw_zs(cfg, B, Lg, rng):
    shapes = [(B, cfg.n_remaining, Lg)]
    shapes += [(B, cfg.n_early_size, Lg) for k in range(cfg.n_flows)
               if k % cfg.n_early_every == 0 and k > 0]
    return [rng.normal(size=s).astype(np.float32) for s in shapes]


@pytest.mark.parametrize("fused_cond", [True, False])
def test_infer_matches_torch_oracle(rng, fused_cond):
    oracle = _TorchWaveGlow(CFG, fused_cond=fused_cond)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = waveglow_params_from_torch(sd, CFG)

    B, T = 2, 6
    Lg = T * CFG.hop_length // CFG.n_group
    mel = rng.normal(-5, 2, size=(B, T, CFG.n_mels)).astype(np.float32)
    zs = _draw_zs(CFG, B, Lg, rng)
    with torch.no_grad():
        expect = oracle.infer(torch.from_numpy(mel.transpose(0, 2, 1)),
                              [torch.from_numpy(z) for z in zs],
                              sigma=0.8).numpy()
    wg = WaveGlow(CFG)
    ours = np.asarray(wg.infer(
        params, jnp.asarray(mel),
        zs=[jnp.asarray(z.transpose(0, 2, 1)) for z in zs], sigma=0.8))
    assert ours.shape == expect.shape == (B, T * CFG.hop_length)
    np.testing.assert_allclose(ours, expect, atol=2e-4, rtol=1e-4)


def test_config_inferred_from_state_dict():
    oracle = _TorchWaveGlow(CFG)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    got = waveglow_config_from_state_dict(sd)
    assert got == CFG


def test_random_init_infer_shapes_and_finite():
    params = init_waveglow(jax.random.PRNGKey(0), CFG)
    wg = WaveGlow(CFG)
    mel = jnp.full((1, 8, CFG.n_mels), math.log(1e-5))
    wav = wg.infer(params, mel, key=jax.random.PRNGKey(1), sigma=0.6)
    assert wav.shape == (1, 8 * CFG.hop_length)
    assert bool(jnp.isfinite(wav).all())


def test_load_waveglow_checkpoint_roundtrip(tmp_path, rng):
    """torch.save a hub-style wrapped checkpoint -> load_waveglow vocoder
    callable: right lengths, deterministic per call index, finite."""
    oracle = _TorchWaveGlow(CFG)
    torch.save({"state_dict": oracle.state_dict()},
               tmp_path / "waveglow.pt")
    voc = load_waveglow(str(tmp_path / "waveglow.pt"), sigma=0.7,
                        batch_frames=8)
    mel = rng.normal(-5, 2, size=(11, CFG.n_mels)).astype(np.float32)
    wav = voc(mel)
    assert wav.shape == (11 * CFG.hop_length,)
    assert np.isfinite(wav).all()
    voc2 = load_waveglow(str(tmp_path / "waveglow.pt"), sigma=0.7,
                         batch_frames=8)
    np.testing.assert_array_equal(wav, voc2(mel))


def test_load_vocoder_auto_detects_kind(tmp_path):
    from fastspeech2_tpu.vocoder import detect_vocoder_kind, init_melgan
    from fastspeech2_tpu.vocoder.melgan import MelGANConfig

    oracle = _TorchWaveGlow(CFG)
    torch.save({"state_dict": oracle.state_dict()}, tmp_path / "wg.pt")
    assert detect_vocoder_kind(str(tmp_path / "wg.pt")) == "waveglow"

    # a melgan-format state dict: generator Sequential index naming
    mcfg = MelGANConfig(base_channels=32)
    p = init_melgan(jax.random.PRNGKey(0), mcfg)
    sd = {"generator.1.weight": torch.zeros(32, 80, 7),
          "generator.1.bias": torch.zeros(32)}
    torch.save({"model_g": sd}, tmp_path / "mg.pt")
    assert detect_vocoder_kind(str(tmp_path / "mg.pt")) == "melgan"
    del p


def test_synthesizer_attach_vocoder_fn(tmp_path):
    """text->wav through the host-level vocoder hook (the WaveGlow serving
    path): right PCM lengths, int16, nonzero where valid."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import small_cfg
    from fastspeech2_tpu.infer.synthesize import Synthesizer
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.text import phonemes_to_sequence

    cfg = small_cfg()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params["duration_predictor"]["out"]["b"] = (
        params["duration_predictor"]["out"]["b"] * 0 + 1.3)

    # the vocoder must consume the model's 80-channel mels
    wcfg = WaveGlowConfig(
        n_mels=80, n_flows=2, n_group=8, n_early_every=2, n_early_size=2,
        wn_layers=1, wn_channels=8, wn_kernel=3, upsample_kernel=32,
        hop_length=8)
    oracle = _TorchWaveGlow(wcfg)
    torch.save(oracle.state_dict(), tmp_path / "wg.pt")
    voc = load_waveglow(str(tmp_path / "wg.pt"), batch_frames=8)

    synth = Synthesizer(model, params, state)
    synth.attach_vocoder_fn(voc)  # hop auto-discovered from the callable
    assert synth.has_vocoder and synth.hop_length == wcfg.hop_length
    toks = [np.asarray(phonemes_to_sequence(s), np.int32)
            for s in ("HH AH0 L OW1", "W ER1 L D pau N AW1")]
    mel, wav16, wav_lens = synth.wav_from_token_batch(toks)
    assert wav16.dtype == np.int16
    assert wav16.shape == (2, mel.shape[1] * wcfg.hop_length)
    for i in range(2):
        assert wav_lens[i] > 0
        assert np.any(wav16[i, : wav_lens[i]] != 0)
        assert np.all(wav16[i, wav_lens[i]:] == 0)


def test_load_waveglow_batched_api(tmp_path, rng):
    """.batched vocodes a padded micro-batch in one call: valid lengths
    honored, per-row silence past each row's frames, rows independent of
    the padding rows' content."""
    oracle = _TorchWaveGlow(CFG)
    torch.save(oracle.state_dict(), tmp_path / "wg.pt")
    voc = load_waveglow(str(tmp_path / "wg.pt"), sigma=0.7, batch_frames=8)
    B, L = 3, 16
    mels = rng.normal(-5, 2, size=(B, L, CFG.n_mels)).astype(np.float32)
    out_lens = np.asarray([16, 9, 4], np.int32)
    wav = voc.batched(mels, out_lens)
    assert wav.shape == (B, L * CFG.hop_length)
    assert np.isfinite(wav).all()
    # row independence: another row's mel content (incl. its garbage padding
    # region) must not leak into this row's waveform — same seed, row 0
    # perturbed, row 2 identical
    voc2 = load_waveglow(str(tmp_path / "wg.pt"), sigma=0.7, batch_frames=8)
    mels2 = mels.copy()
    mels2[0] += 3.0
    wav2 = voc2.batched(mels2, out_lens)
    assert not np.allclose(wav[0], wav2[0])
    np.testing.assert_array_equal(wav[2], wav2[2])


def test_nvidia_train_style_checkpoint(tmp_path, rng):
    """NVIDIA's train.py saves {'model': <WaveGlow nn.Module>, 'iteration': N}
    (a pickled module under a dict key): both family detection and loading
    must handle it."""
    from fastspeech2_tpu.vocoder import detect_vocoder_kind

    oracle = _TorchWaveGlow(CFG)
    torch.save({"model": oracle, "iteration": 1000, "optimizer": None},
               tmp_path / "wg_train.pt")
    assert detect_vocoder_kind(str(tmp_path / "wg_train.pt")) == "waveglow"
    voc = load_waveglow(str(tmp_path / "wg_train.pt"), batch_frames=8)
    mel = rng.normal(-5, 2, size=(9, CFG.n_mels)).astype(np.float32)
    wav = voc(mel)
    assert wav.shape == (9 * CFG.hop_length,) and np.isfinite(wav).all()


def test_legacy_cond_layers_config_inference(tmp_path, rng):
    """Config inference must recognize legacy per-layer cond_layers.{i}
    checkpoints ('cond_layer' is a substring of 'cond_layers' — exact key
    checks required) and load_waveglow must work without an explicit cfg."""
    oracle = _TorchWaveGlow(CFG, fused_cond=False)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    assert waveglow_config_from_state_dict(sd) == CFG
    torch.save(oracle.state_dict(), tmp_path / "wg_legacy.pt")
    voc = load_waveglow(str(tmp_path / "wg_legacy.pt"), batch_frames=8)
    mel = rng.normal(-5, 2, size=(7, CFG.n_mels)).astype(np.float32)
    wav = voc(mel)
    assert wav.shape == (7 * CFG.hop_length,) and np.isfinite(wav).all()
