"""MelGAN generator tests: upsampling contract, conv parity vs torch, and
weight-norm folding."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fastspeech2_tpu.vocoder.melgan import (
    MelGANConfig,
    MelGANGenerator,
    _conv1d_reflect,
    _conv_transpose1d,
    _fold_weight_norm,
    init_melgan,
)


def test_generator_shapes_and_range():
    cfg = MelGANConfig(base_channels=64)  # small for test speed
    gen = MelGANGenerator(cfg)
    params = init_melgan(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.default_rng(0).normal(-5, 2, (2, 17, 80)),
                      jnp.float32)
    wav = gen(params, mel)
    assert wav.shape == (2, 17 * 256)
    assert float(jnp.abs(wav).max()) <= 1.0


def test_inference_pads_and_trims():
    cfg = MelGANConfig(base_channels=32)
    gen = MelGANGenerator(cfg)
    params = init_melgan(jax.random.PRNGKey(1), cfg)
    mel = jnp.zeros((1, 10, 80)) - 5.0
    wav = gen.inference(params, mel)
    assert wav.shape == (1, 10 * 256)


def test_conv_reflect_matches_torch(rng):
    x = rng.normal(size=(2, 20, 8)).astype(np.float32)
    tconv = torch.nn.Conv1d(8, 16, 3, dilation=3)
    with torch.no_grad():
        tpad = torch.nn.ReflectionPad1d(3)
        expect = tconv(tpad(torch.from_numpy(x.transpose(0, 2, 1)))).numpy()
    p = {"w": tconv.weight.detach().numpy().transpose(2, 1, 0),
         "b": tconv.bias.detach().numpy()}
    ours = np.asarray(_conv1d_reflect(p, jnp.asarray(x), dilation=3))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), expect, atol=1e-5)


def test_conv_transpose_matches_torch(rng):
    for stride in (2, 8):
        x = rng.normal(size=(2, 12, 8)).astype(np.float32)
        k = 2 * stride
        tconv = torch.nn.ConvTranspose1d(
            8, 4, k, stride=stride, padding=stride // 2 + stride % 2,
            output_padding=stride % 2)
        with torch.no_grad():
            expect = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        # flip spatial axis: torch convT kernel convention (see melgan.py convT)
        p = {"w": tconv.weight.detach().numpy().transpose(2, 0, 1)[::-1].copy(),
             "b": tconv.bias.detach().numpy()}
        ours = np.asarray(_conv_transpose1d(p, jnp.asarray(x), stride))
        assert ours.transpose(0, 2, 1).shape == expect.shape, \
            f"stride {stride}: {ours.shape} vs {expect.shape}"
        np.testing.assert_allclose(ours.transpose(0, 2, 1), expect, atol=1e-5)


def test_polyphase_upsample_matches_conv_transpose(rng):
    """The MXU-shaped polyphase path (kernel-2 conv + sub-pixel interleave)
    must be numerically identical to lax.conv_transpose / torch (even strides
    only -- MelGAN's rates are (8, 8, 2, 2))."""
    from fastspeech2_tpu.vocoder.melgan import (
        _conv_transpose1d_polyphase, _init_conv)

    key = jax.random.PRNGKey(3)
    for stride, cin in ((2, 16), (8, 32)):
        p = _init_conv(key, cin, cin // 2, 2 * stride)
        x = jnp.asarray(rng.normal(size=(2, 13, cin)).astype(np.float32))
        ref = _conv_transpose1d(p, x, stride)
        got = _conv_transpose1d_polyphase(p, x, stride)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_weight_norm_folding(rng):
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 6, 3))
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = _fold_weight_norm(sd, "c")
    with torch.no_grad():
        expect = conv.weight.detach().numpy()
    np.testing.assert_allclose(folded, expect, atol=1e-6)


def _torch_seungwonpark_generator(n_mels=80, base=32):
    """The seungwonpark/melgan Generator rebuilt in torch (model/generator.py
    + model/res_stack.py of that repo): the checkpoint-format oracle for
    load_melgan / melgan_params_from_torch."""
    import torch.nn as nn

    wn = torch.nn.utils.weight_norm

    def res_stack(ch):
        class ResStack(nn.Module):
            def __init__(self):
                super().__init__()
                self.blocks = nn.ModuleList([
                    nn.Sequential(
                        nn.LeakyReLU(0.2),
                        nn.ReflectionPad1d(3 ** i),
                        wn(nn.Conv1d(ch, ch, 3, dilation=3 ** i)),
                        nn.LeakyReLU(0.2),
                        wn(nn.Conv1d(ch, ch, 1)),
                    ) for i in range(3)
                ])

            def forward(self, x):
                for block in self.blocks:
                    x = x + block(x)
                return x
        return ResStack()

    layers = [nn.ReflectionPad1d(3), wn(nn.Conv1d(n_mels, base, 7))]
    ch = base
    for r in (8, 8, 2, 2):
        layers += [nn.LeakyReLU(0.2),
                   wn(nn.ConvTranspose1d(ch, ch // 2, 2 * r, stride=r,
                                         padding=r // 2 + r % 2,
                                         output_padding=r % 2))]
        ch //= 2
        layers.append(res_stack(ch))
    layers += [nn.LeakyReLU(0.2), nn.ReflectionPad1d(3),
               wn(nn.Conv1d(ch, 1, 7)), nn.Tanh()]
    return torch.nn.Sequential(*layers)


def test_load_melgan_checkpoint_matches_torch(tmp_path, rng):
    """Full-stack oracle: a real seungwonpark-format weight-normed checkpoint
    on disk -> load_melgan -> waveform must match the torch generator."""
    from fastspeech2_tpu.vocoder.melgan import MelGANConfig, load_melgan

    torch.manual_seed(7)
    gen_t = _torch_seungwonpark_generator(base=32)
    gen_t.eval()
    ckpt = tmp_path / "melgan_ckpt.pt"
    torch.save({"model_g": {f"generator.{k}": v
                            for k, v in gen_t.state_dict().items()}}, ckpt)

    cfg = MelGANConfig(base_channels=32)
    T = 11
    mel = (rng.normal(size=(T, 80)).astype(np.float32) - 5.0)
    vocoder = load_melgan(str(ckpt), cfg, batch_frames=16)
    wav = vocoder(mel)
    assert wav.shape == (T * 256,)

    with torch.no_grad():
        # torch pads like Generator.inference: log(1e-5) tail, then trim
        m = torch.from_numpy(
            np.pad(mel, ((0, 16 - T % 16 + 10), (0, 0)),
                   constant_values=np.log(1e-5).astype(np.float32)).T[None])
        expect = gen_t(m)[0, 0, : T * 256].numpy()
    np.testing.assert_allclose(wav, expect, atol=2e-5)
