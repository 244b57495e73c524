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
