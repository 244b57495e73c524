"""MelGAN generator in JAX (the reference's external vocoder,
``seungwonpark/melgan`` via torch.hub: reference ``inference.py:183-193``).

Architecture (MelGAN paper, arXiv 1910.06711, as released by seungwonpark):
Conv7(n_mels->512, reflect pad) then per upsample rate r in (8, 8, 2, 2):
LeakyReLU(0.2) -> ConvTranspose1d(C -> C/2, kernel 2r, stride r, pad r/2+r%2,
output_pad r%2) -> 3 residual dilated stacks (dilations 1, 3, 9; each
LReLU-Conv3(dil)-LReLU-Conv1 with residual add), finishing with
LeakyReLU -> Conv7(32->1, reflect) -> tanh. Total upsampling 256 == hop length.

The torch checkpoint uses weight_norm; ``melgan_params_from_torch`` folds
g * v / ||v|| into plain weights at load time.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fastspeech2_tpu.ops.pallas.resstack import (resstack_fused, resstack_tile,
                                                 stack_params)

Array = jax.Array

LRELU_SLOPE = 0.2


@dataclass(frozen=True)
class MelGANConfig:
    n_mels: int = 80
    base_channels: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    resstack_dilations: Tuple[int, ...] = (1, 3, 9)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsample_rates))


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _init_conv(key, in_ch, out_ch, k):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * k)
    return {"w": _uniform(kw, (k, in_ch, out_ch), bound),
            "b": _uniform(kb, (out_ch,), bound)}


def _conv1d_reflect(p, x, dilation: int = 1):
    """Conv with reflect padding to SAME length (melgan uses ReflectionPad1d)."""
    k = p["w"].shape[0]
    pad = dilation * (k - 1) // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = lax.conv_general_dilated(
        x, p["w"], (1,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["b"]


def _conv_transpose1d(p, x, stride: int):
    """torch ConvTranspose1d(kernel=2*stride, stride, padding=ceil(stride/2),
    output_padding=stride%2) in NLC layout with (k, out, in)->we store (k, in, out)
    transposed-conv weights."""
    k = p["w"].shape[0]
    pad = stride // 2 + stride % 2
    out_pad = stride % 2
    y = lax.conv_transpose(
        x, p["w"], (stride,), padding=[(k - 1 - pad, k - 1 - pad + out_pad)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["b"]


def _conv_transpose1d_polyphase(p, x, stride: int):
    """Polyphase form of ``_conv_transpose1d`` for even strides.

    ``lax.conv_transpose`` lowers to a conv over an input with stride-1 zeros
    inserted between samples, so on TPU ~stride x of its MACs multiply zeros
    (measured on a v5e at B=8, T=512: 132x faster in f32 -- 8.38 s -> 63 ms
    per batch -- and parity with conv_transpose in bf16).
    Since kernel == 2*stride, every output sample depends on exactly TWO input
    frames; the whole op is one kernel-2 conv producing stride*C_out channels
    (a dense (2*C_in -> stride*C_out) matmul per frame, MXU-shaped) followed by
    a sub-pixel interleave.

    Derivation (even r, so torch pad=r/2, output_pad=0, out length T*r): with
    stored weights w[kk] = W_torch[:, :, k-1-kk] and h = r/2, output phase s of
    frame t reads frames (t-1, t) for s < h and (t, t+1) for s >= h, with tap
    weights w[(h-1-s) % r] and w[(h-1-s) % r + r]. Numerically identical to
    the lax.conv_transpose path (tests/test_vocoder.py pins allclose 1e-5).
    """
    k, cin, cout = p["w"].shape
    r = stride
    h = r // 2
    # (k=2r, in, out) -> per-phase kernel-2 taps (2, in, r, out) -> (2, in, r*out)
    w = p["w"].reshape(2, r, cin, cout)
    phase = (h - 1 - jnp.arange(r)) % r
    kern = w[:, phase].transpose(0, 2, 1, 3).reshape(2, cin, r * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    z = lax.conv_general_dilated(
        xp, kern, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"))
    B, T1, _ = z.shape  # T1 == T+1
    z = z.reshape(B, T1, r, cout)
    y = jnp.concatenate([z[:, :-1, :h], z[:, 1:, h:]], axis=2)
    return y.reshape(B, (T1 - 1) * r, cout) + p["b"]


def _upsample(p, x, stride: int):
    return (_conv_transpose1d_polyphase(p, x, stride) if stride % 2 == 0
            else _conv_transpose1d(p, x, stride))


def init_melgan(key, cfg: MelGANConfig = MelGANConfig()):
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params: Dict = {"pre": _init_conv(next(ki), cfg.n_mels, cfg.base_channels, 7)}
    blocks = []
    ch = cfg.base_channels
    for r in cfg.upsample_rates:
        block = {"up": _init_conv(next(ki), ch, ch // 2, 2 * r), "stacks": []}
        ch //= 2
        for d in cfg.resstack_dilations:
            block["stacks"].append({
                "c1": _init_conv(next(ki), ch, ch, 3),
                "c2": _init_conv(next(ki), ch, ch, 1),
            })
        blocks.append(block)
    params["blocks"] = blocks
    params["post"] = _init_conv(next(ki), ch, 1, 7)
    return params


class MelGANGenerator:
    """Functional generator: (B, T, n_mels) log-mel -> (B, T*256) waveform.

    bf16=True runs the whole stack in bfloat16 (the upsampled low-channel
    layers are HBM-bandwidth-bound; ~+26% over polyphase f32 on a v5e); wav
    error vs f32 is ~2e-3 peak (-55 dB). Default f32 for bit-faithful
    vocoding -- fast since the polyphase upsampling path (above) removed the
    pathological f32 conv_transpose lowering.

    fused_resstack: run the three dilated residual blocks of each stage as one
    Pallas kernel (ops/pallas/resstack.py) -- one HBM round-trip per stage
    instead of ~12. None (default) enables it on TPU when the stage length is
    tileable; the XLA loop is the fallback everywhere else.
    """

    def __init__(self, cfg: MelGANConfig = MelGANConfig(), bf16: bool = False,
                 fused_resstack: bool | None = None,
                 fused_min_channels: int = 0,
                 fused_interpret: bool = False):
        self.cfg = cfg
        self.bf16 = bf16
        self.fused_resstack = fused_resstack
        # Stages with C < 128 are zero-padded to 128 lanes inside the kernel
        # (exact, but 128/C x the HBM bytes); raise this to keep such stages
        # on the XLA loop if that padding loses on your chip.
        self.fused_min_channels = fused_min_channels
        self.fused_interpret = fused_interpret

    def _use_fused(self, S: int, C: int) -> bool:
        if self.fused_resstack is None:
            if jax.default_backend() != "tpu":
                return False
        elif not self.fused_resstack:
            return False
        return C >= self.fused_min_channels and resstack_tile(S) > 0

    def __call__(self, params, mel: Array) -> Array:
        if self.bf16:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            mel = mel.astype(jnp.bfloat16)
        x = _conv1d_reflect(params["pre"], mel)
        for r, block in zip(self.cfg.upsample_rates, params["blocks"]):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = _upsample(block["up"], x, r)
            if self._use_fused(x.shape[1], x.shape[2]):
                from fastspeech2_tpu.parallel.sharding import (
                    current_tp_mesh, data_shard_map)

                def call(x, w1, b1, w2, b2):
                    return resstack_fused(
                        x, w1, b1, w2, b2,
                        dilations=self.cfg.resstack_dilations,
                        interpret=self.fused_interpret)

                mesh = current_tp_mesh()
                if mesh is not None:
                    # batch-shard the kernel over the serving data mesh --
                    # GSPMD would otherwise all-gather around the custom call
                    call = data_shard_map(call, mesh, batched=(0,))
                x = call(x, *stack_params(block["stacks"]))
            else:
                for d, stack in zip(self.cfg.resstack_dilations,
                                    block["stacks"]):
                    y = jax.nn.leaky_relu(x, LRELU_SLOPE)
                    y = _conv1d_reflect(stack["c1"], y, dilation=d)
                    y = jax.nn.leaky_relu(y, LRELU_SLOPE)
                    y = _conv1d_reflect(stack["c2"], y)
                    x = x + y
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = _conv1d_reflect(params["post"], x)
        return jnp.tanh(x)[..., 0].astype(jnp.float32)

    def inference(self, params, mel: Array, pad_frames: int = 10) -> Array:
        """Mirror of the hub model's .inference: pad the mel tail with the
        log-floor value (log(1e-5)) to flush the transposed-conv edge, then
        trim (seungwonpark/melgan model/generator.py)."""
        mel = jnp.pad(mel, ((0, 0), (0, pad_frames), (0, 0)),
                      constant_values=math.log(1e-5))
        wav = self(params, mel)
        return wav[:, : -(pad_frames * self.cfg.hop_length)]


def load_melgan(path: str, cfg: MelGANConfig = MelGANConfig(),
                bf16: bool = False, batch_frames: int = 256):
    """Load a seungwonpark/melgan-format torch checkpoint and return a
    callable ``(L, n_mels) log-mel -> (L*hop,) float waveform`` for
    ``infer.synthesize.vocode(vocoder=...)`` (the reference instead pulls the
    same weights from torch.hub at runtime, ``inference.py:183-193``).

    Accepts a raw generator state_dict or a training checkpoint carrying it
    under ``model_g`` / ``generator`` / ``model``. Mels pad to a multiple of
    ``batch_frames`` so the jit cache holds a few shapes, not one per mel.
    """
    params = load_melgan_params(path, cfg)
    gen = MelGANGenerator(cfg, bf16=bf16)
    jitted = jax.jit(gen.inference)
    tail = 10  # gen.inference's pad_frames default

    def vocoder(mel: np.ndarray) -> np.ndarray:
        L = mel.shape[0]
        # Pad so L + tail lands on a batch_frames multiple: bounds the jit
        # cache AND keeps every upsample-stage length divisible by 2048, the
        # fused residual-stack kernel's tiling requirement.
        pad = (-(L + tail)) % batch_frames
        m = np.pad(mel.astype(np.float32), ((0, pad), (0, 0)),
                   constant_values=math.log(1e-5))
        wav = jitted(params, jnp.asarray(m[None]))
        return np.asarray(wav)[0, : L * cfg.hop_length]

    return vocoder


def load_melgan_params(path: str, cfg: MelGANConfig = MelGANConfig()):
    """Load a seungwonpark/melgan-format torch checkpoint into our params
    pytree (device arrays). Use with ``MelGANGenerator`` directly — e.g. the
    fused ``Synthesizer.attach_vocoder`` path that keeps the mel on device."""
    sd = _melgan_state_dict(path)
    params = melgan_params_from_torch(sd, cfg)
    return jax.tree.map(jnp.asarray, params)


def _melgan_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj
    for key in ("model_g", "generator", "model", "state_dict"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return {k: np.asarray(v) for k, v in sd.items()
            if hasattr(v, "__array__") or hasattr(v, "numpy")}


def melgan_config_from_checkpoint(path: str) -> MelGANConfig:
    """Infer (n_mels, base_channels) from the first conv's weight shape --
    the hub checkpoint is the default (80, 512); locally-trained narrower
    generators load without a hand-written config."""
    sd = _melgan_state_dict(path)
    key = next(k for k in ("1.weight_v", "generator.1.weight_v") if k in sd)
    out_ch, in_ch, _ = sd[key].shape  # Conv1d (out, in, k)
    return MelGANConfig(n_mels=int(in_ch), base_channels=int(out_ch))


def _fold_weight_norm(sd: Dict[str, np.ndarray], base: str) -> np.ndarray:
    g = np.asarray(sd[f"{base}.weight_g"])
    v = np.asarray(sd[f"{base}.weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def melgan_params_from_torch(sd: Dict[str, np.ndarray],
                             cfg: MelGANConfig = MelGANConfig()) -> Dict:
    """Translate the seungwonpark/melgan generator state_dict (weight-normed,
    Sequential index naming ``generator.{i}...``) into our params tree.

    Layout transforms: Conv1d (out,in,k)->(k,in,out); ConvTranspose1d
    (in,out,k)->(k,in,out).
    """
    sd = {k.replace("generator.", "", 1) if k.startswith("generator.") else k: v
          for k, v in sd.items()}

    def conv(base):
        w = _fold_weight_norm(sd, base)  # (out,in,k)
        return {"w": np.ascontiguousarray(w.transpose(2, 1, 0)),
                "b": np.asarray(sd[f"{base}.bias"])}

    def convT(base):
        w = _fold_weight_norm(sd, base)  # (in,out,k)
        # torch ConvTranspose applies the spatially-flipped kernel relative to
        # lax.conv_transpose's convention -> flip on translation
        return {"w": np.ascontiguousarray(w.transpose(2, 0, 1)[::-1]),
                "b": np.asarray(sd[f"{base}.bias"])}

    # Sequential layout of seungwonpark's Generator:
    # 0 ReflectionPad, 1 Conv7, then per rate: LeakyReLU, ConvT, 3x ResStack,
    # finally LeakyReLU, ReflectionPad, Conv7, Tanh.
    params: Dict = {"pre": conv("1")}
    idx = 2
    blocks = []
    for r in cfg.upsample_rates:
        idx += 1          # LeakyReLU
        block = {"up": convT(str(idx)), "stacks": []}
        idx += 1
        for j, d in enumerate(cfg.resstack_dilations):
            base = f"{idx}.blocks.{j}"
            block["stacks"].append({
                # ResStack block Sequential: 0 LReLU, 1 ReflectionPad, 2 Conv3,
                # 3 LReLU, 4 Conv1
                "c1": conv(f"{base}.2"),
                "c2": conv(f"{base}.4"),
            })
        idx += 1
        blocks.append(block)
    params["blocks"] = blocks
    idx += 2              # LeakyReLU, ReflectionPad
    params["post"] = conv(str(idx))
    return params
