"""WaveGlow vocoder (inference) in JAX.

The reference repo publishes WaveGlow-vocoded audio samples
(``sample/sample_74k_waveglow.wav``, ``sample/sample_102k_waveglow.wav``) and
its demo notebook loads NVIDIA's WaveGlow via torch.hub
(``demo_fastspeech2.ipynb``: ``torch.hub.load('nvidia/DeepLearningExamples:
torchhub', 'nvidia_waveglow')`` + ``waveglow.infer(mel)``) as the alternative
neural vocoder next to MelGAN. This module is the TPU-native equivalent:
the WaveGlow *inference* path (arXiv 1811.00002) as a pure function over a
params pytree, plus a translator for NVIDIA-format torch checkpoints
(weight-normed or ``remove_weightnorm``-folded).

Architecture (normalizing flow, inverse direction only — synthesis):

- conditioning: mel (B, T, 80) -> ConvTranspose1d(80->80, kernel 1024,
  stride 256, no padding), tail-trimmed by kernel-stride, grouped by
  ``n_group``=8 samples -> (B, T*32, 640) with channel = mel_bin*8 + offset.
  The transposed conv runs as a **polyphase kernel-4 conv** (one dense
  (4*80 -> 256*80) matmul per mel frame, MXU-shaped) instead of
  ``lax.conv_transpose`` over a 256x zero-stuffed input — numerically
  identical (see ``melgan._conv_transpose1d_polyphase`` for the same trick
  at kernel==2*stride; here it is generalized to kernel == m*stride).
- 12 flows, run in reverse: affine-coupling inverse (WN network on the
  untouched half predicts (log s, b); ``a1 = (a1 - b) * exp(-s)``) then the
  inverse of the invertible 1x1 convolution (inverses precomputed at load
  time — synthesis never needs the forward direction or the logdet).
- every ``n_early_every`` flows (in reverse: before flows 8 and 4), 2 more
  Gaussian noise channels are prepended, mirroring WaveGlow's early outputs.
- WN: per-flow non-causal WaveNet — start 1x1 conv to ``wn_channels``, 8
  dilated (2^i) kernel-3 convs with gated tanh units, a single fused
  conditioning 1x1 conv over the grouped mel (sliced per layer), residual +
  skip 1x1 convs, zero-init ``end`` 1x1 conv to (b, log s).

All convs are channels-last (NHC) jax ops; the whole synthesis jits to one
XLA program. ``bf16=True`` runs matmul operands in bfloat16 for speed (the
flows are matmul-bound at ``wn_channels``=512); default f32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array


@dataclass(frozen=True)
class WaveGlowConfig:
    n_mels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    wn_layers: int = 8
    wn_channels: int = 512
    wn_kernel: int = 3
    upsample_kernel: int = 1024
    hop_length: int = 256  # == upsample stride

    @property
    def flow_channels(self) -> Tuple[int, ...]:
        """Audio channel count entering each flow k (forward direction)."""
        rem, chans = self.n_group, []
        for k in range(self.n_flows):
            if k % self.n_early_every == 0 and k > 0:
                rem -= self.n_early_size
            chans.append(rem)
        return tuple(chans)

    @property
    def n_remaining(self) -> int:
        """Channels of the final latent z (4 with default config)."""
        return self.flow_channels[-1]


def _conv1d(p, x, dilation: int = 1):
    """SAME zero-padded conv, NHC, weights (k, in, out)."""
    k = p["w"].shape[0]
    pad = dilation * (k - 1) // 2
    y = lax.conv_general_dilated(
        x, p["w"], (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["b"]


def _upsample_polyphase(p, x, stride: int):
    """torch ConvTranspose1d(kernel = m*stride, stride, padding=0) with the
    tail ``kernel - stride`` samples trimmed (exactly WaveGlow's
    ``time_cutoff`` trim), as a polyphase kernel-m conv.

    With padding=0, output sample ``n = u*stride + s`` reads input frames
    ``i`` with ``u-m < i <= u``, tap ``(u-i)*stride + s``; trimming the last
    ``(m-1)*stride`` samples keeps exactly blocks ``u < T``. So: left-pad
    m-1 zero frames, kernel-m VALID conv emitting ``stride*C_out`` channels
    (tap j of block u reads x[u-m+1+j], weight W[:, :, (m-1-j)*stride + s]),
    then a sub-pixel reshape. Weights stay in torch ConvTranspose1d layout
    (C_in, C_out, k).
    """
    w = p["w"]
    cin, cout, k = w.shape
    r = stride
    m = k // r
    assert m * r == k, (k, r)
    taps = w.reshape(cin, cout, m, r)[:, :, ::-1, :]     # [ci, co, j, s]
    kern = taps.transpose(2, 0, 3, 1).reshape(m, cin, r * cout)
    xp = jnp.pad(x, ((0, 0), (m - 1, 0), (0, 0)))
    z = lax.conv_general_dilated(
        xp, kern, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"))
    B, T, _ = z.shape
    y = z.reshape(B, T * r, cout) + p["b"]
    return y


def _wn_apply(p, a0: Array, cond_acts: Array) -> Array:
    """WaveNet-like coupling network: a0 (B, Lg, n_half) + precomputed
    conditioning activations (B, Lg, 2*wn_channels*wn_layers) ->
    (B, Lg, 2*n_half) == concat(b, log s)."""
    nc = p["in"][0]["w"].shape[2] // 2
    x = _conv1d(p["start"], a0)
    out = jnp.zeros(x.shape[:2] + (nc,), x.dtype)
    for i in range(len(p["in"])):
        in_act = _conv1d(p["in"][i], x, dilation=2 ** i)
        in_act = in_act + cond_acts[..., i * 2 * nc:(i + 1) * 2 * nc]
        acts = jnp.tanh(in_act[..., :nc]) * jax.nn.sigmoid(in_act[..., nc:])
        rs = _conv1d(p["res_skip"][i], acts)
        if i < len(p["in"]) - 1:
            x = x + rs[..., :nc]
            out = out + rs[..., nc:]
        else:
            out = out + rs
    return _conv1d(p["end"], out)


class WaveGlow:
    """Functional WaveGlow synthesizer: (B, T, n_mels) log-mel -> (B, T*256)
    waveform. Matches ``WaveGlow.infer`` of NVIDIA's released model (the
    vocoder the reference's demo notebook pairs with FastSpeech2)."""

    def __init__(self, cfg: WaveGlowConfig = WaveGlowConfig(),
                 bf16: bool = False):
        self.cfg = cfg
        self.bf16 = bf16

    def _condition(self, params, mel: Array) -> Array:
        cfg = self.cfg
        up = _upsample_polyphase(params["upsample"], mel, cfg.hop_length)
        B, L, _ = up.shape
        g = cfg.n_group
        # (B, L, n_mels) -> (B, Lg, n_mels*g) with channel = mel*g + offset
        # (torch: unfold(2, g, g).permute(0, 2, 1, 3).view(...))
        spect = up.reshape(B, L // g, g, cfg.n_mels).transpose(0, 1, 3, 2)
        return spect.reshape(B, L // g, cfg.n_mels * g)

    def infer(self, params, mel: Array, key: Optional[Array] = None,
              sigma: float = 1.0, zs: Optional[Sequence[Array]] = None
              ) -> Array:
        """Synthesize. Noise comes from ``key`` (split in draw order) or,
        for parity tests, explicit ``zs`` = [initial z, then one per early
        re-injection in reverse flow order]."""
        cfg = self.cfg
        if self.bf16:
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
            mel = mel.astype(jnp.bfloat16)
        spect = self._condition(params, mel)
        B, Lg, _ = spect.shape
        chans = cfg.flow_channels

        n_draws = 1 + sum(1 for k in range(cfg.n_flows)
                          if k % cfg.n_early_every == 0 and k > 0)
        if zs is None:
            assert key is not None, "need key or zs"
            keys = jax.random.split(key, n_draws)
            zs = [jax.random.normal(keys[0], (B, Lg, chans[-1]), jnp.float32)]
            zs += [jax.random.normal(kk, (B, Lg, cfg.n_early_size),
                                     jnp.float32) for kk in keys[1:]]
        zs = [jnp.asarray(z, spect.dtype) for z in zs]
        assert len(zs) == n_draws, (len(zs), n_draws)

        zi = iter(zs)
        audio = sigma * next(zi)
        for k in reversed(range(cfg.n_flows)):
            flow = params["flows"][k]
            n_half = chans[k] // 2
            a0, a1 = audio[..., :n_half], audio[..., n_half:]
            out = _wn_apply(flow["wn"], a0,
                            _conv1d(flow["wn"]["cond"], spect))
            b, s = out[..., :n_half], out[..., n_half:]
            a1 = (a1 - b) * jnp.exp(-s)
            audio = jnp.concatenate([a0, a1], axis=-1)
            # inverse 1x1: x @ inv(W).T, precomputed at load time
            audio = audio @ jnp.asarray(flow["inv_w"], audio.dtype)
            if k % cfg.n_early_every == 0 and k > 0:
                audio = jnp.concatenate([sigma * next(zi), audio], axis=-1)
        B, Lg, g = audio.shape
        return audio.reshape(B, Lg * g).astype(jnp.float32)


def _init_conv(key, in_ch, out_ch, k, scale=None):
    kw, kb = jax.random.split(key)
    bound = scale if scale is not None else 1.0 / math.sqrt(in_ch * k)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32,
                                             -bound, bound)
    return {"w": u(kw, (k, in_ch, out_ch)), "b": u(kb, (out_ch,))}


def init_waveglow(key, cfg: WaveGlowConfig = WaveGlowConfig()):
    """Random init (tests/smoke): orthogonal 1x1 convs (as NVIDIA does via
    QR of a Gaussian), small-random ``end`` (NVIDIA zero-inits it; tests
    want non-degenerate couplings)."""
    keys = iter(jax.random.split(
        key, (5 + 2 * cfg.wn_layers) * cfg.n_flows + 2))
    params: Dict = {"upsample": None, "flows": []}
    kw, kb = jax.random.split(next(keys))
    bound = 1.0 / math.sqrt(cfg.n_mels * cfg.upsample_kernel)
    params["upsample"] = {
        "w": jax.random.uniform(
            kw, (cfg.n_mels, cfg.n_mels, cfg.upsample_kernel), jnp.float32,
            -bound, bound),
        "b": jax.random.uniform(kb, (cfg.n_mels,), jnp.float32,
                                -bound, bound),
    }
    for k, c in enumerate(cfg.flow_channels):
        n_half = c // 2
        q, _ = jnp.linalg.qr(jax.random.normal(next(keys), (c, c)))
        q = jnp.where(jnp.linalg.det(q) < 0, q.at[:, 0].multiply(-1.0), q)
        wn = {
            "start": _init_conv(next(keys), n_half, cfg.wn_channels, 1),
            "end": _init_conv(next(keys), cfg.wn_channels, 2 * n_half, 1,
                              scale=0.01),
            "cond": _init_conv(next(keys), cfg.n_mels * cfg.n_group,
                               2 * cfg.wn_channels * cfg.wn_layers, 1),
            "in": [_init_conv(next(keys), cfg.wn_channels,
                              2 * cfg.wn_channels, cfg.wn_kernel)
                   for _ in range(cfg.wn_layers)],
            "res_skip": [_init_conv(
                next(keys), cfg.wn_channels,
                2 * cfg.wn_channels if i < cfg.wn_layers - 1
                else cfg.wn_channels, 1) for i in range(cfg.wn_layers)],
        }
        inv = np.linalg.inv(np.asarray(q, np.float64))
        params["flows"].append({
            "inv_w": jnp.asarray(inv.T, jnp.float32), "wn": wn})
    return params


def _maybe_fold_wn(sd: Dict[str, np.ndarray], base: str) -> np.ndarray:
    """Return the plain conv weight at ``base``, folding torch weight_norm
    (g * v / ||v||, norm over all-but-dim-0) when the checkpoint still
    carries it (the demo calls ``remove_weightnorm`` first, but raw training
    checkpoints do not)."""
    if f"{base}.weight" in sd:
        return np.asarray(sd[f"{base}.weight"])
    g = np.asarray(sd[f"{base}.weight_g"])
    v = np.asarray(sd[f"{base}.weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def waveglow_config_from_state_dict(sd: Dict[str, np.ndarray]
                                    ) -> WaveGlowConfig:
    """Infer every architecture dim from checkpoint shapes, so any published
    WaveGlow variant (256- or 512-channel WN) loads without a config file."""
    n_flows = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("WN."))
    wn_layers = 1 + max(int(k.split(".")[3]) for k in sd
                        if k.startswith("WN.0.in_layers."))
    w_in0 = _maybe_fold_wn(sd, "WN.0.in_layers.0")
    wn_channels = w_in0.shape[0] // 2
    wn_kernel = w_in0.shape[2]
    up_w = np.asarray(sd["upsample.weight"])  # (in, out, k)
    n_mels, _, up_k = up_w.shape
    # NVIDIA weight-norms the WN start convs too: raw training checkpoints
    # carry only start.weight_v/weight_g, so fold (shape is unchanged)
    n_group = 2 * _maybe_fold_wn(sd, "WN.0.start").shape[1]
    # early sizes from the channel drops across flows
    chans = [2 * _maybe_fold_wn(sd, f"WN.{k}.start").shape[1]
             for k in range(n_flows)]
    n_early_every = next((k for k in range(1, n_flows)
                          if chans[k] != chans[k - 1]), 4)
    n_early_size = chans[0] - chans[n_early_every] if n_early_every < n_flows \
        else 2
    if "WN.0.cond_layer.weight" in sd or "WN.0.cond_layer.weight_v" in sd:
        cond_in = _maybe_fold_wn(sd, "WN.0.cond_layer").shape[1]
    else:  # legacy per-layer cond convs
        cond_in = _maybe_fold_wn(sd, "WN.0.cond_layers.0").shape[1]
    assert cond_in == n_mels * n_group, (cond_in, n_mels, n_group)
    return WaveGlowConfig(
        n_mels=n_mels, n_flows=n_flows, n_group=n_group,
        n_early_every=n_early_every, n_early_size=n_early_size,
        wn_layers=wn_layers, wn_channels=wn_channels, wn_kernel=wn_kernel,
        # stride is not recoverable from shapes; NVIDIA's upsampler always
        # uses kernel == 4*stride (1024/256)
        upsample_kernel=up_k, hop_length=up_k // 4)


def waveglow_params_from_torch(sd: Dict[str, np.ndarray],
                               cfg: Optional[WaveGlowConfig] = None) -> Dict:
    """Translate an NVIDIA-format WaveGlow state_dict (torch hub
    ``nvidia_waveglow`` / waveglow repo; weight-normed or folded; fused
    ``cond_layer`` or legacy per-layer ``cond_layers.{i}``) into our pytree.

    Layout: Conv1d (out, in, k) -> (k, in, out); ConvTranspose1d stays in
    torch (in, out, k) layout for the polyphase upsampler; Invertible1x1Conv
    weights are inverted (float64) and transposed for channels-last
    right-multiplication.
    """
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items()}
    if cfg is None:
        cfg = waveglow_config_from_state_dict(sd)

    def conv(base):
        w = _maybe_fold_wn(sd, base)  # (out, in, k)
        b = np.asarray(sd.get(f"{base}.bias",
                              np.zeros(w.shape[0], np.float32)))
        return {"w": jnp.asarray(np.ascontiguousarray(w.transpose(2, 1, 0)),
                                 jnp.float32),
                "b": jnp.asarray(b, jnp.float32)}

    params: Dict = {
        "upsample": {
            "w": jnp.asarray(sd["upsample.weight"], jnp.float32),
            "b": jnp.asarray(sd["upsample.bias"], jnp.float32)},
        "flows": [],
    }
    for k in range(cfg.n_flows):
        wn_base = f"WN.{k}"
        if f"{wn_base}.cond_layer.weight" in sd \
                or f"{wn_base}.cond_layer.weight_v" in sd:
            cond = conv(f"{wn_base}.cond_layer")
        else:
            # legacy per-layer cond convs -> concat along out channels in
            # layer order (matches the fused layer's per-layer slicing)
            ws, bs = [], []
            for i in range(cfg.wn_layers):
                c = conv(f"{wn_base}.cond_layers.{i}")
                ws.append(c["w"])
                bs.append(c["b"])
            cond = {"w": jnp.concatenate(ws, axis=2),
                    "b": jnp.concatenate(bs)}
        wn = {
            "start": conv(f"{wn_base}.start"),
            "end": conv(f"{wn_base}.end"),
            "cond": cond,
            "in": [conv(f"{wn_base}.in_layers.{i}")
                   for i in range(cfg.wn_layers)],
            "res_skip": [conv(f"{wn_base}.res_skip_layers.{i}")
                         for i in range(cfg.wn_layers)],
        }
        w1x1 = np.asarray(sd[f"convinv.{k}.conv.weight"], np.float64)[..., 0]
        inv = np.linalg.inv(w1x1)
        params["flows"].append({
            "inv_w": jnp.asarray(inv.T, jnp.float32), "wn": wn})
    return params


def load_waveglow_params(path: str):
    """Load a WaveGlow torch checkpoint -> (params, cfg). Accepts the raw
    state_dict, hub/DeepLearningExamples wrappers (``state_dict`` /
    ``model``), and train checkpoints."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj
    for key in ("state_dict", "model", "waveglow"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    if hasattr(sd, "state_dict"):  # a pickled nn.Module
        sd = sd.state_dict()
    sd = {k[len("model."):] if k.startswith("model.") else k: np.asarray(v)
          for k, v in sd.items()
          if hasattr(v, "__array__") or hasattr(v, "numpy")}
    cfg = waveglow_config_from_state_dict(sd)
    return waveglow_params_from_torch(sd, cfg), cfg


def load_waveglow(path: str, sigma: float = 1.0, bf16: bool = False,
                  batch_frames: int = 64, seed: int = 0):
    """Load a torch WaveGlow checkpoint and return a callable
    ``(L, n_mels) log-mel -> (L*hop,) float waveform`` for
    ``infer.synthesize.vocode(vocoder=...)`` — the drop-in analogue of
    ``melgan.load_melgan`` (the reference demo instead pulls WaveGlow from
    torch.hub at runtime).

    Mels pad (with the log(1e-5) floor) to a multiple of ``batch_frames`` to
    bound the jit cache. Noise is drawn from a per-call counter-derived key:
    deterministic for a fixed call sequence, independent across calls.

    The returned callable also carries a ``.batched(mels (B, L, n_mels),
    out_lens (B,)) -> (B, L*hop) float`` attribute: one device call for a
    whole padded serving micro-batch (frames past each row's length are
    floor-masked to silence first). ``Synthesizer.attach_vocoder_fn`` uses
    it when present instead of B per-row dispatches.
    """
    params, cfg = load_waveglow_params(path)
    wg = WaveGlow(cfg, bf16=bf16)
    jitted = jax.jit(wg.infer, static_argnames=("sigma",))
    calls = [0]
    floor = math.log(1e-5)

    def _key():
        key = jax.random.fold_in(jax.random.PRNGKey(seed), calls[0])
        calls[0] += 1
        return key

    def vocoder(mel: np.ndarray) -> np.ndarray:
        L = mel.shape[0]
        pad = (-L) % batch_frames
        m = np.pad(mel.astype(np.float32), ((0, pad), (0, 0)),
                   constant_values=floor)
        wav = jitted(params, jnp.asarray(m[None]), _key(), sigma=sigma)
        return np.asarray(wav)[0, : L * cfg.hop_length]

    def batched(mels: np.ndarray, out_lens: np.ndarray) -> np.ndarray:
        B, L, _ = mels.shape
        pad = (-L) % batch_frames
        m = np.pad(mels.astype(np.float32), ((0, 0), (0, pad), (0, 0)),
                   constant_values=floor)
        valid = (np.arange(m.shape[1])[None, :, None]
                 < np.asarray(out_lens)[:, None, None])
        m = np.where(valid, m, floor)
        wav = jitted(params, jnp.asarray(m), _key(), sigma=sigma)
        return np.asarray(wav)[:, : L * cfg.hop_length]

    vocoder.batched = batched
    vocoder.hop_length = cfg.hop_length
    return vocoder
