"""Deploy-artifact export (reference ``export_torchscript.py``).

The TPU-native equivalent of TorchScript export is AOT lowering with
``jax.export``: the jitted inference function is serialized (StableHLO) for a
fixed (batch, max_tokens, max_frames) signature and can be reloaded and called
without the model-building Python code.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("fastspeech2_tpu.export")


def export_inference(checkpoint_path: Optional[str], out_path: str,
                     config_path: Optional[str] = None, batch: int = 1,
                     max_tokens: int = 192, max_frames: int = 1024,
                     bf16: bool = False,
                     matmul_precision: str = "default",
                     int8: bool = False,
                     vocoder_path: Optional[str] = None) -> str:
    """Serialize the inference fn (params baked in) to ``out_path``.

    Returns the written path. Loads reference .pth checkpoints or our .npz;
    with no checkpoint, exports a random init (useful for shape contracts).
    bf16/matmul_precision/int8 are baked into the artifact at trace time (same
    semantics as infer.synthesize.Synthesizer: bf16 = MXU speed path,
    matmul_precision="highest" = full-f32 dots for TPU parity-grade serving,
    int8 = W8A8 encoder/decoder matmuls via ops/quant8.py).

    vocoder_path: a MelGAN checkpoint to bake in — the artifact then computes
    tokens -> (mel, wav int16 PCM, out_lens) as ONE program (the fused
    text->wav serving path, same semantics as Synthesizer.attach_vocoder).
    WaveGlow cannot be baked (it samples noise per call); use it host-side.
    """
    from jax import export as jax_export

    from fastspeech2_tpu.config import Config, load_config
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2

    if checkpoint_path and checkpoint_path.endswith((".pth", ".pyt", ".pt")):
        from fastspeech2_tpu.compat.torch_loader import load_torch_checkpoint

        cfg = load_config(config_path) if config_path else None
        params, state, cfg, _ = load_torch_checkpoint(checkpoint_path, cfg)
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)
    elif checkpoint_path:
        from fastspeech2_tpu.train.checkpoint import (
            load_checkpoint, load_checkpoint_meta)

        meta = load_checkpoint_meta(checkpoint_path)
        cfg = Config.from_yaml(meta["hp_yaml"])
        model0 = FastSpeech2(cfg)
        p0, s0 = model0.init(jax.random.PRNGKey(0))
        params, state, _, _, _ = load_checkpoint(checkpoint_path, p0, s0)
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)
    else:
        cfg = load_config(config_path)
        model0 = FastSpeech2(cfg)
        params, state = model0.init(jax.random.PRNGKey(0))

    model = FastSpeech2(cfg)

    if int8:
        from fastspeech2_tpu.ops.quant8 import quantize_model_params

        params = jax.jit(quantize_model_params)(params)

    import contextlib

    from fastspeech2_tpu.ops.precision import compute_dtype

    voc_gen = voc_params = None
    if vocoder_path:
        from fastspeech2_tpu.vocoder import (MelGANGenerator,
                                             detect_vocoder_kind,
                                             load_melgan_params)

        kind = detect_vocoder_kind(vocoder_path)
        if kind != "melgan":
            raise ValueError(
                f"only MelGAN can be baked into the artifact (got {kind}: "
                "WaveGlow samples noise per call); vocode host-side instead")
        voc_gen = MelGANGenerator(bf16=bf16)
        voc_params = load_melgan_params(vocoder_path)

    def infer(xs, ilens, alphas):
        prec = (jax.default_matmul_precision(matmul_precision)
                if matmul_precision != "default" else contextlib.nullcontext())
        with compute_dtype(jnp.bfloat16 if bf16 else None), prec:
            mel, out_lens, durs = model.inference(
                params, state, xs, ilens, out_maxlen=max_frames,
                alpha=alphas)
        if voc_gen is None:
            return mel, out_lens
        from fastspeech2_tpu.infer.synthesize import mel_floor_mask, pcm16

        # same semantics as Synthesizer._wav_fn: silence past each row's
        # length, int16 PCM on-device
        wav = voc_gen(voc_params, mel_floor_mask(mel, out_lens))
        return mel, pcm16(wav), out_lens

    exported = jax_export.export(jax.jit(infer))(
        jax.ShapeDtypeStruct((batch, max_tokens), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        # per-row speed control rides as a runtime input of the artifact
        jax.ShapeDtypeStruct((batch,), jnp.float32),
    )
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    log.info("exported %d-byte artifact to %s (B=%d, T<=%d, L<=%d)",
             len(blob), out_path, batch, max_tokens, max_frames)
    return out_path


def load_exported(path: str):
    """Reload an exported artifact; returns a callable
    (xs, ilens, alphas=None) -> (mel, out_lens), or (mel, wav int16,
    out_lens) for artifacts exported with a baked vocoder. alphas defaults
    to 1.0 (normal speed) per row."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def call(xs, ilens, alphas=None):
        if alphas is None:
            alphas = jnp.ones((xs.shape[0],), jnp.float32)
        return exported.call(xs, ilens, jnp.asarray(alphas, jnp.float32))

    return call
