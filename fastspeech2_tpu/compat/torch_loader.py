"""Translate reference PyTorch checkpoints into our params pytree.

Layout transforms (see ops/nn.py):
- torch Linear weight (out, in)        -> ours (in, out):        transpose
- torch Conv1d weight (out, in, k)     -> ours (k, in, out):     transpose(2,1,0)
- Embedding / LayerNorm / BatchNorm    -> copied verbatim

Key-name map follows the reference module tree (``/root/reference/fastspeech.py``,
``core/encoder.py:117-183``, ``core/duration_modeling/duration_predictor.py:45-62``,
``core/variance_predictor.py:20-37,98-125,162-198``, ``core/modules.py:284-348``).

Checkpoint formats handled (reference train_fastspeech.py:229-239, inference.py:143-166):
- dict with "model" (state_dict), "hp_str", "step", ... (current format)
- a bare state_dict ("old model" format, loaded with strict=False there)

The released-checkpoint traps from SURVEY.md 2.1: the ``encoders`` ->
``encoders_`` module rename is accepted under either name (``_SD``); an
undersized symbol embedding (56-symbol-era checkpoints) is zero-padded to the
frontend vocabulary with a warning; decoder-width/``feat_out`` differences are
covered by rebuilding the config from the checkpoint's embedded ``hp_str``
(``load_torch_checkpoint``) rather than by shape surgery.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from fastspeech2_tpu.config import Config


def _t(w):  # torch Linear -> ours
    return np.ascontiguousarray(np.asarray(w).T)


def _tc(w):  # torch Conv1d -> ours
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


class _SD:
    """state_dict accessor tolerating the encoders/encoders_ rename."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}

    def __call__(self, key: str) -> np.ndarray:
        if key in self.sd:
            return self.sd[key]
        alt = key.replace(".encoders_.", ".encoders.")
        if alt in self.sd:
            return self.sd[alt]
        raise KeyError(f"checkpoint missing key {key} (and {alt})")

    def has(self, key: str) -> bool:
        return key in self.sd or key.replace(".encoders_.", ".encoders.") in self.sd


def _encoder_from_sd(sd: _SD, prefix: str, num_blocks: int, input_layer: str,
                     normalize_before: bool, concat_after: bool,
                     use_scaled_pos_enc: bool):
    p: dict = {}
    if input_layer == "embed":
        p["embed"] = {"w": np.asarray(sd(f"{prefix}.embed.0.weight"))}
        pe_idx = 1
    else:
        p["input_linear"] = {"w": _t(sd(f"{prefix}.embed.0.weight")),
                             "b": np.asarray(sd(f"{prefix}.embed.0.bias"))}
        p["input_ln"] = {"g": np.asarray(sd(f"{prefix}.embed.1.weight")),
                         "b": np.asarray(sd(f"{prefix}.embed.1.bias"))}
        pe_idx = 4
    if use_scaled_pos_enc:
        # reshape: our init stores alpha 0-dim; tolerate (1,)-shaped ckpts
        p["alpha"] = np.asarray(sd(f"{prefix}.embed.{pe_idx}.alpha")).reshape(())
    layers = []
    for i in range(num_blocks):
        lp = f"{prefix}.encoders_.{i}"
        layer = {
            "attn": {
                "q": {"w": _t(sd(f"{lp}.self_attn.linear_q.weight")),
                      "b": np.asarray(sd(f"{lp}.self_attn.linear_q.bias"))},
                "k": {"w": _t(sd(f"{lp}.self_attn.linear_k.weight")),
                      "b": np.asarray(sd(f"{lp}.self_attn.linear_k.bias"))},
                "v": {"w": _t(sd(f"{lp}.self_attn.linear_v.weight")),
                      "b": np.asarray(sd(f"{lp}.self_attn.linear_v.bias"))},
                "out": {"w": _t(sd(f"{lp}.self_attn.linear_out.weight")),
                        "b": np.asarray(sd(f"{lp}.self_attn.linear_out.bias"))},
            },
            "norm1": {"g": np.asarray(sd(f"{lp}.norm1.weight")),
                      "b": np.asarray(sd(f"{lp}.norm1.bias"))},
            "norm2": {"g": np.asarray(sd(f"{lp}.norm2.weight")),
                      "b": np.asarray(sd(f"{lp}.norm2.bias"))},
        }
        w1 = sd(f"{lp}.feed_forward.w_1.weight")
        if w1.ndim == 3:  # conv1d FFN
            layer["ffn"] = {
                "w1": {"w": _tc(w1), "b": np.asarray(sd(f"{lp}.feed_forward.w_1.bias"))},
                "w2": {"w": _tc(sd(f"{lp}.feed_forward.w_2.weight")),
                       "b": np.asarray(sd(f"{lp}.feed_forward.w_2.bias"))},
            }
        else:  # linear FFN
            layer["ffn"] = {
                "w1": {"w": _t(w1), "b": np.asarray(sd(f"{lp}.feed_forward.w_1.bias"))},
                "w2": {"w": _t(sd(f"{lp}.feed_forward.w_2.weight")),
                       "b": np.asarray(sd(f"{lp}.feed_forward.w_2.bias"))},
            }
        if concat_after:
            layer["concat"] = {"w": _t(sd(f"{lp}.concat_linear.weight")),
                               "b": np.asarray(sd(f"{lp}.concat_linear.bias"))}
        layers.append(layer)
    p["layers"] = layers
    if normalize_before:
        p["after_norm"] = {"g": np.asarray(sd(f"{prefix}.after_norm.weight")),
                           "b": np.asarray(sd(f"{prefix}.after_norm.bias"))}
    return p


def _predictor_from_sd(sd: _SD, prefix: str, n_layers: int):
    convs = []
    for i in range(n_layers):
        convs.append({
            "conv": {"w": _tc(sd(f"{prefix}.conv.{i}.0.weight")),
                     "b": np.asarray(sd(f"{prefix}.conv.{i}.0.bias"))},
            "ln": {"g": np.asarray(sd(f"{prefix}.conv.{i}.2.layer_norm.weight")),
                   "b": np.asarray(sd(f"{prefix}.conv.{i}.2.layer_norm.bias"))},
        })
    return {"convs": convs,
            "out": {"w": _t(sd(f"{prefix}.linear.weight")),
                    "b": np.asarray(sd(f"{prefix}.linear.bias"))}}


def params_from_state_dict(
    state_dict: Dict[str, np.ndarray], cfg: Config,
) -> Tuple[dict, dict]:
    """Reference state_dict (numpy arrays) -> (params, state) for FastSpeech2."""
    sd = _SD(state_dict)
    m = cfg.model
    params = {
        "encoder": _encoder_from_sd(
            sd, "encoder", m.elayers, "embed", m.encoder_normalize_before,
            m.encoder_concat_after, m.use_scaled_pos_enc),
        "duration_predictor": _predictor_from_sd(
            sd, "duration_predictor", m.duration_predictor_layers),
        "energy_predictor": _predictor_from_sd(sd, "energy_predictor.predictor", 2),
        "pitch_predictor": _predictor_from_sd(sd, "pitch_predictor.predictor", 2),
        "energy_embed": {"w": _t(sd("energy_embed.weight")),
                         "b": np.asarray(sd("energy_embed.bias"))},
        "pitch_embed": {"w": _t(sd("pitch_embed.weight")),
                        "b": np.asarray(sd("pitch_embed.bias"))},
        "decoder": _encoder_from_sd(
            sd, "decoder", m.dlayers, "linear", m.decoder_normalize_before,
            m.decoder_concat_after, m.use_scaled_pos_enc),
        "feat_out": {"w": _t(sd("feat_out.weight")),
                     "b": np.asarray(sd("feat_out.bias"))},
    }
    # Released-checkpoint trap (SURVEY.md 2.1): some published checkpoints
    # were trained with a 56-symbol vocabulary. Zero-pad the embedding to the
    # frontend's vocabulary so token ids beyond the checkpoint's rows map to
    # a deterministic zero vector (and are loud in the log) instead of
    # jnp.take's silent clip-to-last-row.
    from fastspeech2_tpu.text.symbols import NUM_PHONEMES

    emb = params["encoder"].get("embed", {}).get("w")
    if emb is not None and emb.shape[0] < NUM_PHONEMES:
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint embedding has %d symbol rows < frontend vocabulary "
            "%d (a released-checkpoint quirk); ids >= %d will embed to zeros",
            emb.shape[0], NUM_PHONEMES, emb.shape[0])
        pad = np.zeros((NUM_PHONEMES - emb.shape[0], emb.shape[1]), emb.dtype)
        params["encoder"]["embed"]["w"] = np.concatenate([emb, pad], axis=0)

    state: dict = {}
    if m.postnet_layers > 0:
        layers, bn = [], []
        for i in range(m.postnet_layers):
            layer = {"conv": {"w": _tc(sd(f"postnet.postnet.{i}.0.weight"))}}
            if m.use_batch_norm:
                layer["bn"] = {"g": np.asarray(sd(f"postnet.postnet.{i}.1.weight")),
                               "b": np.asarray(sd(f"postnet.postnet.{i}.1.bias"))}
                bn.append({"mean": np.asarray(sd(f"postnet.postnet.{i}.1.running_mean")),
                           "var": np.asarray(sd(f"postnet.postnet.{i}.1.running_var"))})
            layers.append(layer)
        params["postnet"] = {"layers": layers}
        state["postnet"] = {"bn": bn}
    return params, state


def load_torch_checkpoint(path: str, cfg: Optional[Config] = None):
    """Load a reference .pth/.pyt checkpoint file.

    Returns (params, state, cfg, step). When the checkpoint embeds ``hp_str``
    and no cfg is given, the config is rebuilt from it (reference
    inference.py:149-152); pass ``cfg`` to override.
    """
    import torch  # local import: torch is only needed for interop

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    step = 0
    if isinstance(ckpt, dict) and "model" in ckpt:
        sd = ckpt["model"]
        step = int(ckpt.get("step", 0))
        if cfg is None and "hp_str" in ckpt:
            cfg = Config.from_yaml(ckpt["hp_str"])
    else:
        sd = ckpt
    if cfg is None:
        cfg = Config()
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params, state = params_from_state_dict(sd_np, cfg)
    return params, state, cfg, step
