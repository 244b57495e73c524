"""Translate our params pytree BACK to a reference PyTorch checkpoint.

The inverse of :mod:`fastspeech2_tpu.compat.torch_loader`: models trained in
this framework export to the reference's exact checkpoint format
(``torch.save`` dict with ``model``/``step``/``hp_str``/``githash``,
``/root/reference/train_fastspeech.py:229-239``), so a user can migrate in
EITHER direction -- train here, deploy on the reference (or hand a checkpoint
to a collaborator still running it).

Layout transforms (inverse of torch_loader):
- ours linear (in, out)    -> torch Linear (out, in):      transpose
- ours conv1d (k, in, out) -> torch Conv1d (out, in, k):   transpose(2,1,0)
- Embedding / LayerNorm / BatchNorm copied verbatim.

Key names follow the reference module tree exactly (``fastspeech.py``,
``core/encoder.py:117-183``); the reference's always-allocated-but-unused
``concat_linear`` (``core/encoder.py:44``) is emitted as zeros when our tree
has no ``concat`` entry, so ``load_state_dict(strict=True)`` passes.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from fastspeech2_tpu.config import Config


def _t(w):  # ours linear -> torch
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _tc(w):  # ours conv1d -> torch
    return np.ascontiguousarray(np.asarray(w, np.float32).transpose(2, 1, 0))


def _np(w):
    return np.asarray(w, np.float32)


def _encoder_to_sd(sd: Dict[str, np.ndarray], p: dict, prefix: str,
                   input_layer: str, adim: int, use_scaled_pos_enc: bool,
                   normalize_before: bool, max_pos_len: int) -> None:
    from fastspeech2_tpu.models.encoder import sinusoid_table

    if input_layer == "embed":
        sd[f"{prefix}.embed.0.weight"] = _np(p["embed"]["w"])
        pe_idx = 1
    else:  # Sequential(Linear, LN, Dropout, ReLU, PE) -> indices 0,1,4
        sd[f"{prefix}.embed.0.weight"] = _t(p["input_linear"]["w"])
        sd[f"{prefix}.embed.0.bias"] = _np(p["input_linear"]["b"])
        sd[f"{prefix}.embed.1.weight"] = _np(p["input_ln"]["g"])
        sd[f"{prefix}.embed.1.bias"] = _np(p["input_ln"]["b"])
        pe_idx = 4
    if use_scaled_pos_enc:
        sd[f"{prefix}.embed.{pe_idx}.alpha"] = _np(p["alpha"]).reshape(())
    # the PE table is a registered buffer in the reference
    # (core/embedding.py:48 extend_pe); ship OUR sinusoid values so the
    # reference reproduces this model's exact outputs
    sd[f"{prefix}.embed.{pe_idx}.pe"] = sinusoid_table(
        max_pos_len, adim).astype(np.float32)[None]
    for i, layer in enumerate(p["layers"]):
        lp = f"{prefix}.encoders_.{i}"
        for name in ("q", "k", "v", "out"):
            sd[f"{lp}.self_attn.linear_{name}.weight"] = _t(layer["attn"][name]["w"])
            sd[f"{lp}.self_attn.linear_{name}.bias"] = _np(layer["attn"][name]["b"])
        w1 = np.asarray(layer["ffn"]["w1"]["w"])
        if w1.ndim == 3:  # conv FFN
            sd[f"{lp}.feed_forward.w_1.weight"] = _tc(w1)
            sd[f"{lp}.feed_forward.w_2.weight"] = _tc(layer["ffn"]["w2"]["w"])
        else:
            sd[f"{lp}.feed_forward.w_1.weight"] = _t(w1)
            sd[f"{lp}.feed_forward.w_2.weight"] = _t(layer["ffn"]["w2"]["w"])
        sd[f"{lp}.feed_forward.w_1.bias"] = _np(layer["ffn"]["w1"]["b"])
        sd[f"{lp}.feed_forward.w_2.bias"] = _np(layer["ffn"]["w2"]["b"])
        sd[f"{lp}.norm1.weight"] = _np(layer["norm1"]["g"])
        sd[f"{lp}.norm1.bias"] = _np(layer["norm1"]["b"])
        sd[f"{lp}.norm2.weight"] = _np(layer["norm2"]["g"])
        sd[f"{lp}.norm2.bias"] = _np(layer["norm2"]["b"])
        if "concat" in layer:
            sd[f"{lp}.concat_linear.weight"] = _t(layer["concat"]["w"])
            sd[f"{lp}.concat_linear.bias"] = _np(layer["concat"]["b"])
        else:
            # allocated-but-unused in the reference (core/encoder.py:44)
            sd[f"{lp}.concat_linear.weight"] = np.zeros((adim, 2 * adim),
                                                        np.float32)
            sd[f"{lp}.concat_linear.bias"] = np.zeros((adim,), np.float32)
    if normalize_before:
        sd[f"{prefix}.after_norm.weight"] = _np(p["after_norm"]["g"])
        sd[f"{prefix}.after_norm.bias"] = _np(p["after_norm"]["b"])
    else:
        # the reference allocates after_norm unconditionally and only
        # APPLIES it under normalize_before (core/encoder.py:117,201-202)
        sd[f"{prefix}.after_norm.weight"] = np.ones((adim,), np.float32)
        sd[f"{prefix}.after_norm.bias"] = np.zeros((adim,), np.float32)


def _predictor_to_sd(sd: Dict[str, np.ndarray], p: dict, prefix: str) -> None:
    for i, conv in enumerate(p["convs"]):
        sd[f"{prefix}.conv.{i}.0.weight"] = _tc(conv["conv"]["w"])
        sd[f"{prefix}.conv.{i}.0.bias"] = _np(conv["conv"]["b"])
        sd[f"{prefix}.conv.{i}.2.layer_norm.weight"] = _np(conv["ln"]["g"])
        sd[f"{prefix}.conv.{i}.2.layer_norm.bias"] = _np(conv["ln"]["b"])
    sd[f"{prefix}.linear.weight"] = _t(p["out"]["w"])
    sd[f"{prefix}.linear.bias"] = _np(p["out"]["b"])


def state_dict_from_params(params: dict, state: dict,
                           cfg: Config) -> Dict[str, np.ndarray]:
    """(params, state) -> reference state_dict (numpy arrays, torch naming)."""
    from fastspeech2_tpu.ops.quantize import linear_bins, log_bins

    m = cfg.model
    sd: Dict[str, np.ndarray] = {}
    _encoder_to_sd(sd, params["encoder"], "encoder", "embed", m.adim,
                   m.use_scaled_pos_enc, m.encoder_normalize_before,
                   m.max_pos_len)
    _predictor_to_sd(sd, params["duration_predictor"], "duration_predictor")
    _predictor_to_sd(sd, params["energy_predictor"],
                     "energy_predictor.predictor")
    _predictor_to_sd(sd, params["pitch_predictor"],
                     "pitch_predictor.predictor")
    # quantization-bin buffers (variance_predictor.py:124,188-197)
    d = cfg.data
    sd["energy_predictor.energy_bins"] = linear_bins(
        d.e_min, d.e_max, m.variance_n_bins).astype(np.float32)
    sd["pitch_predictor.pitch_bins"] = log_bins(
        d.p_min, d.p_max, m.variance_n_bins).astype(np.float32)
    sd["energy_embed.weight"] = _t(params["energy_embed"]["w"])
    sd["energy_embed.bias"] = _np(params["energy_embed"]["b"])
    sd["pitch_embed.weight"] = _t(params["pitch_embed"]["w"])
    sd["pitch_embed.bias"] = _np(params["pitch_embed"]["b"])
    _encoder_to_sd(sd, params["decoder"], "decoder", "linear", m.ddim,
                   m.use_scaled_pos_enc, m.decoder_normalize_before,
                   m.max_pos_len)
    sd["feat_out.weight"] = _t(params["feat_out"]["w"])
    sd["feat_out.bias"] = _np(params["feat_out"]["b"])
    if m.postnet_layers > 0:
        for i, layer in enumerate(params["postnet"]["layers"]):
            sd[f"postnet.postnet.{i}.0.weight"] = _tc(layer["conv"]["w"])
            if m.use_batch_norm:
                bn_s = state["postnet"]["bn"][i]
                sd[f"postnet.postnet.{i}.1.weight"] = _np(layer["bn"]["g"])
                sd[f"postnet.postnet.{i}.1.bias"] = _np(layer["bn"]["b"])
                sd[f"postnet.postnet.{i}.1.running_mean"] = _np(bn_s["mean"])
                sd[f"postnet.postnet.{i}.1.running_var"] = _np(bn_s["var"])
                sd[f"postnet.postnet.{i}.1.num_batches_tracked"] = np.asarray(
                    0, np.int64)
    return sd


def save_torch_checkpoint(path: str, params: dict, state: dict, cfg: Config,
                          step: int = 0, githash: Optional[str] = None) -> None:
    """Write a reference-format ``.pth``/``.pyt`` checkpoint
    (``train_fastspeech.py:229-239``: model/optim/step/hp_str/githash; the
    optimizer state is framework-specific and not translated)."""
    import torch  # local import: torch is only needed for interop

    sd_np = state_dict_from_params(params, state, cfg)
    # np.ascontiguousarray would promote 0-dim (the PE alphas) to (1,);
    # np.array(copy=True) keeps shapes and makes the buffers writable
    sd = {k: torch.as_tensor(np.array(v, copy=True)) for k, v in sd_np.items()}
    if githash is None:
        from fastspeech2_tpu.train.checkpoint import git_hash

        githash = git_hash()
    torch.save({"model": sd, "optim": {}, "step": int(step),
                "hp_str": cfg.to_yaml(), "githash": githash}, path)
