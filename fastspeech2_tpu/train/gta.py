"""Ground-truth-aligned (GTA) mel generation for vocoder finetuning.

The reference's ``create_gta`` (``train_fastspeech.py:260-335``) is broken --
it calls ``_forward`` with a wrong argument order (SURVEY.md appendix). This is
the working equivalent: teacher-forced forward with ground-truth durations /
pitch / energy, dumping the post-postnet mels per utterance.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.data.batching import pad_batch
from fastspeech2_tpu.data.dataset import TTSDataset
from fastspeech2_tpu.models.encoder import encoder_apply
from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
from fastspeech2_tpu.models.postnet import postnet_apply
from fastspeech2_tpu.ops import attention_mask, make_non_pad_mask, nn
from fastspeech2_tpu.ops.length_regulator import regulate_length
from fastspeech2_tpu.ops.quantize import to_one_hot

log = logging.getLogger("fastspeech2_tpu.gta")


def generate_gta(model: FastSpeech2, params, state, dataset: TTSDataset,
                 outdir: str, batch_size: int = 8) -> int:
    """Dump GTA mels as (n_mels, L) .npy per utterance; returns count written."""
    os.makedirs(outdir, exist_ok=True)
    utts = [dataset[i] for i in range(len(dataset))]
    T = max(len(u.tokens) for u in utts)
    L = max(u.mel.shape[0] for u in utts)

    @jax.jit
    def gta_forward(params, b):
        tok_mask = make_non_pad_mask(b.ilens, T)
        hs = encoder_apply(params["encoder"], model.encoder_cfg, b.xs,
                           attention_mask(b.ilens, T))
        hs_e, _, _ = regulate_length(hs, b.ds, tok_mask, L)
        hs2 = hs_e + nn.linear(params["pitch_embed"],
                               to_one_hot(b.ps, model.pitch_bins))
        hs2 = hs2 + nn.linear(params["energy_embed"],
                              to_one_hot(b.es, model.energy_bins))
        zs = encoder_apply(params["decoder"], model.decoder_cfg, hs2,
                           attention_mask(b.olens, L))
        before = nn.linear(params["feat_out"], zs).reshape(
            zs.shape[0], -1, model.odim)
        if model.postnet_cfg is None:
            return before
        resid, _ = postnet_apply(params["postnet"], state["postnet"],
                                 model.postnet_cfg, before, training=False)
        return before + resid

    n = 0
    for i in range(0, len(utts), batch_size):
        chunk = utts[i : i + batch_size]
        b = jax.tree.map(jnp.asarray, pad_batch(chunk, T, L))
        mels = np.asarray(gta_forward(params, b))
        for j, u in enumerate(chunk):
            np.save(os.path.join(outdir, f"{u.utt_id}.npy"),
                    mels[j, : u.mel.shape[0]].T.astype(np.float32))
            n += 1
    log.info("wrote %d GTA mels to %s", n, outdir)
    return n
