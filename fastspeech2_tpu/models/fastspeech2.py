"""FastSpeech2 text->mel model: pure-functional init/apply.

Replicates the behavioral contract of the reference ``FeedForwardTransformer``
(``/root/reference/fastspeech.py``) as a params-pytree + jitted-apply design:

- training ``forward`` is teacher-forced: ground-truth durations drive the
  length regulator and ground-truth frame-level pitch/energy are quantized,
  one-hot encoded and added via linear embeddings (fastspeech.py:197-219);
- pitch/energy are predicted at frame level AFTER length regulation (:214-217);
- inference predicts durations (exp/round/clamp), expands, predicts pitch and
  energy, embeds, decodes (:192-196,221-238);
- losses: L1(before)+L1(after) + MSE(log-duration) + MSE(energy) + MSE(pitch),
  masked means over valid positions (:281-324).

Shapes are static (padded); masks carry validity. ``exact_unpadded=True`` in
inference zeroes every conv input beyond the true length so a padded static
buffer is bit-equivalent to the reference's unpadded single-utterance run
(conv windows then see zeros exactly like torch's implicit SAME padding).
Training keeps the reference's batched padding semantics (pad rows carry
embed-of-zero values that leak into conv windows -- faithfully replicated).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.config import Config
from fastspeech2_tpu.models.encoder import EncoderConfig, encoder_apply, init_encoder
from fastspeech2_tpu.models.postnet import PostnetConfig, init_postnet, postnet_apply
from fastspeech2_tpu.models.predictors import (
    PredictorConfig,
    duration_inference_apply,
    duration_train_apply,
    init_predictor,
    variance_inference_apply,
    variance_train_apply,
)
from fastspeech2_tpu.ops import attention_mask, make_non_pad_mask, nn
from fastspeech2_tpu.ops.length_regulator import regulate_length, scale_durations
from fastspeech2_tpu.ops.quantize import linear_bins, log_bins, to_one_hot
from fastspeech2_tpu.text.symbols import NUM_PHONEMES

Array = jax.Array


class Batch(NamedTuple):
    """A padded training batch (static shapes)."""

    xs: Array      # (B, T) int32 token ids
    ilens: Array   # (B,) int32
    ys: Array      # (B, L, odim) float mel targets
    olens: Array   # (B,) int32
    ds: Array      # (B, T) int32 durations
    es: Array      # (B, L) float energy targets
    ps: Array      # (B, L) float pitch targets


@dataclass(frozen=True)
class FastSpeech2:
    """Static model definition; params/state live outside (functional style)."""

    cfg: Config
    idim: int = NUM_PHONEMES

    # -- derived sub-configs -------------------------------------------------

    @property
    def odim(self) -> int:
        return self.cfg.audio.num_mels

    @property
    def encoder_cfg(self) -> EncoderConfig:
        m = self.cfg.model
        return EncoderConfig(
            idim=self.idim, attention_dim=m.adim, attention_heads=m.aheads,
            linear_units=m.eunits, num_blocks=m.elayers,
            dropout_rate=m.transformer_dropout_rate,
            positional_dropout_rate=m.transformer_dropout_rate,
            attention_dropout_rate=m.transformer_dropout_rate,
            input_layer="embed", use_scaled_pos_enc=m.use_scaled_pos_enc,
            normalize_before=m.encoder_normalize_before,
            concat_after=m.encoder_concat_after,
            positionwise_layer_type=m.positionwise_layer_type,
            positionwise_conv_kernel_size=m.positionwise_conv_kernel_size,
            max_pos_len=m.max_pos_len,
        )

    @property
    def decoder_cfg(self) -> EncoderConfig:
        m = self.cfg.model
        return EncoderConfig(
            idim=m.adim, attention_dim=m.ddim, attention_heads=m.aheads,
            linear_units=m.dunits, num_blocks=m.dlayers,
            dropout_rate=m.transformer_dropout_rate,
            positional_dropout_rate=m.transformer_dropout_rate,
            attention_dropout_rate=m.transformer_dropout_rate,
            input_layer="linear", use_scaled_pos_enc=m.use_scaled_pos_enc,
            normalize_before=m.decoder_normalize_before,
            concat_after=m.decoder_concat_after,
            positionwise_layer_type=m.positionwise_layer_type,
            positionwise_conv_kernel_size=m.positionwise_conv_kernel_size,
            max_pos_len=m.max_pos_len,
        )

    @property
    def duration_cfg(self) -> PredictorConfig:
        m = self.cfg.model
        return PredictorConfig(
            idim=m.adim, n_layers=m.duration_predictor_layers,
            n_chans=m.duration_predictor_chans,
            kernel_size=m.duration_predictor_kernel_size,
            dropout_rate=m.duration_predictor_dropout_rate,
        )

    @property
    def variance_cfg(self) -> PredictorConfig:
        # Energy/PitchPredictor wrap VariancePredictor(idim) with DEFAULT args
        # (reference fastspeech.py:93-112 -> variance_predictor.py:8-17):
        # 2 layers, 256 chans, k=3, dropout 0.5 -- the constructor kwargs are
        # dropped by the reference's wrapper, a quirk we replicate.
        return PredictorConfig(idim=self.cfg.model.adim,
                               dropout_rate=self.cfg.model.variance_predictor_dropout_rate)

    @property
    def postnet_cfg(self) -> Optional[PostnetConfig]:
        m = self.cfg.model
        if m.postnet_layers == 0:
            return None
        return PostnetConfig(
            odim=self.odim, n_layers=m.postnet_layers, n_chans=m.postnet_chans,
            n_filts=m.postnet_filts, dropout_rate=m.postnet_dropout_rate,
            use_batch_norm=m.use_batch_norm,
        )

    @property
    def energy_bins(self) -> np.ndarray:
        d = self.cfg.data
        return linear_bins(d.e_min, d.e_max, self.cfg.model.variance_n_bins)

    @property
    def pitch_bins(self) -> np.ndarray:
        d = self.cfg.data
        return log_bins(d.p_min, d.p_max, self.cfg.model.variance_n_bins)

    # -- init ----------------------------------------------------------------

    def init(self, key: Array, dtype=jnp.float32):
        """Returns (params, state). state = postnet BatchNorm running stats."""
        m = self.cfg.model
        keys = jax.random.split(key, 9)
        params = {
            "encoder": init_encoder(keys[0], self.encoder_cfg,
                                    m.initial_encoder_alpha, dtype),
            "duration_predictor": init_predictor(keys[1], self.duration_cfg, dtype),
            "energy_predictor": init_predictor(keys[2], self.variance_cfg, dtype),
            "pitch_predictor": init_predictor(keys[3], self.variance_cfg, dtype),
            "energy_embed": nn.init_linear(keys[4], m.variance_n_bins, m.adim, dtype),
            "pitch_embed": nn.init_linear(keys[5], m.variance_n_bins, m.adim, dtype),
            "decoder": init_encoder(keys[6], self.decoder_cfg,
                                    m.initial_decoder_alpha, dtype),
            "feat_out": nn.init_linear(keys[7], m.ddim,
                                       self.odim * m.reduction_factor, dtype),
        }
        state = {}
        if self.postnet_cfg is not None:
            params["postnet"], state["postnet"] = init_postnet(
                keys[8], self.postnet_cfg, dtype)
        if m.transformer_init != "pytorch":
            # xavier/kaiming variants + the reference's Embedding/LayerNorm
            # reset and BatchNorm-zero quirk (reference core/modules.py:51-81,
            # applied via _reset_parameters, fastspeech.py:378-387). The
            # scaled-PE alphas were set above and stay untouched.
            from fastspeech2_tpu.models.init import apply_transformer_init

            params = apply_transformer_init(
                jax.random.fold_in(key, 0x1217), params, m.transformer_init)
        return params, state

    # -- shared trunk --------------------------------------------------------

    def _use_fused_attention(self) -> bool:
        fa = self.cfg.model.fused_attention
        if fa == "on":
            return True
        if fa == "off":
            return False
        return jax.default_backend() == "tpu"

    def _decode(self, params, state, hs, h_mask_2d, conv_mask, *,
                rngs, training, lengths=None) -> Tuple[Array, Array, dict]:
        """Decoder + feat_out + postnet. h_mask_2d: (B,L,L) attn mask or None;
        conv_mask: (B,L) validity for exact-unpadded conv masking or None."""
        zs = encoder_apply(params["decoder"], self.decoder_cfg, hs, h_mask_2d,
                           rng=rngs.get("decoder"), deterministic=not training,
                           conv_mask=conv_mask, lengths=lengths,
                           fused_attention=self._use_fused_attention(),
                           remat=training and self.cfg.train.remat)
        before = nn.linear(params["feat_out"], zs)
        B = before.shape[0]
        before = before.reshape(B, -1, self.odim)
        new_state = dict(state)
        if self.postnet_cfg is None:
            after = before
        else:
            from fastspeech2_tpu.ops.precision import current_compute_dtype

            # conv_mask is not None: the fused kernel hardwires the
            # zeroed-past-length conv semantics (exact-unpadded inference);
            # eval-mode forward (conv_mask=None) keeps the XLA pad-leak path
            from fastspeech2_tpu.parallel.sharding import tp_degree

            if (not training and lengths is not None
                    and conv_mask is not None
                    and self._use_fused_attention()
                    and current_compute_dtype() == jnp.bfloat16
                    and self.postnet_cfg.use_batch_norm
                    and self.postnet_cfg.n_filts % 2 == 1
                    and tp_degree() == 1):
                from fastspeech2_tpu.ops.pallas.postnet import (
                    postnet_fused_apply)

                # length-adaptive fused postnet chain (ops/pallas/postnet.py)
                resid = postnet_fused_apply(
                    params["postnet"], state["postnet"], self.postnet_cfg,
                    before, lengths)
            else:
                resid, new_post = postnet_apply(
                    params["postnet"], state["postnet"], self.postnet_cfg,
                    before, rng=rngs.get("postnet"), training=training,
                    conv_mask=conv_mask)
                new_state["postnet"] = new_post
            after = before + resid
        return before, after, new_state

    # -- training forward ----------------------------------------------------

    def forward(
        self, params, state, batch: Batch, *,
        rng: Optional[Array] = None, training: bool = False,
    ) -> Tuple[Array, Dict[str, Array], dict]:
        """Teacher-forced forward; returns (loss, report, new_state)."""
        T = batch.xs.shape[1]
        L = batch.ys.shape[1]
        if rng is not None:
            names = ["encoder", "decoder", "postnet", "dur", "en", "pi"]
            rngs = dict(zip(names, jax.random.split(rng, len(names))))
        else:
            rngs = {}

        tok_mask = make_non_pad_mask(batch.ilens, T)
        mel_mask = make_non_pad_mask(batch.olens, L)
        x_masks = attention_mask(batch.ilens, T)

        hs = encoder_apply(params["encoder"], self.encoder_cfg, batch.xs, x_masks,
                           rng=rngs.get("encoder"), deterministic=not training,
                           lengths=batch.ilens,
                           fused_attention=self._use_fused_attention(),
                           remat=training and self.cfg.train.remat)

        # ground-truth quantized pitch/energy (no grad flows: table lookups only)
        one_hot_energy = to_one_hot(batch.es, self.energy_bins)
        one_hot_pitch = to_one_hot(batch.ps, self.pitch_bins)

        d_outs = duration_train_apply(
            params["duration_predictor"], self.duration_cfg, hs, tok_mask,
            rng=rngs.get("dur"), deterministic=not training)

        hs_e, _, _ = regulate_length(hs, batch.ds, tok_mask, L)

        e_outs = variance_train_apply(
            params["energy_predictor"], self.variance_cfg, hs_e, mel_mask,
            rng=rngs.get("en"), deterministic=not training)
        p_outs = variance_train_apply(
            params["pitch_predictor"], self.variance_cfg, hs_e, mel_mask,
            rng=rngs.get("pi"), deterministic=not training)

        # same addition order as the reference (fastspeech.py:218-219)
        hs2 = hs_e + nn.linear(params["pitch_embed"], one_hot_pitch)
        hs2 = hs2 + nn.linear(params["energy_embed"], one_hot_energy)

        h_masks = attention_mask(batch.olens, L)
        before, after, new_state = self._decode(
            params, state, hs2, h_masks, None, rngs=rngs, training=training,
            lengths=batch.olens)

        loss, report = self._loss(before, after, d_outs, e_outs, p_outs, batch,
                                  tok_mask, mel_mask)
        return loss, report, new_state

    def _loss(self, before, after, d_outs, e_outs, p_outs, batch: Batch,
              tok_mask, mel_mask) -> Tuple[Array, Dict[str, Array]]:
        """Masked losses == reference masked_select + mean (fastspeech.py:281-324).

        ``use_weighted_masking`` applies the reference's *intended* weighted
        path (fastspeech.py:308-322) corrected to work: that code computes
        per-sequence weights ``mask / mask.sum(dim=1) / (B * odim)`` but then
        multiplies them onto already-``masked_select``-flattened scalars, which
        crashes. Here the element-wise L1/MSE maps are weighted BEFORE
        reduction, so every sequence contributes equally to l1/duration loss
        regardless of its length (ESPnet's weighted-masking semantics, which
        the reference code was transcribed from). Energy/pitch keep the plain
        masked mean -- the reference's weighted branch never touches them.
        """
        f = jnp.float32
        m = self.cfg.model
        mel_m3 = mel_mask[..., None].astype(f)
        tok_m = tok_mask.astype(f)
        log_d = jnp.log(batch.ds.astype(f) + 1.0)  # duration_predictor.py:133-151

        if m.use_weighted_masking:
            B = before.shape[0]
            # out_weights = mask / per-seq frames / (B * odim) (fastspeech.py:310-311)
            frames = jnp.maximum(jnp.sum(mel_m3, axis=1, keepdims=True), 1.0)
            out_w = mel_m3 / frames / (B * self.odim)
            before_loss = jnp.sum(jnp.abs(before - batch.ys) * out_w)
            after_loss = jnp.sum(jnp.abs(after - batch.ys) * out_w)
            l1_loss = before_loss + after_loss
            # duration_weights = mask / per-seq tokens / B (fastspeech.py:312-316)
            toks = jnp.maximum(jnp.sum(tok_m, axis=1, keepdims=True), 1.0)
            dur_w = tok_m / toks / B
            duration_loss = jnp.sum(jnp.square(d_outs - log_d) * dur_w)
        elif m.use_masking:
            n_mel = jnp.maximum(jnp.sum(mel_m3), 1.0) * self.odim  # selected elements
            before_loss = jnp.sum(jnp.abs(before - batch.ys) * mel_m3) / n_mel
            after_loss = jnp.sum(jnp.abs(after - batch.ys) * mel_m3) / n_mel
            l1_loss = before_loss + after_loss

            n_tok = jnp.maximum(jnp.sum(tok_m), 1.0)
            duration_loss = jnp.sum(jnp.square(d_outs - log_d) * tok_m) / n_tok
        else:
            # use_masking=False: plain full-tensor means including pad
            # positions -- the reference skips every masked_select when the
            # flag is off (fastspeech.py:281-296) and the mean criteria then
            # reduce over the whole padded batch.
            before_loss = jnp.mean(jnp.abs(before - batch.ys))
            after_loss = jnp.mean(jnp.abs(after - batch.ys))
            l1_loss = before_loss + after_loss
            duration_loss = jnp.mean(jnp.square(d_outs - log_d))

        if m.use_masking or m.use_weighted_masking:
            mel_m = mel_mask.astype(f)
            n_frames = jnp.maximum(jnp.sum(mel_m), 1.0)
            energy_loss = jnp.sum(jnp.square(e_outs - batch.es) * mel_m) / n_frames
            pitch_loss = jnp.sum(jnp.square(p_outs - batch.ps) * mel_m) / n_frames
        else:
            energy_loss = jnp.mean(jnp.square(e_outs - batch.es))
            pitch_loss = jnp.mean(jnp.square(p_outs - batch.ps))

        loss = l1_loss + duration_loss + energy_loss + pitch_loss
        report = {
            "l1_loss": l1_loss, "before_loss": before_loss, "after_loss": after_loss,
            "duration_loss": duration_loss, "energy_loss": energy_loss,
            "pitch_loss": pitch_loss, "loss": loss,
        }
        return loss, report

    # -- inference -----------------------------------------------------------

    def encode(self, params, xs: Array, ilens: Array) -> Tuple[Array, Array]:
        """Inference trunk up to (and including) the duration head.

        Returns (hs (B, T, adim) encoder states, d_outs (B, T) int32
        predicted durations). Split out from :meth:`inference` so a serving
        host can read the exact frame demand (ops.length_regulator.
        frame_demand over d_outs) and size the decode buffer to it before
        dispatching :meth:`decode_frames` -- instead of over-allocating by
        the frames-per-token heuristic (the reference never pads frames at
        all, core/duration_modeling/length_regulator.py:60-95; demand sizing
        is the static-shape tax clawed back)."""
        T = xs.shape[1]
        tok_mask = make_non_pad_mask(ilens, T)
        x_masks = attention_mask(ilens, T)

        hs = encoder_apply(params["encoder"], self.encoder_cfg, xs, x_masks,
                           conv_mask=tok_mask, lengths=ilens,
                           fused_attention=self._use_fused_attention())

        from fastspeech2_tpu.ops import flags
        from fastspeech2_tpu.ops.precision import (compute_dtype,
                                                   current_compute_dtype)

        if flags.F32_DURATION and current_compute_dtype() == jnp.bfloat16:
            # The duration head's exp/round/clamp is a rounding knife-edge:
            # under bf16 head numerics 3/5 parity sentences came out +-1-3
            # frames off the f32 path, shifting all downstream frames
            # (BENCH_r04 duration_match 2/5). Running the tiny head (~0.1%
            # of serving FLOPs) in f32/HIGHEST pins the predicted integer
            # durations to the parity tier's while the encoder input stays
            # the bf16 speed path's. VERDICT r4 next #2.
            with compute_dtype(None), jax.default_matmul_precision("highest"):
                d_outs = duration_inference_apply(
                    params["duration_predictor"], self.duration_cfg,
                    hs.astype(jnp.float32), tok_mask, conv_mask=tok_mask)
        else:
            d_outs = duration_inference_apply(
                params["duration_predictor"], self.duration_cfg, hs, tok_mask,
                conv_mask=tok_mask)
        return hs, d_outs

    def decode_frames(
        self, params, state, hs: Array, d_outs: Array, ilens: Array, *,
        out_maxlen: int, alpha=1.0,
    ) -> Tuple[Array, Array]:
        """Inference tail: length-regulate by the (already predicted)
        durations, run the variance adaptor, decoder and postnet.

        Composes with :meth:`encode`: ``inference() == decode_frames(*encode())``
        bit-for-bit (same traced graph either fused in one jit or split in
        two). Returns (mel (B, out_maxlen, odim), out_lens (B,))."""
        T = hs.shape[1]
        tok_mask = make_non_pad_mask(ilens, T)
        d_scaled = scale_durations(d_outs, alpha)
        from fastspeech2_tpu.ops import flags
        from fastspeech2_tpu.ops.precision import current_compute_dtype
        from fastspeech2_tpu.parallel.sharding import tp_degree

        vcfg = self.variance_cfg
        # fused frame-level segment (ops/pallas/adaptor.py): expansion +
        # both variance predictor stacks + quantize/embed + residual in one
        # kernel. Same engagement rules as the other serving kernels: bf16
        # speed path only (the f32 parity path keeps full-precision XLA ops).
        # The kill switch is read once at import (ops/flags.py) -- it picks a
        # trace-time branch, so it must be fixed before the first compile.
        if (self._use_fused_attention()
                and current_compute_dtype() == jnp.bfloat16
                and tp_degree() == 1
                and vcfg.n_layers == 2 and vcfg.kernel_size % 2 == 1
                and vcfg.idim == hs.shape[-1]
                and flags.FUSED_ADAPTOR):
            from fastspeech2_tpu.ops.length_regulator import expansion_indices
            from fastspeech2_tpu.ops.pallas.adaptor import (
                variance_adaptor_fused_apply)

            idx, frame_mask, out_lens = expansion_indices(
                d_scaled, tok_mask, out_maxlen, T)
            hs2, _ = variance_adaptor_fused_apply(
                params, vcfg, hs, idx, out_lens,
                self.pitch_bins, self.energy_bins)
        else:
            hs_e, frame_mask, out_lens = regulate_length(
                hs, d_scaled, tok_mask, out_maxlen)

            e_raw = variance_inference_apply(
                params["energy_predictor"], vcfg, hs_e, conv_mask=frame_mask)
            p_raw = variance_inference_apply(
                params["pitch_predictor"], vcfg, hs_e, conv_mask=frame_mask)
            one_hot_energy = to_one_hot(e_raw, self.energy_bins)
            one_hot_pitch = to_one_hot(p_raw, self.pitch_bins)

            hs2 = hs_e + nn.linear(params["pitch_embed"], one_hot_pitch)
            hs2 = hs2 + nn.linear(params["energy_embed"], one_hot_energy)
            # zero pad rows: the reference has no rows beyond the true length
            # at inference (decoder mask is None there, fastspeech.py:221-224);
            # with a static buffer we mask attention + conv tails instead.
            hs2 = jnp.where(frame_mask[..., None], hs2, 0.0)

        h_masks = attention_mask(out_lens, out_maxlen)
        before, after, _ = self._decode(
            params, state, hs2, h_masks, frame_mask, rngs={}, training=False,
            lengths=out_lens)
        after = jnp.where(frame_mask[..., None], after, 0.0)
        return after, out_lens

    def inference(
        self, params, state, xs: Array, ilens: Array, *,
        out_maxlen: int, alpha=1.0,
    ) -> Tuple[Array, Array, Array]:
        """Free-running synthesis (reference fastspeech.py:339-357, 192-196).

        Args:
            xs: (B, T) int token ids, padded.
            ilens: (B,) lengths.
            out_maxlen: static frame-axis capacity of the output buffer.
            alpha: speed control -- python float, traced scalar, or per-row
                (B,) vector (see ops.length_regulator.scale_durations).
        Returns:
            (mel (B, out_maxlen, odim) -- zeroed beyond each sequence's length,
             out_lens (B,), durations (B, T) int32)

        Bit-equivalent to the reference's unpadded per-utterance inference:
        every conv input is re-zeroed beyond the true length so static padding
        behaves like torch's implicit SAME zero-padding (see module docstring).
        Implemented as :meth:`encode` + :meth:`decode_frames` so serving can
        also run the two halves as separate device programs (demand-sized
        frame buffers, infer/synthesize.py).
        """
        hs, d_outs = self.encode(params, xs, ilens)
        after, out_lens = self.decode_frames(
            params, state, hs, d_outs, ilens, out_maxlen=out_maxlen,
            alpha=alpha)
        return after, out_lens, d_outs


def init_fastspeech2(key: Array, cfg: Optional[Config] = None,
                     idim: int = NUM_PHONEMES, dtype=jnp.float32):
    """Convenience: build the model and initialize (params, state)."""
    model = FastSpeech2(cfg if cfg is not None else Config(), idim)
    params, state = model.init(key, dtype)
    return model, params, state
