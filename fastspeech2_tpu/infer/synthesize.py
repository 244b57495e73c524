"""End-to-end synthesis (reference ``/root/reference/inference.py``).

Pipeline: paragraph -> sentence split on '.' (inference.py:101-108) -> clean +
g2p -> pau mapping (:84-98) -> per-sentence jitted model inference -> concat
mels (:170-176) -> vocoder (MelGAN when available, else Griffin-Lim,
:180-199) -> int16 wav (:200-201).

TPU-shaped: sentences are padded to a small set of static token lengths so the
jit cache stays warm across calls; batches of sentences run in one device call.
"""

from __future__ import annotations

import contextlib
import logging
import math
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.config import Config
from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
from fastspeech2_tpu.text import phonemes_to_sequence
from fastspeech2_tpu.text.g2p import preprocess_text, process_paragraph

log = logging.getLogger("fastspeech2_tpu.synth")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# the log-mel value vocoders treat as silence (log(clamp_min) of the mel
# pipeline, reference dataset/audio_processing.py:243)
MEL_FLOOR = math.log(1e-5)


def mel_floor_mask(mel, out_lens):
    """Frames at/past each row's length -> the log-mel floor, so a padded
    static buffer vocodes to silence beyond the utterance."""
    valid = jnp.arange(mel.shape[1])[None, :, None] < out_lens[:, None, None]
    return jnp.where(valid, mel, MEL_FLOOR)


def pcm16(wav, xp=jnp):
    """float waveform -> int16 PCM (pass xp=np for a host-side array)."""
    return xp.round(xp.clip(wav, -1.0, 1.0) * 32767.0).astype(xp.int16)


def _demand_in_jit(d_outs, alphas, ilens, T):
    """Exact pre-clip frame demand, computed inside the serving jit by the
    SAME scale/mask/fallback functions the length-regulator expansion uses
    (ops/length_regulator.py) -- the saturation check (finish_mel/finish_wav)
    can never drift from what the expansion actually did. Shared by the mel
    and fused-wav jit builders so the two paths cannot diverge either."""
    from fastspeech2_tpu.ops import make_non_pad_mask
    from fastspeech2_tpu.ops.length_regulator import (frame_demand,
                                                      scale_durations)

    return frame_demand(scale_durations(d_outs, alphas),
                        make_non_pad_mask(ilens, T))


class Synthesizer:
    """Stateful wrapper: holds params + jit caches keyed by static shapes."""

    def __init__(self, model: FastSpeech2, params, state,
                 token_multiple: int = 32, frames_per_token: int = 12,
                 max_frames: int = 2048, bf16: bool = False, mesh=None,
                 matmul_precision: str = "default", int8: bool = False,
                 demand_sized: Optional[bool] = None):
        self.model = model
        if int8:
            # W8A8 serving tier: encoder/decoder attention projections + FFN
            # convs become int8 MXU matmuls; predictors, embeddings, postnet,
            # feat_out stay high precision (ops/quant8.py). Measured on v5e:
            # throughput parity with bf16 (1.00x, scripts/measure_int8.py) --
            # use it to halve FFT-stack weight memory, not for speed.
            from fastspeech2_tpu.ops.quant8 import quantize_model_params

            params = jax.device_get(
                jax.jit(quantize_model_params)(params))
        self.int8 = int8
        self.params = params
        self.state = state
        self.token_multiple = token_multiple
        self.frames_per_token = frames_per_token
        self.max_frames = max_frames
        self.bf16 = bf16  # speed config: bf16 matmuls, f32 accum/softmax/LN
        # "highest" forces full-f32 dots. TPU f32 matmuls otherwise run at
        # DEFAULT precision (bf16 operand passes): ~1e-3..5e-2 mel deviation
        # vs the f32 reference, and duration rounding can flip at knife-edges.
        # "highest" restores <=1.2e-5 max-abs mel agreement + exact durations
        # vs torch-CPU (measured on v5e; PARITY.md). No-op on CPU / under bf16.
        self.matmul_precision = matmul_precision
        # mesh: data-parallel inference -- params replicate, the batch axis
        # shards over the 1-D 'data' mesh (parallel/mesh.py); batches pad up
        # to a multiple of the mesh size
        self.mesh = mesh
        # demand-sized decode (ops/flags.py:DEMAND_SIZED): split the serving
        # call into encode (-> exact frame demand) + decode on the smallest
        # 256-frame rung >= the batch demand, instead of one program on the
        # frames_per_token-heuristic buffer (measured 0.53 occupancy)
        if demand_sized is None:
            from fastspeech2_tpu.ops import flags

            demand_sized = flags.DEMAND_SIZED
        self.demand_sized = demand_sized
        self._jitted = {}
        self._jitted_enc = {}
        self._jitted_dec = {}
        self._jitted_dec_wav = {}
        # fused text->wav: set by attach_vocoder
        self._voc = None
        self._voc_params = None
        self._jitted_wav = {}
        # host-level text->wav: set by attach_vocoder_fn
        self._voc_fn = None
        self._voc_fn_hop = 256

    def _compute_ctx(self):
        """(compute dtype, matmul-precision context factory, kernel-mesh
        context factory) — the single source of numerics/placement config for
        the mel and fused-wav jit builders. The kernel-mesh context makes the
        Pallas kernels shard_map over the data mesh instead of being opaque
        custom calls GSPMD all-gathers around (parallel/sharding.py:
        data_shard_map)."""
        dt = jnp.bfloat16 if self.bf16 else None

        def _prec():
            return (jax.default_matmul_precision(self.matmul_precision)
                    if self.matmul_precision != "default"
                    else contextlib.nullcontext())

        def _kmesh():
            if self.mesh is not None and self.mesh.devices.size > 1:
                from fastspeech2_tpu.parallel.sharding import (
                    tensor_parallel_attention)

                return tensor_parallel_attention(self.mesh)
            return contextlib.nullcontext()

        return dt, _prec, _kmesh

    def _fn(self, t_pad: int, l_pad: int):
        key = (t_pad, l_pad)
        if key not in self._jitted:
            from fastspeech2_tpu.ops.precision import compute_dtype

            dt, _prec, _kmesh = self._compute_ctx()

            def infer(params, state, xs, ilens, alphas):
                with compute_dtype(dt), _prec(), _kmesh():
                    mel, out_lens, d_outs = self.model.inference(
                        params, state, xs, ilens, out_maxlen=l_pad,
                        alpha=alphas)
                    demand = _demand_in_jit(d_outs, alphas, ilens,
                                            xs.shape[1])
                return mel, out_lens, demand
            if self.mesh is not None:
                from fastspeech2_tpu.parallel.mesh import shard_inference_fn

                self._jitted[key] = shard_inference_fn(infer, self.mesh)
            else:
                # alpha rides in as a traced (B,) vector: no recompile per
                # distinct speed, and one batch can mix per-request speeds
                self._jitted[key] = jax.jit(infer)
        return self._jitted[key]

    def _enc_fn(self, t_pad: int):
        """Encode program for the demand-sized path: encoder + duration head
        + exact frame demand, keyed by t_pad only. hs/d_outs stay on device
        for the decode program; only demand crosses to the host."""
        if t_pad not in self._jitted_enc:
            from fastspeech2_tpu.ops.precision import compute_dtype

            dt, _prec, _kmesh = self._compute_ctx()

            def enc(params, xs, ilens, alphas):
                with compute_dtype(dt), _prec(), _kmesh():
                    hs, d_outs = self.model.encode(params, xs, ilens)
                    demand = _demand_in_jit(d_outs, alphas, ilens,
                                            xs.shape[1])
                return hs, d_outs, demand
            if self.mesh is not None:
                from fastspeech2_tpu.parallel.mesh import shard_inference_fn

                self._jitted_enc[t_pad] = shard_inference_fn(
                    enc, self.mesh, n_replicated=1, n_data=3)
            else:
                self._jitted_enc[t_pad] = jax.jit(enc)
        return self._jitted_enc[t_pad]

    def _dec_fn(self, t_pad: int, l_pad: int):
        """Decode program: length-regulate + adaptor + decoder + postnet on
        a demand-sized frame buffer."""
        key = (t_pad, l_pad)
        if key not in self._jitted_dec:
            from fastspeech2_tpu.ops.precision import compute_dtype

            dt, _prec, _kmesh = self._compute_ctx()

            def dec(params, state, hs, d_outs, ilens, alphas):
                with compute_dtype(dt), _prec(), _kmesh():
                    mel, out_lens = self.model.decode_frames(
                        params, state, hs, d_outs, ilens, out_maxlen=l_pad,
                        alpha=alphas)
                return mel, out_lens
            if self.mesh is not None:
                from fastspeech2_tpu.parallel.mesh import shard_inference_fn

                self._jitted_dec[key] = shard_inference_fn(
                    dec, self.mesh, n_replicated=2, n_data=4)
            else:
                self._jitted_dec[key] = jax.jit(dec)
        return self._jitted_dec[key]

    def _dec_wav_fn(self, t_pad: int, l_pad: int):
        """Decode + fused vocoder program for the demand-sized wav path."""
        key = (t_pad, l_pad)
        if key not in self._jitted_dec_wav:
            from fastspeech2_tpu.ops.precision import compute_dtype

            dt, _prec, _kmesh = self._compute_ctx()
            gen = self._voc

            def dec_wav(params, state, voc_params, hs, d_outs, ilens, alphas):
                with compute_dtype(dt), _prec(), _kmesh():
                    mel, out_lens = self.model.decode_frames(
                        params, state, hs, d_outs, ilens, out_maxlen=l_pad,
                        alpha=alphas)
                    wav = gen(voc_params, mel_floor_mask(mel, out_lens))
                return mel, pcm16(wav), out_lens
            if self.mesh is not None:
                from fastspeech2_tpu.parallel.mesh import shard_inference_fn

                self._jitted_dec_wav[key] = shard_inference_fn(
                    dec_wav, self.mesh, n_replicated=3, n_data=4)
            else:
                self._jitted_dec_wav[key] = jax.jit(dec_wav)
        return self._jitted_dec_wav[key]

    def attach_vocoder(self, gen, voc_params) -> None:
        """Enable the fused text->wav path: acoustic model + MelGAN generator
        run as ONE device computation, so the mel never round-trips to the
        host between them (the reference runs them as two separate models on
        two host transfers, inference.py:170-193).

        gen: a ``vocoder.MelGANGenerator``; voc_params: its params pytree
        (e.g. from ``vocoder.load_melgan_params``).
        """
        self._voc = gen
        self._voc_params = voc_params
        self._jitted_wav = {}
        self._jitted_dec_wav = {}

    def attach_vocoder_fn(self, fn, hop_length: Optional[int] = None) -> None:
        """Enable text->wav via a host-level vocoder callable
        ``(L, n_mels) log-mel -> (L*hop,) float wav`` (e.g.
        ``vocoder.load_waveglow``). Unlike ``attach_vocoder``, the acoustic
        model and vocoder run as separate device programs — needed for
        vocoders that sample noise per call (WaveGlow). hop_length defaults
        to the callable's own ``hop_length`` attribute (else 256)."""
        self._voc_fn = fn
        self._voc_fn_hop = (hop_length if hop_length is not None
                            else getattr(fn, "hop_length", 256))

    @property
    def has_vocoder(self) -> bool:
        return self._voc is not None or self._voc_fn is not None

    @property
    def hop_length(self) -> int:
        return (self._voc.cfg.hop_length if self._voc is not None
                else self._voc_fn_hop)

    def _wav_fn(self, t_pad: int, l_pad: int):
        key = (t_pad, l_pad)
        if key not in self._jitted_wav:
            from fastspeech2_tpu.ops.precision import compute_dtype

            dt, _prec, _kmesh = self._compute_ctx()
            gen = self._voc

            def infer_wav(params, state, voc_params, xs, ilens, alphas):
                with compute_dtype(dt), _prec(), _kmesh():
                    mel, out_lens, d_outs = self.model.inference(
                        params, state, xs, ilens, out_maxlen=l_pad,
                        alpha=alphas)
                    # Floor-masked frames double as the tail-flush frames the
                    # standalone vocoder path pads in (melgan.load_melgan);
                    # l_pad stays a multiple of 256 so the fused
                    # residual-stack kernel keeps its 2048-sample tiles
                    # (and the kernel-mesh context batch-shards it). int16
                    # PCM on-device halves the device->host bytes and the
                    # server writes it straight into the RIFF body. demand
                    # rides out for the exact saturation check (see _fn).
                    demand = _demand_in_jit(d_outs, alphas, ilens,
                                            xs.shape[1])
                    wav = gen(voc_params, mel_floor_mask(mel, out_lens))
                return mel, pcm16(wav), out_lens, demand
            if self.mesh is not None:
                from fastspeech2_tpu.parallel.mesh import shard_inference_fn

                # same data-parallel layout as the mel path: model + vocoder
                # params replicated, batch sharded over 'data'
                self._jitted_wav[key] = shard_inference_fn(
                    infer_wav, self.mesh, n_replicated=3)
            else:
                self._jitted_wav[key] = jax.jit(infer_wav)
        return self._jitted_wav[key]

    def _host(self, *arrays):
        """Device outputs -> host numpy. Multi-process serving: outputs are
        sharded across hosts (out_shardings=data), so np.asarray would raise
        'not fully addressable' -- all-gather them instead (a collective:
        every host calls the batch methods in lockstep with identical
        inputs, the serving contract)."""
        if self.mesh is not None and jax.process_count() > 1:
            from fastspeech2_tpu.parallel.mesh import gather_to_host

            return gather_to_host(list(arrays), self.mesh)
        return [np.asarray(a) for a in arrays]

    def _b_pad(self, B: int) -> int:
        """Pad serving micro-batches to the next power of two (and to the
        data-mesh multiple): a varying request count would otherwise retrace
        the jit for every distinct B, stalling the batcher 20-40 s per new
        size on TPU. Padded rows carry ilens=1, so the length-adaptive
        kernels spend ~nothing on them. log2(max_batch)+1 shapes total."""
        b = 1 << (B - 1).bit_length()
        if self.mesh is not None:
            b = _round_up(b, self.mesh.devices.size)
        return b

    def _alphas(self, alpha, B: int, B_pad: int) -> Tuple[np.ndarray, float]:
        """Normalize a scalar or per-sequence alpha into a padded (B_pad,)
        f32 vector + its max (for sizing the static frame buffer)."""
        a = np.asarray(alpha, np.float32).reshape(-1)
        if a.size == 1:
            a = np.full((B,), a[0], np.float32)
        if a.size != B:
            raise ValueError(f"alpha has {a.size} entries for {B} sequences")
        if not np.all(np.isfinite(a)) or np.any(a < 0):
            raise ValueError(f"invalid alpha {alpha!r}")
        out = np.ones((B_pad,), np.float32)
        out[:B] = a
        return out, float(a.max())

    def _l_pad(self, t_pad: int, alpha_max: float) -> int:
        """Static frame capacity: scales with slow-speech alpha so alpha > 1
        doesn't truncate (out_lens is clipped to this buffer)."""
        base = t_pad * self.frames_per_token * max(alpha_max, 1.0)
        return min(_round_up(int(np.ceil(base)), 256), self.max_frames)

    def _l_rung(self, demand_max: int) -> int:
        """Demand-sized frame capacity: the smallest 256-frame rung covering
        the batch's exact (device-computed) demand, capped at max_frames.
        256 keeps the rung set small (max_frames/256 shapes per t_pad, each
        jitted once) and preserves the fused residual-stack vocoder kernel's
        2048-sample tiling (hop 256 x 8 frames). A max_frames below one rung
        caps the buffer exactly like the heuristic path's ladder does."""
        return min(_round_up(max(demand_max, 1), 256), self.max_frames)

    def _decode_groups(self, dem_all: np.ndarray):
        """Row groups for the demand-sized decode dispatch: [(rows, rung)].

        Splitting the decode at the demand median lets the short half stop
        paying the long half's padded frame columns (decoder attention
        score/context dots span the full padded L). Measured on v5e at the
        bench workload: single demand rung -4.2%, 2-way split -7.9% vs the
        heuristic buffer (scripts/measure_demand_sized.py, PARITY.md). One
        group when the split wouldn't shrink the short rung, the batch is
        tiny, or a data mesh needs sub-batches it can't divide."""
        B_pad = len(dem_all)
        rung_all = self._l_rung(int(dem_all.max()))
        mesh_n = self.mesh.devices.size if self.mesh is not None else 1
        if B_pad < 4 or (B_pad // 2) % mesh_n != 0:
            return [(np.arange(B_pad), rung_all)]
        order = np.argsort(dem_all, kind="stable")
        short, long_ = order[: B_pad // 2], order[B_pad // 2:]
        rung_s = self._l_rung(int(dem_all[short].max()))
        if rung_s >= rung_all:
            return [(np.arange(B_pad), rung_all)]
        return [(short, rung_s), (long_, rung_all)]

    def _demand_trunc(self, demand: np.ndarray, B: int) -> np.ndarray:
        """Truncation flags for the demand-sized path: demand is known BEFORE
        the decode dispatch, so the only capped rows are those past the hard
        max_frames ceiling (no grow ladder exists on this path)."""
        trunc = np.asarray(demand[:B]) > self.max_frames
        if trunc.any():
            log.warning(
                "frame demand exceeds max_frames=%d for %d/%d rows -- "
                "audio is truncated (raise max_frames or split the input)",
                self.max_frames, int(trunc.sum()), B)
        return trunc

    def _grow_l_pad(self, l_pad: int, demand: Optional[int] = None) -> int:
        """Next frame-buffer bucket after a saturation retrigger: the
        doubling ladder keeps the set of compiled shapes logarithmic, and
        the jump goes straight to the first rung >= the (exact, device-
        computed) demand -- each skipped intermediate rung would have cost a
        full re-dispatch plus a cold jit compile in the serving delivery
        thread."""
        new = l_pad * 2
        if demand is not None:
            while new < demand and new < self.max_frames:
                new *= 2
        return min(_round_up(new, 256), self.max_frames)

    def _check_saturation(self, demand: np.ndarray, l_pad: int,
                          B: int) -> Tuple[bool, np.ndarray]:
        """(must_grow, truncated_rows) for a batch result.

        ``expansion_indices`` CLIPS out_lens to the static buffer
        (ops/length_regulator.py:45) -- the reference's LengthRegulator never
        truncates (core/duration_modeling/length_regulator.py:60-95), so
        silent capping here would be a parity break with no signal. Rows
        whose pre-clip demand exceeds the buffer trigger a re-bucket while
        max_frames allows; at the max_frames ceiling they are reported as
        truncated instead. demand == l_pad is an exact fit: no re-run, no
        flag."""
        sat = np.asarray(demand[:B]) > l_pad
        if not sat.any():
            return False, sat
        if l_pad < self.max_frames:
            return True, sat
        log.warning(
            "frame buffer saturated at max_frames=%d for %d/%d rows -- "
            "audio is truncated (raise max_frames or split the input)",
            self.max_frames, int(sat.sum()), B)
        return False, sat

    def wav_from_token_batch_async(
        self, token_seqs: Sequence[np.ndarray], alpha: float = 1.0,
    ):
        """Issue the fused text->wav device call WITHOUT blocking on the
        result; returns a zero-arg finisher whose call performs the
        device->host transfer (and any saturation re-bucket) and returns
        (mel, wav16, wav_lens, truncated).

        Why: JAX dispatch is asynchronous, but the device->host read at the
        end of a serving batch is not -- a synchronous loop leaves the chip
        idle for one full transfer (plus, on tunneled backends, the
        round-trip) between micro-batches. Dispatching batch k+1 before
        finishing batch k (double buffering, infer/server.py Batcher)
        overlaps compute with delivery. VERDICT r3 next #3."""
        if not token_seqs or not all(len(s) for s in token_seqs):
            raise ValueError("empty token sequence: input produced no phonemes")
        if self._voc is None and self._voc_fn is not None:
            # host-level vocoder: the mel path dispatches async; the vocoder
            # itself runs at finish time (it is a separate device program)
            finish_mel = self.mel_from_token_batch_async(token_seqs, alpha)

            def finish_hostvoc():
                mel, out_lens, trunc = finish_mel()
                hop = self._voc_fn_hop
                batched = getattr(self._voc_fn, "batched", None)
                if batched is not None:
                    wav16 = pcm16(np.asarray(batched(mel, out_lens)), np)
                    tail = (np.arange(wav16.shape[1])[None, :]
                            >= (out_lens * hop)[:, None])
                    wav16[tail] = 0
                else:
                    wav16 = np.zeros((len(token_seqs), mel.shape[1] * hop),
                                     np.int16)
                    for i in range(len(token_seqs)):
                        w = np.asarray(self._voc_fn(mel[i, : out_lens[i]]))
                        wav16[i, : w.shape[0]] = pcm16(w, np)
                return mel, wav16, out_lens * hop, trunc

            return finish_hostvoc
        assert self._voc is not None, "attach_vocoder(_fn) first"
        B = len(token_seqs)
        B_pad = self._b_pad(B)
        alphas, a_max = self._alphas(alpha, B, B_pad)
        t_pad = _round_up(max(len(s) for s in token_seqs), self.token_multiple)
        l_pad = self._l_pad(t_pad, a_max)
        xs = np.zeros((B_pad, t_pad), np.int32)
        ilens = np.ones((B_pad,), np.int32)
        for i, s in enumerate(token_seqs):
            xs[i, : len(s)] = s
            ilens[i] = len(s)
        xs_d, ilens_d, alphas_d = (jnp.asarray(xs), jnp.asarray(ilens),
                                   jnp.asarray(alphas))
        if self.demand_sized:
            dev_enc = self._enc_fn(t_pad)(self.params, xs_d, ilens_d,
                                          alphas_d)

            def finish_wav_demand():
                (dem,) = self._host(dev_enc[2])
                dem_all = np.asarray(dem)
                trunc = self._demand_trunc(dem_all, B)
                groups = self._decode_groups(dem_all)
                l_max = max(r for _, r in groups)
                hop = self._voc.cfg.hop_length
                mel = wav = None
                out_lens = np.zeros((B_pad,), np.int64)
                for rows, rung in groups:
                    if (t_pad, rung) not in self._jitted_dec_wav:
                        log.info("demand -> decode rung l_pad=%d (first "
                                 "time compiles)", rung)
                    if len(groups) == 1:
                        dev = self._dec_wav_fn(t_pad, rung)(
                            self.params, self.state, self._voc_params,
                            dev_enc[0], dev_enc[1], ilens_d, alphas_d)
                    else:
                        gi = jnp.asarray(rows)
                        dev = self._dec_wav_fn(t_pad, rung)(
                            self.params, self.state, self._voc_params,
                            jnp.take(dev_enc[0], gi, axis=0),
                            jnp.take(dev_enc[1], gi, axis=0),
                            jnp.take(ilens_d, gi), jnp.take(alphas_d, gi))
                    mel_g, wav_g, lens_g = self._host(dev[0], dev[1], dev[2])
                    if mel is None:
                        mel = np.zeros((B_pad, l_max, mel_g.shape[2]),
                                       mel_g.dtype)
                        wav = np.zeros((B_pad, l_max * hop), wav_g.dtype)
                    mel[rows, : mel_g.shape[1]] = mel_g
                    wav[rows, : wav_g.shape[1]] = wav_g
                    out_lens[rows] = lens_g
                return mel[:B], wav[:B], out_lens[:B] * hop, trunc

            return finish_wav_demand
        dev = self._wav_fn(t_pad, l_pad)(
            self.params, self.state, self._voc_params, xs_d, ilens_d, alphas_d)

        def finish_wav(dev=dev, l_pad=l_pad):
            demand = None
            while True:
                mel, wav, out_lens = self._host(dev[0], dev[1], dev[2])
                if demand is None:
                    # demand doesn't depend on the buffer -- and its pull is
                    # an extra device->host round-trip, so it only happens
                    # when a row actually hit the buffer edge (out_lens ==
                    # min(demand, l_pad), so out_lens < l_pad everywhere
                    # ==> demand == out_lens)
                    if np.any(np.asarray(out_lens[:B]) >= l_pad):
                        (dem,) = self._host(dev[3])
                        demand = np.asarray(dem)[:B]
                    else:
                        demand = np.asarray(out_lens[:B])
                grow, trunc = self._check_saturation(demand, l_pad, B)
                if not grow:
                    break
                # rare path: re-dispatch synchronously on a buffer sized for
                # the known demand (one jump, no intermediate rungs). A
                # never-warmed (t_pad, l_pad) shape jit-compiles here --
                # inside the serving delivery thread -- so log it: one
                # multi-second stall per new shape, cached afterwards.
                l_pad = self._grow_l_pad(l_pad, int(demand.max()))
                log.info("frame demand %d > buffer; re-bucketing to l_pad=%d"
                         " (first time compiles)", int(demand.max()), l_pad)
                dev = self._wav_fn(t_pad, l_pad)(
                    self.params, self.state, self._voc_params,
                    xs_d, ilens_d, alphas_d)
            hop = self._voc.cfg.hop_length
            return mel[:B], wav[:B], out_lens[:B] * hop, trunc

        return finish_wav

    def wav_from_token_batch(
        self, token_seqs: Sequence[np.ndarray], alpha: float = 1.0,
        return_truncated: bool = False,
    ):
        """List of id sequences -> (mel (B, L, n_mels) f32, wav (B, L*hop)
        int16 PCM, wav valid lengths = out_lens*hop). Requires
        attach_vocoder or attach_vocoder_fn. return_truncated appends a (B,)
        bool array marking rows capped by max_frames (see
        _check_saturation)."""
        out = self.wav_from_token_batch_async(token_seqs, alpha)()
        return out if return_truncated else out[:3]

    def mel_from_token_batch_async(
        self, token_seqs: Sequence[np.ndarray], alpha: float = 1.0,
    ):
        """Issue the mel device call without blocking; returns a zero-arg
        finisher -> (mel, out_lens, truncated). See
        wav_from_token_batch_async for the double-buffering rationale."""
        if not token_seqs or not all(len(s) for s in token_seqs):
            raise ValueError("empty token sequence: input produced no phonemes")
        B = len(token_seqs)
        B_pad = self._b_pad(B)
        alphas, a_max = self._alphas(alpha, B, B_pad)
        t_pad = _round_up(max(len(s) for s in token_seqs), self.token_multiple)
        l_pad = self._l_pad(t_pad, a_max)
        xs = np.zeros((B_pad, t_pad), np.int32)
        ilens = np.zeros((B_pad,), np.int32)
        for i, s in enumerate(token_seqs):
            xs[i, : len(s)] = s
            ilens[i] = len(s)
        ilens[B:] = 1  # padded rows: minimal valid length, sliced away below
        xs_d, ilens_d, alphas_d = (jnp.asarray(xs), jnp.asarray(ilens),
                                   jnp.asarray(alphas))
        if self.demand_sized:
            dev_enc = self._enc_fn(t_pad)(self.params, xs_d, ilens_d,
                                          alphas_d)

            def finish_mel_demand():
                # the demand read blocks until the encode program lands; in
                # the double-buffered server the gap overlaps with the other
                # in-flight batch's compute (infer/server.py Batcher)
                (dem,) = self._host(dev_enc[2])
                dem_all = np.asarray(dem)
                trunc = self._demand_trunc(dem_all, B)
                groups = self._decode_groups(dem_all)
                l_max = max(r for _, r in groups)
                mel = None
                out_lens = np.zeros((B_pad,), np.int64)
                for rows, rung in groups:
                    if (t_pad, rung) not in self._jitted_dec:
                        log.info("demand -> decode rung l_pad=%d (first "
                                 "time compiles)", rung)
                    if len(groups) == 1:
                        dev = self._dec_fn(t_pad, rung)(
                            self.params, self.state, dev_enc[0], dev_enc[1],
                            ilens_d, alphas_d)
                    else:
                        gi = jnp.asarray(rows)
                        dev = self._dec_fn(t_pad, rung)(
                            self.params, self.state,
                            jnp.take(dev_enc[0], gi, axis=0),
                            jnp.take(dev_enc[1], gi, axis=0),
                            jnp.take(ilens_d, gi), jnp.take(alphas_d, gi))
                    mel_g, lens_g = self._host(dev[0], dev[1])
                    if mel is None:
                        mel = np.zeros((B_pad, l_max, mel_g.shape[2]),
                                       mel_g.dtype)
                    mel[rows, : mel_g.shape[1]] = mel_g
                    out_lens[rows] = lens_g
                return mel[:B], out_lens[:B], trunc

            return finish_mel_demand
        dev = self._fn(t_pad, l_pad)(self.params, self.state, xs_d, ilens_d,
                                     alphas_d)

        def finish_mel(dev=dev, l_pad=l_pad):
            demand = None
            while True:
                mel, out_lens = self._host(dev[0], dev[1])
                if demand is None:
                    # see finish_wav: the demand pull (one extra
                    # device->host round-trip) only happens when a row
                    # actually hit the buffer edge
                    if np.any(np.asarray(out_lens[:B]) >= l_pad):
                        (dem,) = self._host(dev[2])
                        demand = np.asarray(dem)[:B]
                    else:
                        demand = np.asarray(out_lens[:B])
                grow, trunc = self._check_saturation(demand, l_pad, B)
                if not grow:
                    break
                # rare path: one re-dispatch on a buffer sized for the known
                # demand (first time per shape jit-compiles; finish_wav note)
                l_pad = self._grow_l_pad(l_pad, int(demand.max()))
                log.info("frame demand %d > buffer; re-bucketing to l_pad=%d"
                         " (first time compiles)", int(demand.max()), l_pad)
                dev = self._fn(t_pad, l_pad)(self.params, self.state, xs_d,
                                             ilens_d, alphas_d)
            return mel[:B], out_lens[:B], trunc

        return finish_mel

    def mel_from_token_batch(
        self, token_seqs: Sequence[np.ndarray], alpha: float = 1.0,
        return_truncated: bool = False,
    ):
        """List of id sequences -> (mel (B, L, n_mels), out_lens (B,)).

        alpha: scalar or per-sequence speed control. return_truncated appends
        a (B,) bool array marking rows capped by max_frames (see
        _check_saturation); rows that merely outgrow the first frame bucket
        are re-run on a larger buffer automatically and are NOT truncated.
        """
        mel, out_lens, trunc = self.mel_from_token_batch_async(
            token_seqs, alpha)()
        if return_truncated:
            return mel, out_lens, trunc
        return mel, out_lens

    def warmup(self, batch_sizes=(1, 16), token_lens=(32, 96)) -> int:
        """Pre-compile the serving shapes so the first real requests don't
        pay 20-40 s of jit each (cold-start is per (B_pad, t_pad, l_pad)
        shape). Because _b_pad rounds to powers of two, every pow2 bucket
        between min(batch_sizes) and max(batch_sizes) is warmed — not just
        the endpoints — so intermediate request counts hit a traced shape
        too. Runs dummy batches through the wav path when a vocoder is
        attached, else the mel path; returns the number of calls made.
        ``serve --warmup`` drives this before binding the port."""
        lo, hi = max(min(batch_sizes), 1), max(batch_sizes)
        sizes, b = [], lo
        while b < hi:
            sizes.append(self._b_pad(b))
            b <<= 1
        sizes.append(self._b_pad(hi))
        sizes = sorted(set(sizes))
        calls = 0
        for t in token_lens:
            for b in sizes:
                seqs = [np.ones((t,), np.int32)] * b
                if self.has_vocoder:
                    self.wav_from_token_batch(seqs)
                else:
                    self.mel_from_token_batch(seqs)
                calls += 1
                if self.demand_sized:
                    calls += self._warm_dec_rungs(t, b)
        return calls

    def _warm_dec_rungs(self, t: int, b: int) -> int:
        """Demand-sized decode: the rung a real batch lands on depends on its
        predicted durations, so the dummy warmup batch only compiles ONE
        rung. Pre-compile every 256-frame rung up to the frames_per_token
        heuristic ceiling for this token length (zero-filled inputs -- only
        the compiled shape matters), so a live request's rung never pays the
        20-40 s cold jit in the delivery thread."""
        t_pad = _round_up(t, self.token_multiple)
        B_pad = self._b_pad(b)
        adim = self.model.cfg.model.adim
        # the 2-way decode split (see _decode_groups) dispatches B_pad/2
        # sub-batches: warm those shapes too when the split can engage
        mesh_n = self.mesh.devices.size if self.mesh is not None else 1
        sizes = [B_pad]
        if B_pad >= 4 and (B_pad // 2) % mesh_n == 0:
            sizes.append(B_pad // 2)
        calls = 0
        for bp in sizes:
            hs0 = jnp.zeros((bp, t_pad, adim), jnp.float32)
            d0 = jnp.ones((bp, t_pad), jnp.int32)
            il0 = jnp.ones((bp,), jnp.int32)
            al0 = jnp.ones((bp,), jnp.float32)
            rung, top = 256, self._l_pad(t_pad, 1.0)
            while rung <= top:
                if self._voc is not None:
                    out = self._dec_wav_fn(t_pad, rung)(
                        self.params, self.state, self._voc_params, hs0, d0,
                        il0, al0)
                else:
                    out = self._dec_fn(t_pad, rung)(
                        self.params, self.state, hs0, d0, il0, al0)
                self._host(out[-1])
                calls += 1
                rung += 256
        return calls

    def _bucket_plan(self, lens, max_buckets: int, a_max: float):
        """Partition sorted length ranks into <= max_buckets contiguous
        segments minimizing total padded frame cost sum(|seg| * l_pad(seg
        max)). Exact O(n^2 * k) DP; n is a serving micro-batch (small)."""
        order = sorted(range(len(lens)), key=lambda i: lens[i])
        n = len(order)

        def seg_cost(i, j):  # ranks [i, j)
            t_pad = _round_up(lens[order[j - 1]], self.token_multiple)
            return (j - i) * self._l_pad(t_pad, a_max)

        INF = float("inf")
        best = [[INF] * (max_buckets + 1) for _ in range(n + 1)]
        cut = [[0] * (max_buckets + 1) for _ in range(n + 1)]
        best[0][0] = 0.0
        for j in range(1, n + 1):
            for k in range(1, max_buckets + 1):
                for i in range(j):
                    if best[i][k - 1] == INF:
                        continue
                    c = best[i][k - 1] + seg_cost(i, j)
                    if c < best[j][k]:
                        best[j][k] = c
                        cut[j][k] = i
        k = min(range(1, max_buckets + 1), key=lambda k: best[n][k])
        bounds, j = [], n
        while j > 0:
            i = cut[j][k]
            bounds.append((i, j))
            j, k = i, k - 1
        return [[order[r] for r in range(i, j)] for i, j in reversed(bounds)]

    def mel_from_token_batch_bucketed(
        self, token_seqs: Sequence[np.ndarray], alpha: float = 1.0,
        max_buckets: int = 3,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Like mel_from_token_batch, but length-sorts the batch into up to
        max_buckets sub-batches with their own padded (t_pad, l_pad) shapes.

        Heterogeneous serving batches waste decoder FLOPs on padding (the
        frame buffer sizes to the LONGEST utterance); bucketing bounds that
        to each sub-batch's own maximum. Each bucket shape jits once and is
        cached like any other; results match the unbucketed call row-for-row
        (exact-unpadded inference is padding-invariant) except that a row's
        frame capacity is its own bucket's l_pad rather than the global one
        -- the same frames_per_token safety margin a homogeneous batch gets.
        """
        B = len(token_seqs)
        if B <= 1 or max_buckets <= 1:
            return self.mel_from_token_batch(token_seqs, alpha)
        alphas, a_max = self._alphas(alpha, B, B)
        lens = [len(s) for s in token_seqs]
        groups = self._bucket_plan(lens, max_buckets, a_max)
        mels, out_lens = [None] * B, np.zeros((B,), np.int32)
        for g in groups:
            mel_g, lens_g = self.mel_from_token_batch(
                [token_seqs[i] for i in g], alphas[g])
            for row, i in enumerate(g):
                mels[i] = mel_g[row]
                out_lens[i] = lens_g[row]
        L = max(m.shape[0] for m in mels)
        out = np.zeros((B, L, mels[0].shape[1]), mels[0].dtype)
        for i, m in enumerate(mels):
            out[i, : m.shape[0]] = m
        return out, out_lens

    def synth_phonemes(self, phoneme_str: str, alpha: float = 1.0) -> np.ndarray:
        """Space-joined phoneme string -> (L, n_mels) mel."""
        tokens = np.asarray(phonemes_to_sequence(phoneme_str), np.int32)
        mel, out_lens = self.mel_from_token_batch([tokens], alpha)
        return mel[0, : out_lens[0]]

    def synth_text(self, text: str, alpha: float = 1.0,
                   g2p=None) -> Tuple[np.ndarray, dict]:
        """Free text -> (L_total, n_mels) mel (sentence mels concatenated,
        reference inference.py:170-176) + timing stats."""
        t0 = time.perf_counter()
        sentences = [s for s in process_paragraph(text) if s.strip()]
        phoneme_strs = [preprocess_text(s, g2p=g2p) for s in sentences]
        token_seqs = [np.asarray(phonemes_to_sequence(p), np.int32)
                      for p in phoneme_strs if p]
        t_frontend = time.perf_counter() - t0

        t0 = time.perf_counter()
        mel, out_lens = self.mel_from_token_batch(token_seqs, alpha)
        mels = [mel[i, : out_lens[i]] for i in range(len(token_seqs))]
        full = np.concatenate(mels, axis=0)
        t_model = time.perf_counter() - t0
        stats = {
            "frontend_s": t_frontend, "model_s": t_model,
            "frames": int(full.shape[0]),
            "msec_per_frame": 1000.0 * t_model / max(full.shape[0], 1),
        }
        return full, stats


def vocode(mel: np.ndarray, cfg: Config, vocoder: Optional[object] = None,
           gl_iters: int = 30) -> np.ndarray:
    """(L, n_mels) log-mel -> float waveform. Uses the given neural vocoder
    (callable mel->wav) when provided, else Griffin-Lim over the approximate
    inverse mel (reference inference.py:180-199)."""
    if vocoder is not None:
        return np.asarray(vocoder(mel))
    from fastspeech2_tpu.audio.griffin_lim import griffin_lim
    from fastspeech2_tpu.audio.stft import mel_filterbank

    a = cfg.audio
    fb = mel_filterbank(a.sample_rate, a.n_fft, a.n_mels, a.fmin, a.fmax)
    # least-squares pseudo-inverse mel -> linear magnitude
    inv = np.linalg.pinv(fb)
    mag = np.maximum(inv @ np.exp(mel.T), 0.0)  # (n_freq, L)
    wav = griffin_lim(jnp.asarray(mag[None]), n_iters=gl_iters,
                      n_fft=a.n_fft, hop_length=a.hop_length,
                      win_length=a.win_length)
    return np.asarray(wav)[0]


def write_wav(path: str, wav: np.ndarray, sample_rate: int) -> None:
    """int16 PCM wav (reference inference.py:200-201), via scipy."""
    from scipy.io.wavfile import write

    peak = np.abs(wav).max()
    if peak > 1.0:
        wav = wav / peak
    write(path, sample_rate, (wav * 32767.0).astype(np.int16))
