"""Training loop (reference ``/root/reference/train_fastspeech.py:26-250``).

Structure per epoch: bucketed batches -> jitted accumulate+clip+step -> periodic
scalar metrics (summary_interval), teacher-forced validation (validation_step),
checkpoint + predictor evaluation (save_interval). Multi-host: every host runs
the same loop on its batch shard; host 0 writes checkpoints/metrics.
"""

from __future__ import annotations

import contextlib
import logging
import os
import signal
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.config import Config
from fastspeech2_tpu.data.batching import BucketBatcher
from fastspeech2_tpu.data.dataset import TTSDataset
from fastspeech2_tpu.data.prefetch import prefetch
from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
from fastspeech2_tpu.train.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
)
from fastspeech2_tpu.train.metrics import MetricsWriter, Throughput
from fastspeech2_tpu.train.optimizer import make_optimizer
from fastspeech2_tpu.train.step import (
    TrainState,
    make_eval_step,
    make_mesh,
    make_train_step,
    shard_train_step,
)

log = logging.getLogger("fastspeech2_tpu.train")

# jitted-callable cache for the periodic validation/eval paths; keyed by
# (tag, id(model), static shapes) so each (model, shape) compiles exactly once
# per process instead of once per validation/save interval. id() can't
# collide: the cached closure keeps its model alive, so the id stays taken.
_JIT_CACHE: dict = {}


def _jit_cached(key, fn):
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(fn)
    return _JIT_CACHE[key]


# preemption-safe training: with SIGTERM/SIGINT caught, the loop finishes the
# in-flight step, checkpoints, and exits cleanly instead of losing up to
# save_interval steps (the reference loses them, SURVEY.md 5: "a crash loses
# up to save_interval=1000 steps"). Cloud TPU preemptions deliver SIGTERM.
_PREEMPT_SYNC_STEPS = 10  # multi-host flag-agreement cadence (one collective)


def _drain_writer(ckpt_writer) -> None:
    """Join the async writer before a synchronous exit save, LOGGING a stale
    error from an earlier failed periodic write instead of re-raising it --
    otherwise a transient disk error thousands of steps ago would abort the
    preemption/final checkpoint, the exact loss the exit save exists to
    prevent. The sync save that follows raises on its own if the disk is
    still bad."""
    try:
        ckpt_writer.wait()
    except Exception:
        log.exception("earlier async checkpoint write had failed; "
                      "attempting the synchronous exit save anyway")


@contextlib.contextmanager
def _preemption_guard(flag: dict):
    """Install SIGTERM/SIGINT handlers setting ``flag['hit']``; restore the
    previous handlers on exit. No-op off the main thread (tests, servers)."""

    def _on_signal(signum, frame):
        flag["hit"] = True
        log.warning("signal %d received; checkpointing at the next step "
                    "boundary then exiting", signum)

    prev = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # not in the main thread: leave handlers alone
            pass
    try:
        yield
    finally:
        for sig, h in prev.items():
            signal.signal(sig, h)


def evaluate_predictors(model: FastSpeech2, ts: TrainState,
                        valid_ds: TTSDataset) -> dict:
    """Per-utterance teacher-forced L1 of duration/energy/pitch predictions
    (reference evaluation.py:12-41)."""
    from fastspeech2_tpu.data.batching import pad_batch
    from fastspeech2_tpu.models.predictors import (
        duration_train_apply, variance_train_apply)
    from fastspeech2_tpu.models.encoder import encoder_apply
    from fastspeech2_tpu.ops import attention_mask, make_non_pad_mask
    from fastspeech2_tpu.ops.length_regulator import regulate_length

    utts = [valid_ds[i] for i in range(len(valid_ds))]
    # one static shape for the whole pass: per-utterance shapes would trigger a
    # recompile each (the reference loops bs=1 dynamic shapes, evaluation.py:24)
    T = max(len(u.tokens) for u in utts)
    L = max(u.mel.shape[0] for u in utts)

    def one(params, b):
        tok_mask = make_non_pad_mask(b.ilens, T)
        mel_mask = make_non_pad_mask(b.olens, L)
        hs = encoder_apply(params["encoder"], model.encoder_cfg, b.xs,
                           attention_mask(b.ilens, T))
        d_outs = duration_train_apply(params["duration_predictor"],
                                      model.duration_cfg, hs, tok_mask)
        hs_e, _, _ = regulate_length(hs, b.ds, tok_mask, L)
        e_outs = variance_train_apply(params["energy_predictor"],
                                      model.variance_cfg, hs_e, mel_mask)
        p_outs = variance_train_apply(params["pitch_predictor"],
                                      model.variance_cfg, hs_e, mel_mask)
        # per-utterance mean over the padded grid == reference's bs=1 L1 means
        # up to the zero-padded tail, which both sides zero identically
        nd = jnp.maximum(tok_mask.sum(), 1)
        nf = jnp.maximum(mel_mask.sum(), 1)
        return (jnp.sum(jnp.abs(d_outs - b.ds) * tok_mask) / nd,
                jnp.sum(jnp.abs(e_outs - b.es) * mel_mask) / nf,
                jnp.sum(jnp.abs(p_outs - b.ps) * mel_mask) / nf)

    # cache the compiled fn across calls (every save_interval) -- a fresh
    # @jax.jit wrapper here would retrace + recompile each time
    one = _jit_cached(("eval_predictors", id(model), T, L), one)

    d_l, e_l, p_l = [], [], []
    for u in utts:
        b = jax.tree.map(jnp.asarray, pad_batch([u], T, L))
        d, e, p = one(ts.params, b)
        d_l.append(float(d)); e_l.append(float(e)); p_l.append(float(p))
    return {"Dur_Loss": float(np.mean(d_l)), "Energy_Loss": float(np.mean(e_l)),
            "Pitch_Loss": float(np.mean(p_l))}


def _log_validation_sample(model, ts, valid_ds, metrics, step, cfg,
                           audio_steps: int = 0, vocoder=None):
    """Free-running inference on one valid utterance + mel images + audio to
    TB (reference train_fastspeech.py:167-219). Audio uses the given neural
    vocoder (cfg.train.vocoder_checkpoint -> MelGAN, matching the reference's
    torch.hub MelGAN) or falls back to Griffin-Lim."""
    from fastspeech2_tpu.utils.plotting import plot_spectrogram_to_numpy

    u = valid_ds[0]
    T = len(u.tokens)
    L = max(u.mel.shape[0] * 2, 64)

    def _infer(params, mstate, xs, ilens):
        return model.inference(params, mstate, xs, ilens, out_maxlen=L)

    mel, out_lens, _ = _jit_cached(("val_sample", id(model), T, L), _infer)(
        ts.params, ts.model_state, jnp.asarray(u.tokens[None]),
        jnp.asarray([T], jnp.int32))
    if int(out_lens[0]) >= L:
        # out_lens is clipped to the static buffer; an untrained or
        # duration-exploding model would otherwise truncate silently
        log.warning("validation sample filled its %d-frame buffer (target "
                    "%d frames): predicted durations likely exploding, "
                    "sample image/audio truncated", L, u.mel.shape[0])
    pred = np.asarray(mel)[0, : int(out_lens[0])].T
    metrics.image(step, "validation/mel_target",
                  plot_spectrogram_to_numpy(u.mel.T))
    if pred.shape[1] > 0:
        metrics.image(step, "validation/mel_predicted",
                      plot_spectrogram_to_numpy(pred))
    if audio_steps > 0 and pred.shape[1] > 0:
        from fastspeech2_tpu.infer.synthesize import vocode

        sr = cfg.audio.sample_rate
        metrics.audio(step, "validation/audio_predicted",
                      vocode(pred.T, cfg, vocoder=vocoder,
                             gl_iters=audio_steps), sr)
        metrics.audio(step, "validation/audio_target",
                      vocode(u.mel, cfg, vocoder=vocoder,
                             gl_iters=audio_steps), sr)


def resolve_dp(cfg: Config, n_dev: int, tp: int) -> int:
    """Data-parallel degree for the train mesh.

    train.dp_size > 0 pins it explicitly (errors if it can't be honored);
    0 (the default, config.py:147 "use all visible devices") picks the
    largest dp <= n_dev/tp that divides batch_size -- the data axis must
    divide both the accumulation-window batch and each micro-batch.
    """
    if cfg.train.dp_size > 0:
        dp = cfg.train.dp_size
        if dp * tp > n_dev:
            raise ValueError(
                f"train.dp_size={dp} x tensor_parallel={tp} needs "
                f"{dp * tp} devices but only {n_dev} are visible")
        if cfg.train.batch_size % dp != 0:
            raise ValueError(
                f"train.dp_size={dp} must divide train.batch_size="
                f"{cfg.train.batch_size} (the batch shards over 'data')")
        return dp
    return next(d for d in range(min(n_dev // tp, cfg.train.batch_size), 0, -1)
                if cfg.train.batch_size % d == 0)


def train(cfg: Config, name: str, outdir: str,
          resume_path: Optional[str] = None,
          max_steps: Optional[int] = None,
          data_dir: Optional[str] = None,
          profile_dir: Optional[str] = None,
          profile_steps: int = 5) -> TrainState:
    """Run training; returns the final TrainState.

    With ``profile_dir``, a jax.profiler trace of ``profile_steps`` steps is
    captured once the step function is warm (the reference has no profiler at
    all -- SURVEY.md 5).

    Preemption-safe: SIGTERM/SIGINT during setup OR the loop checkpoints the
    in-flight state at the next step boundary and returns. The guard wraps the
    whole function, not just the loop -- setup (init + first-step compile) can
    take tens of seconds, and a preemption notice landing there must not kill
    the process uncheckpointed."""
    preempt = {"hit": False}
    with _preemption_guard(preempt):
        return _train(cfg, name, outdir, resume_path, max_steps, data_dir,
                      profile_dir, profile_steps, preempt)


def _train(cfg: Config, name: str, outdir: str,
           resume_path: Optional[str],
           max_steps: Optional[int],
           data_dir: Optional[str],
           profile_dir: Optional[str],
           profile_steps: int,
           preempt: dict) -> TrainState:
    host_id = jax.process_index()
    num_hosts = jax.process_count()
    is_host0 = host_id == 0

    data_dir = data_dir or cfg.data.data_dir
    train_ds = TTSDataset(data_dir, cfg.data.train_filelist,
                          cfg.train.use_phonemes, cfg.data.tts_cleaner_names)
    valid_ds = TTSDataset(data_dir, cfg.data.valid_filelist,
                          cfg.train.use_phonemes, cfg.data.tts_cleaner_names)

    tp = max(1, cfg.train.tensor_parallel)
    if tp > 1:
        from fastspeech2_tpu.parallel.sharding import check_tp_divisibility

        check_tp_divisibility(cfg, tp)
        if cfg.model.aheads % tp != 0 and cfg.model.fused_attention != "off":
            import dataclasses

            # non-head-aligned TP cannot shard_map the fused kernel (a head
            # would straddle shards); encoder_apply also guards this, the
            # explicit "off" just makes the config self-describing
            log.info("tensor_parallel=%d does not divide aheads=%d: fused "
                     "attention falls back to the XLA path", tp, cfg.model.aheads)
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, fused_attention="off"))

    model = FastSpeech2(cfg)
    params, mstate = model.init(jax.random.PRNGKey(cfg.train.seed))
    opt = make_optimizer(cfg)
    ts = TrainState(params, mstate, opt.init(params), jnp.asarray(0, jnp.int32))
    step0 = 0
    if resume_path:
        try:
            p, s, o, step0, _ = load_checkpoint(
                resume_path, ts.params, ts.model_state, ts.opt_state)
        except (KeyError, ValueError) as e:
            # optimizer layout changed across versions: keep params/step,
            # restart optimizer state (== reference's warn-and-continue on
            # checkpoint mismatches, train_fastspeech.py:42-63)
            log.warning("optimizer state in %s doesn't match current "
                        "optimizer (%s); reinitializing it", resume_path, e)
            p, s, _, step0, _ = load_checkpoint(
                resume_path, ts.params, ts.model_state)
            o = opt.init(p)
        ts = TrainState(jax.tree.map(jnp.asarray, p), jax.tree.map(jnp.asarray, s),
                        jax.tree.map(jnp.asarray, o),
                        jnp.asarray(step0, jnp.int32))
        log.info("resumed from %s at step %d", resume_path, step0)

    accum = cfg.train.accum_grad
    n_dev = len(jax.devices())
    dp = resolve_dp(cfg, n_dev, tp)
    if dp * tp != n_dev:
        log.warning("using %d of %d devices (dp=%d x tp=%d; batch_size %d)",
                    dp * tp, n_dev, dp, tp, cfg.train.batch_size)
    if tp > 1:
        from fastspeech2_tpu.parallel.sharding import (
            make_mesh_2d, shard_pytree, shard_train_step_tp)

        mesh = make_mesh_2d(dp, tp)
        with mesh:
            ts = TrainState(shard_pytree(ts.params, mesh),
                            ts.model_state,
                            shard_pytree(ts.opt_state, mesh), ts.step)
        step_fn = shard_train_step_tp(
            make_train_step(model, opt, accum, bf16=cfg.train.bf16,
                            sequence_parallel=cfg.train.sequence_parallel,
                            tp_mesh=mesh),
            mesh, ts)
    else:
        mesh = make_mesh(dp)
        # multi-device DP: the fused kernels shard_map over the data mesh
        # (GSPMD would all-gather around their custom calls otherwise)
        step_fn = shard_train_step(
            make_train_step(model, opt, accum, bf16=cfg.train.bf16,
                            tp_mesh=mesh if mesh.devices.size > 1 else None),
            mesh)
    eval_fn = jax.jit(make_eval_step(model))

    batcher = BucketBatcher(
        train_ds, batch_size=cfg.train.batch_size * accum,
        max_frames=cfg.train.tts_max_mel_len, seed=cfg.train.seed,
        host_id=host_id, num_hosts=num_hosts,
        bin_lengths=cfg.train.tts_bin_lengths)

    # train.chkpt_dir/log_dir (reference train_fastspeech.py:27,83-84): joined
    # under --outdir when relative; an absolute config path wins outright
    # (os.path.join semantics), matching the reference's use of the raw value.
    ckpt_dir = os.path.normpath(os.path.join(outdir, cfg.train.chkpt_dir, name))
    ckpt_writer = AsyncCheckpointer()  # periodic saves overlap the loop
    log_dir = os.path.normpath(os.path.join(outdir, cfg.train.log_dir, name))
    metrics = MetricsWriter(log_dir) if is_host0 else None
    tput = Throughput(cfg.audio.hop_length, cfg.audio.sample_rate)
    rng = jax.random.PRNGKey(cfg.train.seed + host_id)

    vocoder = None  # neural validation audio (reference train_fastspeech.py:446)
    if is_host0 and cfg.train.melgan_vocoder and cfg.train.vocoder_checkpoint:
        try:
            from fastspeech2_tpu.vocoder import load_melgan

            vocoder = load_melgan(cfg.train.vocoder_checkpoint)
            log.info("validation audio via MelGAN %s",
                     cfg.train.vocoder_checkpoint)
        except Exception as e:  # audio is best-effort; fall back to GL
            log.warning("MelGAN load failed (%s); Griffin-Lim audio", e)

    step = step0
    profiling = {"active": False, "stop_at": -1}
    with mesh:
        for epoch in range(10 ** 9):
            t_epoch = time.time()
            for batch, _shape in prefetch(batcher.epoch(epoch), depth=2):
                if (profile_dir and not profiling["active"]
                        and step >= step0 + 3):  # warm cache first
                    jax.profiler.start_trace(profile_dir)
                    profiling.update(active=True, stop_at=step + profile_steps)
                    profile_dir = None  # once
                rng, sub = jax.random.split(rng)
                if num_hosts > 1:
                    # each host's local batch becomes one slab of the global
                    # array (parallel/mesh.py:shard_batch); host-local arrays
                    # can't feed a globally-sharded jit directly
                    from fastspeech2_tpu.parallel.mesh import shard_batch

                    batch = shard_batch(batch, mesh)
                else:
                    batch = jax.tree.map(jnp.asarray, batch)
                ts, report = step_fn(ts, batch, sub)
                # host-side counter: reading ts.step would block on the device
                # every iteration and serialize host work behind device compute
                step += 1
                tput.add(int(np.sum(batch.olens)))
                if profiling["active"] and step >= profiling["stop_at"]:
                    jax.block_until_ready(ts.params)
                    jax.profiler.stop_trace()
                    profiling["active"] = False
                    log.info("profiler trace captured")

                # preemption exit: single-host checks the local flag every
                # step; multi-host agrees via an allgather every
                # _PREEMPT_SYNC_STEPS steps (all hosts hit the collective at
                # the same aligned step, so the subsequent gather_to_host
                # collective can't deadlock)
                stop = preempt["hit"]
                if num_hosts > 1:
                    if step % _PREEMPT_SYNC_STEPS != 0:
                        stop = False
                    else:
                        from jax.experimental import multihost_utils

                        stop = bool(np.any(multihost_utils.process_allgather(
                            np.asarray(preempt["hit"]))))
                if stop:
                    if num_hosts > 1:
                        from fastspeech2_tpu.parallel.mesh import gather_to_host

                        ts_save = TrainState(*gather_to_host(tuple(ts), mesh))
                    else:
                        ts_save = ts
                    if is_host0:
                        _drain_writer(ckpt_writer)  # don't race the periodic writer
                        path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.npz")
                        save_checkpoint(path, ts_save.params,
                                        ts_save.model_state, ts_save.opt_state,
                                        step, cfg)
                        log.warning("preempted at step %d: saved %s", step, path)
                    return ts

                if is_host0 and step % cfg.train.summary_interval == 0:
                    scalars = {k: float(v) for k, v in report.items()}
                    scalars.update(tput.report())
                    metrics.scalars(step, scalars, prefix="main")
                    tput.reset()
                    if sys.stdout.isatty():  # live bar (reference tqdm equiv)
                        from fastspeech2_tpu.utils.display import progbar, stream
                        total = max_steps or cfg.train.epochs * max(len(train_ds)
                                // max(cfg.train.batch_size, 1), 1)
                        stream(f"{progbar(step, total)} loss {scalars['loss']:.3f} ")
                    log.info("step %d loss %.4f", step, scalars["loss"])

                do_valid = step % cfg.train.validation_step == 0
                do_save = step % cfg.train.save_interval == 0
                if (do_valid or do_save) and num_hosts > 1:
                    # validation/eval/checkpoint run on host-local jits;
                    # gather_to_host is a collective -- EVERY host calls it,
                    # host 0 alone uses the result
                    from fastspeech2_tpu.parallel.mesh import gather_to_host

                    ts_local = TrainState(*gather_to_host(tuple(ts), mesh))
                    ts_local = TrainState(
                        jax.tree.map(jnp.asarray, ts_local.params),
                        jax.tree.map(jnp.asarray, ts_local.model_state),
                        jax.tree.map(jnp.asarray, ts_local.opt_state),
                        jnp.asarray(ts_local.step))
                else:
                    ts_local = ts

                if do_valid and is_host0:
                    vloss = []
                    for vb, _ in BucketBatcher(
                            valid_ds, batch_size=min(len(valid_ds), 2),
                            seed=0, drop_remainder=False).epoch(0):
                        vr = eval_fn(ts_local, jax.tree.map(jnp.asarray, vb))
                        vloss.append(float(vr["loss"]))
                    if vloss:
                        metrics.scalars(step, {"loss": float(np.mean(vloss))},
                                        prefix="validation")
                        try:
                            _log_validation_sample(model, ts_local, valid_ds,
                                                   metrics, step, cfg,
                                                   audio_steps=30,
                                                   vocoder=vocoder)
                        except Exception as e:  # images are best-effort
                            log.warning("validation sample logging failed: %s", e)

                if do_save and is_host0:
                    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.npz")
                    # async: snapshot to host now, npz write + retention prune
                    # on the writer thread while the loop keeps stepping
                    ckpt_writer.save(path, ts_local.params,
                                     ts_local.model_state, ts_local.opt_state,
                                     step, cfg)
                    ev = evaluate_predictors(model, ts_local, valid_ds)
                    metrics.scalars(step, ev, prefix="evaluation")
                    log.info("saving %s (async)", path)

                if max_steps is not None and step - step0 >= max_steps:
                    if num_hosts > 1:
                        from fastspeech2_tpu.parallel.mesh import gather_to_host

                        final = TrainState(*gather_to_host(tuple(ts), mesh))
                    else:
                        final = ts
                    if is_host0:
                        # sync final save: wait for any in-flight async write
                        # (same path when max_steps lands on save_interval),
                        # then write + prune on this thread before returning
                        _drain_writer(ckpt_writer)
                        save_checkpoint(
                            os.path.join(ckpt_dir, f"ckpt_{step:08d}.npz"),
                            final.params, final.model_state, final.opt_state,
                            step, cfg)
                        prune_checkpoints(ckpt_dir, cfg.train.keep_ckpts)
                    return ts
            log.info("epoch %d done in %.1fs", epoch, time.time() - t_epoch)
            if epoch + 1 >= cfg.train.epochs:
                if is_host0:
                    ckpt_writer.wait()
                return ts
