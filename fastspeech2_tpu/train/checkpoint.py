"""Checkpointing: params + optimizer state + step + config snapshot.

Equivalent of the reference's ``torch.save({model, optim, step, hp_str, githash})``
(``train_fastspeech.py:229-244``) as a single .npz with path-flattened pytree
leaves -- dependency-free, atomic (write + rename), and multi-host safe
(only host 0 writes; see train/loop.py). The config snapshot enables
reconstruction without the original YAML (== ``load_hparam_str``,
reference inference.py:149-152).
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np

from fastspeech2_tpu.config import Config


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_into(template, flat: dict):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.shape(leaf)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def git_hash() -> str:
    """Code-version provenance (reference utils/util.py:571-573)."""
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return "unknown"


def _atomic_savez(path: str, payload: dict, meta: dict) -> None:
    """npz write to a same-directory temp file + rename; __meta__ rides as a
    uint8 JSON buffer (npz has no string arrays without pickle)."""
    payload = dict(payload)
    payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(),
                                        dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)),
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_checkpoint(path: str, params, model_state, opt_state, step: int,
                    cfg: Config) -> None:
    """Atomic single-file checkpoint write."""
    payload = {}
    for prefix, tree in (("params", params), ("state", model_state),
                         ("opt", opt_state)):
        for k, v in _flatten(tree).items():
            payload[f"{prefix}::{k}"] = v
    _atomic_savez(path, payload, {"step": int(step), "hp_yaml": cfg.to_yaml(),
                                  "githash": git_hash(), "format": 1})


class AsyncCheckpointer:
    """Overlap checkpoint serialization + disk IO with training.

    ``save()`` snapshots the pytrees to host memory synchronously (mandatory:
    the jitted train step donates its input buffers, so device values must be
    pulled before the next step invalidates them) and hands the npz write +
    atomic rename + retention pruning to a background thread. The reference
    blocks the loop on ``torch.save`` every save_interval
    (``train_fastspeech.py:229-244``); here the loop only pays the
    device->host transfer.

    One write in flight at a time: a new ``save()`` first joins the previous
    write (checkpoint intervals are long; an unbounded queue could otherwise
    hold many full model copies). Writer errors re-raise at the next
    ``save()``/``wait()``.
    """

    def __init__(self):
        import threading

        self._threading = threading
        self._thread: Optional[object] = None
        self._err: list = []

    def save(self, path: str, params, model_state, opt_state, step: int,
             cfg: Config) -> None:
        self.wait()
        host = jax.device_get((params, model_state, opt_state))

        def _write():
            try:
                save_checkpoint(path, *host, step, cfg)
                prune_checkpoints(os.path.dirname(path), cfg.train.keep_ckpts)
            except BaseException as e:
                # visible immediately -- the loop already logged "saving ...
                # (async)" and won't call wait() again until the next save,
                # which can be thousands of steps away
                logging.getLogger(__name__).exception(
                    "async checkpoint write to %s FAILED", path)
                self._err.append(e)

        # non-daemon: if an exception unwinds the training loop (or the
        # process exits) with a write in flight, interpreter shutdown joins
        # this thread so the atomic write+rename still completes instead of
        # silently losing a checkpoint the log already announced
        self._thread = self._threading.Thread(target=_write, daemon=False)
        self._thread.start()

    def wait(self) -> None:
        """Join the in-flight write; re-raise its error, if any."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err:
            raise self._err.pop(0)


def load_checkpoint(
    path: str, params_template, state_template, opt_template=None,
) -> Tuple[Any, Any, Any, int, Config]:
    """Load into the given pytree templates; returns
    (params, model_state, opt_state, step, cfg).

    opt_template=None skips optimizer-state restoration (inference/GTA/export
    consumers; also sidesteps optimizer-layout changes across versions --
    resume-from-checkpoint is the only caller that needs the opt state)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {"params": {}, "state": {}, "opt": {}}
        meta = json.loads(bytes(z["__meta__"]).decode())
        for k in z.files:
            if k == "__meta__":
                continue
            prefix, rest = k.split("::", 1)
            flat[prefix][rest] = z[k]
    params = _unflatten_into(params_template, flat["params"])
    state = _unflatten_into(state_template, flat["state"])
    opt = (_unflatten_into(opt_template, flat["opt"])
           if opt_template is not None else None)
    cfg = Config.from_yaml(meta["hp_yaml"])
    return params, state, opt, meta["step"], cfg


def load_checkpoint_meta(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return json.loads(bytes(z["__meta__"]).decode())


def average_checkpoints(paths, out_path: str) -> int:
    """Uniform parameter average of N checkpoints -> one checkpoint.

    The classic deployment trick (averaging the last few periodic saves
    reduces the variance of the final weights; standard in ESPnet/fairseq
    pipelines, absent from the reference). Works on the flat npz
    representation, so no model rebuild is needed: float params AND BatchNorm
    running stats average uniformly; non-float leaves (none today) and the
    meta (config snapshot, githash) come from the NEWEST checkpoint by step.
    The optimizer state is dropped -- an averaged model is an inference/export
    artifact, not a resume point. Returns the newest step.

    Raises ValueError on config or key-set mismatch between the inputs --
    averaging across architectures is silent corruption, not a feature.
    """
    if len(paths) < 2:
        raise ValueError("need at least 2 checkpoints to average")
    metas = [load_checkpoint_meta(p) for p in paths]
    newest = max(range(len(paths)), key=lambda i: metas[i]["step"])
    for p, m in zip(paths, metas):
        if m["hp_yaml"] != metas[newest]["hp_yaml"]:
            raise ValueError(f"config mismatch: {p} vs {paths[newest]}")

    acc: dict = {}
    dtypes: dict = {}
    keysets = None
    for p in paths:
        with np.load(p, allow_pickle=False) as z:
            keys = {k for k in z.files
                    if k != "__meta__" and not k.startswith("opt::")}
            if keysets is None:
                keysets = keys
            elif keys != keysets:
                raise ValueError(
                    f"key mismatch: {sorted(keys ^ keysets)[:5]} ...")
            for k in keys:
                v = z[k]
                dtypes.setdefault(k, v.dtype)
                if not np.issubdtype(v.dtype, np.floating):
                    acc[k] = v if p == paths[newest] else acc.get(k, v)
                    continue
                # accumulate in f64: N float32 adds stay exact to f32 ulp
                acc[k] = acc.get(k, 0.0) + v.astype(np.float64)
    payload = {}
    for k, v in acc.items():
        # np.asarray: adding a python 0.0 to a 0-dim array (the PE alphas)
        # yields a numpy SCALAR, which must still divide + round-trip
        v = np.asarray(v)
        if v.dtype == np.float64:
            v = (v / len(paths)).astype(dtypes[k])
        payload[k] = v
    meta = dict(metas[newest])
    meta["averaged_from"] = [os.path.basename(p) for p in paths]
    _atomic_savez(out_path, payload, meta)
    return int(metas[newest]["step"])


def prune_checkpoints(ckpt_dir: str, keep: int) -> None:
    """Retain only the newest ``keep`` step checkpoints in ``ckpt_dir``
    (cfg.train.keep_ckpts). keep <= 0 keeps everything -- the reference never
    prunes, so that is the default. Steps sort lexicographically thanks to the
    zero-padded ``ckpt_{step:08d}.npz`` naming."""
    if keep <= 0:
        return
    import glob
    import re

    files = sorted(
        f for f in glob.glob(os.path.join(ckpt_dir, "ckpt_*.npz"))
        if re.fullmatch(r"ckpt_\d+\.npz", os.path.basename(f)))
    for f in files[:-keep]:
        try:
            os.unlink(f)
        except OSError:  # already gone / racing writer: retention is advisory
            pass
