"""Reverse checkpoint interop: our params -> reference .pth format.

Round-trip checks (saver -> loader identity) plus the strong oracle: the
exported state_dict loads into the ACTUAL reference FeedForwardTransformer
with strict=True and produces the same losses / inference mel as our model.
"""

import dataclasses
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fastspeech2_tpu.compat.torch_loader import (load_torch_checkpoint,
                                                 params_from_state_dict)
from fastspeech2_tpu.compat.torch_saver import (save_torch_checkpoint,
                                                state_dict_from_params)
from fastspeech2_tpu.config import Config
from fastspeech2_tpu.models.fastspeech2 import Batch, FastSpeech2

REF = "/root/reference"


def _ref_model(cfg):
    for mod in ("librosa", "g2p_en", "pyworld"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from fastspeech import FeedForwardTransformer

    class _Dot(dict):
        __getattr__ = dict.__getitem__

    def _ns(d):
        return (_Dot({k: _ns(v) for k, v in d.items()})
                if isinstance(d, dict) else d)

    return FeedForwardTransformer(68, 80, _ns(cfg.to_dict()))


def _small_cfg(**model_kw):
    cfg = Config()
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, elayers=1, dlayers=1,
                                       **model_kw))


@pytest.mark.parametrize("variant", ["default", "pre_ln_concat_linear_ffn"])
def test_saver_loader_round_trip(variant):
    """state_dict_from_params o params_from_state_dict == identity on every
    leaf, for the default arch and the non-default options."""
    kw = ({} if variant == "default" else
          dict(encoder_normalize_before=True, decoder_normalize_before=True,
               encoder_concat_after=True, decoder_concat_after=True,
               positionwise_layer_type="linear", use_scaled_pos_enc=False))
    cfg = _small_cfg(**kw)
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(4))

    sd = state_dict_from_params(jax.device_get(params), jax.device_get(state),
                                cfg)
    params2, state2 = params_from_state_dict(sd, cfg)

    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(params2)):
        assert jax.tree_util.keystr(k1) == jax.tree_util.keystr(k2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k1))
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(state),
            jax.tree_util.tree_leaves_with_path(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k1))


def test_exported_checkpoint_runs_in_reference(tmp_path):
    """The exported .pth loads into the reference model with strict=True and
    the two frameworks agree on teacher-forced losses and inference mel."""
    cfg = _small_cfg()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(6))
    params["duration_predictor"]["out"]["b"] = jnp.full_like(
        params["duration_predictor"]["out"]["b"], 1.3)

    path = str(tmp_path / "exported.pth")
    save_torch_checkpoint(path, jax.device_get(params), jax.device_get(state),
                          cfg, step=123)

    ref = _ref_model(cfg)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["step"] == 123 and "hp_str" in ckpt
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in ckpt["model"].items()}, strict=True)
    assert not missing and not unexpected
    ref.eval()

    # teacher-forced loss parity
    g = np.random.default_rng(0)
    B, T, L = 2, 9, 30
    ilens = np.array([T, T - 2], np.int32)
    olens = np.array([L, L - 8], np.int32)
    xs = np.zeros((B, T), np.int64)
    ds = np.zeros((B, T), np.int64)
    for b in range(B):
        xs[b, : ilens[b]] = g.integers(1, 68, ilens[b])
        d = np.ones(ilens[b], np.int64)
        d[-1] += olens[b] - d.sum()
        ds[b, : ilens[b]] = d
    ys = g.normal(size=(B, L, 80)).astype(np.float32)
    es = g.uniform(0, 100, (B, L)).astype(np.float32)
    ps = g.uniform(71, 600, (B, L)).astype(np.float32)
    for b in range(B):
        ys[b, olens[b]:] = 0
        es[b, olens[b]:] = 0
        ps[b, olens[b]:] = 0

    with torch.no_grad():
        _, report_t = ref.forward(
            torch.from_numpy(xs), torch.from_numpy(ilens).long(),
            torch.from_numpy(ys), torch.from_numpy(olens).long(),
            torch.from_numpy(ds), torch.from_numpy(es), torch.from_numpy(ps))
    report_t = {k: v for d in report_t for k, v in d.items()}

    batch = Batch(xs=jnp.asarray(xs, jnp.int32), ilens=jnp.asarray(ilens),
                  ys=jnp.asarray(ys), olens=jnp.asarray(olens),
                  ds=jnp.asarray(ds, jnp.int32), es=jnp.asarray(es),
                  ps=jnp.asarray(ps))
    _, report_j, _ = model.forward(params, state, batch, training=False)
    for k in ("l1_loss", "duration_loss", "energy_loss", "pitch_loss", "loss"):
        np.testing.assert_allclose(float(report_j[k]), float(report_t[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)

    # inference mel parity through the exported checkpoint
    x = np.random.default_rng(2).integers(1, 68, 8).astype(np.int64)
    with torch.no_grad():
        mel_t = ref.inference(torch.from_numpy(x)).numpy()
    mel_j, out_lens, _ = jax.jit(
        lambda p, s, xx, il: model.inference(p, s, xx, il,
                                             out_maxlen=mel_t.shape[0])
    )(params, state, jnp.asarray(x[None], jnp.int32),
      jnp.asarray([8], jnp.int32))
    assert int(out_lens[0]) == mel_t.shape[0]
    np.testing.assert_allclose(np.asarray(mel_j)[0], mel_t,
                               rtol=1e-4, atol=2e-4)


def test_exported_checkpoint_reimports_via_cli_loader(tmp_path):
    """Full circle: our ckpt -> .pth -> load_torch_checkpoint -> same mel."""
    cfg = _small_cfg()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(8))
    path = str(tmp_path / "circle.pyt")
    save_torch_checkpoint(path, jax.device_get(params), jax.device_get(state),
                          cfg, step=7)
    p2, s2, cfg2, step = load_torch_checkpoint(path)
    assert step == 7 and cfg2.model.elayers == 1
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_cli_bidirectional(tmp_path):
    """`convert` CLI: .pth -> .npz -> .pth with identical weights; the final
    .pth still loads into the loader with the same params."""
    cfg = _small_cfg()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(10))
    first = str(tmp_path / "a.pyt")
    save_torch_checkpoint(first, jax.device_get(params),
                          jax.device_get(state), cfg, step=11)

    from fastspeech2_tpu.cli import main

    npz = str(tmp_path / "b.npz")
    main(["convert", "-p", first, "-o", npz])
    second = str(tmp_path / "c.pth")
    main(["convert", "-p", npz, "-o", second])

    p2, s2, cfg2, step = load_torch_checkpoint(second)
    assert step == 11 and cfg2.model.elayers == 1
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
