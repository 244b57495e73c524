"""Weight-init variants + weighted-masking loss (VERDICT round-1 items 5/6).

- ``transformer_init`` xavier/kaiming variants are compared distribution-level
  against the reference's ``initialize()`` (``core/modules.py:51-81``) run on
  the live torch oracle: per-leaf std/max agreement after state-dict
  translation, plus the quirks (BatchNorm zeroed and never reset; Embedding /
  LayerNorm reset to module defaults; PE alpha preserved).
- ``use_weighted_masking`` is validated by the equal-lengths equivalence
  property (uniform weights == masked mean) and the per-sequence-equal-weight
  property on unequal lengths; the reference's own weighted branch crashes
  (SURVEY.md appendix) so no oracle run exists for it.
"""

import dataclasses
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fastspeech2_tpu.compat.torch_loader import params_from_state_dict
from fastspeech2_tpu.config import Config
from fastspeech2_tpu.models.fastspeech2 import Batch, FastSpeech2
from fastspeech2_tpu.models.init import INIT_TYPES, apply_transformer_init

REF = "/root/reference"


def _small_cfg(**model_overrides):
    cfg = Config()
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, elayers=1, dlayers=1,
                                       **model_overrides))


def _ref_initialized_params(init_type, cfg):
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

    torch.manual_seed(11)
    model = FeedForwardTransformer(68, 80, _ns(cfg.to_dict()))
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return params_from_state_dict(sd, cfg)


def _leaf_items(params):
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in leaves:
        out[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return out


@pytest.mark.parametrize("init_type", ["xavier_uniform", "xavier_normal",
                                       "kaiming_uniform", "kaiming_normal"])
def test_transformer_init_matches_reference_distribution(init_type):
    """Per-leaf distribution agreement with the torch oracle's initialize()."""
    cfg = _small_cfg(transformer_init=init_type)
    ref_params, ref_state = _ref_initialized_params(init_type, cfg)
    ours_params, _ = FastSpeech2(cfg).init(jax.random.PRNGKey(2))

    ref_leaves = _leaf_items(ref_params)
    our_leaves = _leaf_items(ours_params)
    assert set(ref_leaves) == set(our_leaves)

    uniform = init_type.endswith("uniform")
    for name, ref in ref_leaves.items():
        ours = our_leaves[name]
        assert ours.shape == ref.shape, name
        if name.endswith("['w']") and ref.ndim > 1 and "embed']" not in name:
            # re-drawn weights: same spread (std within 12% -- thousands of
            # iid samples) and, for uniform, the same hard bound
            assert np.std(ours) == pytest.approx(np.std(ref), rel=0.12), name
            if uniform:
                assert np.max(np.abs(ours)) <= np.max(np.abs(ref)) * 1.02, name
        elif "['bn']" in name:
            # the BatchNorm quirk: zeroed by the dim-1 loop, never reset
            np.testing.assert_array_equal(ref, 0.0, err_msg=name)
            np.testing.assert_array_equal(ours, 0.0, err_msg=name)
        elif name.endswith("['b']") and ref.ndim == 1:
            np.testing.assert_array_equal(ours, 0.0, err_msg=name)
            np.testing.assert_array_equal(ref, 0.0, err_msg=name)
        elif name.endswith("['g']"):
            np.testing.assert_array_equal(ours, 1.0, err_msg=name)
        elif name.endswith("['alpha']"):
            assert float(ours) == 1.0

    # Embedding is reset to N(0,1) with zero padding row
    emb = our_leaves["['encoder']['embed']['w']"]
    assert np.std(emb[1:]) == pytest.approx(1.0, rel=0.1)
    np.testing.assert_array_equal(emb[0], 0.0)


def test_transformer_init_pytorch_is_default():
    cfg = _small_cfg(transformer_init="pytorch")
    p1, _ = FastSpeech2(cfg).init(jax.random.PRNGKey(3))
    p2, _ = FastSpeech2(_small_cfg()).init(jax.random.PRNGKey(3))
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(p1),
            jax.tree_util.tree_leaves_with_path(p2)):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transformer_init_unknown_rejected():
    with pytest.raises(ValueError, match="Unknown initialization"):
        apply_transformer_init(jax.random.PRNGKey(0), {"x": {"w": jnp.ones((4, 4))}},
                               "glorot")  # not a reference name
    with pytest.raises(ValueError, match="Unknown initialization"):
        FastSpeech2(_small_cfg(transformer_init="bogus")).init(jax.random.PRNGKey(0))
    assert "pytorch" in INIT_TYPES


def _batch(ilens, olens, T, L, seed=0):
    g = np.random.default_rng(seed)
    B = len(ilens)
    xs = np.zeros((B, T), np.int32)
    ds = np.zeros((B, T), np.int32)
    for b in range(B):
        xs[b, : ilens[b]] = g.integers(1, 68, ilens[b])
        d = np.ones(ilens[b], np.int64)
        d[-1] += olens[b] - d.sum()
        ds[b, : ilens[b]] = d
    ys = g.normal(size=(B, L, 80)).astype(np.float32)
    es = g.uniform(0.0, 130.0, (B, L)).astype(np.float32)
    ps = g.uniform(71.0, 676.0, (B, L)).astype(np.float32)
    for b in range(B):
        ys[b, olens[b]:] = 0.0
        es[b, olens[b]:] = 0.0
        ps[b, olens[b]:] = 0.0
    return Batch(xs=jnp.asarray(xs), ilens=jnp.asarray(np.asarray(ilens, np.int32)),
                 ys=jnp.asarray(ys), olens=jnp.asarray(np.asarray(olens, np.int32)),
                 ds=jnp.asarray(ds), es=jnp.asarray(es), ps=jnp.asarray(ps))


def _forward(cfg, batch):
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    _, report, _ = model.forward(params, state, batch, training=False)
    return {k: float(v) for k, v in report.items()}


def test_weighted_masking_equals_masked_mean_on_equal_lengths():
    """With every sequence the same length the per-sequence weights are
    uniform 1/(B*T*odim) -- exactly the masked mean. Energy/pitch are
    untouched by the weighted branch (reference fastspeech.py:308-322)."""
    cfg = _small_cfg()
    cfg_w = _small_cfg(use_weighted_masking=True)
    batch = _batch(ilens=[9, 9], olens=[30, 30], T=9, L=30)
    r_plain = _forward(cfg, batch)
    r_weighted = _forward(cfg_w, batch)
    for k in r_plain:
        assert r_weighted[k] == pytest.approx(r_plain[k], rel=1e-5), k


def test_weighted_masking_weighs_sequences_equally():
    """Unequal lengths: each sequence contributes its own mean/B, so the
    weighted l1 equals the average of the two single-sequence masked means
    (which plain masking -- a global element mean -- does NOT satisfy)."""
    cfg_w = _small_cfg(use_weighted_masking=True)
    full = _batch(ilens=[11, 5], olens=[40, 12], T=11, L=40, seed=4)
    r_full = _forward(cfg_w, full)

    singles = []
    for b in range(2):
        il, ol = int(full.ilens[b]), int(full.olens[b])
        sub = Batch(xs=full.xs[b:b + 1], ilens=full.ilens[b:b + 1],
                    ys=full.ys[b:b + 1], olens=full.olens[b:b + 1],
                    ds=full.ds[b:b + 1], es=full.es[b:b + 1],
                    ps=full.ps[b:b + 1])
        singles.append(_forward(cfg_w, sub))
    for k in ("before_loss", "after_loss", "l1_loss", "duration_loss"):
        want = 0.5 * (singles[0][k] + singles[1][k])
        assert r_full[k] == pytest.approx(want, rel=2e-3), k


def test_train_step_with_weighted_masking_and_xavier_init():
    """Integration: a train step runs (finite loss, params update) with
    use_weighted_masking=True and transformer_init=xavier_uniform -- the two
    round-1 no-op knobs now live through the real training path."""
    import jax.numpy as jnp

    from fastspeech2_tpu.train.optimizer import make_optimizer
    from fastspeech2_tpu.train.step import TrainState, make_train_step

    cfg = _small_cfg(use_weighted_masking=True,
                     transformer_init="xavier_uniform")
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    opt = make_optimizer(cfg)
    ts = TrainState(params, state, opt.init(params), jnp.asarray(0, jnp.int32))
    batch = _batch(ilens=[8, 5], olens=[20, 12], T=8, L=20, seed=2)
    step = jax.jit(make_train_step(model, opt, accum_grad=1))
    ts2, report = step(ts, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(report["loss"]))
    assert int(ts2.step) == 1
    # the update actually moved the (xavier-initialized) weights
    moved = jax.tree.map(lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
                         ts.params, ts2.params)
    assert max(jax.tree.leaves(moved)) > 0.0
