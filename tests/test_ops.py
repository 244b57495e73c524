"""Unit tests for core ops: masks, length regulator, quantization (including
parity vs torch.bucketize), masked attention softmax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fastspeech2_tpu.ops import (
    attention_mask,
    bucketize,
    make_non_pad_mask,
    make_pad_mask,
    regulate_length,
    to_one_hot,
)
from fastspeech2_tpu.ops.attention import masked_softmax
from fastspeech2_tpu.ops.quantize import linear_bins, log_bins


def test_pad_masks():
    lengths = jnp.array([5, 3, 2])
    pad = make_pad_mask(lengths, 5)
    np.testing.assert_array_equal(
        np.asarray(pad),
        [[0, 0, 0, 0, 0], [0, 0, 0, 1, 1], [0, 0, 1, 1, 1]],
    )
    assert np.all(np.asarray(make_non_pad_mask(lengths, 5)) == ~np.asarray(pad))


def test_attention_mask_matches_reference_example():
    # docstring example in reference fastspeech.py:359-373
    m = attention_mask(jnp.array([5, 3]), 5)
    expected_1 = np.ones((5, 5))
    expected_2 = np.zeros((5, 5))
    expected_2[:3, :3] = 1
    np.testing.assert_array_equal(np.asarray(m[0]), expected_1)
    np.testing.assert_array_equal(np.asarray(m[1]), expected_2)


def test_length_regulator_expansion():
    # reference length_regulator.py:67-84 example
    hs = jnp.array([[[1.0], [2.0], [3.0]]])
    ds = jnp.array([[1, 2, 3]])
    mask = jnp.array([[True, True, True]])
    out, frame_mask, out_lens = regulate_length(hs, ds, mask, 8)
    np.testing.assert_array_equal(
        np.asarray(out[0, :, 0]), [1, 2, 2, 3, 3, 3, 0, 0]
    )
    assert int(out_lens[0]) == 6
    np.testing.assert_array_equal(np.asarray(frame_mask[0]),
                                  [1, 1, 1, 1, 1, 1, 0, 0])


def test_length_regulator_zero_duration_skipped():
    # a zero-duration phoneme contributes no frames
    hs = jnp.array([[[1.0], [2.0], [3.0]]])
    ds = jnp.array([[2, 0, 1]])
    mask = jnp.ones((1, 3), bool)
    out, _, out_lens = regulate_length(hs, ds, mask, 4)
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [1, 1, 3, 0])
    assert int(out_lens[0]) == 3


def test_length_regulator_all_zero_fallback():
    # reference :86-88 -- all-zero durations become 1 per valid token
    hs = jnp.array([[[5.0], [6.0], [7.0]]])
    ds = jnp.zeros((1, 3), jnp.int32)
    mask = jnp.array([[True, True, False]])
    out, _, out_lens = regulate_length(hs, ds, mask, 4)
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [5, 6, 0, 0])
    assert int(out_lens[0]) == 2


def test_length_regulator_respects_token_mask():
    # padded tokens' durations are ignored
    hs = jnp.array([[[1.0], [2.0], [9.0]]])
    ds = jnp.array([[1, 1, 7]])
    mask = jnp.array([[True, True, False]])
    out, _, out_lens = regulate_length(hs, ds, mask, 4)
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [1, 2, 0, 0])
    assert int(out_lens[0]) == 2


def test_length_regulator_sum_invariant(rng):
    # sum(durations) == out_len for random batches
    B, T, L = 4, 12, 64
    ds = rng.integers(0, 6, (B, T)).astype(np.int32)
    ilens = rng.integers(1, T + 1, (B,)).astype(np.int32)
    mask = np.arange(T)[None] < ilens[:, None]
    hs = rng.normal(size=(B, T, 8)).astype(np.float32)
    out, frame_mask, out_lens = regulate_length(
        jnp.asarray(hs), jnp.asarray(ds), jnp.asarray(mask), L)
    expect = (ds * mask).sum(1)
    expect = np.where(expect == 0, mask.sum(1), expect)
    np.testing.assert_array_equal(np.asarray(out_lens), expect)
    np.testing.assert_array_equal(np.asarray(frame_mask).sum(1),
                                  np.minimum(expect, L))


@pytest.mark.parametrize("side_values", [True, False])
def test_bucketize_matches_torch(rng, side_values):
    bins = linear_bins(0.01786651276051998, 130.5338592529297)  # energy bins
    if side_values:
        # exact boundary values exercise the tie-breaking semantics
        x = np.concatenate([bins[:10], bins[-10:], [0.0, 1e9, -5.0]]).astype(np.float32)
    else:
        x = rng.uniform(-1, 140, size=(512,)).astype(np.float32)
    ours = np.asarray(bucketize(jnp.asarray(x), jnp.asarray(bins)))
    theirs = torch.bucketize(torch.from_numpy(x), torch.from_numpy(bins)).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_bucketize_matches_torch_log_bins(rng):
    bins = log_bins(71.0, 676.2260946528305)  # pitch bins
    x = rng.uniform(0, 800, size=(512,)).astype(np.float32)
    x[:5] = 0.0  # unvoiced frames
    ours = np.asarray(bucketize(jnp.asarray(x), jnp.asarray(bins)))
    theirs = torch.bucketize(torch.from_numpy(x), torch.from_numpy(bins)).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_log_bins_match_torch_formula():
    # torch: exp(linspace(log(min), log(max), 255)) in float32
    # (reference core/variance_predictor.py:188-197)
    bins = log_bins(71.0, 676.2260946528305)
    t = torch.exp(torch.linspace(torch.log(torch.tensor(71.0)),
                                 torch.log(torch.tensor(676.2260946528305)), 255))
    np.testing.assert_allclose(bins, t.numpy(), rtol=1e-6)


def test_linear_bins_match_torch():
    bins = linear_bins(0.0178, 130.5)
    t = torch.linspace(0.0178, 130.5, 255)
    np.testing.assert_allclose(bins, t.numpy(), rtol=1e-6)


def test_one_hot_shape():
    x = jnp.array([[0.0, 100.0]])
    oh = to_one_hot(x, linear_bins(0.0, 130.0))
    assert oh.shape == (1, 2, 256)
    assert float(oh.sum()) == 2.0


def test_masked_softmax_matches_torch_fill():
    # torch path: masked_fill(-inf) -> softmax -> masked_fill(0)
    # (reference core/attention.py:58-65)
    torch.manual_seed(0)
    scores = torch.randn(2, 3, 4, 4)
    mask = torch.zeros(2, 1, 4, 4, dtype=torch.bool)
    mask[0, :, :, :3] = True  # 3 valid keys
    mask[1, :, :2, :2] = True
    t_scores = scores.masked_fill(~mask, float("-inf"))
    t_attn = torch.softmax(t_scores, dim=-1).masked_fill(~mask, 0.0)
    t_attn = torch.nan_to_num(t_attn)  # fully-masked rows: reference NaNs->0 anyway
    ours = masked_softmax(jnp.asarray(scores.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(ours), t_attn.numpy(), atol=1e-6)


def test_hash_dropout_speed_mode():
    """Under a compute-dtype context, dropout uses the counter-hash mask:
    deterministic per key, key-dependent, correct keep rate and 1/(1-p)
    scaling; f32 default path keeps jax.random.bernoulli."""
    from fastspeech2_tpu.ops import nn
    from fastspeech2_tpu.ops.precision import compute_dtype

    x = jnp.ones((64, 256), jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    with compute_dtype(jnp.bfloat16):
        y1 = nn.dropout(k1, x, 0.25, deterministic=False)
        y1b = nn.dropout(k1, x, 0.25, deterministic=False)
        y2 = nn.dropout(k2, x, 0.25, deterministic=False)
    a1 = np.asarray(y1)
    assert np.array_equal(a1, np.asarray(y1b))            # deterministic
    assert not np.array_equal(a1, np.asarray(y2))         # key-dependent
    vals = np.unique(a1)
    assert set(np.round(vals, 5)) <= {0.0, np.float32(np.round(1 / 0.75, 5))}
    assert abs((a1 != 0).mean() - 0.75) < 0.02            # keep rate

    # f32 path unchanged (threefry bernoulli)
    y_ref = nn.dropout(k1, x, 0.25, deterministic=False)
    mask_ref = np.asarray(jax.random.bernoulli(k1, 0.75, x.shape))
    assert np.array_equal(np.asarray(y_ref) != 0, mask_ref)
