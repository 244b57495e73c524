"""Data pipeline tests: filelist parsing (against the real reference
valid_filelist), outlier filter parity, dataset invariants, bucketed batching
determinism and multi-host alignment."""

import numpy as np
import pytest

from fastspeech2_tpu.data import (
    BucketBatcher,
    TTSDataset,
    pad_batch,
    parse_filelist,
    remove_outlier,
)
from fastspeech2_tpu.data.dataset import write_fake_feature_store

VALID_FILELIST = "/root/reference/filelists/valid_filelist.txt"


def test_parse_reference_valid_filelist():
    entries = parse_filelist(VALID_FILELIST)
    assert len(entries) == 10
    e = entries[0]
    assert e.utt_id == "LJ001-0001"
    assert e.phonemes[0] == "P" and e.phonemes[-1] == "N"
    # the field is frame *boundaries*: one more entry than durations
    assert len(e.start_positions) in (len(e.durations), len(e.durations) + 1)
    assert all(d >= 0 for d in e.durations)
    # durations may be longer than phonemes; the dataset truncates + absorbs
    assert len(e.durations) >= len(e.phonemes) - 1


def test_remove_outlier_matches_reference_quirk():
    # reference utils/util.py:34-49: outliers -> 0 then -> max(after zeroing);
    # original zeros stay zero
    x = np.array([0.0, 1.0, 1.1, 0.9, 1.05, 50.0, 1.2], np.float32)
    out = remove_outlier(x.copy())
    # 50.0 is the outlier; max after zeroing it is 1.2
    np.testing.assert_allclose(out, [0.0, 1.0, 1.1, 0.9, 1.05, 1.2, 1.2])


def test_remove_outlier_reference_exec_parity(rng):
    """Run the actual reference remove_outlier as oracle."""
    import sys
    import types
    sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from utils.util import remove_outlier as ref_remove_outlier

    for _ in range(5):
        x = rng.uniform(0, 30, 64).astype(np.float32)
        x[rng.integers(0, 64, 5)] = 0.0
        x[rng.integers(0, 64, 2)] *= 50
        ours = remove_outlier(x.copy())
        theirs = ref_remove_outlier(x.copy())
        np.testing.assert_allclose(ours, theirs)


@pytest.fixture(scope="module")
def fake_store(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))
    filelist = write_fake_feature_store(root, n_utts=12, seed=3)
    return root, filelist


def test_dataset_invariants(fake_store):
    root, filelist = fake_store
    ds = TTSDataset(root, filelist)
    assert len(ds) == 12
    u = ds[0]
    assert u.durations.sum() == u.mel.shape[0] == len(u.energy) == len(u.pitch)
    assert u.mel.shape[1] == 80
    assert u.tokens.dtype == np.int32


def test_pad_batch_shapes(fake_store):
    root, filelist = fake_store
    ds = TTSDataset(root, filelist)
    utts = [ds[i] for i in range(4)]
    b = pad_batch(utts, t_pad=32, l_pad=128)
    assert b.xs.shape == (4, 32) and b.ys.shape == (4, 128, 80)
    for i, u in enumerate(utts):
        assert b.ilens[i] == len(u.tokens)
        assert b.olens[i] == u.mel.shape[0]
        np.testing.assert_array_equal(b.xs[i, : b.ilens[i]], u.tokens)
        assert np.all(b.xs[i, b.ilens[i]:] == 0)
        assert b.ds[i].sum() == b.olens[i]


def test_batcher_determinism_and_host_sharding(fake_store):
    root, filelist = fake_store
    ds = TTSDataset(root, filelist)
    mk = lambda host, n_hosts: BucketBatcher(  # noqa: E731
        ds, batch_size=2, host_id=host, num_hosts=n_hosts, seed=5,
        token_multiple=8, frame_multiple=32)

    a1 = [(b.xs.tobytes(), shape) for b, shape in mk(0, 1).epoch(0)]
    a2 = [(b.xs.tobytes(), shape) for b, shape in mk(0, 1).epoch(0)]
    assert a1 == a2, "same (seed, epoch) must give identical batches"
    a3 = [(b.xs.tobytes(), shape) for b, shape in mk(0, 1).epoch(1)]
    assert a1 != a3, "different epochs must shuffle differently"

    # two hosts take disjoint equal shares, together covering host-0's stream
    h0 = [(b.xs.tobytes()) for b, _ in mk(0, 2).epoch(0)]
    h1 = [(b.xs.tobytes()) for b, _ in mk(1, 2).epoch(0)]
    assert len(h0) == len(h1)
    assert not set(h0) & set(h1)


def test_batcher_static_shape_quantization(fake_store):
    root, filelist = fake_store
    ds = TTSDataset(root, filelist)
    shapes = set()
    for b, (t, l) in BucketBatcher(ds, batch_size=2, token_multiple=8,
                                   frame_multiple=32).epoch(0):
        assert b.xs.shape[1] == t and b.ys.shape[1] == l
        assert t % 8 == 0 and l % 32 == 0
        shapes.add((t, l))
    assert len(shapes) <= 4, "bucketing should keep the shape set small"


def test_prefetch_order_and_errors():
    from fastspeech2_tpu.data.prefetch import prefetch

    assert list(prefetch(range(100), depth=3)) == list(range(100))

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer died")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1 and next(it) == 2
    import pytest

    with pytest.raises(RuntimeError, match="producer died"):
        next(it)

    # abandoning the iterator doesn't deadlock the producer
    it2 = prefetch(iter(range(10**6)), depth=1)
    next(it2)
    it2.close()


def test_pad_batch_infers_mel_width(fake_store):
    """Non-80-bin configs work: pad_batch sizes ys from the mels themselves."""
    root, filelist = fake_store
    ds = TTSDataset(root, filelist)
    u = ds[0]
    narrow = u.__class__(utt_id=u.utt_id, tokens=u.tokens,
                         mel=u.mel[:, :40], durations=u.durations,
                         energy=u.energy, pitch=u.pitch)
    b = pad_batch([narrow], t_pad=32, l_pad=128)
    assert b.ys.shape == (1, 128, 40)


def test_batcher_remainder(fake_store):
    """drop_remainder=False must surface the tail utterances (the validation
    loop relies on it); drop_remainder=True keeps full batches only."""
    root, filelist = fake_store
    ds = TTSDataset(root, filelist)
    n = len(ds)
    bs = next(b for b in (5, 7, 3, 4) if n % b)  # any size with a remainder
    rows_kept = sum(b.xs.shape[0]
                    for b, _ in BucketBatcher(ds, batch_size=bs).epoch(0))
    assert rows_kept == (n // bs) * bs
    rows_all = sum(b.xs.shape[0]
                   for b, _ in BucketBatcher(ds, batch_size=bs,
                                             drop_remainder=False).epoch(0))
    assert rows_all == n


def test_batcher_overlong_filtered_globally(fake_store):
    """Overlong utterances are dropped from the GLOBAL order before batching:
    every yielded batch is full, contains no overlong or duplicated rows, and
    all hosts therefore agree on the step count (no per-host skip desync)."""
    root, filelist = fake_store
    ds = TTSDataset(root, filelist)
    lengths = [ds[i].mel.shape[0] for i in range(len(ds))]
    cap = sorted(lengths)[len(lengths) // 2]  # drop roughly half
    n_ok = sum(1 for l in lengths if l <= cap)
    rows = 0
    for b, _ in BucketBatcher(ds, batch_size=2, max_frames=cap).epoch(0):
        assert b.xs.shape[0] == 2
        assert np.all(b.olens <= cap)
        keys = [b.xs[i].tobytes() for i in range(b.xs.shape[0])]
        assert len(set(keys)) == len(keys), "no duplicated rows"
        rows += b.xs.shape[0]
    assert rows == (n_ok // 2) * 2


def test_batcher_group_aligned_shapes(fake_store):
    """Multi-host: at every step, all hosts pad to the SAME (t_pad, l_pad)
    (group max), keeping cross-host collectives shape-aligned."""
    root, filelist = fake_store
    ds = TTSDataset(root, filelist)
    mk = lambda host: BucketBatcher(  # noqa: E731
        ds, batch_size=2, host_id=host, num_hosts=2, seed=5,
        token_multiple=8, frame_multiple=32)
    shapes0 = [shape for _, shape in mk(0).epoch(0)]
    shapes1 = [shape for _, shape in mk(1).epoch(0)]
    assert shapes0 == shapes1
    # and the pads actually cover both hosts' data
    for (b0, s0), (b1, s1) in zip(mk(0).epoch(0), mk(1).epoch(0)):
        assert max(b0.ilens.max(), b1.ilens.max()) <= s0[0]
        assert max(b0.olens.max(), b1.olens.max()) <= s0[1]
