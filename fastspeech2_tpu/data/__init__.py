"""Data pipeline: filelist parsing, feature store, bucketed static-shape
batching, per-host sharding."""

from fastspeech2_tpu.data.filelist import FilelistEntry, parse_filelist  # noqa: F401
from fastspeech2_tpu.data.dataset import TTSDataset, remove_outlier  # noqa: F401
from fastspeech2_tpu.data.batching import BucketBatcher, pad_batch  # noqa: F401
