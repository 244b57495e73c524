"""Typed configuration for the TPU-native FastSpeech2 framework.

Mirrors the reference's single YAML config (``/root/reference/configs/default.yaml``)
and its ``HParam`` dot-dict loader (``/root/reference/utils/hparams.py:55-65``), but as
frozen dataclasses with defaults, validation, and a round-trippable string snapshot
(the equivalent of the reference's ``hp_str`` checkpoint embedding,
``/root/reference/train_fastspeech.py:417-418``).

Unknown YAML keys are preserved in ``extras`` so configs written for the reference
load unchanged.
"""

from __future__ import annotations

import dataclasses
import io
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


@dataclass(frozen=True)
class DataConfig:
    """Dataset paths and pitch/energy statistics (reference default.yaml:1-16).

    ``wav_dir`` is the preprocess CLI's wav root when ``-d`` is not given
    (the reference carries it in default.yaml:3 but never reads it).
    """

    data_dir: str = "./data/"
    wav_dir: str = "./wavs/"
    e_mean: float = 21.578571319580078
    e_std: float = 18.916799545288086
    e_min: float = 0.01786651276051998
    e_max: float = 130.5338592529297
    f0_mean: float = 206.5135564772342
    f0_std: float = 53.633228905750336
    p_min: float = 71.0
    p_max: float = 676.2260946528305
    train_filelist: str = "./filelists/train_filelist.txt"
    valid_filelist: str = "./filelists/valid_filelist.txt"
    tts_cleaner_names: List[str] = field(default_factory=lambda: ["english_cleaners"])


@dataclass(frozen=True)
class AudioConfig:
    """Feature-extraction parameters (reference default.yaml:19-32).

    ``peak_norm`` routes into the preprocess CLI's wav read (per-file peak
    normalisation). ``mu_law``/``bits``/``min_level_db``/``ref_level_db`` are
    WaveRNN residue the reference also never reads; they exist so
    reference-format YAMLs load, and ``validate_config`` rejects non-default
    values rather than silently ignoring them.
    """

    sample_rate: int = 22050
    fmax: float = 8000.0
    fmin: float = 0.0
    n_mels: int = 80
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    num_mels: int = 80
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    bits: int = 9
    mu_law: bool = True
    peak_norm: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Network architecture (reference default.yaml:38-106).

    Note: the reference hardcodes encoder/decoder dropout to 0.2 at construction
    (``fastspeech.py:75-77,127-129``) regardless of the ``transformer_*_dropout_rate``
    keys; we expose that hardcoded value as ``transformer_dropout_rate`` so the
    behavior is explicit and configurable.
    """

    adim: int = 256
    aheads: int = 2
    elayers: int = 4
    eunits: int = 1024
    ddim: int = 384
    dlayers: int = 4
    dunits: int = 1024
    positionwise_layer_type: str = "conv1d"  # "conv1d" | "linear"
    positionwise_conv_kernel_size: int = 9
    postnet_layers: int = 5
    postnet_filts: int = 5
    postnet_chans: int = 256
    use_masking: bool = True
    use_weighted_masking: bool = False
    use_batch_norm: bool = True
    use_scaled_pos_enc: bool = True
    encoder_normalize_before: bool = False
    decoder_normalize_before: bool = False
    encoder_concat_after: bool = False
    decoder_concat_after: bool = False
    reduction_factor: int = 1
    loss_type: str = "L1"
    transformer_init: str = "pytorch"
    transformer_warmup_steps: int = 4000
    transformer_lr: float = 1.0
    initial_encoder_alpha: float = 1.0
    initial_decoder_alpha: float = 1.0
    # the reference hardcodes 0.2 for enc/dec dropout (fastspeech.py:75-77,127-129)
    transformer_dropout_rate: float = 0.2
    postnet_dropout_rate: float = 0.5
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 256
    duration_predictor_kernel_size: int = 3
    duration_predictor_dropout_rate: float = 0.5
    variance_predictor_dropout_rate: float = 0.5
    variance_n_bins: int = 256
    # positional-encoding table length (reference core/embedding.py:31)
    max_pos_len: int = 5000
    # Pallas fused attention on the deterministic path: "auto" (TPU only),
    # "on", or "off"
    fused_attention: str = "auto"


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop parameters (reference default.yaml:109-138)."""

    accum_grad: int = 4
    grad_clip: float = 1.0
    weight_decay: float = 0.0  # reference defines 0.001 but never applies it
    epochs: int = 1000
    seed: int = 1
    use_phonemes: bool = True
    batch_size: int = 16
    melgan_vocoder: bool = False
    # local seungwonpark-format MelGAN checkpoint for validation audio and as
    # the synth/serve default; the reference instead downloads the same
    # weights from torch.hub at runtime (train_fastspeech.py:446). Empty +
    # melgan_vocoder=False -> Griffin-Lim audio.
    vocoder_checkpoint: str = ""
    save_interval: int = 1000
    chkpt_dir: str = "./checkpoints"
    log_dir: str = "./logs"
    summary_interval: int = 200
    validation_step: int = 500
    tts_max_mel_len: int = 870
    tts_bin_lengths: bool = True
    # TPU additions (no reference equivalent -- SURVEY.md 2.8):
    num_hosts: int = 1
    dp_size: int = 0  # 0 => use all visible devices
    # Megatron-over-GSPMD tensor parallelism (parallel/sharding.py): shards
    # FFT-block attention heads and FFN hidden channels over a 2nd mesh axis.
    # 1 => pure data parallelism (the right choice at 25.6M params).
    tensor_parallel: int = 1
    # Megatron-SP: with tensor_parallel > 1, also shard the FFT-block residual
    # streams' time axis over the model axis between blocks (cuts per-chip
    # activation memory in the LN/dropout/residual segments; numerics
    # unchanged). Ignored when tensor_parallel == 1.
    sequence_parallel: bool = False
    bf16: bool = False  # bf16 matmuls for speed configs; f32 for parity configs
    max_tokens: int = 192  # static phoneme-axis pad (longest LJSpeech ~180)
    # Rematerialize FFT-block activations in the backward pass
    # (jax.checkpoint per block): trades ~15% step-time FLOPs for O(num_blocks)
    # less activation memory -- the standard TPU HBM-for-FLOPs lever for
    # larger batches. Numerics unchanged. No reference equivalent.
    remat: bool = False
    # Retain only the newest N step checkpoints (0 = keep all, matching the
    # reference, which never prunes). The preemption checkpoint is never pruned.
    keep_ckpts: int = 0


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    extras: Dict[str, Any] = field(default_factory=dict)

    # -- snapshotting (equivalent of the reference's hp_str) ------------------

    def to_dict(self) -> Dict[str, Any]:
        d = {
            "data": dataclasses.asdict(self.data),
            "audio": dataclasses.asdict(self.audio),
            "model": dataclasses.asdict(self.model),
            "train": dataclasses.asdict(self.train),
        }
        if self.extras:
            d["extras"] = self.extras
        return d

    def to_yaml(self) -> str:
        """Serialize for embedding in checkpoints (== reference ``hp_str``)."""
        buf = io.StringIO()
        yaml.safe_dump(self.to_dict(), buf, sort_keys=True)
        return buf.getvalue()

    @staticmethod
    def from_yaml(s: str) -> "Config":
        """Rebuild from a checkpoint-embedded snapshot
        (== reference ``load_hparam_str``, utils/hparams.py:5-11).
        Dead-knob validation downgrades to warnings here: a trained
        checkpoint must load even if its snapshot carries one."""
        return config_from_dict(yaml.safe_load(s) or {}, strict=False)


def validate_config(cfg: Config, strict: bool = True) -> Config:
    """Reject values no code path consumes -- a knob that silently does
    nothing is worse than an error. Runs on every YAML/checkpoint load.

    The reference accepts-and-ignores all of these (``loss_type`` and the
    WaveRNN-residue audio keys appear in its default.yaml but are read
    nowhere in its tree); we fail fast on user-authored YAML. strict=False
    (checkpoint-embedded snapshots, ``Config.from_yaml``) downgrades to a
    logged warning: a trained model must stay loadable even if the config
    it was trained under carried a dead knob.
    """
    def fail(msg: str):
        if strict:
            raise ValueError(msg)
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint config: %s (ignored for loading)", msg)

    m, a = cfg.model, cfg.audio
    if m.loss_type != "L1":
        fail(f"model.loss_type={m.loss_type!r}: only 'L1' is implemented "
             "(the reference also hardcodes L1Loss regardless of this key)")
    if m.use_masking and m.use_weighted_masking:
        # not downgradable: the loss branches are contradictory
        raise ValueError(
            "model.use_masking and model.use_weighted_masking are mutually "
            "exclusive (the reference crashes with both set; ESPnet asserts "
            "exactly this)")
    if m.reduction_factor != 1:
        raise ValueError(  # shapes would be wrong: never downgradable
            f"model.reduction_factor={m.reduction_factor}: only 1 is "
            "implemented (the reference's >1 support is commented out, "
            "fastspeech.py:275-278)")
    # Unconsumed WaveRNN-residue audio keys: present for reference-config
    # compatibility at their defaults, rejected when changed (changing them
    # would silently do nothing -- no vocoder here reads raw bits/mu-law).
    defaults = AudioConfig()
    for name in ("mu_law", "bits", "min_level_db", "ref_level_db"):
        if getattr(a, name) != getattr(defaults, name):
            fail(f"audio.{name}={getattr(a, name)!r}: this key is consumed "
                 "by no code path (WaveRNN residue in the reference config "
                 "too); remove it or keep the default "
                 f"{getattr(defaults, name)!r}")
    return cfg


def _filter_fields(cls, raw: Dict[str, Any]):
    names = {f.name for f in dataclasses.fields(cls)}
    known = {k: v for k, v in raw.items() if k in names}
    unknown = {k: v for k, v in raw.items() if k not in names}
    return cls(**known), unknown


def config_from_dict(raw: Dict[str, Any], strict: bool = True) -> Config:
    """Build a Config from a (possibly reference-format) nested dict."""
    raw = dict(raw or {})
    extras: Dict[str, Any] = dict(raw.get("extras", {}))
    data, u = _filter_fields(DataConfig, raw.get("data", {}) or {})
    if u:
        extras["data"] = u
    audio, u = _filter_fields(AudioConfig, raw.get("audio", {}) or {})
    if u:
        extras["audio"] = u
    model, u = _filter_fields(ModelConfig, raw.get("model", {}) or {})
    if u:
        extras["model"] = u
    train, u = _filter_fields(TrainConfig, raw.get("train", {}) or {})
    if u:
        extras["train"] = u
    for k in raw:
        if k not in ("data", "audio", "model", "train", "extras"):
            extras[k] = raw[k]
    return validate_config(
        Config(data=data, audio=audio, model=model, train=train,
               extras=extras), strict=strict)


def load_config(path: Optional[str] = None) -> Config:
    """Load a YAML config file; with no path, return defaults.

    Accepts configs written for the reference (same section/key names);
    keys the dataclasses don't know about land in ``extras``.
    """
    if path is None:
        return Config()
    with open(path, "r", encoding="utf-8") as f:
        return config_from_dict(yaml.safe_load(f) or {})
