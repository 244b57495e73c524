"""Neural vocoder stage (downstream of text->mel, per BASELINE.json).

The reference pulls its vocoders from torch.hub at runtime — MelGAN in the
CLI (``train_fastspeech.py:446``, ``inference.py:183``) and MelGAN or NVIDIA
WaveGlow in the demo notebook (``demo_fastspeech2.ipynb``). Here both are JAX
implementations with translators for those torch checkpoint formats;
``load_vocoder`` sniffs which family a checkpoint belongs to.
"""

from fastspeech2_tpu.vocoder.melgan import (  # noqa: F401
    MelGANConfig,
    MelGANGenerator,
    init_melgan,
    load_melgan,
    load_melgan_params,
    melgan_params_from_torch,
)
from fastspeech2_tpu.vocoder.waveglow import (  # noqa: F401
    WaveGlow,
    WaveGlowConfig,
    init_waveglow,
    load_waveglow,
    load_waveglow_params,
    waveglow_params_from_torch,
)


def detect_vocoder_kind(path: str) -> str:
    """'melgan' | 'waveglow' from a torch checkpoint's key names (WaveGlow
    carries WN.{k}./convinv.{k}. modules; MelGAN a generator Sequential)."""
    import torch

    try:  # meta: key names without materializing weights
        obj = torch.load(path, map_location="meta", weights_only=False)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "waveglow", "model_g", "generator"):
        if isinstance(obj, dict) and key in obj and obj[key] is not None:
            inner = obj[key]
            if isinstance(inner, dict):
                obj = inner
            elif hasattr(inner, "state_dict"):
                # NVIDIA train-style layout: a pickled nn.Module under the key
                obj = inner.state_dict()
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    keys = " ".join(obj.keys()) if isinstance(obj, dict) else ""
    return "waveglow" if ("WN." in keys or "convinv." in keys) else "melgan"


def load_vocoder(path: str, kind: str = "auto", **kw):
    """Load either vocoder family as a ``(L, n_mels) log-mel -> (L*hop,)
    waveform`` callable for ``infer.synthesize.vocode``."""
    if kind == "auto":
        kind = detect_vocoder_kind(path)
    if kind == "waveglow":
        return load_waveglow(path, **kw)
    return load_melgan(path, **kw)
