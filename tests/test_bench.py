"""bench.py's self-evidencing pieces: the analytic FLOPs model behind the
MFU numbers in BENCH_r*.json must agree with XLA's own cost analysis, and
the median/IQR helper must be correct. (The timing paths themselves run on
the real chip via the driver.)"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _median_iqr, model_flops, peak_flops_per_s  # noqa: E402


def test_analytic_flops_matches_xla_cost_analysis():
    """model_flops on dense shapes == XLA's compiled flop count (within 5%:
    XLA adds elementwise/softmax/LN flops the analytic count omits; the
    analytic count is the matmul/conv census)."""
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2

    cfg = Config()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    B, T, L = 4, 64, 448
    g = np.random.default_rng(0)
    xs = jnp.asarray(g.integers(1, 68, (B, T)), jnp.int32)
    ilens = jnp.full((B,), T, jnp.int32)

    fn = jax.jit(lambda p, s, x, il: model.inference(p, s, x, il, out_maxlen=L))
    ca = fn.lower(params, state, xs, ilens).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    xla_flops = float(ca["flops"])
    analytic = model_flops(cfg, [T] * B, [L] * B)
    assert 0.90 * xla_flops < analytic < 1.05 * xla_flops, (
        f"analytic {analytic:.3e} vs XLA {xla_flops:.3e}")


def test_analytic_flops_scales_with_true_lengths():
    """The count uses TRUE lengths (the MFU numerator is useful work): half
    the frames, well under half the FLOPs of the dense count (attention is
    quadratic in L)."""
    from fastspeech2_tpu.config import Config

    cfg = Config()
    dense = model_flops(cfg, [64] * 4, [448] * 4)
    half = model_flops(cfg, [64] * 4, [224] * 4)
    assert half < 0.55 * dense
    assert model_flops(cfg, [], []) == 0.0


def test_median_iqr():
    med, iqr = _median_iqr([1.0, 2.0, 3.0, 4.0, 100.0])  # outlier-robust
    assert med == 3.0 and iqr == 2.0
    med, iqr = _median_iqr([7.0] * 5)
    assert med == 7.0 and iqr == 0.0


def test_peak_table_cpu_is_zero():
    # on CPU there's no MFU denominator; the bench omits mfu_* rather than
    # inventing one
    if jax.default_backend() != "tpu":
        assert peak_flops_per_s() == 0.0
