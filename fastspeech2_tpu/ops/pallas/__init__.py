"""Pallas TPU kernels for the hot fused ops, with XLA fallbacks in ops/.

Kernels:
    attention.py -- fused masked self-attention (scores+softmax+re-zero+PV in
                    one VMEM-resident kernel; the (T,T) attention matrix never
                    touches HBM)
"""

from fastspeech2_tpu.ops.pallas.attention import fused_attention  # noqa: F401
