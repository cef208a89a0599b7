"""Pallas TPU kernels for the K3M hot ops (fused attention, fused
bi-directional co-attention)."""

from k3m_tpu.kernels.attention import fused_attention  # noqa: F401
from k3m_tpu.kernels.coattn import fused_biattention  # noqa: F401
