"""Utilities: metrics logging, profiling, reproducibility helpers."""

from k3m_tpu.utils.metrics import MetricsLogger  # noqa: F401
from k3m_tpu.utils.profiling import profile_trace, timed  # noqa: F401
