"""Pallas TPU kernels for the hot ops.

Kernels are gated: they engage on TPU backends (or under interpret mode
in tests) and every call site keeps an XLA fallback, so CPU runs and
odd shapes degrade gracefully.
"""

from .attention import flash_mha  # noqa: F401
