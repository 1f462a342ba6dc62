"""Pallas TPU kernels for the hot ops."""

from .pconv_kernel import fused_pconv_eval, pallas_enabled

__all__ = ["fused_pconv_eval", "pallas_enabled"]
