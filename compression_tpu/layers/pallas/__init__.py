"""Pallas TPU kernels: hand-fused fast paths behind the standard layer APIs."""

from compression_tpu.layers.pallas.gdn_kernel import fused_gdn

__all__ = ["fused_gdn"]
