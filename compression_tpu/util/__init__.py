"""Utilities: bitstream containers, image IO, metrics."""

from compression_tpu.util.packed_tensors import PackedTensors

__all__ = ["PackedTensors"]
