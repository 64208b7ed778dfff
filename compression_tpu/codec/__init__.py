"""Native entropy-coding codec: C++ range coder + CDF quantization.

Layout:
  cc/          — the C++17 library (normative bitstream spec in tpc_codec.cc)
  binding.py   — ctypes loader (compiles the .so on demand)
  host.py      — batched NumPy-facing API (the models' fast path)
  _numpy_ref.py— pure-NumPy executable spec, fuzz-tested against the C++
  jax_ops.py   — jax.pure_callback wrappers for fully-jitted pipelines
  xla_cdf.py   — PMF->CDF quantization in pure XLA (on-device table builds)
"""

from compression_tpu.codec.xla_cdf import pmf_to_quantized_cdf_xla
from compression_tpu.codec.host import (
    encode_capacity,
    entropy_decode,
    entropy_encode,
    pmf_to_quantized_cdf,
    run_length_gamma_decode,
    run_length_gamma_encode,
)

__all__ = [
    "encode_capacity",
    "entropy_encode",
    "entropy_decode",
    "pmf_to_quantized_cdf",
    "pmf_to_quantized_cdf_xla",
    "run_length_gamma_encode",
    "run_length_gamma_decode",
]
