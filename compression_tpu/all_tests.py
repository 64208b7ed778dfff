"""Post-install smoke test: runs the full pytest suite.

Role of the reference's test aggregator (reference: tensorflow_compression/
all_tests.py): `python -m compression_tpu.all_tests` after a pip install
verifies the package (including the on-demand native codec build) works in
the target environment.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    import pytest

    tests_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tests")
    if not os.path.isdir(tests_dir):
        # Installed package without the repo tree: run the import + codec
        # smoke path only.
        import numpy as np

        import compression_tpu as tpc
        from compression_tpu.codec import host

        cdf = host.pmf_to_quantized_cdf(
            np.array([[0.5, 0.3, 0.2]]), np.array([3], np.int32), 12
        )
        strings = host.entropy_encode(
            np.array([[0, 1, 2, 1]], np.int32),
            np.zeros((1, 4), np.int32),
            cdf, np.array([4], np.int32), np.zeros(1, np.int32), 12,
        )
        back = host.entropy_decode(
            strings, np.zeros((1, 4), np.int32), cdf,
            np.array([4], np.int32), np.zeros(1, np.int32), 12,
        )
        assert back.tolist() == [[0, 1, 2, 1]]
        print(f"compression_tpu {tpc.__version__}: smoke test OK")
        return 0
    return pytest.main([tests_dir, "-q"])


if __name__ == "__main__":
    sys.exit(main())
