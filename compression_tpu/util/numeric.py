"""Small numeric helpers shared by the codec hot paths."""

from __future__ import annotations

import numpy as np

__all__ = ["slim_int"]


def slim_int(values: np.ndarray) -> np.ndarray:
    """Narrowest integer dtype that exactly holds ``values``.

    The decoded-symbol upload is on the host->device critical path of every
    codec; int8 is a 4x smaller transfer than the coder's int32. Falls back
    to the input dtype unchanged when the values don't fit int16.
    """
    if values.size:
        lo, hi = values.min(), values.max()
        if -128 <= lo and hi <= 127:
            return values.astype(np.int8)
        if -32768 <= lo and hi <= 32767:
            return values.astype(np.int16)
    return values
