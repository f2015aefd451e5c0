"""Shape bucketing to avoid jit recompiles across pipeline stages.

Observation/track counts change after every filter pass; padding them to
geometric buckets (25% growth) makes repeated solver calls hit the jit
cache instead of recompiling the large BA/GP graphs (minutes each through
the TPU remote-compile path). Padded rows carry zero weight and index 0,
making them exact no-ops in every segment reduction.
"""

from __future__ import annotations

import numpy as np


def bucket_size(n: int, min_size: int = 256) -> int:
    """Smallest value >= n in the series {min_size * (1.25^k rounded to
    multiples of 128)}."""
    if n <= min_size:
        return min_size
    size = float(min_size)
    while size < n:
        size *= 1.25
    return int(np.ceil(size / 128.0) * 128)


def pad_axis0(a: np.ndarray, n: int, fill=0):
    pad = n - a.shape[0]
    if pad <= 0:
        return a
    width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, width, constant_values=fill)
