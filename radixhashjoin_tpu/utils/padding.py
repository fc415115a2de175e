"""Shape-bucket padding policy.

XLA compiles one program per operand shape. The engine therefore pads every
data-dependent array to the next "bucket" size (min_pad * base**k), so the
number of distinct compiled programs is logarithmic in data size and the
persistent compilation cache stays small. This replaces the reference's
malloc'd exact-size buffers (e.g. the 128 KiB result pages, Result.cpp:7-14)
with statically-shaped padded device arrays.
"""

from __future__ import annotations

import numpy as np


def bucket_size(n: int, min_pad: int = 1024, base: int = 2) -> int:
    """Smallest min_pad * base**k >= max(n, 1)."""
    size = min_pad
    n = max(int(n), 1)
    while size < n:
        size *= base
    return size


def pad_to(arr: np.ndarray, size: int, fill) -> np.ndarray:
    """Pad a 1-D array to `size` with `fill` (host-side; device pads via ops)."""
    n = len(arr)
    assert n <= size, (n, size)
    if n == size:
        return arr
    out = np.full(size, fill, dtype=arr.dtype)
    out[:n] = arr
    return out
