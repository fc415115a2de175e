"""Utilities: shape-bucket padding policy, exact u64 limb sums, primes."""

from .padding import bucket_size, pad_to
from .limbs import sum_u32_exact, combine_limb_partials

__all__ = ["bucket_size", "pad_to", "sum_u32_exact", "combine_limb_partials"]
