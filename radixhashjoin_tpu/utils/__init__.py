"""Utilities: shape-bucket padding policy, exact u64 limb sums, primes,
per-operator roofline profiling."""

from .padding import bucket_size, pad_to
from .limbs import (sum_u32_exact, combine_limb_partials, weighted_partials,
                    combine_weighted_partials)
from .primes import is_prime, next_prime, next_pow2, pow2
from .profiling import OpProfiler, arr_bytes

__all__ = ["bucket_size", "pad_to", "sum_u32_exact", "combine_limb_partials",
           "weighted_partials", "combine_weighted_partials", "is_prime",
           "next_prime", "next_pow2", "pow2", "OpProfiler", "arr_bytes"]
