"""SUM projection: exact u64 aggregation over the final intermediate rows.

Reference: column_proj (Query.cpp:66-74) — scalar loop summing
rel.values[col][rowid] with multiplicity. Here: one gather + masked limb
reduction (utils/limbs.py); the host combines the small partial vector into
an exact (wrapping) u64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.limbs import CHUNK, combine_limb_partials, fold_partials


@jax.jit
def _gather_partials(col: jax.Array, rows: jax.Array, count: jax.Array):
    n = rows.shape[0]
    assert n % CHUNK == 0, n
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    vals = jnp.where(idx < count, col[rows], 0)
    lo = vals & 0xFFFF
    hi = vals >> 16
    lo_p = lo.reshape(n // CHUNK, CHUNK).sum(axis=1, dtype=jnp.int32)
    hi_p = hi.reshape(n // CHUNK, CHUNK).sum(axis=1, dtype=jnp.int32)
    return fold_partials(jnp.stack([lo_p, hi_p]))


@jax.jit
def gather_partials_matrix(col: jax.Array, mat: jax.Array, row_idx,
                           count: jax.Array):
    """_gather_partials with the rows taken from an intermediate-matrix row."""
    return _gather_partials(col, mat[row_idx], count)


def sum_column_over_rows(col: jax.Array, rows: jax.Array, count) -> int:
    """Exact u64 sum of col[rows[:count]] (device reduce + host combine)."""
    partials = _gather_partials(col, rows, count)
    return combine_limb_partials(np.asarray(partials))
