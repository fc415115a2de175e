"""Fused row-filter operators over the 2-D intermediate matrix.

The intermediate is one int32 matrix of shape (k, P): row j holds the rowid
column of the j-th joined slot, columns past the live count are padding.
This replaces the reference's per-slot vector-of-vectors intermediate
(intermediate.h). The join-side chaining programs (probe/expand) live in
ops/backend.py; here are the pure row-filter cases:

  case 3 / joined same-slot — eq_filter_matrix: stable masked compaction
      of all matrix rows by a column-equality predicate
      (intermediate.cpp:72-87 / the intended semantics of the broken
      non-fresh parse_table branch, SURVEY.md §8.2)
  fresh same-slot — eq_filter_rows: live rowids where the two columns are
      equal (parse_table fresh branch, intermediate.cpp:17-25)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .compact import compact_mask_positions


@jax.jit
def eq_filter_matrix(colA, colB, inter_mat, i1, i2, count):
    """Keep intermediate columns where the two gathered values are equal.
    Returns (new_mat, new_count)."""
    n = inter_mat.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    live = idx < count
    v1 = colA[inter_mat[i1]]
    v2 = colB[inter_mat[i2]]
    m = (v1 == v2) & live
    pos, cnt = compact_mask_positions(m)
    out = jnp.zeros_like(inter_mat).at[:, pos].set(inter_mat, mode="drop")
    return out, cnt


@jax.jit
def eq_filter_rows(colA, colB, rows, count):
    """Fresh same-slot predicate: live rowids where colA == colB."""
    n = rows.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    m = (colA[rows] == colB[rows]) & (idx < count)
    pos, cnt = compact_mask_positions(m)
    out = jnp.zeros_like(rows).at[pos].set(rows, mode="drop")
    return out, cnt
