"""Fused chaining operators over a 2-D intermediate matrix.

The intermediate is one int32 matrix of shape (k, P): row j holds the rowid
column of the j-th joined slot, columns past the live count are padding.
This replaces the reference's per-slot vector-of-vectors intermediate
(intermediate.h) and lets every chaining case be a single compiled program:

  case 1  — expand_fresh_pair:   materialize pairs into a fresh 2-row matrix
  case 2  — expand_attach_fresh: replicate all existing rows by match count,
                                  attach the fresh slot as a new row
  case 3 / same-slot — eq_filter_matrix: masked stable compaction of all
                                  rows by a column-equality predicate

Fusing the gathers into the probe/expand programs minimizes dispatch count
(each dispatch is a host->device round trip; on remote transports that is
the second-order cost after readbacks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .compact import compact_mask_positions
from .join import probe_count


@jax.jit
def probe_rows(col_l, lrows, lcount, col_r, rrows, rcount):
    """probe_count over gathered column values (fused gathers)."""
    return probe_count(col_l[lrows], lcount, col_r[rrows], rcount)


@jax.jit
def probe_matrix(col_l, inter_mat, lrow_idx, lcount, col_r, rrows, rcount):
    """probe_count with the left side gathered via an intermediate row."""
    return probe_count(col_l[inter_mat[lrow_idx]], lcount,
                       col_r[rrows], rcount)


def _pair_indices(order, lo, offsets, cum, out_size):
    L = lo.shape[0]
    k = jax.lax.broadcasted_iota(jnp.int32, (out_size,), 0)
    left_of = jnp.searchsorted(cum, k, side="right").astype(jnp.int32)
    lc = jnp.minimum(left_of, np.int32(L - 1))
    within = k - offsets[lc]
    rr = order[lo[lc] + within]
    return lc, rr


@partial(jax.jit, static_argnames=("out_size",))
def expand_fresh_pair(order, lo, offsets, cum, lrows, rrows, out_size):
    """Case 1: (2, out_size) matrix of rowid pairs (intermediate.cpp:92-103)."""
    li, ri = _pair_indices(order, lo, offsets, cum, out_size)
    return jnp.stack([lrows[li], rrows[ri]])


@partial(jax.jit, static_argnames=("out_size",))
def expand_attach_fresh(order, lo, offsets, cum, inter_mat, fresh_rows,
                        out_size):
    """Case 2: replicate every intermediate row per match and append the
    fresh slot's rowids as a new matrix row (intermediate.cpp:52-66 as one
    gather program — the reference's 97.7% hotspot)."""
    li, ri = _pair_indices(order, lo, offsets, cum, out_size)
    return jnp.concatenate([inter_mat[:, li], fresh_rows[ri][None]], axis=0)


@partial(jax.jit, static_argnames=("i1", "i2"))
def eq_filter_matrix(colA, colB, inter_mat, i1: int, i2: int, count):
    """Case 3 / joined same-slot: keep intermediate columns where the two
    gathered values are equal; stable 2-D compaction. Returns
    (new_mat, new_count, nonempty_pairs) — the last is the deferred NULL
    flag source for case 3 (pair-set emptiness, Query.cpp:188-191)."""
    n = inter_mat.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    live = idx < count
    v1 = colA[inter_mat[i1]]
    v2 = colB[inter_mat[i2]]
    m = (v1 == v2) & live
    pos, cnt = compact_mask_positions(m)
    out = jnp.zeros_like(inter_mat).at[:, pos].set(inter_mat, mode="drop")
    # pair-set non-emptiness: any shared value between the live prefixes
    sv2 = jnp.sort(jnp.where(live, v2, np.int32(2**31 - 1)))
    v1m = jnp.where(live, v1, np.int32(-1))
    lo = jnp.searchsorted(sv2, v1m, side="left")
    hi = jnp.searchsorted(sv2, v1m, side="right")
    nonempty = jnp.any((hi > lo) & live)
    return out, cnt, nonempty


@jax.jit
def eq_filter_rows(colA, colB, rows, count):
    """Fresh same-slot predicate: live rowids where colA == colB
    (parse_table fresh branch, intermediate.cpp:17-25)."""
    n = rows.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    m = (colA[rows] == colB[rows]) & (idx < count)
    pos, cnt = compact_mask_positions(m)
    out = jnp.zeros_like(rows).at[pos].set(rows, mode="drop")
    return out, cnt
