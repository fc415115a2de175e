"""Join backend selection: dense direct-address vs sort+searchsorted.

Both backends share the (order, lo, offsets, cum, total) probe contract
and the (li, ri) expansion contract; the executor picks one per engine
from the catalog's global value domain:

  dense — bounded key domain (ops/join_dense.py): scatter-add table,
          O(1) lookups, scatter-max/cummax expansion. The fast path for
          contest-shaped data (values < 2**18).
  sort  — domain-oblivious (ops/join.py): argsort + binary search.
          Skew-proof fallback, always correct.

The fused wrappers below also gather the inputs (rowids -> values) inside
the same compiled program to keep dispatch counts low.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .join import any_common, expand_pairs, probe_count
from .join_dense import dense_any_common, dense_expand, dense_probe


# ---- fused sort-backend wrappers ----

@jax.jit
def _probe_rows_sort(col_l, lrows, lcount, col_r, rrows, rcount):
    return probe_count(col_l[lrows], lcount, col_r[rrows], rcount)


@jax.jit
def _probe_matrix_sort(col_l, mat, lrow, lcount, col_r, rrows, rcount):
    return probe_count(col_l[mat[lrow]], lcount, col_r[rrows], rcount)


@partial(jax.jit, static_argnames=("out_size",))
def _expand_pair_sort(order, lo, off, cum, lrows, rrows, out_size):
    li, ri = expand_pairs(order, lo, off, cum, out_size)
    return jnp.stack([lrows[li], rrows[ri]])


@partial(jax.jit, static_argnames=("out_size",))
def _expand_attach_sort(order, lo, off, cum, mat, fresh_rows, out_size):
    li, ri = expand_pairs(order, lo, off, cum, out_size)
    return jnp.concatenate([mat[:, li], fresh_rows[ri][None]], axis=0)


@jax.jit
def _any_common_matrix_sort(colA, colB, mat, i1, i2, count):
    return any_common(colA[mat[i1]], colB[mat[i2]], count)


# ---- fused dense-backend wrappers ----

@partial(jax.jit, static_argnames=("domain",))
def _probe_rows_dense(col_l, lrows, lcount, col_r, rrows, rcount, domain):
    return dense_probe(col_l[lrows], lcount, col_r[rrows], rcount, domain)


@partial(jax.jit, static_argnames=("domain",))
def _probe_matrix_dense(col_l, mat, lrow, lcount, col_r, rrows, rcount,
                        domain):
    return dense_probe(col_l[mat[lrow]], lcount, col_r[rrows], rcount, domain)


@partial(jax.jit, static_argnames=("out_size",))
def _expand_pair_dense(order, lo, off, cum, lrows, rrows, out_size):
    li, ri = dense_expand(order, lo, off, cum, out_size)
    return jnp.stack([lrows[li], rrows[ri]])


@partial(jax.jit, static_argnames=("out_size",))
def _expand_attach_dense(order, lo, off, cum, mat, fresh_rows, out_size):
    li, ri = dense_expand(order, lo, off, cum, out_size)
    return jnp.concatenate([mat[:, li], fresh_rows[ri][None]], axis=0)


@partial(jax.jit, static_argnames=("domain",))
def _any_common_matrix_dense(colA, colB, mat, i1, i2, count, domain):
    return dense_any_common(colA[mat[i1]], colB[mat[i2]], count, domain)


class JoinBackend:
    """Uniform interface over the two join formulations."""

    def __init__(self, kind: str, domain: int = 0):
        assert kind in ("dense", "sort"), kind
        self.kind = kind
        self.domain = domain

    def probe_rows(self, col_l, lrows, lcount, col_r, rrows, rcount):
        if self.kind == "dense":
            return _probe_rows_dense(col_l, lrows, lcount, col_r, rrows,
                                     rcount, self.domain)
        return _probe_rows_sort(col_l, lrows, lcount, col_r, rrows, rcount)

    def probe_matrix(self, col_l, mat, lrow, lcount, col_r, rrows, rcount):
        if self.kind == "dense":
            return _probe_matrix_dense(col_l, mat, lrow, lcount, col_r,
                                       rrows, rcount, self.domain)
        return _probe_matrix_sort(col_l, mat, lrow, lcount, col_r, rrows,
                                  rcount)

    def expand_fresh_pair(self, order, lo, off, cum, lrows, rrows, out_size):
        f = _expand_pair_dense if self.kind == "dense" else _expand_pair_sort
        return f(order, lo, off, cum, lrows, rrows, out_size)

    def expand_attach_fresh(self, order, lo, off, cum, mat, fresh_rows,
                            out_size):
        f = (_expand_attach_dense if self.kind == "dense"
             else _expand_attach_sort)
        return f(order, lo, off, cum, mat, fresh_rows, out_size)

    def any_common_matrix(self, colA, colB, mat, i1, i2, count):
        if self.kind == "dense":
            return _any_common_matrix_dense(colA, colB, mat, i1, i2, count,
                                            self.domain)
        return _any_common_matrix_sort(colA, colB, mat, i1, i2, count)
