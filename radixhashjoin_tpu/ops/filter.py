"""Selection filter: strict <, >, = over a slot's live rowids.

Reference semantics: Query::run_filters (Query.cpp:81-158) scans the column
and erases non-matching rowids from a set. Here: one gather + vectorized
compare + stable compaction; NULL early-exit is the caller reading back a
zero count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .compact import compact, compact_mask_positions

import numpy as np

OP_EQ, OP_LT, OP_GT = 0, 1, 2
OP_CODE = {"=": OP_EQ, "<": OP_LT, ">": OP_GT}

# Filter constants are mapped onto the device code space by
# DeviceCatalog.encode_filter (identity narrowing, or order-preserving
# dictionary translation for wide catalogs).


@partial(jax.jit, static_argnames=("op",))
def filter_live(rowids: jax.Array, count: jax.Array, col: jax.Array,
                value, op: int):
    """Narrow live rowids to those whose `col` value satisfies (op, value).

    rowids: padded int32 rowid array; count: live prefix length;
    col: full device column (int32); value: int32 constant.
    Returns (new_rowids padded, new_count).
    """
    n = rowids.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    vals = col[rowids]
    if op == OP_EQ:
        m = vals == value
    elif op == OP_LT:
        m = vals < value
    else:
        m = vals > value
    m = m & (idx < count)
    pos, new_count = compact_mask_positions(m)
    return compact(rowids, pos), new_count


@partial(jax.jit, static_argnames=("op", "pad"))
def filter_full(col: jax.Array, count, value, op: int, pad: int):
    """First filter on a pristine slot: scan the column directly (no rowid
    gather — the live set is still the identity). Returns (rowids padded
    to `pad`, new_count)."""
    n = col.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    if op == OP_EQ:
        m = col == value
    elif op == OP_LT:
        m = col < value
    else:
        m = col > value
    m = m & (idx < count)
    pos, new_count = compact_mask_positions(m)
    rows = compact(idx, pos)
    if pad > n:
        rows = jnp.pad(rows, (0, pad - n))
    else:
        rows = rows[:pad]
    return rows, new_count
