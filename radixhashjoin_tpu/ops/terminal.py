"""Factorized terminal-join aggregation (dense backend).

The LAST join of a query never needs materializing: projections over the
would-be expanded intermediate factor into
  * existing slot s:  sum_e col_s[row_e] * match_count_e        (weighted sum)
  * fresh slot:       sum_e T[key_e],  T[v] = sum of the fresh projection
                      column over live fresh rows with join-key v
                      (a dense scatter-add table, like the probe's count
                      table but accumulating values)

This removes the single largest cost of the workload — the reference
spends 97.7% of its runtime materializing exactly these rows
(change_intermediate, intermediate.cpp:52-66; 20.8M output rows on the
small workload) — and the TPU engine now never allocates them either.
NULL detection (empty pair set, Query.cpp:188-191) becomes a deferred
device flag (total == 0), so terminal joins also need no host readback.

Value-table limbs are 11 bits (3 channels): exact while no single join
key has more than ~2**20 duplicate rows on the fresh side; the engine
falls back to materializing execution for the sort backend (unbounded
domains), which has no such bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.limbs import fold_partials, weighted_partials
from ..utils.limbs import _rowsum


def _dense_counts(lv, icount, rv, rcount, domain):
    """counts[i] = multiplicity of lv[i] among live rv; masked lanes 0."""
    L, R = lv.shape[0], rv.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
    rvm = jnp.where(ri < rcount, rv, np.int32(domain))
    t_cnt = jnp.zeros(domain, jnp.int32).at[rvm].add(1, mode="drop")
    lvm = jnp.where(li < icount, lv, np.int32(-1))
    counts = jnp.where(lvm >= 0, t_cnt[jnp.clip(lvm, 0, domain - 1)], 0)
    return counts, lvm


@partial(jax.jit, static_argnames=("domain",))
def terminal_probe_matrix(col_full, mat, row_idx, icount,
                          col_fresh_join, fresh_rows, fresh_cnt, domain):
    """Terminal case 2: (counts, lvm, total) with the full side an
    intermediate-matrix row. total==0 is the deferred NULL flag source."""
    counts, lvm = _dense_counts(col_full[mat[row_idx]], icount,
                                col_fresh_join[fresh_rows], fresh_cnt,
                                domain)
    return counts, lvm, jnp.sum(counts)


@partial(jax.jit, static_argnames=("domain",))
def terminal_probe_rows(col_l, lrows, lcount,
                        col_fresh_join, fresh_rows, fresh_cnt, domain):
    """Terminal case 1: full side is a live rowid set."""
    counts, lvm = _dense_counts(col_l[lrows], lcount,
                                col_fresh_join[fresh_rows], fresh_cnt,
                                domain)
    return counts, lvm, jnp.sum(counts)


@jax.jit
def terminal_sum_existing_matrix(col, mat, row_idx, counts, icount):
    """sum col[mat[row_idx][e]] * counts[e] over live rows (5-channel
    weighted limb partials; combine_weighted_partials on host)."""
    return weighted_partials(col[mat[row_idx]], counts, icount)


@jax.jit
def terminal_sum_existing_rows(col, rows, counts, count):
    return weighted_partials(col[rows], counts, count)


# fresh-side: 11-bit limb channels for the value tables
_L0, _L1 = 11, 11
_STAGE1 = 16          # first-stage chunk: gathered entries < 2**27


def _fresh_sum_body(col_proj, col_join, fresh_rows, fresh_cnt,
                    lvm, icount, domain):
    """Traceable body of terminal_sum_fresh (shared with the fused op)."""
    R = fresh_rows.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
    live_r = ri < fresh_cnt
    key = jnp.where(live_r, col_join[fresh_rows], np.int32(domain))
    pv = jnp.where(live_r, col_proj[fresh_rows], 0)
    limbs = [pv & 0x7FF, (pv >> _L0) & 0x7FF, pv >> (_L0 + _L1)]

    L = lvm.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
    live_l = (li < icount) & (lvm >= 0)
    lv_safe = jnp.clip(lvm, 0, domain - 1)

    outs = []
    for limb in limbs:
        t = jnp.zeros(domain, jnp.int32).at[key].add(limb, mode="drop")
        g = jnp.where(live_l, t[lv_safe], 0)          # entries < 2**27
        s1 = g.reshape(L // _STAGE1, _STAGE1).sum(axis=1, dtype=jnp.int32)
        m = s1.shape[0]
        c2 = min(1024, m)
        lo = (s1 & 0xFFFF).reshape(m // c2, c2).sum(axis=1, dtype=jnp.int32)
        hi = (s1 >> 16).reshape(m // c2, c2).sum(axis=1, dtype=jnp.int32)
        outs.append(jnp.stack([lo, hi]))
    return fold_partials(jnp.stack(outs))


@partial(jax.jit, static_argnames=("domain",))
def terminal_sum_fresh(col_proj, col_join, fresh_rows, fresh_cnt,
                       lvm, icount, domain):
    """sum over existing rows e of T[lvm[e]] where T[v] = sum of
    col_proj over live fresh rows with col_join == v.

    Returns (3, 2, 2) folded int32 partials; combine with
    combine_fresh_partials on the host."""
    return _fresh_sum_body(col_proj, col_join, fresh_rows, fresh_cnt,
                           lvm, icount, domain)


def _fresh_sum_weighted(col_proj, col_join, fresh_rows, fresh_cnt,
                        lvm, weights, icount, domain):
    """sum over existing rows e of weights[e] * T[lvm[e]] — the
    multiplicity-weighted fresh-side reduction (used when a deferred
    middle attach left a `mult` row). Returns (3, 5, 2) folded int32
    partials (per 11-bit T channel, weighted_partials layout)."""
    R = fresh_rows.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
    live_r = ri < fresh_cnt
    key = jnp.where(live_r, col_join[fresh_rows], np.int32(domain))
    pv = jnp.where(live_r, col_proj[fresh_rows], 0)
    limbs = [pv & 0x7FF, (pv >> _L0) & 0x7FF, pv >> (_L0 + _L1)]
    L = lvm.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
    live_l = (li < icount) & (lvm >= 0)
    lv_safe = jnp.clip(lvm, 0, domain - 1)
    outs = []
    for limb in limbs:
        t = jnp.zeros(domain, jnp.int32).at[key].add(limb, mode="drop")
        g = jnp.where(live_l, t[lv_safe], 0)          # entries < 2**27
        outs.append(weighted_partials(g, weights, icount))
    return jnp.stack(outs)


def combine_fresh_w_partials(partials: np.ndarray) -> int:
    """Host combiner for _fresh_sum_weighted output (3, 5, 2) folded."""
    from ..utils.limbs import combine_weighted_partials
    p = np.asarray(partials)
    total = 0
    for c, shift in enumerate((0, _L0, _L0 + _L1)):
        total += combine_weighted_partials(p[c]) << shift
    return total & _U64_MASK


@partial(jax.jit, static_argnames=("plan", "domain"))
def terminal_join_and_project(ex_source, icount, fresh_rows, fresh_cnt,
                              col_full, col_join_fresh, proj_cols,
                              plan, domain, mult=None):
    """ONE compiled program for the whole terminal join: dense count probe
    + every projection's reduction. Dispatch count is the dominant cost of
    the workload on a remote-attached chip (~2-7 ms per call), so the
    final join costs one dispatch instead of 1 + #projections.

    plan (static): (ex_kind, full_row, proj_specs) where ex_kind is
    "mat"/"rows", full_row indexes the intermediate matrix row holding the
    full side's rowids (ignored for "rows"), and proj_specs is a tuple of
    ("fresh",) | ("mat", row) | ("rows",) aligned with proj_cols.

    `mult` (optional): per-existing-row multiplicity from a deferred
    middle attach; weighted sums then use counts*mult (bounded by the
    final row count < 2**31) and fresh sums become mult-weighted
    ("fresh_w" partials).

    Returns (empty, tuple of per-projection partials) — `empty` (device
    bool) is the deferred NULL flag, computed wrap-proof via any(counts>0)
    because the factorized pair count routinely exceeds int32 (that is the
    point of factorizing); partial kinds are "fresh"/"fresh_w"/"weighted"
    per spec and mult. Exactness bound with `mult`: no single existing row
    may contribute >= 2**31 final rows (counts*mult is an int32 product).
    """
    ex_kind, full_row, proj_specs = plan
    if ex_kind == "mat":
        lv = col_full[ex_source[full_row]]
    else:
        lv = col_full[ex_source]
    counts, lvm = _dense_counts(lv, icount, col_join_fresh[fresh_rows],
                                fresh_cnt, domain)
    empty = ~jnp.any(counts > 0)
    weight = counts if mult is None else counts * mult
    outs = []
    for spec, col in zip(proj_specs, proj_cols):
        if spec[0] == "fresh":
            if mult is None:
                outs.append(_fresh_sum_body(col, col_join_fresh, fresh_rows,
                                            fresh_cnt, lvm, icount, domain))
            else:
                outs.append(_fresh_sum_weighted(col, col_join_fresh,
                                                fresh_rows, fresh_cnt, lvm,
                                                mult, icount, domain))
        elif spec[0] == "mat":
            outs.append(weighted_partials(col[ex_source[spec[1]]], weight,
                                          icount))
        else:  # "rows"
            outs.append(weighted_partials(col[ex_source], weight, icount))
    return empty, tuple(outs)


_U64_MASK = (1 << 64) - 1


def combine_fresh_partials(partials: np.ndarray) -> int:
    """Host combiner for terminal_sum_fresh output (3, 2, 2) folded."""
    p = np.asarray(partials)
    total = 0
    for c, shift in enumerate((0, _L0, _L0 + _L1)):
        total += ((_rowsum(p[c, 0]) + (_rowsum(p[c, 1]) << 16)) << shift)
    return total & _U64_MASK
