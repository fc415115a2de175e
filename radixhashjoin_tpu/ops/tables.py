"""Message-table build (weighted bincount) and lookup kernels.

The factorized executor's two hot primitives are

    build:  B = zeros(n_bins).at[idxs].add(weights)   (weighted bincount)
    lookup: g = B[keys]                               (table gather)

XLA lowers the non-unique-index scatter at a fixed ~110 M updates/s and
the gather at a fixed ~9 ns/element on a v5e (EVIDENCE_r02.md), both far
below HBM speed-of-light — they are fixed-function engines, not
bandwidth-bound ops. Three alternatives, each exact:

* `weighted_bincount_sorted` — ONE carrying sort groups (idx, weight)
  pairs (jnp.argsort measured 549 M keys/s, 5x the scatter engine), a
  wrapped int32 cumsum + per-bin boundary differences reconstruct the
  table with NO scatter at all. Exact: true per-bin sums < 2**31 (the
  planner's overflow caps), and differences of a mod-2**32 prefix sum
  recover any sum < 2**31 exactly.
* `weighted_bincount_onehot` — Pallas TPU kernel, the weighted
  generalization of ops/pallas_radix.py's one-hot histogram (867 M
  tuples/s at 256 bins): each 2048-value block accumulates
  sum(weight * (idx == bin)) over bin tiles in VMEM. Compute scales
  linearly with n_bins, so this wins only for narrow tables.
* `table_gather_onehot` — MXU lookup: g = onehot(keys) @ stack(B_lo,
  B_hi) in float32, two 16-bit limbs recombined on the VPU. Exact: each
  limb < 2**16 is exactly representable in f32, each one-hot row has
  exactly one nonzero, and f32 addition of one nonzero term is exact.
  Compute scales with n_bins — small-table fast path (the r2 microbench
  measured 2.4x the gather engine at <= 1K entries).

`scatter_table` / `table_gather` dispatch by an `impl` string; "auto"
picks from the committed measurements (scripts/bench_tables.py) by
backend, table width, and row count. All variants drop out-of-range
indices (the wave's mask sentinel) like `.at[].add(mode="drop")`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---- tuned thresholds (measured on v5e 2026-08-19, 16.7M rows,
# scripts/bench_tables.py; committed in EVIDENCE_r03.md) ----
#
#   scatter  512 bins: onehot 1273 M/s vs xla 136 M/s  (9.4x)
#           1024 bins: onehot  339 M/s vs xla 137 M/s  (2.5x)
#           2048 bins: onehot  134 M/s vs xla 191 M/s  (xla wins)
#           sorted: 58-77 M/s everywhere (the carrying sort + boundary
#           searchsorted never beats the ~190 M/s scatter engine; kept
#           as a verified alternative)
#   gather   256 bins: onehot below measurement floor vs xla 120 M/s
#           1024 bins: onehot 1317 M/s vs xla 191 M/s  (6.9x)
#           4096 bins: onehot  138 M/s vs xla 141 M/s  (breakeven)

ONEHOT_SCATTER_MAX_BINS = 1024
ONEHOT_GATHER_MAX_BINS = 2048
# enough rows to amortize kernel setup; below this the XLA engines are
# already sub-millisecond and dispatch overhead dominates either way
ONEHOT_MIN_ROWS = 1 << 16

BLOCK_ROWS = 16
LANES = 128
_BLOCK = BLOCK_ROWS * LANES
_BIN_TILE = 256


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---- scatter (weighted bincount) ----

def weighted_bincount_xla(idxs, weights, n_bins: int):
    """Reference implementation: XLA scatter-add, out-of-range dropped."""
    return jnp.zeros(n_bins, jnp.int32).at[idxs].add(weights, mode="drop")


def weighted_bincount_sorted(idxs, weights, n_bins: int):
    """Scatter-free weighted bincount: one carrying sort + wrapped-cumsum
    boundary differences.

    jax.lax.sort carries the weights through the key sort (no separate
    permutation gather); bin b's sum = cum[first >= b+1] - cum[first >= b]
    via ONE searchsorted of the n_bins+1 bin edges. int32 cumsum wraps
    mod 2**32, but each true bin sum < 2**31 (caller-guaranteed: the
    factorized planner's overflow caps), so the wrapped difference is
    exact. Out-of-range idxs sort past the last boundary and drop."""
    sk, sw = jax.lax.sort((idxs, weights), num_keys=1)
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(sw.astype(jnp.int32))])
    edges = jnp.arange(n_bins + 1, dtype=sk.dtype)
    bounds = jnp.searchsorted(sk, edges, side="left",
                              method="sort").astype(jnp.int32)
    return cum[bounds[1:]] - cum[bounds[:-1]]


def _whist_kernel(n_bins, idx_ref, w_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idxs = idx_ref[:]
    ws = w_ref[:]

    def tile(t, _):
        base = t * _BIN_TILE
        bins = base + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_ROWS, LANES, _BIN_TILE), 2)
        onehot = (idxs[:, :, None] == bins).astype(jnp.int32)
        part = jnp.sum(onehot * ws[:, :, None], axis=(0, 1))
        out_ref[0, pl.ds(base, _BIN_TILE)] += part
        return 0

    jax.lax.fori_loop(0, n_bins // _BIN_TILE, tile, 0)


@partial(jax.jit, static_argnames=("n_bins", "interpret"))
def weighted_bincount_onehot(idxs, weights, n_bins: int,
                             interpret: bool = False):
    """Pallas TPU weighted bincount: per-block one-hot accumulation over
    _BIN_TILE-wide bin windows in VMEM (the weighted generalization of
    ops/pallas_radix.py's histogram — /root/reference/structs.cpp:111-121
    at kernel level). Out-of-range idxs match no bin. Caller guarantees
    per-bin totals < 2**31 (weights nonnegative)."""
    n = idxs.shape[0]
    if n % _BLOCK:
        pad = _BLOCK - n % _BLOCK
        idxs = jnp.pad(idxs, (0, pad), constant_values=-1)
        weights = jnp.pad(weights, (0, pad))
        n = idxs.shape[0]
    bins_padded = -(-n_bins // _BIN_TILE) * _BIN_TILE
    grid = n // _BLOCK
    out = pl.pallas_call(
        partial(_whist_kernel, bins_padded),
        grid=(grid,),
        in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bins_padded), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, bins_padded), jnp.int32),
        interpret=interpret,
    )(idxs.reshape(grid * BLOCK_ROWS, LANES),
      weights.reshape(grid * BLOCK_ROWS, LANES))
    return out[0, :n_bins]


def scatter_table(idxs, weights, n_bins: int, impl: str = "xla"):
    """Dispatch B = zeros(n_bins).at[idxs].add(weights, mode='drop')."""
    if impl == "auto":
        impl = ("onehot" if _on_tpu()
                and n_bins <= ONEHOT_SCATTER_MAX_BINS
                and idxs.shape[0] >= ONEHOT_MIN_ROWS else "xla")
    if impl == "sorted":
        return weighted_bincount_sorted(idxs, weights, n_bins)
    if impl == "onehot":
        return weighted_bincount_onehot(idxs, weights, n_bins,
                                        interpret=not _on_tpu())
    return weighted_bincount_xla(idxs, weights, n_bins)


# ---- gather (table lookup) ----

def table_gather_onehot(table, keys):
    """Exact MXU table lookup: one-hot(keys) @ [lo16, hi16] limbs in f32.

    Each limb < 2**16 is exact in f32; a one-hot row has exactly one
    nonzero, so the matmul performs no inexact additions. Wins only for
    narrow tables (compute scales with table length)."""
    n_bins = table.shape[0]
    limbs = jnp.stack([(table & 0xFFFF).astype(jnp.float32),
                       (table >> 16).astype(jnp.float32)], axis=1)
    onehot = (keys[:, None] == jnp.arange(n_bins, dtype=keys.dtype)
              ).astype(jnp.float32)
    # HIGHEST precision: TPU default demotes f32 matmuls to bf16 passes,
    # which rounds limbs >= 2**8 — exactness requires true f32 products
    g = jax.lax.dot_general(onehot, limbs, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    return (g[:, 0].astype(jnp.int32)
            + (g[:, 1].astype(jnp.int32) << 16))


def table_gather(table, keys, impl: str = "xla"):
    """Dispatch g = table[keys] (keys always in range by the factorized
    planner's width construction)."""
    if impl == "auto":
        impl = ("onehot" if _on_tpu()
                and table.shape[0] <= ONEHOT_GATHER_MAX_BINS
                and keys.shape[0] >= ONEHOT_MIN_ROWS else "xla")
    if impl == "onehot":
        return table_gather_onehot(table, keys)
    return table[keys]
