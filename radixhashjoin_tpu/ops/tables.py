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
* `weighted_bincount_mxu` — MXU build: B_k = onehot(idx)^T @ 7-bit
  weight limbs in int8 with s32 accumulation (limbs 0..127 cannot
  sign-wrap, and per-bin limb sums inherit the caller's < 2**31 cap),
  recombined with shifts. Measured 24 G updates/s at 1024 bins (178x
  the scatter engine), 1.1 G at 2048; compute scales with n_bins.
* `weighted_bincount_onehot` — Pallas VPU kernel, the weighted
  generalization of ops/pallas_radix.py's one-hot histogram: each
  2048-value block accumulates sum(weight * (idx == bin)) over bin
  tiles in VMEM. Measured 1.3 G updates/s at 512 bins but 50x slower
  than the MXU build at 1024 — kept as a verified alternative.
* `table_gather_onehot` — MXU lookup: g = onehot(keys) @ four 8-bit
  limbs in int8 with s32 accumulation. Exact: each one-hot row has
  exactly one nonzero, so every output column is a single (possibly
  sign-wrapped) limb, recovered by masking to 8 bits. Compute scales
  with n_bins — small-table fast path, measured 32x the gather engine
  at 2048 bins.

`scatter_table` / `table_gather` dispatch by an `impl` string; "auto"
picks from the committed measurements (scripts/bench_tables.py) by
backend, table width, and row count. All variants drop out-of-range
indices (the wave's mask sentinel) like `.at[].add(mode="drop")`.

MEASUREMENT CAVEAT (r5): the r2/r3-era rates quoted in docstrings
below were taken with block_until_ready-based timing, which the axon
transport can satisfy WITHOUT waiting — treat them as upper bounds.
The r5 readback-forced re-measurements (EVIDENCE_r05) are the
authoritative numbers for the sorted/presorted hier kernels: gather
339 M elem/s and build 295 M updates/s at 2^20 bins vs the engines'
116/150 M. The narrow-table MXU breakevens keep their r3 thresholds
until re-certified the same way (scripts/bench_tables.py now uses the
robust timer).
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
#   scatter (int8 MXU; the Pallas VPU one-hot peaked at 1.27 G/s at 512
#   bins and 423 M/s at 1024 — superseded):
#            512 bins: mxu below floor      vs xla 132 M/s
#           1024 bins: mxu 24412 M/s        vs xla 132 M/s  (178x)
#           2048 bins: mxu  1139 M/s        vs xla 180 M/s  (6.3x)
#           4096 bins: mxu   394 M/s        vs xla 182 M/s  (2.2x)
#           8192 bins: mxu   165 M/s        vs xla 181 M/s  (xla wins)
#           sorted: 58-81 M/s everywhere (the carrying sort + boundary
#           searchsorted never beats the ~190 M/s scatter engine; kept
#           as a verified alternative)
#   gather (int8 4-limb MXU; the f32-HIGHEST 2-limb variant it replaced
#   measured 4x slower):
#           1024 bins: onehot below floor    vs xla 193 M/s
#           2048 bins: onehot 4582 M/s       vs xla 142 M/s  (32x)
#           4096 bins: onehot  481 M/s       vs xla 142 M/s  (3.4x)
#           8192 bins: onehot  173 M/s       vs xla 141 M/s  (1.2x)
#          16384 bins: onehot   71 M/s       vs xla 141 M/s  (xla wins)

MXU_SCATTER_MAX_BINS = 4096
ONEHOT_GATHER_MAX_BINS = 8192
# enough rows to amortize kernel setup; below this the XLA engines are
# already sub-millisecond and dispatch overhead dominates either way
ONEHOT_MIN_ROWS = 1 << 16

# device kinds whose MXU-vs-fixed-function-engine breakevens were
# actually measured (v5e, 2026-08-19, scripts/bench_tables.py); the
# thresholds above are THEIRS — any other TPU (v4, v5p, v6e, ...) keeps
# the XLA engines under "auto" until its own shootout is committed,
# instead of silently inheriting v5e breakevens
_MEASURED_KINDS = frozenset({"TPU v5 lite", "TPU v5e"})

BLOCK_ROWS = 16
LANES = 128
_BLOCK = BLOCK_ROWS * LANES
_BIN_TILE = 256


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _measured_tpu() -> bool:
    """True only on TPU kinds with committed kernel-policy measurements."""
    if not _on_tpu():
        return False
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return False
    return kind in _MEASURED_KINDS


# ---- scatter (weighted bincount) ----

def weighted_bincount_xla(idxs, weights, n_bins: int):
    """Reference implementation: XLA scatter-add, out-of-range dropped."""
    return jnp.zeros(n_bins, jnp.int32).at[idxs].add(weights, mode="drop")


def weighted_bincount_mxu(idxs, weights, n_bins: int):
    """MXU weighted bincount: B_k = onehot(idx)^T @ (7-bit weight limbs)
    in int8 with int32 accumulation, recombined with shifts.

    Exact: 7-bit limbs (0..127) never sign-wrap in int8; products are
    0 or the limb; per-bin limb sums are bounded by the caller's
    per-bin-total < 2**31 contract (sum w = sum_k 2^(7k) sum w7_k with
    nonnegative terms), and the final shift-accumulate recombines below
    2**31. Out-of-range idxs match no bin and drop. Measured 178x the
    XLA scatter engine at 1024 bins (24 G updates/s, 16.7M rows)."""
    limbs = jnp.stack([(weights >> (7 * k)) & 0x7F for k in range(5)],
                      axis=1).astype(jnp.int8)
    onehot = (idxs[:, None] == jnp.arange(n_bins, dtype=idxs.dtype)
              ).astype(jnp.int8)
    bk = jax.lax.dot_general(onehot, limbs, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    out = bk[:, 0]
    for k in range(1, 5):
        out = out + (bk[:, k] << (7 * k))
    return out


HIER_BLOCK_ROWS = 2048
# sub_width == block_rows: robust against skewed keys — a narrower
# window (1024) rates ~18% higher on uniform data (196 vs 166 M
# updates/s, bench_tables r5) but sorted zipf tails then spill and the
# any(spill) fallback pays a FULL engine pass (net ~84 M/s, BELOW the
# 150 M/s engine). Equal widths only spill through value gaps.
HIER_SUB_WIDTH = 2048


def weighted_bincount_hier(idxs, weights, n_bins: int,
                           block_rows: int = None,
                           sub_width: int = None,
                           presorted: bool = False):
    """Hierarchical wide-table build: ONE carrying sort groups the rows,
    then every block of `block_rows` consecutive sorted rows MXU-builds a
    `sub_width`-wide local table anchored at its first key (a batched
    int8 one-hot limb matmul — the 24 G updates/s narrow-table kernel
    applied piecewise), and the per-block tables window-scatter-add into
    the output: n/block_rows window updates instead of n element updates
    through the ~200 M updates/s scatter engine.

    The wide-table analog of the reference's partition step
    (/root/reference/structs.cpp:111-134): sort by key == histogram +
    stable scatter in one op, sub-tables == per-partition builds.

    Exact for any input: rows whose key exceeds its block anchor +
    sub_width ("spill" — only possible when fewer than block_rows rows
    share sub_width consecutive bins, i.e. low occupancy) are masked out
    of the MXU pass and added through one engine scatter, gated by
    lax.cond on the spill count so dense inputs never pay it. Negative
    keys are clamped to the drop sentinel up front (they would otherwise
    anchor block 0's window out of bounds and drop its valid rows).
    Per-bin totals < 2**31 (caller contract) bound every partial: 7-bit
    limbs cannot sign-wrap in int8, per-block per-bin limb sums are
    <= block_rows * 127, and window adds accumulate to the true sums.

    presorted=True skips the carrying sort: the caller promises idxs is
    already non-decreasing (a window of a node-sorted huge column —
    ops/factorized.py's persistent sorted layout). An unsorted input
    would NOT be silently wrong — blocks then anchor at their first key
    and every out-of-window row lands in the spill scatter — but the
    point of the promise is speed: the r4 in-loop negative (16.7 ->
    23.2 s with per-window hier) was exactly the per-window sort."""
    # late-bound defaults: read the module globals at CALL time so
    # tests can monkeypatch HIER_* (def-time defaults froze them)
    block_rows = HIER_BLOCK_ROWS if block_rows is None else block_rows
    sub_width = HIER_SUB_WIDTH if sub_width is None else sub_width
    n = idxs.shape[0]
    idxs = jnp.where(idxs < 0, n_bins, idxs)
    pad = -n % block_rows
    if pad:
        idxs = jnp.pad(idxs, (0, pad), constant_values=n_bins)
        weights = jnp.pad(weights, (0, pad))
    if presorted:
        sk, sw = idxs, weights
    else:
        sk, sw = jax.lax.sort((idxs, weights), num_keys=1)
    nb = sk.shape[0] // block_rows
    skb = sk.reshape(nb, block_rows)
    swb = sw.reshape(nb, block_rows)
    bases = skb[:, 0]
    # local < 0 is impossible after the sort but CAN happen under the
    # presorted promise when the caller's order is imperfect (e.g. a
    # masked-to-sentinel row anchoring a block) — those rows must SPILL
    # to the engine scatter, not silently drop
    local = skb - bases[:, None]
    spill = (local < 0) | (local >= sub_width)
    wm = jnp.where(spill, 0, swb)
    limbs = jnp.stack([(wm >> (7 * k)) & 0x7F for k in range(5)],
                      axis=-1).astype(jnp.int8)        # (nb, R, 5)
    onehot = (local[:, :, None]
              == jnp.arange(sub_width, dtype=local.dtype)
              ).astype(jnp.int8)                       # (nb, R, sub)
    bk = jax.lax.dot_general(onehot, limbs, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    blockres = bk[..., 0]                              # (nb, sub)
    for k in range(1, 5):
        blockres = blockres + (bk[..., k] << (7 * k))
    # window scatter: nb updates of sub_width contiguous lanes; windows
    # may overlap (anchors are data) — add order is irrelevant for sums.
    # Sentinel-anchored blocks land in the pad region or drop wholesale
    # (sorted => every row of such a block is itself out of range).
    out = jnp.zeros(n_bins + sub_width, jnp.int32)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    out = jax.lax.scatter_add(out, bases[:, None], blockres, dn)[:n_bins]

    def add_spill(o):
        return o.at[jnp.where(spill, skb, n_bins).reshape(-1)].add(
            jnp.where(spill, swb, 0).reshape(-1), mode="drop")

    return jax.lax.cond(jnp.any(spill), add_spill, lambda o: o, out)


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
        if not _measured_tpu() or idxs.shape[0] < ONEHOT_MIN_ROWS:
            impl = "xla"
        elif n_bins <= MXU_SCATTER_MAX_BINS:
            impl = "mxu"
        else:
            # wide tables: the hierarchical build (one carrying sort +
            # blocked MXU sub-tables + window scatters) measured 260 M
            # updates/s vs the ~175 M/s scatter engine at 2^16..2^21
            # bins (EVIDENCE_r04, 16.7M rows, v5e)
            impl = "hier"
    if impl == "mxu":
        return weighted_bincount_mxu(idxs, weights, n_bins)
    if impl == "hier":
        return weighted_bincount_hier(idxs, weights, n_bins)
    if impl == "sorted":
        return weighted_bincount_sorted(idxs, weights, n_bins)
    if impl == "onehot":
        return weighted_bincount_onehot(idxs, weights, n_bins,
                                        interpret=not _on_tpu())
    return weighted_bincount_xla(idxs, weights, n_bins)


def scatter_add_window(acc, idxs, weights, impl: str = "xla"):
    """acc.at[idxs].add(weights, mode='drop') for ONE window of a huge
    message build (the windowed fori_loop bodies of
    ops/factorized.py:_scatter_add_big / _fused_node_pass): int8-MXU
    one-hot limb matmuls at narrow widths, the scatter engine at wide
    widths. The kernels drop out-of-range indices exactly like
    mode='drop' (the huge paths' masked-row sentinel is n_bins), so
    accumulation into `acc` is bit-identical; per-bin totals stay
    < 2**31 under the planner's overflow caps, the kernels' caller
    contract.

    Wide windows deliberately DIFFER from scatter_table's one-shot
    policy: hier wins one-shot at 16.7M rows (260 vs 175 M updates/s)
    but measured SLOWER inside the 2^26-row window loops — the 1B-row
    zipf engine run regressed 16.7 s -> 23.2 s with hier windows
    (EVIDENCE_r04): a carrying sort paid once per build amortizes; one
    per window does not. "hier" stays available explicitly."""
    n_bins = acc.shape[0]
    if impl == "auto":
        if (not _measured_tpu() or idxs.shape[0] < ONEHOT_MIN_ROWS
                or n_bins > MXU_SCATTER_MAX_BINS):
            impl = "xla"
        else:
            impl = "mxu"
    if impl == "mxu":
        return acc + weighted_bincount_mxu(idxs, weights, n_bins)
    if impl == "hier":
        return acc + weighted_bincount_hier(idxs, weights, n_bins)
    if impl == "hier_presorted":
        # the window is a slice of a node-sorted column (persistent
        # sorted layout): the hier build without its carrying sort —
        # the r4 in-loop negative was the per-window sort, not the
        # blocked MXU sub-tables. sub_width == block_rows keeps skewed
        # (zipf-tail) windows out of the spill fallback (see
        # HIER_GATHER_SUB_WIDTH)
        return acc + weighted_bincount_hier(idxs, weights, n_bins,
                                            sub_width=HIER_BLOCK_ROWS,
                                            presorted=True)
    return acc.at[idxs].add(weights, mode="drop")


# ---- gather (table lookup) ----

def table_gather_onehot(table, keys):
    """Exact MXU table lookup: one-hot(keys) @ four 8-bit limbs in int8
    with int32 accumulation.

    The int8 cast wraps limb values 128..255 negative, but a one-hot
    row has exactly ONE nonzero, so each output column is a single
    signed limb — masking it back to 8 bits (& 0xFF on the s32 result)
    recovers the true limb exactly. int8 MXU density makes this 4x the
    f32-HIGHEST two-limb variant it replaced (measured: 4.6 G elem/s at
    2048 bins vs the gather engine's ~140 M). Wins only for narrow
    tables (compute scales with table length)."""
    n_bins = table.shape[0]
    limbs = jnp.stack([(table >> s) & 0xFF for s in (0, 8, 16, 24)],
                      axis=1).astype(jnp.int8)
    onehot = (keys[:, None] == jnp.arange(n_bins, dtype=keys.dtype)
              ).astype(jnp.int8)
    g = jax.lax.dot_general(onehot, limbs, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return ((g[:, 0] & 0xFF) + ((g[:, 1] & 0xFF) << 8)
            + ((g[:, 2] & 0xFF) << 16) + ((g[:, 3] & 0xFF) << 24))


def _gather_auto(n_bins: int, rows: int) -> bool:
    return (_measured_tpu() and n_bins <= ONEHOT_GATHER_MAX_BINS
            and rows >= ONEHOT_MIN_ROWS)


def table_gather2(tableA, tableB, keys, impl: str = "xla"):
    """Fused double lookup: (tableA[keys], tableB[keys]) — on the MXU
    path one one-hot feeds ONE int8 matmul with 8 limb columns (both
    tables), halving the dominant cost vs two separate lookups. The
    dense join backend's probe (count table + offset table) is the
    consumer."""
    if impl == "auto":
        impl = ("onehot" if _gather_auto(tableA.shape[0], keys.shape[0])
                else "xla")
    if impl != "onehot":
        return tableA[keys], tableB[keys]
    n_bins = tableA.shape[0]
    limbs = jnp.stack([(t >> s) & 0xFF
                       for t in (tableA, tableB)
                       for s in (0, 8, 16, 24)], axis=1).astype(jnp.int8)
    onehot = (keys[:, None] == jnp.arange(n_bins, dtype=keys.dtype)
              ).astype(jnp.int8)
    g = jax.lax.dot_general(onehot, limbs, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)

    def recomb(o):
        return ((g[:, o] & 0xFF) + ((g[:, o + 1] & 0xFF) << 8)
                + ((g[:, o + 2] & 0xFF) << 16)
                + ((g[:, o + 3] & 0xFF) << 24))

    return recomb(0), recomb(4)


def table_gather_diffcum(table, sk):
    """table[sk] for SORTED keys with NO gather at all: scatter the
    table's first differences at each bin's first occurrence (bounds =
    ONE searchsorted of the n_bins+2 bin edges into sk), then a wrapped
    int32 cumsum reconstructs the values. Exact: every table entry is
    int32, and mod-2^32 prefix differences recover int32 values exactly
    (the weighted_bincount_sorted argument in reverse). Out-of-range
    keys (< 0 or >= n_bins — the wave's mask sentinel) yield 0, like
    mode='drop' on the build side. The cost is one n_bins-sized unique
    scatter + one n-length cumsum — bandwidth, not the ~9 ns/elem
    fixed-function engine. Supersedes the reference's cache-resident
    probe loop (/root/reference/Result.cpp:61-73) for presorted probes.
    """
    n_bins = table.shape[0]
    n = sk.shape[0]
    tpad = jnp.concatenate([table, jnp.zeros(1, jnp.int32)])
    skc = jnp.minimum(sk, n_bins)          # sentinel bin -> zero entry
    edges = jnp.arange(n_bins + 2, dtype=sk.dtype)
    bounds = jnp.searchsorted(skc, edges, side="left",
                              method="sort").astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), tpad[:-1]])
    delta = tpad - prev                     # (n_bins + 1,) wrapped diffs
    # bins whose first key sits past the end scatter into slot n (cut)
    acc = jnp.zeros(n + 1, jnp.int32).at[bounds[:-1]].add(delta,
                                                          mode="drop")
    return jnp.cumsum(acc[:n])


# sub_width == block_rows: a block of consecutive sorted keys can only
# leave an equal-width window through value GAPS (occupancy < 1 key/bin
# locally) — any sub_width < block_rows tripped the full-length engine
# spill fallback on zipf tails (+554 ms/window at 2^26). The r5 robust
# sweep (readback-forced timing, sorted zipf keys, 2^26 rows):
#   (1024,1024) gather 198 ms  build 240 ms   <- gather optimum
#   (2048,2048) gather 240 ms  build 227 ms   <- build optimum
#   (512,512)   gather 279 ms  build 369 ms
# vs the engines' 580 ms gather / 449 ms scatter.
HIER_GATHER_BLOCK_ROWS = 1024
HIER_GATHER_SUB_WIDTH = 1024


def table_gather_hier(table, sk, block_rows: int = None,
                      sub_width: int = None):
    """table[sk] for SORTED keys via blocked one-hot MXU lookups from
    sub_width-wide table windows anchored at each block's first key —
    the gather mirror of weighted_bincount_hier: sortedness makes every
    block's keys local to one window; the windows come out of HBM as
    nb CONTIGUOUS slices (a windowed lax.gather, engine-friendly),
    and the per-block lookup is the 4-limb int8 one-hot matmul of
    table_gather_onehot applied piecewise.

    Exact for any input: rows whose key leaves its block window (only
    possible at low occupancy) or is out of range are masked out of the
    MXU pass and fixed by one engine gather, gated by lax.cond on the
    spill count. Out-of-range keys yield 0 (mode='drop' semantics)."""
    block_rows = (HIER_GATHER_BLOCK_ROWS if block_rows is None
                  else block_rows)
    sub_width = (HIER_GATHER_SUB_WIDTH if sub_width is None
                 else sub_width)
    n = sk.shape[0]
    n_bins = table.shape[0]
    sent = n_bins + sub_width              # past every window: spills
    sk2 = jnp.where((sk < 0) | (sk > n_bins), jnp.int32(sent), sk)
    pad = -n % block_rows
    if pad:
        sk2 = jnp.pad(sk2, (0, pad), constant_values=sent)
    nb = sk2.shape[0] // block_rows
    skb = sk2.reshape(nb, block_rows)
    bases = jnp.minimum(skb[:, 0], n_bins)  # sentinel blocks -> zero pad
    local = skb - bases[:, None]
    spill = (local < 0) | (local >= sub_width)
    tpad = jnp.concatenate([table,
                            jnp.zeros(sub_width + 1, jnp.int32)])
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    W = jax.lax.gather(tpad, bases[:, None], dn,
                       slice_sizes=(sub_width,))         # (nb, sub)
    limbs = jnp.stack([(W >> s) & 0xFF for s in (0, 8, 16, 24)],
                      axis=-1).astype(jnp.int8)          # (nb, sub, 4)
    lm = jnp.where(spill, sub_width, local)
    onehot = (lm[:, :, None]
              == jnp.arange(sub_width, dtype=lm.dtype)
              ).astype(jnp.int8)                         # (nb, R, sub)
    g4 = jax.lax.dot_general(onehot, limbs, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    g = ((g4[..., 0] & 0xFF) + ((g4[..., 1] & 0xFF) << 8)
         + ((g4[..., 2] & 0xFF) << 16) + ((g4[..., 3] & 0xFF) << 24))
    g = g.reshape(-1)[:n]
    spill_n = spill.reshape(-1)[:n]

    def fix(gg):
        safe = jnp.where(spill_n, jnp.minimum(sk2[:n], n_bins),
                         jnp.int32(0))
        eng = tpad.at[safe].get(mode="promise_in_bounds")
        return jnp.where(spill_n, eng, gg)

    return jax.lax.cond(jnp.any(spill_n), fix, lambda gg: gg, g)


PALLAS_GATHER_KEY_ROWS = 512


def _pgather_kernel(kb_rows, s_rows, tab_ref, keys_ref, out_ref,
                    spill_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        spill_ref[0, 0] = 0

    k = keys_ref[:]
    r = jax.lax.shift_right_logical(k, 7)
    c = k & 127
    rmin = jnp.min(r, axis=1, keepdims=True)
    rb = jnp.broadcast_to(rmin, (kb_rows, LANES))
    rb1 = jnp.minimum(rb + 1, s_rows - 1)
    tab = tab_ref[:]
    xlo = jnp.take_along_axis(tab, rb, axis=0)
    xhi = jnp.take_along_axis(tab, rb1, axis=0)
    ylo = jnp.take_along_axis(xlo, c, axis=1)
    yhi = jnp.take_along_axis(xhi, c, axis=1)
    ok_lo = r == rb
    ok_hi = r == rb + 1
    out_ref[:] = jnp.where(ok_lo, ylo, jnp.where(ok_hi, yhi, 0))
    spill_ref[0, 0] += jnp.sum((~(ok_lo | ok_hi)).astype(jnp.int32))


def table_gather_pallas(table, sk, interpret: bool = False):
    """table[sk] for SORTED keys with the whole table VMEM-resident as
    (rows, 128): each (512, 128) key block fetches table rows
    rmin/rmin+1 by sublane dynamic-gather (one per-lane VMEM lookup,
    tpu.dynamic_gather axis 0) and lane-crossbars the low 7 bits
    (axis 1) — sorted blocks of 128 consecutive keys span at most two
    table rows except at low occupancy, where the kernel counts spills
    and ONE gated engine pass fixes them. 4 MB at 2^20 bins: the whole
    message table rides VMEM for the entire grid, the analog of the
    reference's cache-resident build side
    (/root/reference/Result.cpp:43-58). Out-of-range keys yield 0."""
    n = sk.shape[0]
    n_bins = table.shape[0]
    s_rows = -(-n_bins // LANES) + 8       # zero pad past every bin
    s_rows = -(-s_rows // 8) * 8
    flat = s_rows * LANES
    tpad = jnp.zeros(flat, jnp.int32).at[:n_bins].set(table)
    sent = flat - 1                         # reads the zero pad
    sk2 = jnp.where((sk < 0) | (sk >= n_bins), jnp.int32(sent), sk)
    kb = PALLAS_GATHER_KEY_ROWS
    blk = kb * LANES
    pad = -n % blk
    if pad:
        sk2 = jnp.pad(sk2, (0, pad), constant_values=sent)
    grid = sk2.shape[0] // blk
    out, spills = pl.pallas_call(
        partial(_pgather_kernel, kb, s_rows),
        grid=(grid,),
        in_specs=[pl.BlockSpec((s_rows, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((kb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((kb, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((grid * kb, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        interpret=interpret,
    )(tpad.reshape(s_rows, LANES), sk2.reshape(grid * kb, LANES))
    g = out.reshape(-1)[:n]

    def fix(_gg):
        # spills are rare (low-occupancy blocks only); the gated
        # fallback recomputes the whole gather through the engine
        # rather than tracking which rows spilled — the cond makes
        # dense inputs never pay it
        return tpad.at[sk2[:n]].get(mode="promise_in_bounds")

    return jax.lax.cond(spills[0, 0] > 0, fix, lambda gg: gg, g)


def table_gather(table, keys, impl: str = "xla"):
    """Dispatch g = table[keys] (keys always in range by the factorized
    planner's width construction — promise_in_bounds skips XLA's index
    clamp, which otherwise materializes a full keys-sized temp: 4 GB of
    HBM at a 2**30-row fact table)."""
    if impl == "auto":
        impl = ("onehot" if _gather_auto(table.shape[0], keys.shape[0])
                else "xla")
    if impl == "onehot":
        return table_gather_onehot(table, keys)
    return table.at[keys].get(mode="promise_in_bounds")
