"""Pallas TPU one-pass radix partition scatter + multi-pass radix sort.

The reference partitions with per-chunk histograms, per-chunk prefix
sums, and a stable index scatter (multiHistogram/multiPartition
structs.cpp:111-134 + the serial gather at structs.cpp:182-194). The TPU
has no vector scatter unit, so the rank computation — "how many equal-
digit elements precede me" — is the part XLA can only express through a
full comparison sort. This kernel computes it directly on the VPU: each
grid block builds a one-hot (rows, lanes, bins) cube in VMEM and takes
two exclusive cumsums (across rows, across lanes), which is exactly a
stable within-block rank per digit, plus the block's digit histogram.
The host side then assembles the destination of every element as

    dest = bin_offset[digit] + block_base[block, digit] + rank_in_block

(bin_offset = exclusive scan of the global histogram, block_base =
exclusive scan of the per-block histograms down the block axis) and
materializes the permutation with one XLA unique-index scatter, which
runs at HBM bandwidth (~820 GB/s measured, scripts/bench_kernels.py).

Chaining passes LSB-first gives a stable radix sort: `radix_sort_order`
sorts 2^bits-bounded keys in ceil(bits/log2 n_bins) passes — a complete
TPU-native alternative to `jnp.argsort` for bounded domains (dictionary
codes always are — models/device_catalog.py).

Measured natively on the v5e (2026-08-17, scripts/bench_kernels.py):
correct at all sizes, but the O(n_bins) one-hot rank work per element
caps it at ~13 M keys/s vs 134-392 M keys/s for XLA's fused argsort —
so the engine keeps `jnp.argsort` in the probe (ops/join.py) and this
module stays a verified, available backend rather than the default.
The same measurement justifies the partition design the OTHER way:
`xla_scatter_add` runs at 820 GB/s, so the scatter-from-scanned-
histogram materialization is bandwidth-optimal once ranks are known.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 16
LANES = 128
BLOCK = BLOCK_ROWS * LANES


HGROUP = 128  # grid steps sharing one hist output block (one lane column each)


def _rank_hist_kernel(nb_pad, digits_ref, rank_ref, hist_ref):
    """Per-block stable rank-within-digit + digit histogram.

    Everything stays 2-D (Mosaic rejects relayouts of 3-D one-hot cubes):
    one (nb_pad, LANES) one-hot slab per sublane row, bins along the
    SUBLANE axis. The within-row exclusive lane scan is a strict-lower-
    triangular matmul (MXU; exact — partial sums <= 2048 << 2^24 in f32
    accumulation from 0/1 bf16 inputs); the across-row scan is a running
    (nb_pad, 1) accumulator carried by the static row loop. Block
    histograms land one lane column per grid step via a one-hot column
    mask; HGROUP consecutive steps share one hist block (sequential TPU
    grid), zeroed at first touch. digits outside [0, nb_pad) cannot occur
    (callers pad with the sentinel bin nb_pad - 1 at most).
    """
    i = pl.program_id(0)

    @pl.when(i % HGROUP == 0)
    def _():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    bins = jax.lax.broadcasted_iota(jnp.int32, (nb_pad, LANES), 0)
    la = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lb = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    t_lanes = (la < lb).astype(jnp.bfloat16)      # T[l', l] = [l' < l]
    run = jnp.zeros((nb_pad, 1), jnp.float32)     # rows-before count per bin
    for r in range(BLOCK_ROWS):                   # static unroll
        oh = digits_ref[r:r + 1, :] == bins       # (nb_pad, LANES)
        ohf = oh.astype(jnp.float32)
        lanes_before = jnp.dot(oh.astype(jnp.bfloat16), t_lanes,
                               preferred_element_type=jnp.float32)
        rank = jnp.sum((run + lanes_before) * ohf, axis=0, keepdims=True)
        rank_ref[r:r + 1, :] = rank.astype(jnp.int32)
        run = run + jnp.sum(ohf, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, HGROUP), 1)
    hist_ref[:] = hist_ref[:] + run.astype(jnp.int32) * (col == i % HGROUP)


@partial(jax.jit, static_argnames=("n_bins", "interpret"))
def rank_and_hist(digits: jax.Array, n_bins: int, interpret: bool = False):
    """(ranks int32[n], block_hists int32[nblocks, n_bins]) for a flat
    int32 digit vector (padded internally to a block multiple; the pad
    lanes carry digit n_bins and are excluded)."""
    n = digits.shape[0]
    if n % BLOCK:
        digits = jnp.pad(digits, (0, BLOCK - n % BLOCK),
                         constant_values=n_bins)
    npad = digits.shape[0]
    grid = npad // BLOCK
    nb_pad = -(-n_bins // 8) * 8             # sublane-tile the bin axis
    hcols = -(-grid // HGROUP) * HGROUP
    ranks, hists = pl.pallas_call(
        partial(_rank_hist_kernel, nb_pad),
        grid_spec=pl.GridSpec(
            grid=(grid,),
            in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb_pad, HGROUP),
                             lambda i: (0, i // HGROUP),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((grid * BLOCK_ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb_pad, hcols), jnp.int32),
        ],
        interpret=interpret,
    )(digits.reshape(grid * BLOCK_ROWS, LANES))
    return ranks.reshape(npad)[:n], hists[:n_bins, :grid].T


@partial(jax.jit, static_argnames=("n_bins", "interpret"))
def partition_order(digits: jax.Array, n_bins: int,
                    interpret: bool = False):
    """Stable-partition permutation: order[j] = source index of the j-th
    element when stably grouped by digit (digits == n_bins sort last —
    the dead-lane convention of ops/radix_partition.py).

    Returns (order int32[n], hist int32[n_bins + 1]); hist[:n_bins] are
    the real bins, hist[n_bins] the dead lanes.
    """
    n = digits.shape[0]
    nb = n_bins + 1                       # digit n_bins = dead/sentinel bin
    ranks, bh = rank_and_hist(digits, nb, interpret=interpret)
    ghist = jnp.sum(bh, axis=0)
    bin_off = jnp.cumsum(ghist) - ghist                       # (nb,)
    block_base = jnp.cumsum(bh, axis=0) - bh                  # (nblk, nb)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    blk = idx // BLOCK
    d = jnp.clip(digits, 0, nb - 1)
    dest = bin_off[d] + block_base[blk, d] + ranks
    order = jnp.zeros(n, jnp.int32).at[dest].set(idx, mode="drop")
    return order, ghist


@partial(jax.jit, static_argnames=("bits", "digit_bits", "interpret"))
def radix_sort_order(keys: jax.Array, bits: int, digit_bits: int = 8,
                     interpret: bool = False) -> jax.Array:
    """Stable ascending sort permutation of int32 keys in [0, 2^bits):
    LSB-first radix passes, `digit_bits` bits per pass. Equivalent to
    jnp.argsort(keys, stable=True) but built from rank_and_hist passes
    instead of a comparison sort."""
    n = keys.shape[0]
    order = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    k = keys
    for shift in range(0, bits, digit_bits):
        nb = 1 << min(digit_bits, bits - shift)
        digits = (k >> shift) & np.int32(nb - 1)
        p, _ = partition_order(digits, nb, interpret=interpret)
        order = order[p]
        k = k[p]
    return order
