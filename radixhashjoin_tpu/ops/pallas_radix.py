"""Pallas TPU kernels for radix partitioning primitives.

`radix_histogram` is the TPU-native successor of the reference's 8-way
chunked histogram jobs (multiHistogram structs.cpp:111-121 + the serial
merge at structs.cpp:168-173): the grid plays the role of the chunk loop,
each block computes its digit histogram as a one-hot reduction in VMEM
(VPU-friendly: compare-broadcast + sum, no scatter), and the sequential
TPU grid accumulates directly into the output block — no merge step.

Used by the distributed layer for global digit histograms (psum of
per-chip histograms) that drive exchange capacity sizing and skew
detection (config.skew_heavy_fraction), and available as a planning
primitive. Digits are the value's low bits, exactly the reference's
`payload & (2^HASH_LSB - 1)` (Result.cpp:5, JobScheduler.cpp:152).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Each grid step consumes a (BLOCK_ROWS, 128) tile = 2048 values; tile dims
# satisfy the TPU (8, 128) int32 tiling constraint.
BLOCK_ROWS = 16
LANES = 128
DEFAULT_BLOCK = BLOCK_ROWS * LANES


def _hist_kernel(n_bins, count_ref, vals_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # 3D one-hot: (rows, lanes, bins) compare + full reduce — no reshape
    # (Mosaic rejects (r,l)->(r*l,1) shape casts)
    row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 1)
    pos = i * (BLOCK_ROWS * LANES) + row * LANES + lane
    # i1 vectors can't gain a minor dim (Mosaic); keep the mask int32
    live = (pos < count_ref[0]).astype(jnp.int32)
    digits = vals_ref[:] & np.int32(n_bins - 1)
    bins = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES, n_bins), 2)
    onehot = (digits[:, :, None] == bins).astype(jnp.int32) * live[:, :, None]
    out_ref[:] += jnp.sum(onehot, axis=(0, 1))[None]


@partial(jax.jit, static_argnames=("n_bins", "block", "interpret"))
def radix_histogram(vals: jax.Array, count, n_bins: int = 256,
                    block: int = DEFAULT_BLOCK,
                    interpret: bool = False) -> jax.Array:
    """Histogram of `vals[:count] & (n_bins-1)`; vals padded to a multiple
    of `block` = 2048 (shape buckets are powers of two >= 1024... the 1024
    bucket pads up to one block). Returns int32 (n_bins,). Set
    interpret=True on CPU."""
    assert block == DEFAULT_BLOCK, "tile geometry is fixed (BLOCK_ROWS x 128)"
    n = vals.shape[0]
    if n % block:
        vals = jnp.pad(vals, (0, block - n % block))
    n = vals.shape[0]
    assert n_bins & (n_bins - 1) == 0 and n_bins >= LANES, n_bins
    grid = n // block
    count_arr = jnp.asarray(count, dtype=jnp.int32).reshape(1)
    out = pl.pallas_call(
        partial(_hist_kernel, n_bins),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, n_bins), lambda i, c: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_bins), jnp.int32),
        interpret=interpret,
    )(count_arr, vals.reshape(grid * BLOCK_ROWS, LANES))
    return out[0]


def radix_histogram_xla(vals: jax.Array, count, n_bins: int) -> jax.Array:
    """XLA reference implementation (bincount) for testing/fallback."""
    n = vals.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    digits = jnp.where(idx < count, vals & np.int32(n_bins - 1),
                       np.int32(n_bins))
    return jnp.zeros(n_bins, jnp.int32).at[digits].add(1, mode="drop")
