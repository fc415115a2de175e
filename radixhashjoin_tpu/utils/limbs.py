"""Exact uint64 summation on 32-bit hardware lanes.

TPU vector lanes are 32-bit; the output contract requires exact uint64 SUMs
(values exceed 2**32, BASELINE.md). We sum on-device in two 16-bit limbs with
chunked int32 partial sums sized so no partial can overflow, then combine the
small partial vector exactly in Python integers on the host.

Replaces the reference's scalar `sum += rel.values[col][rowid]` loop
(Query.cpp:66-74) with a vectorized, masked, limb-exact reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Rows per partial-sum chunk; divides every padding bucket (min bucket 1024).
# lo-limb partial < CHUNK * 2**16 = 2**26; hi < 2**25. Both fit int32 exactly.
CHUNK = 1 << 10

_U64_MASK = (1 << 64) - 1

# ---- device fold of chunk partials to two scalars per limb row ----
#
# Measured on the axon transport: the end-of-batch readback costs ~3 MB/s
# effective, so fetching (k, nchunks) partial tensors dominated the whole
# workload. Every partial entry is < 2**26, so the chunk axis folds
# EXACTLY into two int32s [sum(p & 0x1FFF), sum(p >> 13)] for up to 2**18
# chunks (2**13 * 2**18 = 2**31); the host reconstructs
# rowsum = lo + (hi << 13) in Python integers. The readback then fetches
# a few scalars per projection instead of megabytes.

FOLD_SHIFT = 13
_FOLD_MASK = (1 << FOLD_SHIFT) - 1


def fold_partials(p: jax.Array) -> jax.Array:
    """Fold the chunk axis (last) of nonneg int32 partials (< 2**26) to
    length-2: [..., 0] = sum of low 13 bits, [..., 1] = sum of high bits."""
    assert p.shape[-1] <= (1 << 18), p.shape
    lo = (p & _FOLD_MASK).sum(axis=-1, dtype=jnp.int32)
    hi = (p >> FOLD_SHIFT).sum(axis=-1, dtype=jnp.int32)
    return jnp.stack([lo, hi], axis=-1)


def _rowsum(row: np.ndarray) -> int:
    """Host half of fold_partials: exact row total from [lo, hi]."""
    return int(row[..., 0]) + (int(row[..., 1]) << FOLD_SHIFT)


# ---- cross-chip widening of folded partials ----
#
# A folded entry is < 2**26, so a raw int32 psum over the mesh axis is
# exact only to 2**5 = 32 chips. Splitting each entry into 16-bit halves
# before the psum makes every summand < 2**16, so the halved psum stays
# exact to 2**15 chips — beyond any current pod (v5p tops out at 8,960).
# The fold reconstruction is linear, so the host merges halves first
# (entry = lo + (hi << 16), exact in int64 to 2**15 chips) and then
# combines limb partials as usual.

MAX_PSUM_CHIPS = 1 << 15


def split_fold16(x: jax.Array) -> jax.Array:
    """Device half: nonneg int32 folded partials -> stacked 16-bit halves
    (leading axis 2: [x & 0xFFFF, x >> 16]), safe to psum over up to
    MAX_PSUM_CHIPS mesh devices."""
    return jnp.stack([x & 0xFFFF, x >> 16])


def merge_fold16(p: np.ndarray) -> np.ndarray:
    """Host half: psum'd split_fold16 output -> exact int64 entries."""
    p = np.asarray(p).astype(np.int64)
    return p[0] + (p[1] << 16)


@jax.jit
def sum_u32_exact(vals: jax.Array, count: jax.Array) -> jax.Array:
    """Device half: (padded int32 values in [0, 2**31), live count) ->
    (2, 2) int32 folded limb partial sums. Rows >= count contribute 0.
    Padded length must be a multiple of CHUNK (bucket sizes are powers of 2
    >= 1024, see utils/padding.py).
    """
    n = vals.shape[0]
    assert n % CHUNK == 0, n
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    v = jnp.where(idx < count, vals, 0)
    lo = v & 0xFFFF
    hi = v >> 16
    lo_p = lo.reshape(n // CHUNK, CHUNK).sum(axis=1, dtype=jnp.int32)
    hi_p = hi.reshape(n // CHUNK, CHUNK).sum(axis=1, dtype=jnp.int32)
    return fold_partials(jnp.stack([lo_p, hi_p]))


def combine_limb_partials(partials: np.ndarray) -> int:
    """Host half: exact u64 (wrapping) total from folded (2, 2) limb
    partials (psum'd folds from the distributed path combine the same
    way — the fold reconstruction is linear)."""
    p = np.asarray(partials)
    return (_rowsum(p[0]) + (_rowsum(p[1]) << 16)) & _U64_MASK


# ---- exact weighted sums: sum(vals[i] * counts[i]) with both < 2**31 ----
#
# 32x32 -> 64 product via 16-bit splits, all exact in uint32:
#   p0 = a0*b0 (< 2**32), p1 = a0*b1 + a1*b0 (< 2**32), p2 = a1*b1 (< 2**30)
#   a*b = p0 + p1*2**16 + p2*2**32
# Each p is further split into 16-bit limbs for chunked int32 accumulation.

WCHUNK = 1 << 10   # channel limb < 2**16 -> chunk partial < 2**26


@jax.jit
def weighted_partials(vals: jax.Array, counts: jax.Array,
                      count: jax.Array) -> jax.Array:
    """Device half of exact u64 sum(vals*counts) over the live prefix.
    Returns (5, 2) folded int32 channels with host weights
    [1, 2**16, 2**16, 2**32, 2**32]."""
    n = vals.shape[0]
    assert n % WCHUNK == 0, n
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    live = idx < count
    a = jnp.where(live, vals, 0).astype(jnp.uint32)
    b = jnp.where(live, counts, 0).astype(jnp.uint32)
    a0, a1 = a & 0xFFFF, a >> 16
    b0, b1 = b & 0xFFFF, b >> 16
    p0 = a0 * b0                      # exact in uint32
    p1 = a0 * b1 + a1 * b0            # each term < 2**31, sum < 2**32
    p2 = (a1 * b1).astype(jnp.int32)  # < 2**30

    def chunks(x):
        return x.reshape(n // WCHUNK, WCHUNK).sum(axis=1, dtype=jnp.int32)

    return fold_partials(jnp.stack([
        chunks((p0 & 0xFFFF).astype(jnp.int32)),       # weight 1
        chunks((p0 >> 16).astype(jnp.int32)),          # weight 2**16
        chunks((p1 & 0xFFFF).astype(jnp.int32)),       # weight 2**16
        chunks((p1 >> 16).astype(jnp.int32)),          # weight 2**32
        chunks(p2),                                    # weight 2**32
    ]))


def weighted_partials_segments(vals: jax.Array, counts: jax.Array,
                               seg_ids: np.ndarray,
                               n_segs: int) -> jax.Array:
    """Segment-batched weighted_partials: MANY exact u64 weighted sums
    in one fused channel computation + one chunk reduce + two scatters.

    vals/counts: 1-D int32, the segments' (value, weight) vectors back
    to back, every segment zero-padded to a WCHUNK multiple (dead rows
    carry zero weight). seg_ids: per-CHUNK segment index (a small host
    constant). Returns (n_segs, 5, 2) folded channels — each row
    combines exactly like one weighted_partials output.

    Replaces one ~17-HLO-op reduction PER projection with ~30 ops total
    for a whole wave of queries — on a remote-attached chip each HLO op
    costs ~25 us of scheduling regardless of data size, so op count is
    the wall (EVIDENCE_r02.md "Transport floor")."""
    n = vals.shape[0]
    assert n % WCHUNK == 0 and n // WCHUNK == len(seg_ids), (n, len(seg_ids))
    a = vals.astype(jnp.uint32)
    b = counts.astype(jnp.uint32)
    a0, a1 = a & 0xFFFF, a >> 16
    b0, b1 = b & 0xFFFF, b >> 16
    p0 = a0 * b0
    p1 = a0 * b1 + a1 * b0
    p2 = (a1 * b1).astype(jnp.int32)

    def chunks(x):
        return x.reshape(n // WCHUNK, WCHUNK).sum(axis=1, dtype=jnp.int32)

    ch = jnp.stack([chunks((p0 & 0xFFFF).astype(jnp.int32)),
                    chunks((p0 >> 16).astype(jnp.int32)),
                    chunks((p1 & 0xFFFF).astype(jnp.int32)),
                    chunks((p1 >> 16).astype(jnp.int32)),
                    chunks(p2)])                      # (5, C)
    sid = jnp.asarray(seg_ids)
    lo = jnp.zeros((5, n_segs), jnp.int32).at[:, sid].add(ch & _FOLD_MASK)
    hi = jnp.zeros((5, n_segs), jnp.int32).at[:, sid].add(
        ch >> FOLD_SHIFT)
    return jnp.stack([lo, hi], axis=-1).transpose(1, 0, 2)  # (n_segs,5,2)


_W_WEIGHTS = (1, 1 << 16, 1 << 16, 1 << 32, 1 << 32)


def combine_weighted_partials(partials: np.ndarray) -> int:
    """Host half: exact u64 (wrapping) total of weighted_partials output
    (folded (5, 2) channels)."""
    p = np.asarray(partials)
    total = 0
    for ch, w in zip(p, _W_WEIGHTS):
        total += _rowsum(ch) * w
    return total & _U64_MASK
