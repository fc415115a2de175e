"""Radix partition op vs NumPy oracle (reference structs.cpp:144-204)."""

import jax.numpy as jnp
import numpy as np

from radixhashjoin_tpu.ops.radix_partition import radix_partition
from radixhashjoin_tpu.utils.padding import pad_to


def test_radix_partition_matches_reference_layout():
    rng = np.random.default_rng(0)
    n, nb = 3000, 256
    vals = rng.integers(0, 1 << 18, n).astype(np.int32)
    rowids = np.arange(n, dtype=np.int32)
    vp, rp, hist, off = radix_partition(
        jnp.asarray(pad_to(vals, 4096, 0)),
        jnp.asarray(pad_to(rowids, 4096, 0)), jnp.int32(n), nb)
    vp, rp = np.asarray(vp), np.asarray(rp)
    hist, off = np.asarray(hist), np.asarray(off)
    digits = vals & (nb - 1)
    np.testing.assert_array_equal(hist,
                                  np.bincount(digits, minlength=nb))
    np.testing.assert_array_equal(off, np.cumsum(hist) - hist)
    for d in (0, 1, 7, 255):
        want_rows = rowids[digits == d]       # stable: original order
        got_rows = rp[off[d]:off[d] + hist[d]]
        np.testing.assert_array_equal(got_rows, want_rows)
        assert np.all((vp[off[d]:off[d] + hist[d]] & (nb - 1)) == d)


def test_radix_partition_dead_lanes_sort_last():
    vals = pad_to(np.array([5, 5, 3], dtype=np.int32), 1024, 7)
    rows = pad_to(np.array([10, 11, 12], dtype=np.int32), 1024, 99)
    vp, rp, hist, off = radix_partition(jnp.asarray(vals), jnp.asarray(rows),
                                        jnp.int32(3), 16)
    assert int(hist.sum()) == 3
    np.testing.assert_array_equal(np.asarray(rp)[:3], [12, 10, 11])
