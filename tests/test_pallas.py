"""Pallas kernels (interpret mode on CPU) vs XLA/NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from radixhashjoin_tpu.ops.pallas_radix import (radix_histogram,
                                                radix_histogram_xla)


@pytest.mark.parametrize("n,count,n_bins", [
    (4096, 4096, 256), (4096, 3000, 256), (8192, 1, 128), (2048, 0, 256),
    (1024, 1000, 256)])
def test_radix_histogram_matches_numpy(n, count, n_bins):
    rng = np.random.default_rng(n + count)
    vals = rng.integers(0, 1 << 18, n).astype(np.int32)
    got = np.asarray(radix_histogram(jnp.asarray(vals), count, n_bins,
                                     interpret=True))
    expect = np.bincount(vals[:count] & (n_bins - 1), minlength=n_bins)
    np.testing.assert_array_equal(got, expect)
    got_xla = np.asarray(radix_histogram_xla(jnp.asarray(vals),
                                             jnp.int32(count), n_bins))
    np.testing.assert_array_equal(got_xla, expect)


def test_radix_histogram_ignores_padding_garbage():
    vals = np.full(2048, -1, dtype=np.int32)   # sentinel lanes everywhere
    vals[:5] = [0, 1, 1, 2, 255]
    got = np.asarray(radix_histogram(jnp.asarray(vals), 5, 256,
                                     interpret=True))
    assert got[0] == 1 and got[1] == 2 and got[2] == 1 and got[255] == 1
    assert got.sum() == 5
