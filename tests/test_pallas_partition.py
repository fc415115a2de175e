"""Pallas one-pass partition scatter + radix sort vs NumPy oracles
(interpret mode on CPU; the same kernels compile natively on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from radixhashjoin_tpu.ops.pallas_partition import (BLOCK, partition_order,
                                                    radix_sort_order,
                                                    rank_and_hist)

INTERPRET = True


@pytest.mark.parametrize("n,n_bins", [(BLOCK, 8), (3 * BLOCK, 256),
                                      (BLOCK + 37, 16)])
def test_rank_and_hist(n, n_bins):
    rng = np.random.default_rng(n)
    digits = rng.integers(0, n_bins, n).astype(np.int32)
    ranks, bh = rank_and_hist(jnp.asarray(digits), n_bins,
                              interpret=INTERPRET)
    ranks, bh = np.asarray(ranks), np.asarray(bh)
    nblocks = bh.shape[0]
    for b in range(nblocks):
        blk = digits[b * BLOCK:(b + 1) * BLOCK]
        np.testing.assert_array_equal(bh[b], np.bincount(blk,
                                                         minlength=n_bins))
        # rank = stable position within the block's digit group
        for d in range(n_bins):
            pos = np.flatnonzero(blk == d)
            got = ranks[b * BLOCK:(b + 1) * BLOCK][pos]
            np.testing.assert_array_equal(got, np.arange(len(pos)))


@pytest.mark.parametrize("n,n_bins,dead", [(BLOCK, 8, 0), (2 * BLOCK, 64, 7),
                                           (BLOCK - 100, 16, 31)])
def test_partition_order(n, n_bins, dead):
    rng = np.random.default_rng(n + n_bins)
    digits = rng.integers(0, n_bins, n).astype(np.int32)
    if dead:
        digits[rng.choice(n, dead, replace=False)] = n_bins
    order, hist = partition_order(jnp.asarray(digits), n_bins,
                                  interpret=INTERPRET)
    order, hist = np.asarray(order), np.asarray(hist)
    np.testing.assert_array_equal(
        hist[:n_bins], np.bincount(digits[digits < n_bins],
                                   minlength=n_bins))
    # stable grouped permutation == np.argsort(kind='stable')
    np.testing.assert_array_equal(order, np.argsort(digits, kind="stable"))


@pytest.mark.parametrize("n,bits,digit_bits", [(BLOCK, 8, 8),
                                               (2 * BLOCK + 11, 18, 8),
                                               (BLOCK, 20, 6)])
def test_radix_sort_order(n, bits, digit_bits):
    rng = np.random.default_rng(bits)
    keys = rng.integers(0, 1 << bits, n).astype(np.int32)
    order = radix_sort_order(jnp.asarray(keys), bits, digit_bits,
                             interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(order),
                                  np.argsort(keys, kind="stable"))
