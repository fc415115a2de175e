"""Factorized terminal-join aggregation vs NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from radixhashjoin_tpu.ops.terminal import (combine_fresh_partials,
                                            terminal_probe_rows,
                                            terminal_sum_existing_rows,
                                            terminal_sum_fresh)
from radixhashjoin_tpu.utils.limbs import (combine_weighted_partials,
                                           weighted_partials)
from radixhashjoin_tpu.utils.padding import pad_to

DOMAIN = 1024


def test_weighted_partials_exact_u64():
    rng = np.random.default_rng(0)
    n = 4096
    vals = rng.integers(0, 2**31 - 2, n).astype(np.int64)
    counts = rng.integers(0, 2**20, n).astype(np.int64)
    live = 3000
    got = combine_weighted_partials(np.asarray(weighted_partials(
        jnp.asarray(vals.astype(np.int32)),
        jnp.asarray(counts.astype(np.int32)), jnp.int32(live))))
    expect = int((vals[:live].astype(object) *
                  counts[:live].astype(object)).sum()) & ((1 << 64) - 1)
    assert got == expect > 2**40   # exercises the high limbs


def test_terminal_case1_matches_expansion():
    rng = np.random.default_rng(1)
    L, R = 700, 900
    lv = rng.integers(0, 40, L).astype(np.int32)
    rv = rng.integers(0, 40, R).astype(np.int32)
    lproj = rng.integers(0, 1 << 18, 2048).astype(np.int32)
    rproj = rng.integers(0, 1 << 18, 2048).astype(np.int32)
    lrows = pad_to(np.arange(L, dtype=np.int32), 1024, 0)
    rrows = pad_to(np.arange(R, dtype=np.int32), 1024, 0)
    colA = pad_to(lv, 2048, 0)
    colB = pad_to(rv, 2048, 0)

    counts, lvm, total = terminal_probe_rows(
        jnp.asarray(colA), jnp.asarray(lrows), jnp.int32(L),
        jnp.asarray(colB), jnp.asarray(rrows), jnp.int32(R), DOMAIN)

    # oracle: expand all pairs
    pairs = [(i, j) for i in range(L) for j in range(R) if lv[i] == rv[j]]
    assert int(total) == len(pairs)

    got_l = combine_weighted_partials(np.asarray(
        terminal_sum_existing_rows(jnp.asarray(lproj), jnp.asarray(lrows),
                                   counts, jnp.int32(L))))
    exp_l = sum(int(lproj[i]) for i, _ in pairs)
    assert got_l == exp_l

    got_r = combine_fresh_partials(np.asarray(terminal_sum_fresh(
        jnp.asarray(rproj), jnp.asarray(colB), jnp.asarray(rrows),
        jnp.int32(R), lvm, jnp.int32(L), DOMAIN)))
    exp_r = sum(int(rproj[j]) for _, j in pairs)
    assert got_r == exp_r


def test_terminal_fresh_heavy_duplicates():
    # many duplicate keys on the fresh side: limb tables must stay exact
    R = 2048
    rv = np.zeros(R, dtype=np.int32)          # all rows share key 0
    rproj = np.full(R, (1 << 18) - 1, dtype=np.int32)
    lvm = jnp.asarray(pad_to(np.array([0, 0], dtype=np.int32), 1024, -1))
    rrows = jnp.asarray(np.arange(R, dtype=np.int32))
    got = combine_fresh_partials(np.asarray(terminal_sum_fresh(
        jnp.asarray(rproj), jnp.asarray(rv), rrows, jnp.int32(R),
        lvm, jnp.int32(2), DOMAIN)))
    assert got == 2 * R * ((1 << 18) - 1)
