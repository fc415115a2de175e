"""Dense direct-address join backend vs oracle and the sort backend."""

import jax.numpy as jnp
import numpy as np
import pytest

from radixhashjoin_tpu.ops.join import expand_pairs, probe_count
from radixhashjoin_tpu.ops.join_dense import (dense_any_common, dense_expand,
                                              dense_probe)
from radixhashjoin_tpu.utils.padding import bucket_size, pad_to

DOMAIN = 1024


def _oracle_pairs(lv, rv):
    out = []
    for i, x in enumerate(lv):
        for j, y in enumerate(rv):
            if x == y:
                out.append((i, j))
    return out


@pytest.mark.parametrize("seed,L,R,vmax", [(0, 300, 500, 40), (1, 64, 64, 3),
                                           (2, 1000, 10, 1000)])
def test_dense_matches_oracle_and_sort(seed, L, R, vmax):
    rng = np.random.default_rng(seed)
    lv = rng.integers(0, vmax, L).astype(np.int32)
    rv = rng.integers(0, vmax, R).astype(np.int32)
    lpad = jnp.asarray(pad_to(lv, 1024, 0))
    rpad = jnp.asarray(pad_to(rv, 1024, 0))
    d = dense_probe(lpad, jnp.int32(L), rpad, jnp.int32(R), DOMAIN)
    s = probe_count(lpad, jnp.int32(L), rpad, jnp.int32(R))
    expect = _oracle_pairs(lv, rv)
    assert int(d[4]) == int(s[4]) == len(expect)
    if not expect:
        return
    out_size = bucket_size(len(expect))
    li_d, ri_d = dense_expand(*d[:4], out_size)
    got_d = sorted(zip(np.asarray(li_d)[:len(expect)].tolist(),
                       np.asarray(ri_d)[:len(expect)].tolist()))
    li_s, ri_s = expand_pairs(*s[:4], out_size)
    got_s = sorted(zip(np.asarray(li_s)[:len(expect)].tolist(),
                       np.asarray(ri_s)[:len(expect)].tolist()))
    assert got_d == sorted(expect) == got_s


def test_dense_no_match_and_padding():
    lv = jnp.asarray(pad_to(np.array([1, 2, 3], dtype=np.int32), 1024, 0))
    rv = jnp.asarray(pad_to(np.array([7, 8], dtype=np.int32), 1024, 0))
    *_, total = dense_probe(lv, jnp.int32(3), rv, jnp.int32(2), DOMAIN)
    assert int(total) == 0
    # padding zeros on both sides must not match
    lv2 = jnp.asarray(pad_to(np.array([0, 5], dtype=np.int32), 1024, 0))
    rv2 = jnp.asarray(pad_to(np.array([0, 0, 6], dtype=np.int32), 1024, 0))
    *_, t2 = dense_probe(lv2, jnp.int32(2), rv2, jnp.int32(3), DOMAIN)
    assert int(t2) == 2


def test_dense_any_common():
    a = jnp.asarray(pad_to(np.array([1, 2, 3], dtype=np.int32), 1024, 0))
    b = jnp.asarray(pad_to(np.array([9, 3, 9], dtype=np.int32), 1024, 0))
    assert bool(dense_any_common(a, b, jnp.int32(3), DOMAIN))
    assert not bool(dense_any_common(a, b, jnp.int32(1), DOMAIN))
    b2 = jnp.asarray(pad_to(np.array([9, 9, 9], dtype=np.int32), 1024, 0))
    assert not bool(dense_any_common(a, b2, jnp.int32(3), DOMAIN))
