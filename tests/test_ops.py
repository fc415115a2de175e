"""Unit tests of the device operators against NumPy oracles.

This is the per-kernel coverage the reference entirely lacks (SURVEY.md §4):
compaction, filters, join count/expand, membership, exact u64 sums.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from radixhashjoin_tpu.ops.aggregate import sum_column_over_rows
from radixhashjoin_tpu.ops.compact import compact, compact_mask_positions
from radixhashjoin_tpu.ops.filter import OP_CODE, filter_live
from radixhashjoin_tpu.ops.join import any_common, expand_pairs, probe_count
from radixhashjoin_tpu.utils.padding import bucket_size, pad_to


def test_bucket_size():
    assert bucket_size(0) == 1024
    assert bucket_size(1024) == 1024
    assert bucket_size(1025) == 2048
    assert bucket_size(3_000_000) == 4194304


def test_compact_stable():
    arr = jnp.arange(1024, dtype=jnp.int32) * 10
    mask = (jnp.arange(1024) % 3) == 0
    pos, cnt = compact_mask_positions(mask)
    out = np.asarray(compact(arr, pos))
    expect = np.arange(0, 1024, 3) * 10
    assert int(cnt) == len(expect)
    np.testing.assert_array_equal(out[:len(expect)], expect)


@pytest.mark.parametrize("op,ref", [("=", np.equal), ("<", np.less),
                                    (">", np.greater)])
def test_filter_live(op, ref):
    rng = np.random.default_rng(1)
    n, pad = 700, 1024
    col = rng.integers(0, 50, 2000).astype(np.int32)
    rows = rng.choice(2000, n, replace=False).astype(np.int32)
    k = 25
    got_rows, got_cnt = filter_live(
        jnp.asarray(pad_to(rows, pad, 0)), jnp.int32(n),
        jnp.asarray(col), jnp.int32(k), OP_CODE[op])
    expect = rows[ref(col[rows], k)]
    assert int(got_cnt) == len(expect)
    np.testing.assert_array_equal(np.asarray(got_rows)[:len(expect)], expect)


def _oracle_pairs(lv, rv):
    """All (i, j) with lv[i] == rv[j], grouped by i, j ascending within i."""
    out = []
    for i, x in enumerate(lv):
        for j, y in enumerate(rv):
            if x == y:
                out.append((i, j))
    return out


def test_join_count_expand_exact():
    rng = np.random.default_rng(2)
    L, R = 300, 500
    lv = rng.integers(0, 40, L).astype(np.int32)
    rv = rng.integers(0, 40, R).astype(np.int32)
    lpad = pad_to(lv, 1024, 0)
    rpad = pad_to(rv, 1024, 0)
    order, lo, off, cum, total = probe_count(
        jnp.asarray(lpad), jnp.int32(L), jnp.asarray(rpad), jnp.int32(R))
    expect = _oracle_pairs(lv, rv)
    assert int(total) == len(expect)
    out_size = bucket_size(int(total))
    li, ri = expand_pairs(order, lo, off, cum, out_size)
    got = sorted(zip(np.asarray(li)[:len(expect)].tolist(),
                     np.asarray(ri)[:len(expect)].tolist()))
    assert got == sorted(expect)


def test_join_no_match_and_sentinels():
    lv = pad_to(np.array([1, 2, 3], dtype=np.int32), 1024, 0)
    rv = pad_to(np.array([7, 8], dtype=np.int32), 1024, 0)
    *_, total = probe_count(jnp.asarray(lv), jnp.int32(3),
                            jnp.asarray(rv), jnp.int32(2))
    assert int(total) == 0
    # padding lanes (value 0 on both sides) must not fabricate matches
    lv2 = pad_to(np.array([0, 5], dtype=np.int32), 1024, 0)
    rv2 = pad_to(np.array([0, 0, 6], dtype=np.int32), 1024, 0)
    *_, t2 = probe_count(jnp.asarray(lv2), jnp.int32(2),
                         jnp.asarray(rv2), jnp.int32(3))
    assert int(t2) == 2  # only the live 0 matches the two live 0s


def test_any_common():
    a = pad_to(np.array([1, 2, 3], dtype=np.int32), 1024, 0)
    b = pad_to(np.array([9, 3, 9], dtype=np.int32), 1024, 0)
    assert bool(any_common(jnp.asarray(a), jnp.asarray(b), jnp.int32(3)))
    b2 = pad_to(np.array([9, 9, 9], dtype=np.int32), 1024, 0)
    assert not bool(any_common(jnp.asarray(a), jnp.asarray(b2), jnp.int32(3)))
    # live prefix only: the 3 in b beyond count must not count
    assert not bool(any_common(jnp.asarray(a), jnp.asarray(b), jnp.int32(1)))


def test_sum_exact_u64_over_2_32():
    # sums must exceed 2**32 exactly (BASELINE.md: e.g. 5032407477)
    n = 5000
    col = jnp.full(8192, 2**20, dtype=jnp.int32)
    rows = jnp.arange(8192, dtype=jnp.int32)
    got = sum_column_over_rows(col, rows, jnp.int32(n))
    assert got == n * 2**20 > 2**32


def test_sum_masks_padding():
    col = jnp.asarray(np.arange(4096, dtype=np.int32))
    rows = jnp.asarray(pad_to(np.array([1, 2, 3], dtype=np.int32), 1024, 999))
    assert sum_column_over_rows(col, rows, jnp.int32(3)) == 6


# ---- message-table kernels (ops/tables.py) ----

def test_weighted_bincount_variants_match_xla():
    import jax.numpy as jnp
    from radixhashjoin_tpu.ops.tables import (weighted_bincount_mxu,
                                              weighted_bincount_onehot,
                                              weighted_bincount_sorted,
                                              weighted_bincount_xla)
    rng = np.random.default_rng(5)
    n, n_bins = 5000, 700
    # include out-of-range sentinels (the wave's masked rows) and
    # weights past every int8-limb boundary (sign-wrap coverage)
    idxs = jnp.asarray(np.where(rng.random(n) < 0.1, n_bins,
                                rng.integers(0, n_bins, n)).astype(np.int32))
    w = jnp.asarray(rng.integers(0, 2**20, n).astype(np.int32))
    ref = np.asarray(weighted_bincount_xla(idxs, w, n_bins))
    assert (np.asarray(weighted_bincount_sorted(idxs, w, n_bins))
            == ref).all()
    assert (np.asarray(weighted_bincount_mxu(idxs, w, n_bins))
            == ref).all()
    assert (np.asarray(weighted_bincount_onehot(idxs, w, n_bins,
                                                interpret=True))
            == ref).all()


def test_weighted_bincount_hier_exact():
    """Hierarchical wide-table build vs the XLA scatter engine across
    its regimes: dense (spill-free fast path), sparse (every block
    spills — the cond fallback), sentinel-heavy, negative keys, and a
    ragged tail shorter than one block."""
    import jax.numpy as jnp
    from radixhashjoin_tpu.ops.tables import (weighted_bincount_hier,
                                              weighted_bincount_xla)
    rng = np.random.default_rng(7)
    n_bins = 1 << 15
    cases = {
        # dense: 2**17 rows over 2**15 bins (mult 4) — blocks stay local
        "dense": rng.integers(0, n_bins, 1 << 17),
        # zipf-ish skew: heavy head, long tail
        "skew": np.minimum((rng.random(1 << 17) + 1e-9) ** -2.0,
                           n_bins - 1).astype(np.int64),
        # sparse: 4096 rows over 32768 bins — blocks span >> sub_width
        "sparse": rng.integers(0, n_bins, 1 << 12),
        # ragged: not a multiple of block_rows, with sentinels + negatives
        "ragged": np.where(rng.random(3001) < 0.2, -3,
                           np.where(rng.random(3001) < 0.1, n_bins + 7,
                                    rng.integers(0, n_bins, 3001))),
    }
    for name, idx_np in cases.items():
        idxs = jnp.asarray(idx_np.astype(np.int32))
        w = jnp.asarray(rng.integers(0, 2**20, idxs.shape[0])
                        .astype(np.int32))
        # the reference for the DOCUMENTED contract: every out-of-range
        # index drops (raw jnp .at[] would wrap negatives NumPy-style;
        # the MXU/onehot/hier kernels all drop them, and no caller ever
        # produces one — wave sentinels are >= n_bins)
        ref = np.asarray(weighted_bincount_xla(
            jnp.where(idxs < 0, n_bins, idxs), w, n_bins))
        got = np.asarray(weighted_bincount_hier(idxs, w, n_bins))
        assert (got == ref).all(), name


def test_weighted_bincount_sorted_exact_past_int32_total():
    """The wrapped-cumsum trick: the GLOBAL total overflows int32 but
    every per-bin sum stays < 2**31, so boundary diffs remain exact."""
    import jax.numpy as jnp
    from radixhashjoin_tpu.ops.tables import weighted_bincount_sorted
    n_bins = 8
    n = 1 << 16
    idxs = jnp.asarray(np.arange(n, dtype=np.int32) % n_bins)
    w = jnp.full(n, 1 << 16, jnp.int32)     # total = 2**32 (wraps), per
    out = np.asarray(weighted_bincount_sorted(idxs, w, n_bins))
    assert (out == (n // n_bins) * (1 << 16)).all()   # bin sum = 2**29


def test_table_gather_onehot_exact_full_int32():
    import jax.numpy as jnp
    from radixhashjoin_tpu.ops.tables import table_gather_onehot
    rng = np.random.default_rng(6)
    table = jnp.asarray(rng.integers(0, 2**31 - 1, 512, dtype=np.int64)
                        .astype(np.int32))
    keys = jnp.asarray(rng.integers(0, 512, 4096).astype(np.int32))
    got = np.asarray(table_gather_onehot(table, keys))
    assert (got == np.asarray(table)[np.asarray(keys)]).all()


def test_kernel_policy_gated_on_measured_device_kind(monkeypatch):
    """The MXU/onehot auto thresholds were measured on a v5e; any OTHER
    TPU kind (v4, v5p, v6e) must fall back to the XLA engines under
    "auto" instead of silently inheriting v5e breakevens."""
    from types import SimpleNamespace

    import jax

    from radixhashjoin_tpu.ops import tables

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for kind, want in [("TPU v4", False), ("TPU v5p", False),
                       ("TPU v6 lite", False), ("TPU v5 lite", True),
                       ("TPU v5e", True)]:
        monkeypatch.setattr(
            jax, "devices",
            lambda kind=kind: [SimpleNamespace(device_kind=kind)])
        assert tables._measured_tpu() is want, kind
        assert tables._gather_auto(1024, 1 << 20) is want, kind
    # CPU backend never engages the measured-kind paths
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert tables._measured_tpu() is False


def test_scatter_add_window_impls_exact():
    """scatter_add_window (the huge-build window-loop kernel router)
    must accumulate bit-identically to acc.at[idx].add(mode='drop') for
    every impl, including the masked-row sentinel (idx == n_bins) and a
    nonzero running accumulator."""
    import jax.numpy as jnp
    import numpy as np
    from radixhashjoin_tpu.ops.tables import scatter_add_window
    rng = np.random.default_rng(11)
    n, n_bins = 8192, 1 << 14
    idx = rng.integers(0, n_bins, n).astype(np.int32)
    idx[::7] = n_bins                      # drop sentinel
    w = rng.integers(0, 1000, n).astype(np.int32)
    acc0 = jnp.asarray(rng.integers(0, 50, n_bins).astype(np.int32))
    want = np.asarray(scatter_add_window(acc0, jnp.asarray(idx),
                                         jnp.asarray(w), "xla"))
    for impl in ("mxu", "hier"):
        got = np.asarray(scatter_add_window(acc0, jnp.asarray(idx),
                                            jnp.asarray(w), impl))
        assert (got == want).all(), impl


def test_wide_gather_kernels_exact():
    """table_gather_{diffcum,hier,pallas}: exact vs the engine on
    sorted keys, including out-of-range sentinels (drop -> 0),
    negatives, and sparse inputs that force hier/pallas spill
    fallbacks (VERDICT r4 #1 kernels)."""
    import numpy as np
    import jax.numpy as jnp
    from radixhashjoin_tpu.ops.tables import (
        table_gather_diffcum, table_gather_hier, table_gather_pallas)
    rng = np.random.default_rng(5)
    for n, bins in ((1 << 15, 1 << 12), (100001, 1 << 16),
                    (50000, 1 << 20)):
        table = rng.integers(-2**31, 2**31 - 1, bins).astype(np.int32)
        keys = np.sort(rng.integers(0, bins, n).astype(np.int32))
        keys[:3] = -2
        keys[-4:] = bins
        ok = (keys >= 0) & (keys < bins)
        ref = np.where(ok, table[np.clip(keys, 0, bins - 1)], 0)
        t, k = jnp.asarray(table), jnp.asarray(keys)
        assert (np.asarray(table_gather_diffcum(t, k)) == ref).all()
        assert (np.asarray(table_gather_hier(t, k)) == ref).all()
        assert (np.asarray(
            table_gather_pallas(t, k, interpret=True)) == ref).all()


def test_presorted_bincount_exact_even_when_promise_broken():
    """weighted_bincount_hier(presorted=True) must stay exact when the
    input violates the sortedness promise (masked-to-sentinel rows in
    the middle anchor blocks above their neighbors): negative-local
    rows spill to the engine scatter instead of silently dropping."""
    import numpy as np
    import jax.numpy as jnp
    from radixhashjoin_tpu.ops.tables import (weighted_bincount_hier,
                                              weighted_bincount_xla)
    rng = np.random.default_rng(11)
    n, bins = 1 << 14, 1 << 13
    idx = np.sort(rng.integers(0, bins, n).astype(np.int32))
    idx[rng.integers(0, n, 500)] = bins          # sentinels mid-stream
    w = rng.integers(0, 100, n).astype(np.int32)
    ref = np.asarray(weighted_bincount_xla(jnp.asarray(idx),
                                           jnp.asarray(w), bins))
    got = np.asarray(weighted_bincount_hier(jnp.asarray(idx),
                                            jnp.asarray(w), bins,
                                            presorted=True))
    assert (got == ref).all()
