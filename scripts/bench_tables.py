"""Message-table kernel shootout (ops/tables.py): the measurement base
for the ftree_scatter / ftree_gather "auto" policy.

Measures, at star-join-like shapes, B = zeros(bins).at[idx].add(w) as
  * xla    — the scatter engine (r2 baseline: ~110 M updates/s)
  * sorted — carrying sort + wrapped-cumsum boundary diffs (scatter-free)
  * onehot — Pallas one-hot accumulation (weighted radix histogram)
and g = B[keys] as
  * xla    — the gather engine (~9 ns/elem fixed)
  * onehot — MXU limb-matmul lookup

Every timing runs in degraded transport mode (see bench_kernels.py: the
axon tunnel lies to block_until_ready before a process's first
readback) and verifies exactness against the XLA reference first.

Usage: python scripts/bench_tables.py [--log-rows 24]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from _bench_timing import (enter_degraded_mode as _enter_degraded_mode,
                           timeit as _time)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--log-rows", type=int, default=24)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from radixhashjoin_tpu.ops.tables import (table_gather_onehot,
                                              weighted_bincount_hier,
                                              weighted_bincount_mxu,
                                              weighted_bincount_onehot,
                                              weighted_bincount_sorted,
                                              weighted_bincount_xla)

    platform = jax.devices()[0].platform
    interp = platform != "tpu"
    _enter_degraded_mode()
    n = 1 << args.log_rows
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    # ---- scatter shootout ----
    for log_bins in (9, 10, 11, 12, 16, 20, 21):
        bins = 1 << log_bins
        idx = jax.random.randint(k1, (n,), 0, bins, dtype=jnp.int32)
        # per-bin totals stay < 2**31: avg rows/bin * max weight
        wmax = max(min((1 << 31) // max(4 * n // bins, 1), 1000), 1)
        w = jax.random.randint(k2, (n,), 0, wmax, dtype=jnp.int32)
        fns = {"xla": jax.jit(partial(weighted_bincount_xla, n_bins=bins)),
               "sorted": jax.jit(partial(weighted_bincount_sorted,
                                         n_bins=bins))}
        if bins > 4096:
            # hierarchical build (sort + blocked MXU sub-tables +
            # window scatter), the wide-table contender; sweep the
            # sub-table width for the policy
            for sub in (1024, 2048, 4096):
                fns[f"hier{sub}"] = jax.jit(partial(
                    weighted_bincount_hier, n_bins=bins, sub_width=sub))
        if bins <= 8192:
            fns["mxu"] = jax.jit(partial(weighted_bincount_mxu,
                                         n_bins=bins))
        if bins <= 4096 and not interp:
            fns["onehot"] = jax.jit(partial(weighted_bincount_onehot,
                                            n_bins=bins, interpret=interp))
        ref = np.asarray(fns["xla"](idx, w))
        out = {"metric": "weighted_bincount_updates_per_s",
               "platform": platform, "rows": n, "bins": bins,
               "max_weight": wmax}
        for name, f in fns.items():
            assert (np.asarray(f(idx, w)) == ref).all(), name
            dt = _time(f, idx, w)
            out[name] = round(n / dt) if dt else "below_floor"
            out[f"{name}_s"] = round(dt, 5) if dt else None
        print(json.dumps(out))

    # ---- gather shootout ----
    for log_bins in (8, 10, 11, 12):
        bins = 1 << log_bins
        table = jax.random.randint(k1, (bins,), 0, 2**31 - 1,
                                   dtype=jnp.int32)
        keys = jax.random.randint(k2, (n,), 0, bins, dtype=jnp.int32)
        f_x = jax.jit(lambda t, k: t[k])
        f_o = jax.jit(table_gather_onehot)
        ref = np.asarray(f_x(table, keys))
        assert (np.asarray(f_o(table, keys)) == ref).all()
        out = {"metric": "table_gather_elems_per_s", "platform": platform,
               "rows": n, "bins": bins}
        for name, f in (("xla", f_x), ("onehot", f_o)):
            dt = _time(f, table, keys)
            out[name] = round(n / dt) if dt else "below_floor"
        print(json.dumps(out))


if __name__ == "__main__":
    main()
