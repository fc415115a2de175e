"""Wide-table message-GATHER shootout (VERDICT r4 #1).

The committed floor of every huge-node pass is the XLA gather engine:
g = B[keys] at ~9 ns/element on a v5e regardless of table width
(EVIDENCE_r02). A 2^20-bin message table is only 4 MB — trivially
VMEM-resident — so the engine's fixed-function rate is ~100x off
bandwidth. Candidates measured here, all exact vs the engine:

  * xla          — the gather engine, random keys (the baseline)
  * xla_sorted   — the engine fed SORTED keys (locality probe)
  * diffcum      — keys pre-sorted: bounds = searchsorted(sk, bin
                   edges), scatter the table's first differences at the
                   bounds, wrapped int32 cumsum reconstructs B[sk]
                   exactly (values are int32; mod-2^32 prefix
                   differences recover them) — NO gather at all
  * hier         — keys pre-sorted: blocked one-hot MXU lookup from
                   sub_width-wide table windows anchored at each
                   block's first key (the gather mirror of
                   ops/tables.py:weighted_bincount_hier)
  * pallas       — keys pre-sorted: whole table VMEM-resident as
                   (8192, 128); per (8192, 128) key block the kernel
                   fetches rows rmin/rmin+1 by sublane dynamic-gather
                   and lane-crossbars the low 7 bits
                   (tpu.dynamic_gather both axes); rows spanning > 2
                   table rows spill to an engine fallback
  * sort1/2/3    — lax.sort carrying 0/1/2 extra operands (what a
                   sorted-consumption pipeline pays up front)
  * unsort       — scatter g_sorted back to input order (what a
                   drop-in replacement pays at the end)

Timings use the degraded-mode discipline (bench_kernels.py): the axon
tunnel lies to block_until_ready before a process's first readback.

Usage: python scripts/bench_gather.py [--log-rows 24] [--log-bins 20]
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
    p.add_argument("--log-bins", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from radixhashjoin_tpu.ops.tables import (
        table_gather_diffcum, table_gather_hier, table_gather_pallas)

    platform = jax.devices()[0].platform
    _enter_degraded_mode()
    n = 1 << args.log_rows
    bins = 1 << args.log_bins
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    table = jax.random.randint(k1, (bins,), 0, 2**31 - 1, dtype=jnp.int32)
    keys = jax.random.randint(k2, (n,), 0, bins, dtype=jnp.int32)
    sk = jnp.sort(keys)
    aux1 = jax.random.randint(k1, (n,), 0, 1000, dtype=jnp.int32)
    aux2 = jax.random.randint(k2, (n,), 0, 1000, dtype=jnp.int32)

    f_x = jax.jit(lambda t, k: t.at[k].get(mode="promise_in_bounds"))
    f_xs = jax.jit(lambda t, k: t.at[k].get(mode="promise_in_bounds",
                                            indices_are_sorted=True))
    f_dc = jax.jit(partial(table_gather_diffcum))
    f_hier = jax.jit(partial(table_gather_hier))
    f_pl = jax.jit(partial(table_gather_pallas))

    ref_r = np.asarray(f_x(table, keys))
    ref_s = np.asarray(f_x(table, sk))
    out = {"metric": "table_gather_wide_elems_per_s", "platform": platform,
           "rows": n, "bins": bins}

    dt = _time(f_x, table, keys)
    out["xla"] = round(n / dt) if dt else "below_floor"
    dt = _time(f_x, table, sk)
    out["xla_sorted"] = round(n / dt) if dt else "below_floor"
    dt = _time(f_xs, table, sk)
    out["xla_sorted_hint"] = round(n / dt) if dt else "below_floor"

    for name, f in (("diffcum", f_dc), ("hier", f_hier),
                    ("pallas", f_pl)):
        try:
            got = np.asarray(f(table, sk))
            assert (got == ref_s).all(), f"{name} mismatch"
            dt = _time(f, table, sk)
            out[name] = round(n / dt) if dt else "below_floor"
        except Exception as e:  # keep the shootout alive per-candidate
            out[name] = f"error: {str(e)[:120]}"

    # sort costs (what sorted consumption pays up front)
    f_s1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1))
    f_s2 = jax.jit(lambda k, a: jax.lax.sort((k, a), num_keys=1))
    f_s3 = jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1))
    for name, f, a in (("sort1", f_s1, (keys,)),
                       ("sort2", f_s2, (keys, aux1)),
                       ("sort3", f_s3, (keys, aux1, aux2))):
        dt = _time(f, *a)
        out[name] = round(n / dt) if dt else "below_floor"

    # argsort + unsort scatter (drop-in replacement overhead)
    f_arg = jax.jit(lambda k: jax.lax.sort((k, jax.lax.iota(jnp.int32, n)),
                                           num_keys=1))
    _, perm = f_arg(keys)
    g_sorted = f_x(table, sk)
    f_un = jax.jit(lambda p, g: jnp.zeros(n, jnp.int32).at[p].set(
        g, unique_indices=True))
    assert (np.asarray(f_un(perm, g_sorted)) == ref_r).all()
    dt = _time(f_un, perm, g_sorted)
    out["unsort"] = round(n / dt) if dt else "below_floor"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
