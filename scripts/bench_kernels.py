"""Kernel-level microbenchmarks: the evidence base for the engine's
kernel strategy (one JSON line per measurement).

Measures, on the current JAX backend:
  * XLA fused gather bandwidth (column lookup, the engine's hottest
    primitive) — decides whether a Pallas VMEM-table gather could pay.
    Measured 2026-08-18 on a v5e chip IN DEGRADED TRANSPORT MODE (see
    _enter_degraded_mode): ~0.5 GB/s / ~116 M elem/s. The round-1
    roofline estimate of 0.85 GB/s was right; an earlier "~1 TB/s"
    reading was fresh-mode fiction (block_until_ready doesn't wait
    before the process's first readback).
  * Pallas radix histogram (ops/pallas_radix.py) vs the XLA bincount —
    the reference's multiHistogram analog (structs.cpp:111-121).
  * dense-probe and sort-probe throughput (the two join backends).
  * scatter-add (dense build) bandwidth.

Usage: python scripts/bench_kernels.py [--log-rows 23]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


# timing discipline lives in ONE place (r5: even degraded-mode
# block_until_ready can lie — only dependent value readbacks
# force completion; see scripts/_bench_timing.py)
from _bench_timing import (enter_degraded_mode as _enter_degraded_mode,
                           timeit as _timeit)


def _time(f, *args, iters=10):
    dt = _timeit(f, *args, iters=iters)
    return dt if dt is not None else 1e-9


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--log-rows", type=int, default=23)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from radixhashjoin_tpu.ops.join import probe_count
    from radixhashjoin_tpu.ops.join_dense import dense_probe
    from radixhashjoin_tpu.ops.pallas_radix import (radix_histogram,
                                                    radix_histogram_xla)

    _enter_degraded_mode()
    n = 1 << args.log_rows
    domain = 1 << 18
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    table = jax.random.randint(k1, (domain,), 0, 1000, dtype=jnp.int32)
    idx = jax.random.randint(k2, (n,), 0, domain, dtype=jnp.int32)
    platform = jax.devices()[0].platform

    # gather (column lookup)
    dt = _time(jax.jit(lambda t, i: t[i]), table, idx)
    print(json.dumps({"metric": "xla_gather_gbps", "platform": platform,
                      "rows": n, "value": round(n * 4 / dt / 1e9, 1),
                      "unit": "GB/s", "seconds": round(dt, 6)}))

    # scatter-add (dense hash build analog)
    f = jax.jit(lambda i: jnp.zeros(domain, jnp.int32).at[i].add(1))
    dt = _time(f, idx)
    print(json.dumps({"metric": "xla_scatter_add_gbps",
                      "platform": platform, "rows": n,
                      "value": round(n * 4 / dt / 1e9, 1), "unit": "GB/s",
                      "seconds": round(dt, 6)}))

    # radix histogram: Pallas kernel vs XLA bincount
    interpret = platform != "tpu"
    cnt = jnp.int32(n)
    dt_p = _time(lambda v: radix_histogram(v, cnt, 256,
                                           interpret=interpret), idx,
                 iters=3 if interpret else 10)
    dt_x = _time(jax.jit(lambda v: radix_histogram_xla(v, cnt, 256)), idx)
    print(json.dumps({"metric": "pallas_radix_histogram_tuples_per_s",
                      "platform": platform, "rows": n,
                      "value": round(n / dt_p), "unit": "tuples/s",
                      "xla_bincount_tuples_per_s": round(n / dt_x),
                      "interpret": interpret}))

    # join probes
    rv = jax.random.randint(k1, (n,), 0, domain, dtype=jnp.int32)
    dt = _time(lambda l, r: dense_probe(l, cnt, r, cnt, domain), idx, rv)
    print(json.dumps({"metric": "dense_probe_tuples_per_s",
                      "platform": platform, "rows": n,
                      "value": round(2 * n / dt), "unit": "tuples/s"}))
    dt = _time(lambda l, r: probe_count(l, cnt, r, cnt), idx, rv)
    print(json.dumps({"metric": "sort_probe_tuples_per_s",
                      "platform": platform, "rows": n,
                      "value": round(2 * n / dt), "unit": "tuples/s"}))

    # Pallas one-pass partition + radix sort vs XLA argsort (the honest
    # comparison behind keeping jnp.argsort in the probe: the one-hot
    # rank kernel is correct on TPU but O(n_bins)/element — see
    # ops/pallas_partition.py docstring)
    from radixhashjoin_tpu.ops.pallas_partition import (partition_order,
                                                        radix_sort_order)
    digits = jax.random.randint(k2, (n,), 0, 256, dtype=jnp.int32)
    iters = 2 if interpret else 5
    dt_p = _time(lambda d: partition_order(d, 256, interpret=interpret)[0],
                 digits, iters=iters)
    dt_s = _time(lambda k: radix_sort_order(k, 18, 9, interpret=interpret),
                 idx, iters=iters)
    dt_a = _time(jax.jit(lambda k: jnp.argsort(k, stable=True)), idx)
    print(json.dumps({"metric": "pallas_partition_tuples_per_s",
                      "platform": platform, "rows": n,
                      "value": round(n / dt_p), "unit": "tuples/s",
                      "radix_sort_18bit_tuples_per_s": round(n / dt_s),
                      "xla_argsort_tuples_per_s": round(n / dt_a),
                      "interpret": interpret}))


if __name__ == "__main__":
    main()
