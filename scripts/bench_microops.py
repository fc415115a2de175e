"""Micro-time the engine's primitive ops at golden-workload shapes.

Times each primitive (argsort, domain scatter/cumsum, gather, filter,
probe, expand, terminal) at the padded shapes the 50-query workload
actually uses, so per-query device time (~4-5 ms across ~30 ops) can be
attributed. Prints one JSON line per op.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    DOMAIN = 131072
    for n in (8192, 65536):
        v = jax.random.randint(key, (n,), 0, DOMAIN, jnp.int32)
        rows = []
        rows.append(("argsort", timeit(jax.jit(jnp.argsort), v)))
        rows.append(("sort", timeit(jax.jit(jnp.sort), v)))

        def scatter_add(x):
            return jnp.zeros(DOMAIN, jnp.int32).at[x].add(1, mode="drop")
        rows.append(("scatter_add_domain", timeit(jax.jit(scatter_add), v)))
        rows.append(("cumsum_domain",
                     timeit(jax.jit(jnp.cumsum),
                            jnp.zeros(DOMAIN, jnp.int32))))
        rows.append(("cumsum_n", timeit(jax.jit(jnp.cumsum), v)))
        tbl = jnp.zeros(DOMAIN, jnp.int32)
        rows.append(("gather_domain",
                     timeit(jax.jit(lambda t, i: t[i]), tbl, v)))

        def filt(x):
            m = x < 1000
            return jnp.cumsum(m.astype(jnp.int32)), m
        rows.append(("filter_mask_cumsum", timeit(jax.jit(filt), v)))

        from radixhashjoin_tpu.ops.join_dense import dense_probe, dense_expand
        cnt = jnp.int32(n - 7)
        pr = dense_probe(v, cnt, v, cnt, DOMAIN)
        rows.append(("dense_probe",
                     timeit(lambda a: dense_probe(a, cnt, a, cnt, DOMAIN), v)))
        rows.append(("dense_expand",
                     timeit(lambda p: dense_expand(*p[:4], n), pr)))
        for name, s in rows:
            print(json.dumps({"metric": "microop_us", "op": name, "n": n,
                              "value": round(s * 1e6, 1)}))


if __name__ == "__main__":
    main()
