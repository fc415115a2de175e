"""Scaling-efficiency harness: engine-level distributed join throughput
at N = {1, 2, 4, 8} devices (BASELINE.json configs 4-5 reporting shape).

Each device count runs in its own subprocess (the XLA host-platform
device count is fixed at backend init). The measured step is the
engine's real multi-chip join: DistExecutor case-1 — skew-aware level-0
exchange, chip-local sort join, expansion into the sharded intermediate,
psum'd projections — on a synthetic uniform workload.

Prints one JSON line per N plus a summary with per-device efficiency
relative to N=1. On a single physical host the "devices" are virtual CPU
shards sharing the same cores, so efficiency here validates the HARNESS
(and the SPMD program's weak-scaling structure); real pod numbers come
from running the same script where jax.devices() are real chips.

Usage: python scripts/scale_efficiency.py [--rows 18] [--ns 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def worker(n_devices: int, log_rows: int, exchange: bool = False) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").split(
            "--xla_force_host_platform_device_count")[0]
        + f" --xla_force_host_platform_device_count={n_devices}").strip()
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import numpy as np
    from radixhashjoin_tpu.config import EngineConfig
    from radixhashjoin_tpu.parallel import DistExecutor
    from radixhashjoin_tpu.storage import Relation
    from radixhashjoin_tpu.workload import JoinPred, Projection, Query

    n = 1 << log_rows
    rng = np.random.default_rng(0)
    rels = [Relation([rng.integers(0, n // 4, n).astype(np.uint64),
                      rng.integers(0, 1000, n).astype(np.uint64)])
            for _ in range(2)]
    cfg = EngineConfig(factorized=not exchange)
    ex = DistExecutor(rels, cfg, n_devices=n_devices)
    q = Query([0, 1], [JoinPred(0, 0, 1, 0)], [],
              [Projection(0, 1), Projection(1, 1)])
    ex.execute(q)                       # compile + warm
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        ex.execute(q)
    dt = (time.time() - t0) / iters
    print(json.dumps({
        "metric": "dist_engine_join_tuples_per_s",
        "path": "exchange" if exchange else "ftree",
        "devices": n_devices,
        "rows_per_side": n, "value": round(2 * n / dt), "unit": "tuples/s",
        "seconds": round(dt, 4)}))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=18, help="log2 rows/side")
    p.add_argument("--ns", default="1,2,4,8")
    p.add_argument("--worker", type=int, default=None)
    p.add_argument("--exchange", action="store_true",
                   help="force the exchange path (factorized off)")
    args = p.parse_args()
    if args.worker is not None:
        worker(args.worker, args.rows, args.exchange)
        return

    results = {}
    for n in (int(x) for x in args.ns.split(",")):
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(n),
             "--rows", str(args.rows)]
            + (["--exchange"] if args.exchange else []),
            capture_output=True, text=True, timeout=1200)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(json.dumps({"devices": n, "error": out.stderr[-400:]}))
            continue
        rec = json.loads(line[-1])
        results[n] = rec
        print(json.dumps(rec))
    if 1 in results:
        base = results[1]["value"]
        for n, rec in sorted(results.items()):
            eff = rec["value"] / (base * n)
            print(json.dumps({
                "metric": "scaling_efficiency", "devices": n,
                "value": round(eff, 3), "unit": "fraction_of_linear"}))


if __name__ == "__main__":
    main()
