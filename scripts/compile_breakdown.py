"""Cold-start compile breakdown of the golden workload (VERDICT r4
weak #1: cold_wall_s regressed 18.3 s -> 118 s between r3 and r4).

Runs the full small workload against a FRESH XLA compilation cache
(JAX_COMPILATION_CACHE_DIR -> temp dir) with every `run_stage` /
`run_filter_batch` / catalog upload dispatch wrapped in a wall-clock
timer. The first call of each distinct program signature pays its
compile; the per-call table printed here names where the cold seconds
actually go (one JSON line per dispatch >= 0.5 s, plus a summary).

Usage:  python scripts/compile_breakdown.py
(TPU: ~2 min of compiles; the process-global fresh cache dir means the
repo's persistent .jax_cache is untouched.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="rhj_coldcache_")

SMALL = "/root/reference/small"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage-group", type=int, default=0,
                    help="override EngineConfig.stage_group (0 = default)")
    args = ap.parse_args()
    import jax

    from radixhashjoin_tpu.config import EngineConfig
    from radixhashjoin_tpu.models.engine import Engine
    from radixhashjoin_tpu.ops import stage
    from radixhashjoin_tpu.storage import load_relation
    from radixhashjoin_tpu.workload import parse_work_stream

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    calls = []
    orig = stage.run_stage

    def timed(*a, **k):
        plan = a[7] if len(a) > 7 else k.get("plan")
        ops = tuple(op[0] for op in plan) if plan else ()
        t0 = time.time()
        out = orig(*a, **k)
        jax.block_until_ready(out)
        calls.append((time.time() - t0, len(ops), ops[:8]))
        return out

    stage.run_stage = timed
    # batch.py binds run_stage at import time — patch there too
    from radixhashjoin_tpu.models import batch as batch_mod
    if hasattr(batch_mod, "run_stage"):
        batch_mod.run_stage = timed

    relations = [load_relation(f"{SMALL}/r{i}") for i in range(14)]
    with open(f"{SMALL}/small.work") as f:
        batches = parse_work_stream(f)
    with open(f"{SMALL}/small.result") as f:
        golden = [line.rstrip("\n") for line in f]

    t0 = time.time()
    cfg = (EngineConfig(stage_group=args.stage_group)
           if args.stage_group else EngineConfig())
    engine = Engine(relations, cfg)
    t_init = time.time() - t0
    t0 = time.time()
    got = engine.run_workload(batches)
    cold = time.time() - t0
    assert got == golden, "output mismatch"

    for dt, n_ops, head in sorted(calls, reverse=True):
        if dt >= 0.5:
            print(json.dumps({"metric": "cold_dispatch_s",
                              "value": round(dt, 2), "plan_ops": n_ops,
                              "head": list(head)}))
    print(json.dumps({
        "metric": "cold_breakdown_s", "unit": "s",
        "stage_group": cfg.stage_group,
        "engine_init_s": round(t_init, 2),
        "cold_wall_s": round(cold, 2),
        "n_stage_dispatches": len(calls),
        "stage_total_s": round(sum(c[0] for c in calls), 2),
        "other_s": round(cold - sum(c[0] for c in calls), 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
