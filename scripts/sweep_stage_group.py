"""Sweep EngineConfig.stage_group on the current backend.

The small-workload bench is transport-bound on axon (50 dispatches x
~2-7 ms tunnel overhead vs ~45 ms device compute). Grouping g queries
into one fused program per round trades dispatch count against program
size / compile count. Round-1 measured grouping slower pre-deferral;
this re-measures on the current engine (deferral + speculation landed).

One process => the axon handshake and compiles are paid once.
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import sys
import time

SMALL = "/root/reference/small"


def main() -> int:
    from radixhashjoin_tpu.config import EngineConfig
    from radixhashjoin_tpu.storage import load_relation
    from radixhashjoin_tpu.workload import parse_work_stream
    from radixhashjoin_tpu.models.engine import Engine

    relations = [load_relation(f"{SMALL}/r{i}") for i in range(14)]
    with open(f"{SMALL}/small.work") as f:
        batches = parse_work_stream(f)
    with open(f"{SMALL}/small.result") as f:
        golden = [l.rstrip("\n") for l in f]

    groups = [int(g) for g in (sys.argv[1:] or ["1", "2", "5", "10", "25"])]
    for g in groups:
        engine = Engine(relations, EngineConfig(stage_group=g))
        warm = engine.run_workload(batches)
        ok = warm == golden
        best = None
        for _ in range(3):
            engine.batch_executor.counters = {
                k: 0 for k in engine.batch_executor.counters}
            t0 = time.time()
            got = engine.run_workload(batches)
            wall = time.time() - t0
            ok = ok and got == golden
            if best is None or wall < best:
                best = wall
                counters = dict(engine.batch_executor.counters)
        print(json.dumps({"metric": "stage_group_sweep", "stage_group": g,
                          "wall_s": round(best, 4), "exact": ok, **counters}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
