"""radixhashjoin_tpu — a TPU-native vectorized query-execution engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
engine `pelekoudasq/radixHashJoin` (C++/pthreads, see /root/reference):
an in-memory analytical executor for SPJ-aggregate workloads in the
SIGMOD-2018-contest format (binary columnar uint64 relations; queries of the
form ``tables|predicates|projections``; output = one line of SUM projections
per query).

Design stance (see SURVEY.md §7): we keep the reference's *semantics* —
filters -> ordered pipeline of equi-joins with row-id intermediate chaining ->
SUM projections, validated in SURVEY.md §9 — and none of its *mechanisms*.
Thread pools, paged result lists, chained hash tables and per-pair scans
dissolve into array programs: masks, sorts, scans, gathers, segment ops and
collectives, compiled once per shape-bucket by XLA and scaled over a device
mesh with `shard_map` + `all_to_all`.

Layout:
  storage    — columnar relation loading (np.memmap) + per-column stats
               (reference: structs.cpp:17-84)
  workload   — init/work stream parsing        (reference: Query.cpp:10-63, join.cpp:11-62)
  oracle     — NumPy executor of the validated semantics (test oracle)
  ops        — device operators: filters, expand-join, aggregation, radix
  models     — query executor + (stats-driven) planner
  parallel   — device mesh, distributed radix-exchange join
  runtime    — native (C++) loader/parser bindings, host pipeline
  utils      — padding policy, primes, profiling
"""

from __future__ import annotations

import os

# Persistent XLA compilation cache: the engine compiles one program per
# (operator, shape-bucket); cache makes cold starts cheap across processes.
# Set RHJ_NO_JAX_CACHE=1 to disable (e.g. for compile-time benchmarking).
if not os.environ.get("RHJ_NO_JAX_CACHE"):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))

from .config import EngineConfig  # noqa: E402
from .storage import Relation, Catalog, load_relation  # noqa: E402
from .workload import Query, parse_work_stream, parse_init_stream  # noqa: E402

__all__ = [
    "EngineConfig",
    "Relation",
    "Catalog",
    "load_relation",
    "Query",
    "parse_work_stream",
    "parse_init_stream",
]

__version__ = "0.1.0"
