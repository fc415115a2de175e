"""Pre-AOT-compile the pod SPMD programs into the persistent cache.

A real multi-chip allocation pays XLA's compile cost on first run —
measured 60-90 s PER SPMD program for 8-chip v5e programs
(EVIDENCE_r03.md "SPMD compile cost"). This script compiles the engine's
distributed programs for a target TPU topology AHEAD of time, with no
TPU devices attached (`jax.experimental.topologies` detached AOT), and
persists them in `.jax_cache` so a real pod allocation measures scaling
on day one instead of compiling (VERDICT r3 #6).

Mechanism (two phases, because the recording needs the CPU backend with
N virtual devices while the TPU compiler needs the default platform):

  1. RECORD (subprocess, JAX_PLATFORMS=cpu, N virtual devices): run the
     scale_efficiency workload — BOTH engine paths (factorized d_ftree
     and the case-1 exchange) — through the real DistExecutor, with the
     dist ops wrapped to capture every invocation's static arguments and
     array avals (shape/dtype/PartitionSpec). Shard capacities depend
     only on n_devices, so the CPU-recorded shapes equal the real pod's.
  2. COMPILE (this process, default platform): rebuild each unique
     signature against a detached `get_topology_desc` mesh of the same
     size and `jit.lower(...).compile()` it. The persistent compilation
     cache keys on the optimized HLO + compile options, so the real
     pod's first run hits the cache.

Usage:
    python scripts/aot_pod_cache.py [--topology v5e:2x4] [--rows 18]
Prints one JSON line per compiled program (compile seconds); run it
twice — the second run's compile times collapsing to < 1 s each IS the
cache-hit proof.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

_REC_OPS = ("d_ftree", "d_case1_probe", "d_case1_expand", "d_case2_probe",
            "d_case2_expand", "d_eq_mat", "d_eq_rows", "d_filter",
            "d_project", "d_seed")


def _force_device_count(flags: str, n_devices: int) -> str:
    """Replace any --xla_force_host_platform_device_count token while
    keeping every OTHER flag (splitting on the flag name discarded
    whatever followed it — ADVICE r4)."""
    kept = [t for t in flags.split()
            if not t.startswith("--xla_force_host_platform_device_count")]
    kept.append(f"--xla_force_host_platform_device_count={n_devices}")
    return " ".join(kept)


def record(n_devices: int, log_rows: int, out_path: str) -> None:
    """Phase 1 (CPU subprocess): run both engine paths, capture every
    dist-op call signature."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = _force_device_count(
        os.environ.get("XLA_FLAGS", ""), n_devices)
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from radixhashjoin_tpu.config import EngineConfig
    from radixhashjoin_tpu.parallel import DistExecutor, dist_executor
    from radixhashjoin_tpu.storage import Relation
    from radixhashjoin_tpu.workload import JoinPred, Projection, Query

    calls = []

    def encode(a):
        if isinstance(a, Mesh):
            return ("mesh",)
        if isinstance(a, jax.Array):
            spec = getattr(getattr(a, "sharding", None), "spec", None)
            return ("array", tuple(a.shape), np.dtype(a.dtype).str,
                    tuple(spec) if spec is not None else None)
        return ("static", a)

    def wrap(name, fn):
        def wrapped(*args, **kwargs):
            calls.append((name, tuple(encode(a) for a in args),
                          tuple((k, encode(v))
                                for k, v in sorted(kwargs.items()))))
            return fn(*args, **kwargs)
        return wrapped

    saved = {n: getattr(dist_executor, n) for n in _REC_OPS
             if hasattr(dist_executor, n)}
    for n, fn in saved.items():
        setattr(dist_executor, n, wrap(n, fn))

    n = 1 << log_rows
    rng = np.random.default_rng(0)
    rels = [Relation([rng.integers(0, n // 4, n).astype(np.uint64),
                      rng.integers(0, 1000, n).astype(np.uint64)])
            for _ in range(2)]
    q = Query([0, 1], [JoinPred(0, 0, 1, 0)], [],
              [Projection(0, 1), Projection(1, 1)])
    for factorized in (True, False):            # ftree + exchange paths
        ex = DistExecutor(rels, EngineConfig(factorized=factorized),
                          n_devices=n_devices)
        ex.execute(q)
    with open(out_path, "wb") as f:
        pickle.dump(calls, f)
    print(f"recorded {len(calls)} dist-op calls", file=sys.stderr)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--topology", default="v5e:2x4",
                   help="detached TPU topology (get_topology_desc name)")
    p.add_argument("--rows", type=int, default=18,
                   help="log2 rows/side of the scale_efficiency workload")
    p.add_argument("--record-worker", default=None, help=argparse.SUPPRESS)
    p.add_argument("--devices", type=int, default=0, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.record_worker:
        record(args.devices, args.rows, args.record_worker)
        return

    # ---- phase 1: record signatures on a CPU mesh of the same size ----
    import numpy as np
    shape = args.topology.split(":")[1]
    n_devices = int(np.prod([int(x) for x in shape.split("x")]))
    rec_path = f"/tmp/aot_pod_calls_{n_devices}_{args.rows}.pkl"
    # the worker MUST see the CPU platform before anything imports jax:
    # an axon/TPU sitecustomize on PYTHONPATH pins the platform at
    # interpreter startup (earlier than record() runs), which silently
    # recorded single-chip shapes — strip it and force cpu in the env
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p) or os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
    env["XLA_FLAGS"] = _force_device_count(env.get("XLA_FLAGS", ""),
                                           n_devices)
    subprocess.run([sys.executable, __file__, "--record-worker", rec_path,
                    "--devices", str(n_devices), "--rows", str(args.rows)],
                   check=True, env=env, timeout=1800)
    with open(rec_path, "rb") as f:
        calls = pickle.load(f)

    # ---- phase 2: detached-topology AOT compile of each signature ----
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    import radixhashjoin_tpu  # noqa: F401  (persistent cache setup)
    from radixhashjoin_tpu.parallel import dist_ops

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    mesh = Mesh(np.array(topo.devices), ("x",))   # make_mesh's axis name

    def decode(item):
        kind = item[0]
        if kind == "mesh":
            return mesh
        if kind == "array":
            _, shp, dt, spec = item
            sh = (NamedSharding(mesh, PartitionSpec(*spec))
                  if spec is not None else None)
            return jax.ShapeDtypeStruct(shp, np.dtype(dt), sharding=sh)
        return item[1]

    # jax's persistent compilation cache does not persist detached
    # topology compiles (verified: zero .jax_cache entries from them),
    # so the compiled pod executables are serialized EXPLICITLY
    # (jax.experimental.serialize_executable) — a real pod allocation
    # deserialize_and_load()s them in <1 s instead of compiling
    import hashlib

    from jax.experimental import serialize_executable as se

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache", "aot_pod")
    os.makedirs(cache_dir, exist_ok=True)

    # the serialized executable is only valid for the jax/jaxlib pair
    # that produced it — fold both versions into the cache key so an
    # upgraded environment recompiles instead of counting a stale blob
    # as a hit (ADVICE r4)
    import jaxlib

    version_tag = (jax.__version__, getattr(jaxlib, "__version__", "?"))
    seen = set()
    total = 0.0
    hits = 0
    for name, enc, enc_kw in calls:
        key = (name, pickle.dumps((version_tag, enc, enc_kw)))
        if key in seen:
            continue
        seen.add(key)
        h = hashlib.sha256(key[1]).hexdigest()[:16]
        path = os.path.join(
            cache_dir,
            f"{name}-{args.topology.replace(':', '_')}-{h}.bin")
        if os.path.exists(path):
            t0 = time.time()
            with open(path, "rb") as f:
                pickle.load(f)                  # loadable blob on disk
            dt = time.time() - t0
            hits += 1
            print(json.dumps({"metric": "aot_pod_compile_s",
                              "program": name,
                              "topology": args.topology, "cached": True,
                              "rows": 1 << args.rows,
                              "value": round(dt, 2), "unit": "s"}))
            continue
        fn = getattr(dist_ops, name)
        argv = [decode(a) for a in enc]
        kw = {k: decode(v) for k, v in enc_kw}
        t0 = time.time()
        try:
            compiled = fn.lower(*argv, **kw).compile()
            blob, in_tree, out_tree = se.serialize(compiled)
            with open(path, "wb") as f:
                pickle.dump((blob, in_tree, out_tree), f)
        except Exception as e:  # keep going: one bad signature, not all
            print(json.dumps({"metric": "aot_pod_compile_s",
                              "program": name, "error": str(e)[:200]}))
            continue
        dt = time.time() - t0
        total += dt
        print(json.dumps({"metric": "aot_pod_compile_s", "program": name,
                          "topology": args.topology, "cached": False,
                          "rows": 1 << args.rows,
                          "value": round(dt, 2), "unit": "s"}))
    print(json.dumps({"metric": "aot_pod_compile_total_s",
                      "topology": args.topology,
                      "programs": len(seen), "cache_hits": hits,
                      "value": round(total, 2), "unit": "s"}))


if __name__ == "__main__":
    main()
