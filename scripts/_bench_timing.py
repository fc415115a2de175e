"""Shared readback-forced timing for every kernel bench.

The axon transport can return from `jax.block_until_ready` WITHOUT
waiting — even after a process's first device->host readback — so any
timing built on it can report sub-floor fictions (several early-r5
"kernel rates" were exactly that; EVIDENCE_r05 "Measurement
discipline"). The only sync the transport cannot fake is a dependent
VALUE readback. This module is the single home of the discipline
(CLAUDE.md points here); bench scripts must not grow private copies.

Usage:
    from _bench_timing import enter_degraded_mode, timeit
    enter_degraded_mode()          # once per process, measures floor
    dt = timeit(f, *args)          # per-call seconds or None
"""

from __future__ import annotations

import time

_SYNC_FLOOR = 0.0


def _force(r) -> None:
    """Force completion of r via a real one-element value readback."""
    import jax
    import numpy as np
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])


def enter_degraded_mode() -> float:
    """One real readback (pays the tunnel handshake on first use) +
    measure the per-readback floor. Returns the floor (seconds)."""
    global _SYNC_FLOOR
    import jax
    import jax.numpy as jnp
    import numpy as np
    np.asarray(jnp.zeros(1))
    g = jax.jit(lambda x: x + 1)
    x = jnp.zeros(1, jnp.int32)
    floors = []
    for _ in range(5):
        t0 = time.time()
        _force(g(x))
        floors.append(time.time() - t0)
    _SYNC_FLOOR = min(floors)
    return _SYNC_FLOOR


def timeit(f, *args, iters: int = 10):
    """Per-call seconds: N chained dispatches ending in ONE dependent
    value readback, minus the readback floor, amortized over N. None
    when the measurement collapses below resolution (report that
    honestly instead of a fictitious rate)."""
    r = f(*args)
    _force(r)
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    _force(r)
    dt = (time.time() - t0 - _SYNC_FLOOR) / iters
    return dt if dt > 1e-6 else None
