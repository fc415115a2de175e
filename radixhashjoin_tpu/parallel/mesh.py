"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    """1-D mesh over the first n devices (joins shard over one hash axis).

    Query execution shards the *hash space* (radix digits) — the analog of
    the reference's per-bucket JoinJob fan-out (Result.cpp:100-107) — so a
    single axis is the natural topology; batches of queries can later stack
    a second (data-parallel) axis.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))
