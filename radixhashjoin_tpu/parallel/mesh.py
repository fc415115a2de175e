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
        if n_devices > len(devs):
            # never truncate silently: a caller asking for an 8-chip
            # mesh on a 1-device backend would otherwise "succeed" with
            # single-chip shapes (this bit the AOT pod-cache recorder)
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are available "
                f"(platform {devs[0].platform}); set "
                f"--xla_force_host_platform_device_count / JAX_PLATFORMS"
                f" before jax initializes")
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))
