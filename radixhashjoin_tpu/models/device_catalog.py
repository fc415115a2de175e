"""Device-resident column catalog shared by the executors.

Columns upload once (int32 narrow path) and are reused by every query —
the reference instead re-materializes per-join tuple arrays
(structs.cpp:217-243); on TPU the relation lives in HBM for the process
lifetime and joins address it with rowid gathers.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..config import EngineConfig, DEFAULT
from ..storage import Relation
from ..utils.padding import bucket_size

# Values the narrow (int32-lane) device path can represent: the right-side
# join sentinel is INT32_MAX (ops/join.py), so data must stay strictly below.
NARROW_MAX = 2**31 - 2


class DeviceCatalog:
    def __init__(self, relations: Sequence[Relation],
                 config: EngineConfig = DEFAULT):
        self.relations = relations
        self.config = config
        self._cols: Dict[tuple, jax.Array] = {}
        self._iota: Dict[int, jax.Array] = {}

    def col(self, rel_id: int, col: int) -> jax.Array:
        key = (rel_id, col)
        if key not in self._cols:
            host = self.relations[rel_id].narrow_column(col)
            self._cols[key] = jax.device_put(host)
        return self._cols[key]

    def iota(self, size: int) -> jax.Array:
        if size not in self._iota:
            self._iota[size] = jnp.arange(size, dtype=jnp.int32)
        return self._iota[size]

    def bucket(self, n: int) -> int:
        return bucket_size(n, self.config.min_pad, self.config.pad_base)

    def narrow_ok(self, rel_ids) -> bool:
        for rel_id in rel_ids:
            rel = self.relations[rel_id]
            if any(s.max > NARROW_MAX for s in rel.stats):
                return False
        return True

    @property
    def domain(self) -> int:
        """Power-of-two bound > every column value across the catalog, for
        the dense join backend's direct-address tables."""
        if not hasattr(self, "_domain"):
            gmax = 0
            for rel in self.relations:
                for s in rel.stats:
                    gmax = max(gmax, s.max)
            d = 1024
            while d <= gmax + 1:
                d *= 2
            self._domain = d
        return self._domain
