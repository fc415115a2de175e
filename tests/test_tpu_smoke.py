"""TPU-gated huge-path smoke tier (VERDICT r4 weak #4).

The 1B-row behavior of the lazy/fused/sorted-window machinery is
bench-proven (EVIDENCE_r05) but the benches are manual; this tier
keeps huge-path regressions from waiting for the next bench session.
It runs ONLY on a real TPU (the conftest pins CI to the CPU platform,
where these sizes would take minutes and the kernels-under-test are
policy-gated off anyway):

    RHJ_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py \
        -m tpu_smoke --run-tpu-smoke

Sizes are the smallest that cross the REAL huge-node threshold
(_BIG_WAVE_ROWS = 2^28): one window loop + a ragged tail, sorted
windows engaged by the auto policy.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.tpu_smoke


def _on_tpu() -> bool:
    import jax
    return jax.default_backend() == "tpu"


@pytest.mark.skipif("not config.getoption('--run-tpu-smoke', False)",
                    reason="TPU smoke tier: pass --run-tpu-smoke on "
                           "real hardware")
def test_huge_zipf_join_smoke():
    if not _on_tpu():
        pytest.skip("needs a real TPU")
    from radixhashjoin_tpu.config import EngineConfig
    from radixhashjoin_tpu.models.engine import Engine
    from radixhashjoin_tpu.storage import Relation
    from radixhashjoin_tpu.workload import (FilterPred, JoinPred,
                                            Projection, Query)
    n, n_keys = (1 << 28) + 12345, 1 << 20        # ragged huge node
    rng = np.random.default_rng(3)
    u = rng.random(n) + 1e-12
    zk = np.minimum(u ** (-10.0), n_keys - 1).astype(np.uint64)
    del u
    vals = rng.integers(0, 1000, n).astype(np.uint64)
    fact = Relation([zk, vals])
    dv = rng.integers(0, 1000, n_keys).astype(np.uint64)
    dim = Relation([np.arange(n_keys, dtype=np.uint64), dv])
    q = Query([0, 1], [JoinPred(0, 0, 1, 0)],
              [FilterPred(1, 1, "<", 900)],
              [Projection(0, 1), Projection(1, 1)])
    keep = (dv < 900)[zk.astype(np.int64)]
    e0 = int(vals[keep].sum(dtype=np.uint64)) % 2**64
    cnt = np.bincount(zk[keep].astype(np.int64),
                      minlength=n_keys).astype(np.uint64)
    e1 = int((dv * cnt * (dv < 900)).sum(dtype=np.uint64)) % 2**64
    eng = Engine([fact, dim], EngineConfig())
    got = eng.run_workload([[q]])
    assert got == [f"{e0} {e1}"], got
