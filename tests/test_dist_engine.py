"""Engine-level distributed execution on the 8-virtual-device CPU mesh:
full query semantics vs the oracle, Zipf skew through the heavy path, wide
values, and the golden workload (SURVEY.md §4 multi-chip test plan).
"""

import numpy as np
import pytest

from radixhashjoin_tpu.config import EngineConfig
from radixhashjoin_tpu.models.engine import Engine
from radixhashjoin_tpu.oracle import OracleExecutor, format_result
from radixhashjoin_tpu.parallel import DistExecutor
from radixhashjoin_tpu.storage import Relation
from radixhashjoin_tpu.workload import (FilterPred, JoinPred, Projection,
                                        Query)

from test_fuzz import _random_catalog, _random_query
from test_wide import _wide_catalog, _wide_filter_query

# SPMD CPU compiles dominate; deselected from the default run
pytestmark = pytest.mark.slow


def _check(rels, queries, config=None):
    oracle = OracleExecutor(rels)
    ex = DistExecutor(rels, config or EngineConfig(), n_devices=8)
    for q in queries:
        got = format_result(ex.execute(q), len(q.projections))
        exp = format_result(oracle.execute(q), len(q.projections))
        assert got == exp, (q, got, exp)


@pytest.mark.parametrize("seed", range(2))
def test_dist_fuzz_matches_oracle(seed):
    rng = np.random.default_rng(3000 + seed)
    rels = _random_catalog(rng)
    _check(rels, [_random_query(rng, rels) for _ in range(6)])


def test_dist_zipf_skew_heavy_path():
    # one key owns ~60% of both sides: its digit is globally heavy, so the
    # broadcast path MUST engage (an all_to_all-only design would need a
    # per-destination capacity of nearly the whole relation)
    rng = np.random.default_rng(42)
    n = 4096
    heavy_key = 24                     # digit 0 on an 8-chip mesh
    k1 = np.where(rng.random(n) < 0.6, heavy_key,
                  rng.integers(0, 500, n)).astype(np.uint64)
    k2 = np.where(rng.random(n) < 0.6, heavy_key,
                  rng.integers(0, 500, n)).astype(np.uint64)
    rels = [Relation([k1, rng.integers(0, 100, n).astype(np.uint64)]),
            Relation([k2, rng.integers(0, 100, n).astype(np.uint64)])]
    cfg = EngineConfig(skew_heavy_fraction=0.25)
    digit_share = (k2 % 8 == heavy_key % 8).mean()
    assert digit_share > cfg.skew_heavy_fraction   # heavy path engaged
    q = Query([0, 1], [JoinPred(0, 0, 1, 0)],
              [FilterPred(0, 1, "<", 90)],
              [Projection(0, 1), Projection(1, 1)])
    _check(rels, [q], cfg)


def test_dist_wide_values():
    rng = np.random.default_rng(11)
    rels = _wide_catalog(rng)
    queries = [_wide_filter_query(rng, rels, _random_query(rng, rels))
               for _ in range(4)]
    _check(rels, queries)


def test_dist_engine_facade(small_catalog, small_batches, golden_lines):
    # Engine(config.mesh_devices) routes through the distributed executor;
    # batch 1 of the golden workload exact-matches
    eng = Engine(small_catalog, EngineConfig(mesh_devices=8))
    assert eng.dist_executor is not None
    got = eng.run_batch(small_batches[0])
    assert got == golden_lines[:len(small_batches[0])]


def test_dist_golden_full(small_catalog, small_batches, golden_lines):
    eng = Engine(small_catalog, EngineConfig(mesh_devices=8))
    got = eng.run_workload(small_batches)
    assert got == golden_lines
