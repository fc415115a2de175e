"""Stats propagation (reference Query.cpp:91-155 semantics) + planner."""

import numpy as np
import pytest

from radixhashjoin_tpu.config import EngineConfig
from radixhashjoin_tpu.models.engine import Engine
from radixhashjoin_tpu.models.planner import reorder_joins
from radixhashjoin_tpu.models.stats import SlotStats, estimate_join_output
from radixhashjoin_tpu.oracle import run_workload
from radixhashjoin_tpu.storage import Relation
from radixhashjoin_tpu.workload import parse_query


def _stats(size=100, low=0, high=99, distinct=100, cols=2):
    return SlotStats(size=size, low=[low] * cols, max=[high] * cols,
                     distinct=[distinct] * cols)


def test_filter_gt_updates():
    s = _stats()
    # > 49 keeps 50 rows: distinct' = d*(max-k+1)/(max-low), low' = k+1
    s.apply_filter(0, ">", 49, 50)
    assert s.low[0] == 50 and s.max[0] == 99
    assert s.distinct[0] == (100 * (99 - 49 + 1)) // 99
    assert s.size == 50


def test_filter_lt_updates():
    s = _stats()
    s.apply_filter(0, "<", 50, 50)
    assert s.max[0] == 49 and s.low[0] == 0
    assert s.distinct[0] == (100 * (50 - 1 - 0)) // 99


def test_filter_eq_pins():
    s = _stats()
    s.apply_filter(0, "=", 7, 3)
    assert s.low[0] == s.max[0] == 7 and s.distinct[0] == 1
    assert s.size == 3


def test_cross_column_distinct_shrinks():
    s = _stats()
    d_before = s.distinct[1]
    s.apply_filter(0, "=", 7, 10)   # 10% survive
    assert 0 < s.distinct[1] < d_before


def test_join_estimate_range_overlap():
    a = _stats(size=1000, low=0, high=99, distinct=100)
    b = _stats(size=1000, low=200, high=299, distinct=100)
    assert estimate_join_output(a, 0, b, 0) == 0.0   # disjoint ranges
    c = _stats(size=1000, low=0, high=99, distinct=100)
    assert estimate_join_output(a, 0, c, 0) == pytest.approx(10000.0)


def test_reorder_preserves_join_set_and_hoists_selfjoin():
    rels = [Relation([np.arange(100, dtype=np.uint64),
                      np.arange(100, dtype=np.uint64)]) for _ in range(3)]
    q = parse_query("0 1 2|0.0=1.0&1.1=2.1&2.0=2.1|0.0")
    q2 = reorder_joins(q, rels)
    assert sorted(map(str, q2.joins)) == sorted(map(str, q.joins))
    assert q2.joins[0].slot1 == q2.joins[0].slot2 == 2  # self-join first


def test_reorder_golden_full(small_catalog, small_batches, golden_lines):
    """Reordered plans must not change any output line (oracle executor)."""
    replanned = [[reorder_joins(q, small_catalog) for q in b]
                 for b in small_batches]
    got = run_workload(small_catalog, replanned)
    assert got == golden_lines


@pytest.mark.slow
def test_reorder_golden_device(small_catalog, small_batches, golden_lines):
    eng = Engine(small_catalog, EngineConfig(enable_join_reordering=True))
    got = eng.run_workload(small_batches)
    assert got == golden_lines
