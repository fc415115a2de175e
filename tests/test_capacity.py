"""Pair-count ceiling: diagnostics at 2**31, and factorized terminals
legitimately exceeding it.

The reference's paged result lists are unbounded (Result.cpp:21-35); the
engine's int32 offset space caps a MATERIALIZED join at 2**31 - 1 pairs.
Crossing it must raise JoinCapacityError (never silently overflow), while
the factorized terminal path must keep producing exact sums far past
int32 pair counts (it never materializes the pairs).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from radixhashjoin_tpu.config import EngineConfig
from radixhashjoin_tpu.models.engine import Engine
from radixhashjoin_tpu.ops.join import JoinCapacityError, probe_count
from radixhashjoin_tpu.ops.join_dense import dense_probe
from radixhashjoin_tpu.storage import Relation
from radixhashjoin_tpu.workload import JoinPred, Projection, Query

N = 1 << 16   # 65536 x 65536 equal keys = 2**32 pairs


def test_probe_count_overflow_flag():
    v = jnp.full(N, 5, jnp.int32)
    *_, total = probe_count(v, jnp.int32(N), v, jnp.int32(N))
    assert int(total) == -1


def test_dense_probe_overflow_flag():
    v = jnp.full(N, 5, jnp.int32)
    *_, total = dense_probe(v, jnp.int32(N), v, jnp.int32(N), 1024)
    assert int(total) == -1


def _big_rel(rng):
    return Relation([np.full(N, 5, dtype=np.uint64),
                     (np.arange(N, dtype=np.uint64) % 8)])


def test_engine_raises_on_materializing_overflow():
    rng = np.random.default_rng(0)
    rels = [_big_rel(rng), _big_rel(rng),
            Relation([np.arange(16, dtype=np.uint64) % 8,
                      np.ones(16, dtype=np.uint64)])]
    engine = Engine(rels, EngineConfig())
    # first join overflows and is neither terminal nor deferable (three
    # joins: k=0 is a plain case-1 probe) -> must materialize -> raise
    q = Query([0, 1, 2],
              [JoinPred(0, 0, 1, 0), JoinPred(1, 1, 2, 0),
               JoinPred(2, 1, 0, 1)],
              [], [Projection(2, 1)])
    with pytest.raises(JoinCapacityError):
        engine.run_batch([q])


def test_deferred_middle_avoids_materializing_overflow():
    # the SAME overflowing join, but deferable: the planner folds it into
    # the terminal stage as a multiplicity row, so 2**32 pairs never
    # materialize and the exact answer comes out
    rng = np.random.default_rng(0)
    small = Relation([np.arange(16, dtype=np.uint64) % 8,
                      np.full(16, 3, dtype=np.uint64)])
    rels = [_big_rel(rng), _big_rel(rng), small]
    engine = Engine(rels, EngineConfig())
    q = Query([0, 1, 2], [JoinPred(0, 0, 1, 0), JoinPred(1, 1, 2, 0)],
              [], [Projection(2, 1)])
    [got] = engine.run_batch([q])
    # rows: 65536^2 pairs, each joined to the 2 small rows matching its
    # r1.col1 value (values 0..7 twice in small.col0)
    expect = 0
    matches = np.bincount(small.values[0].astype(int), minlength=8)
    for v in range(8):
        n_r1 = int((rels[1].values[1] == v).sum())   # r1 rows with col1==v
        expect += N * n_r1 * int(matches[v]) * 3
    assert got == str(expect % 2**64)


def test_terminal_factorized_beyond_int32_pairs():
    # a TERMINAL join with 2**32 pairs: exact sums, no NULL (the old
    # total==0 wrap at exactly 2**32 would have printed NULL)
    rng = np.random.default_rng(0)
    rels = [_big_rel(rng), _big_rel(rng)]
    engine = Engine(rels, EngineConfig())
    assert engine.batch_executor.join.kind == "dense"
    q = Query([0, 1], [JoinPred(0, 0, 1, 0)], [], [Projection(0, 1)])
    [line] = engine.run_batch([q])
    expect = N * int(rels[0].values[1].sum(dtype=np.uint64))
    assert line == str(expect % 2**64)
