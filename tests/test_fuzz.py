"""Property/fuzz tests: random relations + random queries, device engine
vs the validated NumPy oracle (SURVEY.md §4 test plan).

Covers combinations the golden workload never hits: multi-filter queries,
same-slot predicates, repeated relations in several slots, disconnected
join graphs (case-1 wipe), value collisions, tiny relations.
"""

import numpy as np
import pytest

from radixhashjoin_tpu.config import EngineConfig
from radixhashjoin_tpu.models.engine import Engine
from radixhashjoin_tpu.oracle import OracleExecutor, format_result
from radixhashjoin_tpu.storage import Relation
from radixhashjoin_tpu.workload import (FilterPred, JoinPred, Projection,
                                        Query)


def _random_catalog(rng, n_rel=4):
    rels = []
    for _ in range(n_rel):
        n = int(rng.integers(1, 400))
        cols = int(rng.integers(2, 4))
        vmax = int(rng.choice([8, 64, 1 << 12]))
        rels.append(Relation([rng.integers(0, vmax, n).astype(np.uint64)
                              for _ in range(cols)]))
    return rels


def _random_query(rng, rels):
    nslots = int(rng.integers(1, 4))
    slots = [int(rng.integers(0, len(rels))) for _ in range(nslots)]
    ncols = [rels[s].num_columns for s in slots]

    joins = []
    for _ in range(int(rng.integers(1, 4))):
        s1, s2 = rng.integers(0, nslots, 2)
        joins.append(JoinPred(int(s1), int(rng.integers(0, ncols[s1])),
                              int(s2), int(rng.integers(0, ncols[s2]))))
    filters = []
    for _ in range(int(rng.integers(0, 3))):
        s = int(rng.integers(0, nslots))
        filters.append(FilterPred(s, int(rng.integers(0, ncols[s])),
                                  str(rng.choice(["=", "<", ">"])),
                                  int(rng.integers(0, 70))))
    projections = []
    for _ in range(int(rng.integers(1, 4))):
        s = int(rng.integers(0, nslots))
        projections.append(Projection(s, int(rng.integers(0, ncols[s]))))
    return Query(slots, joins, filters, projections)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_engine_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    rels = _random_catalog(rng)
    oracle = OracleExecutor(rels)
    engine = Engine(rels, EngineConfig())
    queries = [_random_query(rng, rels) for _ in range(8)]
    got = engine.run_batch(queries)
    expect = [format_result(oracle.execute(q), len(q.projections))
              for q in queries]
    assert got == expect


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_sort_backend_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    rels = _random_catalog(rng)
    oracle = OracleExecutor(rels)
    engine = Engine(rels, EngineConfig(join_backend="sort"))
    queries = [_random_query(rng, rels) for _ in range(6)]
    got = engine.run_batch(queries)
    expect = [format_result(oracle.execute(q), len(q.projections))
              for q in queries]
    assert got == expect
