"""Parser: work/init stream contracts (reference Query.cpp:10-63, join.cpp)."""

import io

from radixhashjoin_tpu.workload import (
    FilterPred, JoinPred, Projection, parse_init_stream, parse_query,
    parse_work_stream)


def test_parse_query_mixed():
    q = parse_query("3 0 1|0.2=1.0&1.0=2.1&0.1>3000|0.0 1.1")
    assert q.slots == [3, 0, 1]
    assert q.joins == [JoinPred(0, 2, 1, 0), JoinPred(1, 0, 2, 1)]
    assert q.filters == [FilterPred(0, 1, ">", 3000)]
    assert q.projections == [Projection(0, 0), Projection(1, 1)]


def test_join_comparator_always_equi():
    # any comparator char between two refs parses as equi (Query.cpp:46-48)
    q = parse_query("0 1|0.1>1.2|0.0")
    assert q.joins == [JoinPred(0, 1, 1, 2)] and not q.filters


def test_filter_ops():
    q = parse_query("0|0.0=42&0.1<7&0.2>9|0.0")
    assert [(f.op, f.value) for f in q.filters] == [("=", 42), ("<", 7), (">", 9)]


def test_batches():
    stream = ["0|0.0=1|0.0", "F", "1|1.0=2|1.0", "2|2.0=3|2.0", "F"]
    batches = parse_work_stream(stream)
    assert [len(b) for b in batches] == [1, 2]


def test_small_work_parses(small_batches):
    assert sum(len(b) for b in small_batches) == 50
    assert len(small_batches) == 5
    for b in small_batches:
        for q in b:
            assert q.joins and q.projections


def test_init_stream():
    s = io.StringIO("a\nb\nDone\nignored\n")
    assert parse_init_stream(s) == ["a", "b"]
