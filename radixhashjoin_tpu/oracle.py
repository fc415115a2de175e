"""NumPy oracle executor of the validated query semantics.

This is a direct, vectorized implementation of the semantic specification in
SURVEY.md §9 (which reproduced all 50 golden lines of
/root/reference/small/small.result exactly). It is the engine's test oracle:
fast, device-free, and exact for arbitrary uint64 data. The JAX executor in
models/executor.py must agree with it on every workload.

Semantics per query (file:line cites are into /root/reference):

1. Filters narrow per-slot live rowid sets with strict <,>,= ; an emptied slot
   means NULL for every projection (Query.cpp:81-158).
2. Joins run in written order. With ``inter`` the chained intermediate
   (columns = slots, rows aligned):
   - both slots fresh: intermediate := all matching (r1,r2) pairs, any other
     slot's data discarded (intermediate.cpp:92-103; quirk SURVEY.md §8.5);
   - one slot fresh (wlog s2): every existing row e is replicated once per
     r2 in live[s2] with R[s2].c2[r2] == R[s1].c1[inter[s1][e]]
     (intermediate.cpp:52-66,108-125 — equivalent gather formulation, no
     per-pair scans);
   - both joined: keep rows where the two gathered column values are equal
     (intermediate.cpp:72-87,130-138; equivalence relies on the reference's
     dedup-before-join, SURVEY.md §8.4);
   - same-slot predicate: fresh slot => intermediate[slot] = live rowids with
     col1 == col2 (intermediate.cpp:17-25); joined slot => keep rows with
     equal columns (intended semantics of the UB branch, SURVEY.md §8.2).
     parse_table never triggers the NULL early-exit (Query.cpp:168-170).
   - NULL early-exit fires iff the *pair set* of a join is empty
     (Query.cpp:188-191); a both-joined step may filter away every row while
     its pair set is non-empty — that prints 0 sums, not NULL.
3. Projections: uint64 SUM (wrapping, as C++ uint64) of R[s].c over the final
   intermediate with multiplicity; 0 for a never-joined slot; NULL line if
   step 1/2 emptied (Query.cpp:66-74,198-200,226-235).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .storage import Relation
from .workload import Query


def _expand_match(left_vals: np.ndarray, right_vals: np.ndarray):
    """All (i, j) with left_vals[i] == right_vals[j], grouped by i.

    Returns (left_idx, right_idx) arrays. Sort right side once, binary-search
    each left value, expand counts. O((L+R) log R + out).
    """
    order = np.argsort(right_vals, kind="stable")
    rs = right_vals[order]
    lo = np.searchsorted(rs, left_vals, side="left")
    hi = np.searchsorted(rs, left_vals, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    left_idx = np.repeat(np.arange(len(left_vals), dtype=np.int64), counts)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total, dtype=np.int64) - offsets[left_idx]
    right_idx = order[lo[left_idx] + within]
    return left_idx, right_idx


class OracleExecutor:
    """Executes queries with NumPy, matching the reference bit-for-bit."""

    def __init__(self, relations: Sequence[Relation]):
        self.relations = relations

    def _col(self, rel_id: int, col: int) -> np.ndarray:
        return self.relations[rel_id].values[col]

    def execute(self, q: Query) -> Optional[List[int]]:
        """Returns projection sums, or None for an all-NULL line."""
        rels = self.relations
        nslots = len(q.slots)

        # 1. filters -> live rowid arrays per slot
        live: List[np.ndarray] = []
        for s in range(nslots):
            live.append(np.arange(rels[q.slots[s]].num_tuples, dtype=np.int64))
        for f in q.filters:
            col = self._col(q.slots[f.slot], f.col)
            vals = col[live[f.slot]]
            k = np.uint64(f.value)
            if f.op == "=":
                mask = vals == k
            elif f.op == "<":
                mask = vals < k
            else:
                mask = vals > k
            live[f.slot] = live[f.slot][mask]
            if len(live[f.slot]) == 0:
                return None

        # 2. join pipeline with intermediate chaining
        inter: Dict[int, np.ndarray] = {}  # slot -> rowid column (aligned rows)

        for j in q.joins:
            s1, c1, s2, c2 = j.slot1, j.col1, j.slot2, j.col2
            colA = self._col(q.slots[s1], c1)
            colB = self._col(q.slots[s2], c2)

            if s1 == s2:
                # same-slot predicate (parse_table, intermediate.cpp:11-44)
                if s1 not in inter:
                    # fresh slot: a fresh-fresh "join" of the slot with
                    # itself. Like case 1 it WIPES any other intermediate
                    # (the reference's non-fresh parse_table branch is UB,
                    # SURVEY.md §8.2; this is the self-consistent extension
                    # of the case-1 wipe — intermediates stay one aligned
                    # component). Unreachable on the golden workload.
                    rows = live[s1]
                    keep = colA[rows] == colB[rows]
                    inter = {s1: rows[keep]}
                else:
                    keep = colA[inter[s1]] == colB[inter[s2]]
                    inter = {s: v[keep] for s, v in inter.items()}
                # parse_table never sets the NULL flag (Query.cpp:168-170)
                continue

            j1, j2 = s1 in inter, s2 in inter
            if not j1 and not j2:
                # case 1: both fresh — pairs between live sets; wipes others
                li, ri = _expand_match(colA[live[s1]], colB[live[s2]])
                if len(li) == 0:
                    return None
                inter = {s1: live[s1][li], s2: live[s2][ri]}
            elif j1 and j2:
                # case 3: both joined — row filter; NULL iff the PAIR SET is
                # empty, not the filtered rows (Query.cpp:188-191)
                v1 = colA[inter[s1]]
                v2 = colB[inter[s2]]
                pairs_nonempty = len(np.intersect1d(v1, v2)) > 0
                if not pairs_nonempty:
                    return None
                keep = v1 == v2
                inter = {s: v[keep] for s, v in inter.items()}
            else:
                # case 2: exactly one fresh — replicate existing rows per match
                if j1:
                    full, fresh = s1, s2
                    full_vals = colA[inter[full]]
                    fresh_rows = live[fresh]
                    fresh_vals = colB[fresh_rows]
                else:
                    full, fresh = s2, s1
                    full_vals = colB[inter[full]]
                    fresh_rows = live[fresh]
                    fresh_vals = colA[fresh_rows]
                li, ri = _expand_match(full_vals, fresh_vals)
                if len(li) == 0:
                    return None
                inter = {s: v[li] for s, v in inter.items()}
                inter[fresh] = fresh_rows[ri]

        # 3. SUM projections with multiplicity (uint64 wrapping)
        sums: List[int] = []
        for p in q.projections:
            rows = inter.get(p.slot)
            if rows is None or len(rows) == 0:
                sums.append(0)
            else:
                col = self._col(q.slots[p.slot], p.col)
                s = int(col[rows].sum(dtype=np.uint64))
                sums.append(s)
        return sums


def format_result(sums: Optional[List[int]], n_proj: int) -> str:
    """One output line (Query::print, Query.cpp:226-235)."""
    if sums is None:
        return " ".join(["NULL"] * n_proj)
    return " ".join(str(s) for s in sums)


def run_workload(relations: Sequence[Relation], batches) -> List[str]:
    ex = OracleExecutor(relations)
    out = []
    for batch in batches:
        for q in batch:
            out.append(format_result(ex.execute(q), len(q.projections)))
    return out
