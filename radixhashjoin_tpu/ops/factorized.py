"""Factorized (message-passing) aggregation over tree-shaped join queries.

The reference materializes every join's output rows and sums at the end
(update_intermediate, /root/reference/intermediate.cpp:146-183 +
column_proj, /root/reference/Query.cpp:66-74) — 97.7% of its runtime.
The engine's deferred-attach machinery already avoids materializing
SOME joins; this module generalizes it to the whole query: when the
join sequence forms a TREE (every join attaches a fresh slot — 44/50
golden queries), NOTHING is ever materialized. SUM projections factor
into per-relation "count messages" over the join tree (the classic
Yannakakis / factorized-aggregation structure):

  up pass    beta[s][r]  = product over child edges e of B_e[key_s(r)]
             B_e[v]      = sum of beta[child] over live child rows with
                           child key == v   (one dense scatter-add table)
  down pass  alpha[c][r] = A_e[key_c(r)]
             A_e[v]      = sum over live parent rows of alpha[parent] *
                           (product of the OTHER children's contribs)
  SUM(s, col) = sum over live rows r of col[r] * alpha[s][r] * beta[s][r]

Filters and same-slot selections are BOOLEAN MASKS here, not compacted
rowid sets: a compare is a free VPU op while the reference's erase loops
(Query.cpp:91-146) and the engine's own compaction scatters cost a full
scatter kernel each. Every operator runs at RAW relation length (<= 43K
on the golden data) — no padding, no gathers through live sets — so the
only remaining gather/scatter kernels are the message tables themselves,
and a pristine (unfiltered, selection-free) leaf's B table comes
precomputed from the catalog (DeviceCatalog.bincount_table).

Per-row weights alpha*beta are exact in int32 under host-checked caps
derived from load-time max multiplicities (models/batch.py:_ftree_caps);
any query exceeding a cap falls back to the materialized path.

NULL semantics match the reference exactly: NULL iff a filter emptied a
slot (per-filtered-node emptiness flags, covering slots outside the
final tree too) or any JOIN step produced zero pairs
(/root/reference/Query.cpp:188-191); same-slot predicates never NULL.
With all selections at-or-before the last join, "some join emptied" ==
"final joined multiset empty", tested wrap-proof as
any(mask_root & beta_root > 0). Components wiped by a later case-1 join
(SURVEY.md §8.5) still gate NULL via flag-only trees, which run in the
boolean semiring (0/1 messages — no overflow caps needed).

Spec layout (static, hashable — built by models/batch.py:_plan_ftree).
Note it carries NO slot indices: two structurally identical trees over
different relations share one compiled program.

  spec = (filts, n_sels, edges, flag_nodes, root, projs, trail)
    filts:      per node, tuple of filter opcodes (ops/filter.py
                OP_EQ/OP_LT/OP_GT); each consumes one col + one val
    n_sels:     per node, number of same-slot equality selections
                (each consumes two cols)
    edges:      (parent_node, child_node, pre_flag, needs_down) in
                bottom-up order (every child edge precedes its
                parent's); standalone flag-only nodes have no edges
    flag_nodes: node indices whose mask-emptiness raises a NULL flag
                (every filtered node, including slots outside the tree)
    root:       the tree's root node index (M-emptiness flag source);
                -1 for specs without a joined component
    projs:      tuple of (node,) — one per emitted partial, each a
                (5, 2) weighted_partials fold (combine on host with
                combine_weighted_partials)
    trail:      None, or (node, born_of_join) — ONE selection sitting
                AFTER the last join (consumes two cols). It filters the
                final multiset (rides messages + sum weights) but not
                the NULL flags; it REPLACES the root M-emptiness flag
                with a pre-selection gate: born_of_join (a rewritten
                case-3 edge, models/batch.py:_extract_tree) => NULL iff
                the edge's pair set is empty (support-intersection
                test); native => NULL iff the pre-selection multiset is
                empty. Oracle semantics: oracle.py:121-142.

Column/value consumption order (must match the planner):
  cols: 1. per node in node order: its filter columns, then its
           selection column pairs
        1b. the trailing selection's column pair, if any
        2. per edge in edge order: parent key column, child key column
        3. per edge with pre_flag, in edge order: the precomputed
           bincount table
        4. per projection, in projs order: the plane column
  vals: per node in node order: its filter constants
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.limbs import WCHUNK, weighted_partials
from .filter import OP_EQ, OP_LT


def run_ftree(spec, cols, vals, domain):
    """Execute one factorized tree. Returns (flags, partials): one bool
    flag per flag_node plus the M-emptiness flag, and one (5, 2) int32
    weighted fold per projs entry. Traced inline under the fused stage
    program (ops/stage.py)."""
    filts, n_sels, edges, flag_nodes, root, projs, trail = spec
    k = len(filts)
    ci = vi = 0

    def next_col():
        nonlocal ci
        c = cols[ci]
        ci += 1
        return c

    # per-node boolean masks: filters + same-slot selections, all free
    # VPU compares at raw relation length
    mask = []
    for i in range(k):
        m = None
        for opc in filts[i]:
            c = next_col()
            v = vals[vi]
            vi += 1
            if opc == OP_EQ:
                t = c == v
            elif opc == OP_LT:
                t = c < v
            else:
                t = c > v
            m = t if m is None else m & t
        for _ in range(n_sels[i]):
            a = next_col()
            b = next_col()
            t = a == b
            m = t if m is None else m & t
        mask.append(m)           # None == all rows live

    # the trailing selection (at most one, models/batch.py:_extract_tree)
    # filters the FINAL multiset: it rides the outgoing messages and sum
    # weights (msg_mask) but stays out of `mask`, which feeds the NULL
    # flags — a trailing selection may zero every sum without NULLing
    # (oracle.py:121-124,133-142)
    msg_mask = list(mask)
    tnode = tsel_a = tsel_b = None
    if trail is not None:
        # (a projection-free final comp runs boolean — the part/hit gate
        # below only tests >0, so the clamped messages stay correct)
        tnode, tborn = trail
        tsel_a = next_col()
        tsel_b = next_col()
        tsel = tsel_a == tsel_b
        msg_mask[tnode] = (tsel if mask[tnode] is None
                           else mask[tnode] & tsel)

    flags = [(~jnp.any(mask[i])) for i in flag_nodes]

    pkey, ckey = [], []
    for (_p, _c, _pre, _nd) in edges:
        pkey.append(next_col())
        ckey.append(next_col())
    pre = []
    for (_p, _c, pre_flag, _nd) in edges:
        pre.append(next_col() if pre_flag else None)

    children = {i: [] for i in range(k)}
    for ei, (p, _c, _pre, _nd) in enumerate(edges):
        children[p].append(ei)

    # up pass (edges are bottom-up: beta[child] final before its edge).
    # Flag-only trees (no projs — wiped components gating NULL) run in
    # the BOOLEAN semiring: 0/1 messages, table entries bounded by the
    # child's row count, so no overflow caps are needed for them.
    boolean = not projs
    beta = [None] * k          # None == all-ones
    contrib = [None] * len(edges)
    for ei, (p, c, pre_flag, _nd) in enumerate(edges):
        if pre_flag:
            B = pre[ei]
        else:
            w = beta[c]
            if msg_mask[c] is not None:
                kb = jnp.where(msg_mask[c], ckey[ei], np.int32(domain))
                w = (jnp.int32(1) if w is None
                     else jnp.where(msg_mask[c], w, 0))
            else:
                kb = ckey[ei]
                w = jnp.int32(1) if w is None else w
            B = jnp.zeros(domain, jnp.int32).at[kb].add(w, mode="drop")
        cv = B[pkey[ei]]
        if boolean:
            cv = (cv > 0).astype(jnp.int32)
        contrib[ei] = cv
        beta[p] = cv if beta[p] is None else beta[p] * cv

    if root >= 0 and trail is None:
        br, mr = beta[root], mask[root]
        if br is None:
            flags.append(jnp.array(False) if mr is None
                         else ~jnp.any(mr))
        elif mr is None:
            flags.append(~jnp.any(br > 0))
        else:
            flags.append(~jnp.any(mr & (br > 0)))

    # down pass (reversed edge order == top-down)
    alpha = [None] * k         # None == all-ones
    for ei in reversed(range(len(edges))):
        p, c, _pre, needs_down = edges[ei]
        if not needs_down:
            continue
        w = alpha[p]
        for ej in children[p]:
            if ej != ei:
                w = contrib[ej] if w is None else w * contrib[ej]
        if msg_mask[p] is not None:
            kk = jnp.where(msg_mask[p], pkey[ei], np.int32(domain))
            wv = (jnp.int32(1) if w is None
                  else jnp.where(msg_mask[p], w, 0))
        else:
            kk = pkey[ei]
            wv = jnp.int32(1) if w is None else w
        A = jnp.zeros(domain, jnp.int32).at[kk].add(wv, mode="drop")
        alpha[c] = A[ckey[ei]]

    if trail is not None:
        # NULL gate from the PRE-selection rows. part[r] == row r of the
        # trailing node participates in the joined multiset before the
        # trailing selection (alpha/beta are messages from the REST of
        # the tree — they never include this node's own masks).
        part = jnp.ones(tsel_a.shape[0], bool)
        if mask[tnode] is not None:
            part &= mask[tnode]
        if beta[tnode] is not None:
            part &= beta[tnode] > 0
        if alpha[tnode] is not None:
            part &= alpha[tnode] > 0
        if tborn:
            # join-born (rewritten case-3 edge): NULL iff its PAIR SET is
            # empty (oracle.py:133-142) <=> no participating row's left
            # class value equals any participating row's right value —
            # a support-intersection test over one dense domain table
            supp = jnp.zeros(domain, jnp.int32).at[
                jnp.where(part, tsel_a, np.int32(domain))].max(
                part.astype(jnp.int32), mode="drop")
            flags.append(~jnp.any((supp[tsel_b] > 0) & part))
        else:
            # native same-slot predicate: never NULLs by itself
            # (Query.cpp:168-170) — NULL iff some JOIN emptied, i.e. the
            # pre-selection multiset is empty
            flags.append(~jnp.any(part))

    outs = []
    for (i,) in projs:
        plane = next_col()
        m = beta[i]
        if alpha[i] is not None:
            m = alpha[i] if m is None else m * alpha[i]
        n = plane.shape[0]
        if m is None:
            w = (jnp.ones(n, jnp.int32) if msg_mask[i] is None
                 else msg_mask[i].astype(jnp.int32))
        else:
            w = m if msg_mask[i] is None else jnp.where(msg_mask[i], m, 0)
        # weighted_partials needs a WCHUNK-multiple length; masking rides
        # in the zeroed weights (selections make liveness non-prefix)
        L = max(-(-n // WCHUNK) * WCHUNK, WCHUNK)
        if L != n:
            plane = jnp.pad(plane, (0, L - n))
            w = jnp.pad(w, (0, L - n))
        outs.append(weighted_partials(plane, w, np.int32(L)))
    return tuple(flags), tuple(outs)
