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

Every operator touches only RELATION-sized vectors (<= 43K padded on the
golden data) instead of join-output-sized ones (the speculative
expansions this replaces ran at 128K-256K width), and the per-row
weights alpha*beta are exact in int32 under host-checked caps derived
from load-time max multiplicities (models/batch.py:_ftree_caps); any
query exceeding a cap falls back to the materialized path.

NULL semantics match the reference exactly: a query is NULL iff a
filter emptied a slot or any JOIN step produced zero pairs
(/root/reference/Query.cpp:188-191); same-slot predicates never NULL.
With all selections at-or-before the last join, "some join emptied" is
equivalent to "the final joined multiset is empty", tested wrap-proof
as any(live_root & beta_root > 0). Components wiped by a later case-1
join (SURVEY.md §8.5) still contribute their emptiness flag via a
flag-only tree (no projections).

Spec layout (static, hashable — built by models/batch.py:_plan_ftree):

  spec = (nodes, pristine, n_sels, edges, projs)
    nodes:    tuple of GLOBAL slot indices (group offsets applied)
    pristine: per node, True = the slot has no filters, so its live set
              is the identity and its columns arrive RAW (length n,
              padded in-op) instead of being gathered through live_rows
    n_sels:   per node, number of same-slot equality selections
    edges:    (parent_node, child_node, pre_flag, needs_down) in
              bottom-up order (every child edge precedes its parent's)
    projs:    tuple of (node,) — one per emitted partial, each a
              (5, 2) weighted_partials fold (combine on host with
              combine_weighted_partials)

Column consumption order (must match the planner):
  1. per node, in node order: its selections' column pairs
  2. per edge, in edge order: parent key column, child key column
  3. per edge with pre_flag, in edge order: the precomputed bincount
     table (DeviceCatalog.bincount_table — a pristine leaf's B table
     is query-independent)
  4. per projection, in projs order: the projection plane column
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.limbs import weighted_partials


def run_ftree(spec, lr, lc, cols, domain):
    """Execute one factorized tree. Returns (empty_flag, partials) with
    one (5, 2) int32 weighted fold per projs entry. Traced inline under
    the fused stage program (ops/stage.py)."""
    nodes, pristine, n_sels, edges, projs = spec
    k = len(nodes)
    ci = 0

    def node_len(i):
        return lr[nodes[i]].shape[0]

    def get_col(i):
        nonlocal ci
        c = cols[ci]
        ci += 1
        L = node_len(i)
        if pristine[i]:
            return c if c.shape[0] == L else jnp.pad(c, (0, L - c.shape[0]))
        return c[lr[nodes[i]]]

    live = []
    for i in range(k):
        idx = jax.lax.broadcasted_iota(jnp.int32, (node_len(i),), 0)
        live.append(idx < lc[nodes[i]])
    for i in range(k):
        for _ in range(n_sels[i]):
            a = get_col(i)
            b = get_col(i)
            live[i] = live[i] & (a == b)
    pkey, ckey = [], []
    for (p, c, _pre, _nd) in edges:
        pkey.append(get_col(p))
        ckey.append(get_col(c))
    pre = []
    for (_p, _c, pre_flag, _nd) in edges:
        if pre_flag:
            pre.append(cols[ci])
            ci += 1
        else:
            pre.append(None)

    children = {i: [] for i in range(k)}
    for ei, (p, c, _pre, _nd) in enumerate(edges):
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
            kb = jnp.where(live[c], ckey[ei], np.int32(domain))
            w = (jnp.int32(1) if beta[c] is None
                 else jnp.where(live[c], beta[c], 0))
            B = jnp.zeros(domain, jnp.int32).at[kb].add(w, mode="drop")
        cv = B[pkey[ei]]
        if boolean:
            cv = (cv > 0).astype(jnp.int32)
        contrib[ei] = cv
        beta[p] = cv if beta[p] is None else beta[p] * cv

    root = (({i for i in range(k)} - {e[1] for e in edges}).pop()
            if edges else 0)
    if beta[root] is None:
        empty = ~jnp.any(live[root])
    else:
        empty = ~jnp.any(live[root] & (beta[root] > 0))

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
        kk = jnp.where(live[p], pkey[ei], np.int32(domain))
        wv = jnp.int32(1) if w is None else jnp.where(live[p], w, 0)
        A = jnp.zeros(domain, jnp.int32).at[kk].add(wv, mode="drop")
        alpha[c] = A[ckey[ei]]

    outs = []
    for (i,) in projs:
        plane = get_col(i)
        m = beta[i]
        if alpha[i] is not None:
            m = alpha[i] if m is None else m * alpha[i]
        L = node_len(i)
        wfull = (live[i].astype(jnp.int32) if m is None
                 else jnp.where(live[i], m, 0))
        # count=L: selections make liveness non-prefix, so masking rides
        # in the zeroed weights instead of weighted_partials' prefix mask
        outs.append(weighted_partials(plane, wfull, np.int32(L)))
    return empty, tuple(outs)
