"""Factorized (message-passing) aggregation over tree-shaped join queries.

The reference materializes every join's output rows and sums at the end
(update_intermediate, /root/reference/intermediate.cpp:146-183 +
column_proj, /root/reference/Query.cpp:66-74) — 97.7% of its runtime.
The engine's deferred-attach machinery already avoids materializing
SOME joins; this module generalizes it to the whole query: when the
join sequence forms a TREE (every join attaches a fresh slot — after
case-3 rewriting, all 50 golden queries), NOTHING is ever materialized.
SUM projections factor into per-relation "count messages" over the join
tree (the classic Yannakakis / factorized-aggregation structure):

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

WAVE BATCHING (run_ftree_wave): on a remote-attached chip each
non-fused scatter/gather kernel costs ~0.1 ms of scheduling, so a
50-query batch at ~5 kernels/query pays ~25 ms regardless of data size.
The wave runner executes MANY queries' trees in one program, merging
every scatter and gather at the same tree LEVEL across queries into one
segmented kernel (each edge owns a width-sized slice, offsets = running
sums of the per-edge widths):
kernel count drops from O(queries x edges) to O(tree height).

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
    edges:      (parent_node, child_node, pre_flag, needs_down, width)
                in bottom-up order (every child edge precedes its
                parent's); standalone flag-only nodes have no edges.
                width = power of two spanning BOTH key columns' code
                ranges — the edge's message tables are width-sized, so
                a level's segmented table is sum-of-widths long instead
                of n_edges * catalog_domain (smaller zero-fill, smaller
                scatters, and small-domain fast paths become reachable
                even when an unrelated column blows up the global
                domain)
    flag_nodes: node indices whose mask-emptiness raises a NULL flag
                (every filtered node, including slots outside the tree)
    root:       the tree's root node index (M-emptiness flag source);
                -1 for specs without a joined component
    projs:      tuple of (node,) — one per emitted partial, each a
                (5, 2) weighted_partials fold (combine on host with
                combine_weighted_partials)
    trail:      None, or (node, born_of_join, width) — ONE selection sitting
                AFTER the last join (consumes two cols). It filters the
                final multiset (rides messages + sum weights) but not
                the NULL flags; it REPLACES the root M-emptiness flag
                with a pre-selection gate: born_of_join (a rewritten
                case-3 edge, models/batch.py:_extract_tree) => NULL iff
                the edge's pair set is empty (support-intersection
                test); native => NULL iff the pre-selection multiset is
                empty. Oracle semantics: oracle.py:121-142.
                OR (node_a, True, width, node_b) — a CROSS-NODE pair
                gate for a TRAILING composite-key fusion (a parallel
                case-3 edge with no join after it): tsel_a lives on
                node_a, tsel_b on node_b, and NULL iff no value of
                tsel_a over node_a's participating rows equals any value
                of tsel_b over node_b's participating rows (the
                reference's step pair-set rule, oracle.py:133-142,
                evaluated on the PRE-fusion tree). Such a spec is
                flag-only; its fused twin (same tree with the pair fused
                into the edge key, root = -1) carries the sums.

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

from ..utils.limbs import (seg_chunk, weighted_partials_big,
                           weighted_partials_segments)
from .filter import OP_EQ, OP_LT

# waves/gathers past this many rows switch to the HBM-bounded paths
# (no-concat per-projection folds; lazy gathers)
_BIG_WAVE_ROWS = 1 << 28


class _Tree:
    """Per-spec traced state inside a wave."""

    __slots__ = ("spec", "edges", "flag_nodes", "root", "projs",
                 "mask", "msg_mask", "tnode", "tnode_b", "tborn", "twidth",
                 "tsel_a", "tsel_b",
                 "pkey", "ckey", "pre", "children", "boolean",
                 "beta", "contrib", "alpha", "planes",
                 "by_height", "by_depth")


def _parse_spec(spec, cols, vals, shard=None):
    """Consume one spec's cols/vals (doc order above) into a _Tree:
    masks, key columns, pre tables, plus static height/depth schedules
    for the wave's level-batched passes.

    shard (distributed mode): (slicer, valid) — slicer(col, node) cuts
    this chip's row range out of a replicated node column, valid(node)
    is the boolean mask of real (non-pad, non-duplicate) rows in that
    slice. Pre tables are GLOBAL bincounts and are never sliced."""
    filts, n_sels, edges, flag_nodes, root, projs, trail = spec
    k = len(filts)
    t = _Tree()
    t.spec = spec
    t.edges = edges
    t.flag_nodes = flag_nodes
    t.root = root
    t.projs = projs
    ci = vi = 0

    if shard is None:
        def node_col_raw(i):
            nonlocal ci
            c = cols[ci]
            ci += 1
            return c
    else:
        slicer, _valid = shard

        def node_col_raw(i):
            nonlocal ci
            c = slicer(cols[ci], i)
            ci += 1
            return c

    def next_col():
        nonlocal ci
        c = cols[ci]
        ci += 1
        return c

    # per-node boolean masks: filters + same-slot selections, all free
    # VPU compares at raw relation length; in distributed mode the
    # shard-validity mask seeds every node (pad/duplicate rows dead)
    mask = []
    for i in range(k):
        m = None if shard is None else shard[1](i)
        for opc in filts[i]:
            c = node_col_raw(i)
            v = vals[vi]
            vi += 1
            if opc == OP_EQ:
                tt = c == v
            elif opc == OP_LT:
                tt = c < v
            else:
                tt = c > v
            m = tt if m is None else m & tt
        for _ in range(n_sels[i]):
            a = node_col_raw(i)
            b = node_col_raw(i)
            tt = a == b
            m = tt if m is None else m & tt
        mask.append(m)           # None == all rows live
    t.mask = mask

    # the trailing selection (at most one, models/batch.py:_extract_tree)
    # filters the FINAL multiset: it rides the outgoing messages and sum
    # weights (msg_mask) but stays out of `mask`, which feeds the NULL
    # flags — a trailing selection may zero every sum without NULLing
    # (oracle.py:121-124,133-142). A projection-free final comp runs
    # boolean; the part/hit gate only tests >0, so clamped messages stay
    # correct there.
    t.msg_mask = list(mask)
    t.tnode = t.tnode_b = t.tsel_a = t.tsel_b = t.tborn = t.twidth = None
    if trail is not None and len(trail) == 4:
        # cross-node pair gate (trailing composite-key fusion): the
        # predicate itself is enforced by the fused twin spec — this
        # spec only decides NULL, so messages stay unmasked here
        t.tnode, t.tborn, t.twidth, t.tnode_b = trail
        t.tsel_a = node_col_raw(t.tnode)
        t.tsel_b = node_col_raw(t.tnode_b)
    elif trail is not None:
        t.tnode, t.tborn, t.twidth = trail
        t.tsel_a = node_col_raw(t.tnode)
        t.tsel_b = node_col_raw(t.tnode)
        tsel = t.tsel_a == t.tsel_b
        t.msg_mask[t.tnode] = (tsel if mask[t.tnode] is None
                               else mask[t.tnode] & tsel)

    t.pkey, t.ckey = [], []
    for (p, c, _pre, _nd, _w) in edges:
        t.pkey.append(node_col_raw(p))
        t.ckey.append(node_col_raw(c))
    t.pre = []
    for (_p, _c, pre_flag, _nd, w) in edges:
        # precomputed bincounts are catalog-domain long; the edge only
        # spans its own width (slicing drops nothing: codes <= width-1)
        t.pre.append(next_col()[:w] if pre_flag else None)
    t.planes = [node_col_raw(i) for (i,) in projs]

    t.children = {i: [] for i in range(k)}
    for ei, (p, _c, _pre, _nd, _w) in enumerate(edges):
        t.children[p].append(ei)

    # flag-only trees (no projs — wiped components gating NULL) run in
    # the BOOLEAN semiring: 0/1 messages, table entries bounded by the
    # child's row count, so no overflow caps are needed for them
    t.boolean = not projs
    t.beta = [None] * k
    t.alpha = [None] * k
    t.contrib = [None] * len(edges)

    # static schedules. height(e) = 1 + max height of the child node's
    # incoming edges (bottom-up order makes this a single sweep); a
    # parent's edge always has greater height than every edge into its
    # child, so processing heights in order keeps beta[child] final
    # before its edge fires.
    height = [0] * len(edges)
    node_h = {}
    t.by_height = {}
    for ei, (p, c, _pre, _nd, _w) in enumerate(edges):
        h = node_h.get(c, 0) + 1
        height[ei] = h
        node_h[p] = max(node_h.get(p, 0), h)
        t.by_height.setdefault(h, []).append(ei)
    # depth(e) = distance of the parent node from the root along
    # needs_down edges (needs_down(e) implies needs_down(incoming(p)),
    # so the chain is always assigned)
    incoming = {c: ei for ei, (_p, c, _pre, _nd, _w) in enumerate(edges)}
    depth = {}
    t.by_depth = {}
    for ei in reversed(range(len(edges))):     # top-down
        p, c, _pre, needs_down, _w = edges[ei]
        if not needs_down:
            continue
        d = depth[incoming[p]] + 1 if p in incoming else 0
        depth[ei] = d
        t.by_depth.setdefault(d, []).append(ei)
    return t


def _concat(parts):
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


class _LazyGather:
    """A HUGE message-table gather kept unmaterialized as (table, keys).

    Materializing table[keys] at 2**30 keys costs 8 GB of HBM — the
    gather output plus the TPU backend's clamped-index temp — which is
    the difference between a 1B-row fact table fitting one chip and
    not. Consumers that only need the per-row weight fold it window by
    window, masks included (utils/limbs.py:weighted_partials_big
    gathers and masks inside its fori_loop); the root-emptiness flag
    reduces through a width-sized support table instead
    (any(T[keys] > 0) == any((T > 0) & in-keys)); every other consumer
    (products, boolean clamps) materializes via _mat."""

    __slots__ = ("table", "keys")

    def __init__(self, table, keys):
        self.table = table
        self.keys = keys


def _mat(x):
    if isinstance(x, _LazyGather):
        return x.table.at[x.keys].get(mode="promise_in_bounds")
    return x


def _support_table(keys, width, mask=None):
    """0/1 table of which codes appear in keys (masked lanes dropped).
    Huge key vectors scatter window by window under a fori_loop so the
    scatter's broadcast-update and index-select temps stay window-sized
    (a 2**30-key scatter otherwise materializes two full-length 4 GB
    temps)."""
    n = keys.shape[0]
    if n >= (1 << 31) - (1 << 26):
        raise ValueError(
            f"_support_table caps below 2**31 keys (int32 window "
            f"addressing in the scatter loop); got {n}")
    sent = np.int32(width)

    def scat(sup, k, m):
        k = k if m is None else jnp.where(m, k, sent)
        return sup.at[k].max(1, mode="drop")

    sup0 = jnp.zeros(width, jnp.int32)
    if n <= _BIG_WAVE_ROWS:
        return scat(sup0, keys, mask)
    # n > _BIG_WAVE_ROWS >= w_rows, so every window slice is in range;
    # windows may overlap at the tail: max-scatter of 1s is idempotent,
    # recount-safe
    w_rows = min(1 << 26, _BIG_WAVE_ROWS)
    nw = -(-n // w_rows)

    def body(i, sup):
        start = jnp.minimum(i * w_rows, n - w_rows)
        k = jax.lax.dynamic_slice(keys, (start,), (w_rows,))
        m = (None if mask is None
             else jax.lax.dynamic_slice(mask, (start,), (w_rows,)))
        return scat(sup, k, m)
    return jax.lax.fori_loop(0, nw, body, sup0)


def _none_anywhere(x, axis):
    """~any(x), globally across the mesh axis in distributed mode."""
    a = jnp.any(x)
    if axis is None:
        return ~a
    return jax.lax.psum(a.astype(jnp.int32), axis) == 0


def run_ftree_wave(wspecs, cols, vals, axis=None, shards=None,
                   scatter="xla", gather="xla"):
    """Execute MANY factorized trees in one traced program, batching all
    same-level message scatters/gathers across trees into single
    segmented kernels (per-edge table widths, offsets = running sums).

    wspecs: tuple of (spec, n_cols, n_vals); cols/vals hold every spec's
    operands back to back. Returns (flags, partials) flat, in spec order
    (within a spec: flag_nodes flags, then the M/trailing flag).

    scatter/gather: message-table kernel implementations
    (ops/tables.py): "xla" | "sorted" | "onehot" | "auto" — auto picks
    by backend, table width, and row count from committed measurements.

    Distributed mode (inside shard_map): `axis` names the mesh axis and
    `shards` gives per-spec (slicer, valid) row-sharding hooks
    (_parse_spec). Each chip scatters only ITS rows into the message
    tables; one psum per level makes them global — the TPU-native analog
    of the reference's per-chunk histogram merge
    (/root/reference/structs.cpp:168-173) — and all gathers stay local.
    Flags reduce globally; the returned partials are per-shard (the
    caller psums the stack)."""
    from .tables import scatter_table, table_gather
    trees = []
    ci = vi = 0
    for qi, (spec, nc, nv) in enumerate(wspecs):
        trees.append(_parse_spec(spec, cols[ci:ci + nc],
                                 vals[vi:vi + nv],
                                 None if shards is None else shards[qi]))
        ci += nc
        vi += nv

    # ---- up pass, level-batched across trees ----
    # Per level, every participating edge owns a width-sized slice of ONE
    # concatenated table (offsets = running sum of edge widths): scatter
    # edges first (one scatter builds them all), precomputed bincounts
    # appended after. Both key columns' codes fit the edge width by
    # construction, so no index can leave its slice.
    maxh = max((h for t in trees for h in t.by_height), default=0)
    for h in range(1, maxh + 1):
        ups = [(t, ei) for t in trees for ei in t.by_height.get(h, ())]
        if not ups:
            continue
        sc = [(t, ei) for (t, ei) in ups if t.pre[ei] is None]
        pr = [(t, ei) for (t, ei) in ups if t.pre[ei] is not None]
        offs = {}
        total = 0
        for (t, ei) in sc + pr:
            offs[(id(t), ei)] = total
            total += t.edges[ei][4]
        parts = []
        if sc:
            t_sc = sum(t.edges[ei][4] for (t, ei) in sc)
            sent = np.int32(t_sc)        # mode="drop" sentinel
            idxs, ws = [], []
            for (t, ei) in sc:
                _p, c, _pre, _nd, _w = t.edges[ei]
                key = t.ckey[ei]
                off = np.int32(offs[(id(t), ei)])
                w = _mat(t.beta[c])
                mm = t.msg_mask[c]
                if mm is not None:
                    idxs.append(jnp.where(mm, key + off, sent))
                    ws.append(jnp.where(mm, 1, 0) if w is None
                              else jnp.where(mm, w, 0))
                else:
                    idxs.append(key + off)
                    ws.append(jnp.ones(key.shape[0], jnp.int32)
                              if w is None else w)
            B = scatter_table(_concat(idxs), _concat(ws), t_sc, scatter)
            if axis is not None:
                B = jax.lax.psum(B, axis)     # local scatters -> global
            parts.append(B)
        for (t, ei) in pr:
            parts.append(t.pre[ei])           # already-global bincounts
        mega = _concat(parts)
        gks, meta, resolved = [], [], []
        for (t, ei) in sc + pr:
            gk = t.pkey[ei] + np.int32(offs[(id(t), ei)])
            if gk.shape[0] > _BIG_WAVE_ROWS and not t.boolean:
                resolved.append((t, ei, _LazyGather(mega, gk)))
                continue
            gks.append(gk)
            meta.append((t, ei, gk.shape[0]))
        g = table_gather(mega, _concat(gks), gather) if gks else None
        o = 0
        for (t, ei, n) in meta:
            cv = g[o:o + n]
            o += n
            if t.boolean:
                cv = (cv > 0).astype(jnp.int32)
            resolved.append((t, ei, cv))
        for (t, ei, cv) in resolved:
            t.contrib[ei] = cv
            p = t.edges[ei][0]
            t.beta[p] = (cv if t.beta[p] is None
                         else _mat(t.beta[p]) * _mat(cv))

    # ---- down pass, level-batched (top-down depths) ----
    maxd = max((d for t in trees for d in t.by_depth), default=-1)
    for d in range(0, maxd + 1):
        downs = [(t, ei) for t in trees for ei in t.by_depth.get(d, ())]
        if not downs:
            continue
        offs = {}
        total = 0
        for (t, ei) in downs:
            offs[(id(t), ei)] = total
            total += t.edges[ei][4]
        sent = np.int32(total)
        idxs, ws = [], []
        for (t, ei) in downs:
            p, _c, _pre, _nd, _w = t.edges[ei]
            w = _mat(t.alpha[p])
            for ej in t.children[p]:
                if ej != ei:
                    w = (_mat(t.contrib[ej]) if w is None
                         else w * _mat(t.contrib[ej]))
            key = t.pkey[ei]
            off = np.int32(offs[(id(t), ei)])
            mm = t.msg_mask[p]
            if mm is not None:
                idxs.append(jnp.where(mm, key + off, sent))
                ws.append(jnp.where(mm, 1, 0) if w is None
                          else jnp.where(mm, w, 0))
            else:
                idxs.append(key + off)
                ws.append(jnp.ones(key.shape[0], jnp.int32)
                          if w is None else w)
        A = scatter_table(_concat(idxs), _concat(ws), total, scatter)
        if axis is not None:
            A = jax.lax.psum(A, axis)
        gks, meta = [], []
        for (t, ei) in downs:
            gk = t.ckey[ei] + np.int32(offs[(id(t), ei)])
            if gk.shape[0] > _BIG_WAVE_ROWS and not t.boolean:
                t.alpha[t.edges[ei][1]] = _LazyGather(A, gk)
                continue
            gks.append(gk)
            meta.append((t, ei, gk.shape[0]))
        g = table_gather(A, _concat(gks), gather) if gks else None
        o = 0
        for (t, ei, n) in meta:
            t.alpha[t.edges[ei][1]] = g[o:o + n]
            o += n

    # ---- flags + sums per tree, emitted in spec order ----
    flags, outs = [], []
    for t in trees:
        mask, msg_mask = t.mask, t.msg_mask
        flags.extend(_none_anywhere(mask[i], axis) for i in t.flag_nodes)
        if t.root >= 0 and t.tnode is None:
            br, mr = t.beta[t.root], mask[t.root]
            if isinstance(br, _LazyGather):
                # any(T[keys] > 0) without materializing the gather:
                # scatter the (masked) keys into a width-sized support
                # table, then test any((T > 0) & in-keys) — O(width)
                # memory instead of O(rows)
                sup = _support_table(br.keys, br.table.shape[0], mr)
                if axis is not None:
                    sup = jax.lax.psum(sup, axis)
                flags.append(_none_anywhere((br.table > 0) & (sup > 0),
                                            axis))
            elif br is None:
                flags.append(jnp.array(False) if mr is None
                             else _none_anywhere(mr, axis))
            elif mr is None:
                flags.append(_none_anywhere(br > 0, axis))
            else:
                flags.append(_none_anywhere(mr & (br > 0), axis))
        elif t.tnode is not None:
            # NULL gate from the PRE-selection rows. part[r] == row r of
            # the trailing node participates in the joined multiset
            # before the trailing selection (alpha/beta are messages
            # from the REST of the tree — they never include this node's
            # own masks). For a cross-node gate (trailing fusion) the
            # two sides participate independently: this spec's tree is
            # the PRE-fusion tree, so each side's alpha/beta already
            # exclude the trailing equality.
            def _participates(node, n_rows):
                p = jnp.ones(n_rows, bool)
                if mask[node] is not None:
                    p &= mask[node]
                if t.beta[node] is not None:
                    p &= _mat(t.beta[node]) > 0
                if t.alpha[node] is not None:
                    p &= _mat(t.alpha[node]) > 0
                return p
            part = _participates(t.tnode, t.tsel_a.shape[0])
            part_b = (part if t.tnode_b is None
                      else _participates(t.tnode_b, t.tsel_b.shape[0]))
            if t.tborn:
                # join-born (rewritten case-3 edge): NULL iff its PAIR
                # SET is empty (oracle.py:133-142) <=> no participating
                # row's left class value equals any participating row's
                # right value — a support-intersection test over one
                # dense width-sized table (made global by psum in dist
                # mode: a value may participate on one chip and match on
                # another)
                W = t.twidth
                supp = jnp.zeros(W, jnp.int32).at[
                    jnp.where(part, t.tsel_a, np.int32(W))].max(
                    part.astype(jnp.int32), mode="drop")
                if axis is not None:
                    supp = jax.lax.psum(supp, axis)
                flags.append(_none_anywhere((supp[t.tsel_b] > 0) & part_b,
                                            axis))
            else:
                # native same-slot predicate: never NULLs by itself
                # (Query.cpp:168-170) — NULL iff some JOIN emptied,
                # i.e. the pre-selection multiset is empty
                flags.append(_none_anywhere(part, axis))
        for (i,), plane in zip(t.projs, t.planes):
            m = t.beta[i]
            if t.alpha[i] is not None:
                m = (t.alpha[i] if m is None
                     else _mat(m) * _mat(t.alpha[i]))
            n = plane.shape[0]
            if isinstance(m, _LazyGather):
                # folds window by window; an attached mask (every
                # distributed shard carries a validity mask) rides along
                # window by window too (weighted_partials_big)
                outs.append((plane, m, msg_mask[i]))
                continue
            if m is None:
                w = (jnp.ones(n, jnp.int32) if msg_mask[i] is None
                     else msg_mask[i].astype(jnp.int32))
            else:
                w = (m if msg_mask[i] is None
                     else jnp.where(msg_mask[i], m, 0))
            outs.append((plane, w, None))

    # every projection folds through ONE segment-batched reduction:
    # segments concatenate with zero-gap padding to chunk multiples
    # (zero weight == dead row, so gaps contribute nothing); the chunk
    # size adapts to the wave's total rows (utils/limbs.py:seg_chunk) so
    # the fold stays exact to ~2**35 rows. HUGE waves (> 2**28 rows)
    # skip the concatenation — it would copy 2x the wave's bytes, the
    # difference between fitting one chip's HBM at 2**30 rows and not —
    # and fold each projection in place (weighted_partials_big: windowed
    # fori_loop reads straight out of the operands).
    parts = ()
    if outs:
        total = sum(plane.shape[0] for plane, _w, _mk in outs)
        if total > _BIG_WAVE_ROWS or any(
                isinstance(w, _LazyGather) for _, w, _ in outs):
            parts = (jnp.stack(
                [weighted_partials_big(plane, weight_table=w.table,
                                       weight_keys=w.keys,
                                       weight_mask=mk)
                 if isinstance(w, _LazyGather)
                 else weighted_partials_big(plane, w)
                 for plane, w, mk in outs]),)
            return tuple(flags), parts
        cseg = seg_chunk(total, len(outs))
        gap = jnp.zeros(cseg, jnp.int32)
        vs, ws, seg_ids = [], [], []
        for si, (plane, w, _mk) in enumerate(outs):
            n = plane.shape[0]
            pad = -n % cseg
            vs.append(plane)
            ws.append(w)
            if pad:
                vs.append(gap[:pad])
                ws.append(gap[:pad])
            seg_ids.extend([si] * ((n + pad) // cseg))
        parts = (weighted_partials_segments(
            _concat(vs), _concat(ws),
            np.asarray(seg_ids, np.int32), len(outs), chunk=cseg),)
    return tuple(flags), parts


def run_ftree(spec, cols, vals, scatter="xla", gather="xla"):
    """Execute one factorized tree (a single-spec wave). Returns
    (flags, partials): one bool flag per flag_node plus the M-emptiness
    flag, and partials = a 1-tuple holding ONE (n_projs, 5, 3) stack of
    SEG_SHIFT-piece weighted folds (weighted_partials_segments layout —
    decode each row with utils/limbs.py:combine_weighted_segments).
    Traced inline under the fused stage program (ops/stage.py)."""
    return run_ftree_wave(((spec, len(cols), len(vals)),),
                          tuple(cols), tuple(vals),
                          scatter=scatter, gather=gather)

