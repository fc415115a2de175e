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

  spec = (filts, n_sels, edges, flag_nodes, root, projs, trail, tsels)
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
    tsels:      tuple of node indices — ADDITIONAL trailing same-slot
                selections (two cols each, after the trail pair). Each
                masks its node's outgoing messages and sum weights
                (msg_mask) but never the NULL flags. A spec with tsels
                has trail=None and root=-1 (its sums see every trailing
                mask, so neither the root flag nor a single-node gate
                could decide NULL from it); a flag-only COMPANION spec
                of the same tree WITHOUT any trailing entry carries the
                NULL gate instead — trailing masks on OTHER nodes would
                otherwise leak into this node's alpha/beta and turn the
                pre-trailing participation test post-trailing
                (models/batch.py "masked"/"pregate" variants).

Column/value consumption order (must match the planner):
  cols: 1. per node in node order: its filter columns, then its
           selection column pairs
        1b. the trailing selection's column pair, if any
        1c. per tsels entry, in order: its column pair
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

from ..utils import limbs as _limbs
from ..utils.limbs import (seg_chunk, weighted_partials_big,
                           weighted_partials_segments)
from .filter import OP_EQ, OP_LT

# waves/gathers past this many rows switch to the HBM-bounded paths
# (no-concat per-projection folds; lazy gathers)
_BIG_WAVE_ROWS = 1 << 28


class _Tree:
    """Per-spec traced state inside a wave."""

    __slots__ = ("spec", "edges", "flag_nodes", "root", "projs",
                 "plane_bits",
                 "mask", "msg_mask", "tnode", "tnode_b", "tborn", "twidth",
                 "tsel_a", "tsel_b",
                 "pkey", "ckey", "pre", "children", "boolean",
                 "beta", "contrib", "alpha", "planes",
                 "by_height", "by_depth", "done_folds", "done_flag")


def _parse_spec(spec, cols, vals, shard=None):
    """Consume one spec's cols/vals (doc order above) into a _Tree:
    masks, key columns, pre tables, plus static height/depth schedules
    for the wave's level-batched passes.

    shard (distributed mode): (slicer, valid) — slicer(col, node) cuts
    this chip's row range out of a replicated node column, valid(node)
    is the boolean mask of real (non-pad, non-duplicate) rows in that
    slice. Pre tables are GLOBAL bincounts and are never sliced."""
    filts, n_sels, edges, flag_nodes, root, projs, trail, tsels = spec
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

    # additional trailing selections: final-multiset masks only (the
    # NULL gate lives in a trailing-free companion spec — see docstring)
    for node in tsels:
        a = node_col_raw(node)
        b = node_col_raw(node)
        eq = a == b
        t.msg_mask[node] = (eq if t.msg_mask[node] is None
                            else t.msg_mask[node] & eq)

    t.pkey, t.ckey = [], []
    for (p, c, _pre, _nd, _w) in edges:
        t.pkey.append(node_col_raw(p))
        t.ckey.append(node_col_raw(c))
    t.pre = []
    for (_p, _c, pre_flag, _nd, w) in edges:
        # precomputed bincounts are catalog-domain long; the edge only
        # spans its own width (slicing drops nothing: codes <= width-1)
        t.pre.append(next_col()[:w] if pre_flag else None)
    t.planes = [node_col_raw(i) for (i, *_b) in projs]
    # static value-bit bounds per projection plane (spec-carried, from
    # load-time stats) — lets sorted windows PACK planes into the sort
    # key's low bits; 31 = unknown/unpackable
    t.plane_bits = [(b[0] if b else 31) for (_i, *b) in projs]

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
    t.done_folds = {}        # proj index -> (5, 3) fold from a fused pass
    t.done_flag = None       # per-chip any(weight > 0) from a fused pass

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


def _win_rows() -> int:
    # window length of every huge-node loop; min() lets tests shrink it
    # by monkeypatching _BIG_WAVE_ROWS
    return min(1 << 26, _BIG_WAVE_ROWS)


def _win_guard(n: int) -> None:
    """Window starts (i * w_rows) and dynamic_slice offsets are int32;
    past ~2**31 they would wrap negative and silently re-visit window 0.
    Raise loudly instead (nothing that big fits one chip anyway)."""
    if n >= (1 << 31) - (1 << 26):
        raise ValueError(
            f"huge-node window loops cap below 2**31 rows (int32 window "
            f"addressing); got {n}")


def _slice_cached(arr, start, size, cache):
    """dynamic_slice with per-window CSE: the same operand sliced by
    several consumers of a fused pass reads HBM once."""
    if cache is None:
        return jax.lax.dynamic_slice(arr, (start,), (size,))
    ck = ("s", id(arr))
    if ck not in cache:
        cache[ck] = jax.lax.dynamic_slice(arr, (start,), (size,))
    return cache[ck]


class _Lazy:
    """An unmaterialized per-row weight over a HUGE node: the
    elementwise product of window-evaluable factors.

    Materializing one message gather at 2**30 keys costs 8 GB of HBM
    (the gather output plus the TPU backend's clamped-index temp); a
    star join multiplies SEVERAL of them — the difference between a
    1B-row fact table fitting one chip and not. Factors:

      ("gather", table, keys, off, clamp) — table[keys + off], clamped
          to 0/1 for boolean trees; the offset into the level's
          concatenated table is applied per WINDOW, so no keys-length
          `keys + off` copy ever exists
      ("mat", vec)   — an already-materialized int32 vector
      ("mask", bvec) — boolean; False rows contribute weight 0

    Every consumer evaluates window by window (O(window) temps):
    projection folds via utils/limbs.py:weighted_partials_big's
    weight_fn, message builds via _scatter_add_big, emptiness flags via
    _lazy_any_positive. Products stay int32-exact under the planner's
    host-checked overflow caps (models/batch.py:_ftree_caps), exactly
    as the materialized path's products do."""

    __slots__ = ("n", "factors")

    def __init__(self, n, factors):
        _win_guard(n)
        self.n = n
        self.factors = list(factors)

    @classmethod
    def gather(cls, table, keys, off, clamp, kbits=31):
        # kbits: static bit bound of the key values (the edge width),
        # consumed by the sorted-window packer
        return cls(keys.shape[0],
                   [("gather", table, keys, np.int32(off), bool(clamp),
                     int(kbits))])

    def with_mask(self, bvec):
        return (self if bvec is None
                else _Lazy(self.n, self.factors + [("mask", bvec)]))

    def _parts(self, start, size, cache=None):
        sorted_ids = (cache or {}).get("sorted_ids", ())
        for f in self.factors:
            if f[0] == "gather":
                _tag, table, keys, off, clamp = f[:5]
                k = _slice_cached(keys, start, size, cache)
                ck = ("g", id(table), id(keys), int(off), clamp)
                if cache is not None and ck in cache:
                    yield cache[ck], clamp
                    continue
                if id(keys) in sorted_ids:
                    # the window was sorted by THIS key column
                    # (_fused_node_pass wsort): the hier gather reads
                    # sub_width-wide table windows + blocked one-hot MXU
                    # lookups — 339-391 M elem/s vs the engine's 116 M
                    # at 2^20 bins (readback-forced, EVIDENCE_r05);
                    # adding the offset preserves sortedness
                    from .tables import table_gather_hier
                    g = table_gather_hier(table, k + off)
                else:
                    g = table.at[k + off].get(mode="promise_in_bounds")
                g = (g > 0) if clamp else g
                if cache is not None:
                    cache[ck] = g
                yield g, clamp
            elif f[0] == "mat":
                yield _slice_cached(f[1], start, size, cache), False
            else:
                yield _slice_cached(f[1], start, size, cache), True

    def window(self, start, size, cache=None):
        """int32 weights for rows [start, start+size). `cache` (optional
        dict): per-window common-subexpression store shared across the
        consumers of one fused pass — a gather factor or operand slice
        evaluated once per window is reused by every consumer that
        shares it (the star join's A builds and projection folds gather
        the SAME message tables)."""
        w = msk = None
        for g, is_bool in self._parts(start, size, cache):
            if is_bool:
                msk = g if msk is None else msk & g
            else:
                w = g if w is None else w * g
        if w is None:
            w = jnp.ones(size, jnp.int32)
        return w if msk is None else jnp.where(msk, w, 0)

    def pos_window(self, start, size):
        """bool window: weight > 0 (factors are nonnegative, so the
        product is positive iff every factor is)."""
        p = None
        for g, is_bool in self._parts(start, size):
            t = g if is_bool else (g > 0)
            p = t if p is None else p & t
        return (jnp.ones(size, bool) if p is None else p)


def _mat(x):
    """Materialize full length — the small-node fallback only."""
    if isinstance(x, _Lazy):
        return x.window(np.int32(0), x.n)
    return x


def _lazy_mul(a, b):
    """Product of None | int32 vector | _Lazy weights (same length);
    stays lazy if either side is."""
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, _Lazy) or isinstance(b, _Lazy):
        fa = a.factors if isinstance(a, _Lazy) else [("mat", a)]
        fb = b.factors if isinstance(b, _Lazy) else [("mat", b)]
        n = a.n if isinstance(a, _Lazy) else a.shape[0]
        return _Lazy(n, fa + fb)
    return a * b


def _vary(x, axis):
    """Mark a loop-carry init as device-varying inside shard_map (the
    loop body mixes in per-chip data, and carry types must match)."""
    return x if axis is None else jax.lax.pcast(x, axis, to="varying")


def _lazy_any_positive(lz: _Lazy, mask, axis=None):
    """any(weight > 0 [& mask]) over a huge node, window by window
    (OR is idempotent, so the clamped final window may overlap)."""
    n = lz.n
    w_rows = _win_rows()
    if n <= w_rows:
        p = lz.pos_window(np.int32(0), n)
        return jnp.any(p if mask is None else p & mask)
    nw = -(-n // w_rows)

    def body(i, acc):
        start = jnp.minimum(i * w_rows, n - w_rows)
        p = lz.pos_window(start, w_rows)
        if mask is not None:
            p = p & jax.lax.dynamic_slice(mask, (start,), (w_rows,))
        return acc | jnp.any(p)
    return jax.lax.fori_loop(0, nw, body, _vary(jnp.array(False), axis))


def _scatter_add_big(width, key, off, weight, mask, sent, axis=None,
                     impl="xla"):
    """zeros(width).at[key + off (masked -> sent)].add(weight) for a
    HUGE key vector, window by window: the scatter's full-length
    broadcast-update / index-select temps (2x 4 GB at 2**30 rows) and
    the masked-index `where` copy all shrink to O(window). weight:
    None | int32 vector | _Lazy — evaluated per window. add is NOT
    idempotent, so the ragged tail re-scatters the LAST w_rows with the
    already-covered head masked to zero weight (live_from), unlike the
    idempotent rewrite the fold/any loops use."""
    from .tables import scatter_add_window
    n = key.shape[0]
    _win_guard(n)
    w_rows = _win_rows()
    off = np.int32(off)

    def win(start, size, live_from=None):
        k = jax.lax.dynamic_slice(key, (start,), (size,)) + off
        if isinstance(weight, _Lazy):
            w = weight.window(start, size)
        elif weight is None:
            w = jnp.ones(size, jnp.int32)
        else:
            w = jax.lax.dynamic_slice(weight, (start,), (size,))
        if mask is not None:
            m = jax.lax.dynamic_slice(mask, (start,), (size,))
            k = jnp.where(m, k, sent)
            w = jnp.where(m, w, 0)
        if live_from is not None:
            idx = start + jax.lax.broadcasted_iota(jnp.int32, (size,), 0)
            w = jnp.where(idx >= live_from, w, 0)
        return k, w

    n_full = n // w_rows            # n > _BIG_WAVE_ROWS >= w_rows

    def body(i, acc):
        k, w = win(i * w_rows, w_rows)
        return scatter_add_window(acc, k, w, impl)
    acc = jax.lax.fori_loop(0, n_full, body,
                            _vary(jnp.zeros(width, jnp.int32), axis))
    if n_full * w_rows < n:
        k, w = win(np.int32(n - w_rows), w_rows,
                   live_from=np.int32(n_full * w_rows))
        acc = scatter_add_window(acc, k, w, impl)
    return acc


def _collect_pass_arrays(scatters, folds):
    """Ordered {id: array} of every window-sliced operand of a fused
    pass: scatter keys/weights/masks, fold planes, and the arrays
    inside every lazy factor. These are exactly the arrays a sorted
    window must carry through its permutation."""
    arrs = {}

    def add(a):
        if a is not None and id(a) not in arrs:
            arrs[id(a)] = a

    def add_lazy(w):
        if isinstance(w, _Lazy):
            for f in w.factors:
                add(f[2] if f[0] == "gather" else f[1])
        elif w is not None:
            add(w)

    for (_w, key, _off, weight, mask, _sent) in scatters:
        add(key)
        add_lazy(weight)
        add(mask)
    for (plane, lz, _pb) in folds:
        add(plane)
        add_lazy(lz)
    return arrs


def _pick_primary(scatters, folds):
    """id of the key column consumed by the most scatters + lazy
    gathers of this pass — the column whose sort order pays the most."""
    cnt: dict = {}
    for (_w, key, _off, weight, _m, _s) in scatters:
        cnt[id(key)] = cnt.get(id(key), 0) + 1
        if isinstance(weight, _Lazy):
            for f in weight.factors:
                if f[0] == "gather":
                    cnt[id(f[2])] = cnt.get(id(f[2]), 0) + 1
    for (_plane, lz, _pb) in folds:
        for f in lz.factors:
            if f[0] == "gather":
                cnt[id(f[2])] = cnt.get(id(f[2]), 0) + 1
    if not cnt:
        return None
    return max(cnt.items(), key=lambda kv: kv[1])[0]


def _pass_bits(scatters, folds, arrs):
    """Static value-bit bounds per operand array of a fused pass:
    scatter keys are bounded by their table widths, gather-factor keys
    by their edge widths (_Lazy.gather kbits), planes by spec-carried
    load-time stats, boolean masks by 1; uint16 dtype bounds anything
    else at 16. 31 = unknown (carried raw by the packer — negative or
    unbounded values must never enter a packed word)."""
    bits = {}

    def note(a, b):
        bits[id(a)] = min(bits.get(id(a), 31), b)

    def note_lazy(w):
        if isinstance(w, _Lazy):
            for f in w.factors:
                if f[0] == "gather":
                    note(f[2], f[5] if len(f) > 5 else 31)
                elif f[0] == "mask":
                    note(f[1], 1)
    for (width, key, _off, weight, mask, _sent) in scatters:
        note(key, (width - 1).bit_length())
        note_lazy(weight)
        if mask is not None:
            note(mask, 1)
    for (_plane, lz, pb) in folds:
        note(_plane, pb)
        note_lazy(lz)
    for i, a in arrs.items():
        if a.dtype == jnp.bool_:
            bits[i] = min(bits.get(i, 31), 1)
        elif a.dtype == jnp.uint16:
            bits[i] = min(bits.get(i, 31), 16)
    return bits


def _plan_packing(primary, arrs, bits, with_live):
    """First-fit-decreasing layout of a sorted window's operands into
    int32 words: word 0 carries the primary key in its HIGH bits (so
    sorting by word 0 sorts by key; low-bit payload ties are free to
    break arbitrarily — multiset consumers), remaining known-bit
    payloads fill word 0's low bits then further words; unknown-bit
    operands ride the sort raw. Returns (layout, raw_ids, n_ops) or
    None when packing would not shrink the sort's operand count.
    layout: list of words, each a list of (payload_id, shift, bits);
    word 0's last entry is ("_key", shift, kbits); live (the ragged
    tail's already-covered mask) packs as pseudo-id "_live" (1 bit)."""
    pb = bits.get(primary, 31)
    if pb >= 31:
        return None
    payloads = [(i, bits.get(i, 31)) for i in arrs if i != primary]
    if with_live:
        payloads.append(("_live", 1))
    known = sorted([p for p in payloads if p[1] < 31],
                   key=lambda x: -x[1])
    raw = [p[0] for p in payloads if p[1] >= 31]
    # word 0 starts with the key at its top; payloads stack downward
    words = [[("_key", 31 - pb, pb)]]
    space = [31 - pb]
    for (i, b) in known:
        for w in range(len(words)):
            if space[w] >= b:
                words[w].append((i, space[w] - b, b))
                space[w] -= b
                break
        else:
            words.append([(i, 31 - b, b)])
            space.append(31 - b)
    n_ops = len(words) + len(raw)
    plain_ops = 1 + len(payloads)
    if n_ops >= plain_ops:
        return None
    return words, raw, n_ops


def _fused_node_pass(n, scatters, folds, flag_idx, axis, impl="xla",
                     wsort=False):
    """ONE window loop over a huge node serving every consumer at once:
    message-table scatter builds (the down-pass A slices), exact
    projection folds, and the root NULL flag. Each window slices the
    operands and evaluates every shared lazy gather factor ONCE
    (`_Lazy.window(cache=...)`) — on a star fact node the A build for
    edge 1 gathers edge 2's message table and vice versa, and the
    projection fold gathers BOTH: unfused that is four full passes
    through the v5e gather engine (~9 ns/element — ~10 s each at 2**30
    rows), fused it is two. The TPU-native analog of the reference
    probing all partitions of a bucket in one sweep
    (/root/reference/structs.cpp:111-134 + intermediate.cpp:146-183).

    scatters: [(width, key, off, weight, mask, sent)] — semantics of
        _scatter_add_big (weight: None | vector | _Lazy).
    folds: [(plane, lazy_weight)] — the lazy weight already carries its
        msg_mask factor; returns weighted_partials_segments-style (5, 3)
        folds (decode with combine_weighted_segments).
    flag_idx: folds index whose any(weight > 0) is also wanted (the
        root emptiness bit), or None.
    wsort: sort every window ONCE by the pass's most-consumed key
        column, carrying every other operand slice through the same
        permutation (folds/scatters/flags are multiset ops — window
        order is free). Consumers then read permuted slices
        transparently through the window cache, and the primary key's
        gathers/scatters run the presorted hier kernels instead of the
        fixed-function engines: 339 M elem/s gathers and 295 M
        updates/s builds vs the engines' 116/150 M, bought by one
        ~363 M rows/s bit-packed carrying sort (readback-forced
        timings, EVIDENCE_r05; end to end the same-session A/B at
        2^29 zipf measured 13.83 -> 4.72 s). The r4 negative
        (per-window hier at 16.7 -> 23.2 s) paid one sort per SCATTER;
        this pays one per WINDOW for every consumer. Single-chip only
        (axis None): distributed shards keep engine order.
    Returns ([A_i], [fold_i], anyp_or_None). Exactness: full windows
    are disjoint; the ragged tail re-runs the LAST w_rows with rows
    already covered masked to zero weight (scatter adds zero, fold
    channels zero via live_from — carried through the permutation as a
    sort operand under wsort, OR unaffected) — the same discipline
    as _scatter_add_big / weighted_partials_big, here sharing one loop.
    """
    from .tables import MXU_SCATTER_MAX_BINS, scatter_add_window
    _win_guard(n)
    if wsort is True:
        wsort = "on"
    elif not wsort:
        wsort = "off"
    # sorted windows work under shard_map too: every window is a
    # slice of THIS chip's shard, so the sort is collective-free and
    # the psum'd accs are unaffected (multiset ops)
    primary = (_pick_primary(scatters, folds)
               if wsort != "off" else None)
    arrs = _collect_pass_arrays(scatters, folds) if primary is not None \
        else None
    if primary is not None and wsort == "mono" and len(arrs) > 2:
        # the "auto" policy: engage only the measured-WIN class. A
        # 2-operand pass (one key + one plane: the zipf shape) measured
        # 13.83 -> 4.72 s; a 3-operand pass (the star: two keys + a
        # plane) measured 38.93 -> 40.68 s same-session — only the
        # primary key's legs improve while every leg pays the sort and
        # the quartered window. "on" forces sorted windows everywhere.
        primary = arrs = None
    bits = (_pass_bits(scatters, folds, arrs) if primary is not None
            else None)

    chunk = seg_chunk(n, 1) if folds else 1
    base_rows = _win_rows()
    if primary is not None and len(arrs) > 2:
        # sorted windows add O(window x operands) temps (sort in/out,
        # unpacked slices, and the hier kernels' block tensors — XLA
        # materializes multi-hundred-MB slabs for the batched one-hot
        # matmuls): a 3+-operand pass (the 1B star: key1 + key2 +
        # plane over 10 GB of resident args) OOMed a 16 GB v5e at
        # 2^26-row windows AND at 2^25 — quarter them. The 2-operand
        # zipf pass keeps full windows (measured 9.45 s at 2^30);
        # sort amortization only loses the log2 factor of two
        # halvings.
        base_rows //= 4
    w_rows = max(base_rows, chunk)
    n_full = n // w_rows
    m = (n_full * w_rows) // chunk if folds else 0

    def scat_impl(key, width, mask):
        # primary-key scatters run the presorted hier build; masked
        # ones keep their sorted order because eval_win zeroes the
        # WEIGHT instead of rewriting masked keys to the sentinel
        del mask
        if primary is not None and id(key) == primary \
                and width > MXU_SCATTER_MAX_BINS:
            return "hier_presorted"
        return impl

    def eval_win(start, size, live_rel=None):
        cache = {}
        idx = (None if live_rel is None
               else jax.lax.broadcasted_iota(jnp.int32, (size,), 0))
        live_s = None
        if primary is not None:
            live = (idx >= live_rel) if live_rel is not None else None
            sl = {i: jax.lax.dynamic_slice(arrs[i], (start,), (size,))
                  for i in arrs}
            pk = _plan_packing(primary, arrs, bits, live is not None)
            if pk is None:
                order = [primary] + [i for i in arrs if i != primary]
                ops = [sl[i] for i in order]
                if live is not None:
                    ops.append(live)
                so = jax.lax.sort(tuple(ops), num_keys=1)
                for i, s in zip(order, so):
                    cache[("s", i)] = s
                if live is not None:
                    live_s = so[len(order)]
            else:
                # bit-packed sort: known-bit payloads ride the key
                # word's low bits (and further words), shrinking the
                # carrying sort toward the 1-operand rate; values are
                # nonnegative by the bit bounds' construction
                words, raw, _n = pk

                def as32(i):
                    a = (live if i == "_live"
                         else sl[primary] if i == "_key" else sl[i])
                    return a.astype(jnp.int32)

                packed = []
                for wlist in words:
                    wv = None
                    for (i, sh, _b) in wlist:
                        v = as32(i) << sh
                        wv = v if wv is None else wv | v
                    packed.append(wv)
                so = jax.lax.sort(
                    tuple(packed + [sl[i] for i in raw]), num_keys=1)
                for wi, wlist in enumerate(words):
                    wv = so[wi]
                    for (i, sh, b) in wlist:
                        v = (wv >> sh) & ((1 << b) - 1)
                        if i == "_key":
                            cache[("s", primary)] = v
                        elif i == "_live":
                            live_s = v != 0
                        else:
                            a = arrs[i]
                            if a.dtype == jnp.bool_:
                                v = v != 0
                            elif a.dtype != jnp.int32:
                                v = v.astype(a.dtype)
                            cache[("s", i)] = v
                for i, s in zip(raw, so[len(words):]):
                    cache[("s", i)] = s
            cache["sorted_ids"] = {primary}
        sc = []
        for (width, key, off, weight, mask, sent) in scatters:
            k = _slice_cached(key, start, size, cache) + off
            if isinstance(weight, _Lazy):
                w = weight.window(start, size, cache)
            elif weight is None:
                w = jnp.ones(size, jnp.int32)
            else:
                w = _slice_cached(weight, start, size, cache)
            if mask is not None:
                mk = _slice_cached(mask, start, size, cache)
                if primary is not None and id(key) == primary:
                    # the window is sorted by THIS key: zeroing the
                    # WEIGHT alone preserves both the scatter's value
                    # (adding 0) and the sorted order the presorted
                    # hier build relies on — key codes are always
                    # in-range (< width by the planner's construction;
                    # shard pads hold zeros), so the sentinel rewrite
                    # is unnecessary here
                    w = jnp.where(mk, w, 0)
                else:
                    k = jnp.where(mk, k, sent)
                    w = jnp.where(mk, w, 0)
            if live_rel is not None:
                w = jnp.where(live_s if live_s is not None
                              else idx >= live_rel, w, 0)
            sc.append((k, w))
        fc, anyp = [], None
        for fi, (plane, lz, _pb) in enumerate(folds):
            c = lz.window(start, size, cache)
            if live_s is not None:
                # row positions permuted: the tail's already-covered
                # mask rode the sort as an operand
                c = jnp.where(live_s, c, 0)
            if flag_idx == fi:
                cp = c if (live_rel is None or live_s is not None) \
                    else jnp.where(idx >= live_rel, c, 0)
                anyp = jnp.any(cp > 0)
            v = _slice_cached(plane, start, size, cache)
            fc.append(_limbs._channel_sums(
                v, c, chunk,
                live_from=None if live_s is not None else live_rel))
        return sc, fc, anyp

    def body(i, carry):
        accA, accF, flg = carry
        start = i * w_rows
        sc, fc, ap = eval_win(start, w_rows)
        accA = tuple(scatter_add_window(a, k, w,
                                        scat_impl(s[1], s[0], s[4]))
                     for a, (k, w), s in zip(accA, sc, scatters))
        accF = tuple(jax.lax.dynamic_update_slice(a, cols,
                                                  (0, start // chunk))
                     for a, cols in zip(accF, fc))
        if ap is not None:
            flg = flg | ap
        return (accA, accF, flg)

    accA = tuple(_vary(jnp.zeros(s[0], jnp.int32), axis)
                 for s in scatters)
    accF = tuple(_vary(jnp.zeros((5, m), jnp.int32), axis) for _ in folds)
    flg = _vary(jnp.array(False), axis)
    accA, accF, flg = jax.lax.fori_loop(0, n_full, body, (accA, accF, flg))
    chs = list(accF)
    if n_full * w_rows < n:
        live_rel = np.int32(n_full * w_rows - (n - w_rows))
        sc, fc, ap = eval_win(np.int32(n - w_rows), w_rows,
                              live_rel=live_rel)
        accA = tuple(scatter_add_window(a, k, w,
                                        scat_impl(s[1], s[0], s[4]))
                     for a, (k, w), s in zip(accA, sc, scatters))
        chs = [jnp.concatenate([a, cols], axis=1)
               for a, cols in zip(chs, fc)]
        if ap is not None:
            flg = flg | ap

    def finish(ch):
        lo = (ch & 0x7FF).sum(axis=1, dtype=jnp.int32)
        mid = ((ch >> _limbs.SEG_SHIFT) & 0x7FF).sum(axis=1,
                                                     dtype=jnp.int32)
        hi = (ch >> (2 * _limbs.SEG_SHIFT)).sum(axis=1, dtype=jnp.int32)
        return jnp.stack([lo, mid, hi], axis=-1)

    return (list(accA), [finish(ch) for ch in chs],
            flg if flag_idx is not None else None)


def _none_anywhere(x, axis):
    """~any(x), globally across the mesh axis in distributed mode."""
    a = jnp.any(x)
    if axis is None:
        return ~a
    return jax.lax.psum(a.astype(jnp.int32), axis) == 0


def run_ftree_wave(wspecs, cols, vals, axis=None, shards=None,
                   scatter="xla", gather="xla", wsort=False):
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
        # edges whose CHILD node is huge scatter window by window,
        # each into its own width-sized slot of the level table; the
        # rest batch into one scatter kernel as usual
        sc = [(t, ei) for (t, ei) in ups if t.pre[ei] is None
              and t.ckey[ei].shape[0] <= _BIG_WAVE_ROWS]
        bg = [(t, ei) for (t, ei) in ups if t.pre[ei] is None
              and t.ckey[ei].shape[0] > _BIG_WAVE_ROWS]
        pr = [(t, ei) for (t, ei) in ups if t.pre[ei] is not None]
        offs = {}
        total = 0
        for (t, ei) in sc + bg + pr:
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
        # huge-CHILD edges group by (tree, child): one fused window
        # pass per node serves every edge's B build (shared operand
        # slices + under wsort one carrying sort per window feeding the
        # presorted hier build)
        up_groups: dict = {}
        for (t, ei) in bg:
            up_groups.setdefault((id(t), t.edges[ei][1]), (t, []))[1]\
                .append(ei)
        up_part = {}
        for (_tid, c), (t, eis) in up_groups.items():
            scats = []
            for ei in eis:
                w = t.edges[ei][4]
                scats.append((w, t.ckey[ei], np.int32(0), t.beta[c],
                              t.msg_mask[c], np.int32(w)))
            B_list, _f, _a = _fused_node_pass(
                t.ckey[eis[0]].shape[0], scats, [], None, axis,
                impl=scatter, wsort=wsort)
            for ei, Bb in zip(eis, B_list):
                if axis is not None:
                    Bb = jax.lax.psum(Bb, axis)
                up_part[(id(t), ei)] = Bb
        parts.extend(up_part[(id(t), ei)] for (t, ei) in bg)
        for (t, ei) in pr:
            parts.append(t.pre[ei])           # already-global bincounts
        mega = _concat(parts)
        gks, meta, resolved = [], [], []
        for (t, ei) in sc + bg + pr:
            off = offs[(id(t), ei)]
            if t.pkey[ei].shape[0] > _BIG_WAVE_ROWS:
                # huge PARENT: defer the gather; boolean trees clamp
                # per window inside the lazy factor
                kb = (t.edges[ei][4] - 1).bit_length()
                resolved.append((t, ei, _Lazy.gather(mega, t.pkey[ei],
                                                     off, t.boolean,
                                                     kbits=kb)))
                continue
            gks.append(t.pkey[ei] + np.int32(off))
            meta.append((t, ei, t.pkey[ei].shape[0]))
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
            t.beta[p] = _lazy_mul(t.beta[p], cv)

    # ---- down pass, level-batched (top-down depths) ----
    maxd = max((d for t in trees for d in t.by_depth), default=-1)
    for d in range(0, maxd + 1):
        downs = [(t, ei) for t in trees for ei in t.by_depth.get(d, ())]
        if not downs:
            continue
        # edges whose PARENT node is huge build their A slice window by
        # window (the scatter weight — alpha[p] times the sibling
        # contribs, a product of huge lazy gathers on a star fact node —
        # is evaluated per window, never materialized)
        sm = [(t, ei) for (t, ei) in downs
              if t.pkey[ei].shape[0] <= _BIG_WAVE_ROWS]
        bg = [(t, ei) for (t, ei) in downs
              if t.pkey[ei].shape[0] > _BIG_WAVE_ROWS]
        offs = {}
        total = 0
        for (t, ei) in sm + bg:
            offs[(id(t), ei)] = total
            total += t.edges[ei][4]

        def down_weight(t, ei):
            p = t.edges[ei][0]
            w = t.alpha[p]
            for ej in t.children[p]:
                if ej != ei:
                    w = _lazy_mul(w, t.contrib[ej])
            return w

        parts = []
        if sm:
            t_sm = sum(t.edges[ei][4] for (t, ei) in sm)
            sent = np.int32(t_sm)
            idxs, ws = [], []
            for (t, ei) in sm:
                p = t.edges[ei][0]
                w = _mat(down_weight(t, ei))
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
            Ab = scatter_table(_concat(idxs), _concat(ws), t_sm, scatter)
            if axis is not None:
                Ab = jax.lax.psum(Ab, axis)
            parts.append(Ab)
        # huge-parent edges: ONE fused window pass per (tree, parent)
        # builds all of the node's A slices, folds its projections, and
        # emits its NULL flag, sharing every per-window gather factor
        # (_fused_node_pass) — a star fact's sibling-contrib gathers and
        # its projection-weight gathers are the same tables
        groups: dict = {}
        for (t, ei) in bg:
            groups.setdefault((id(t), t.edges[ei][0]), (t, []))[1]\
                .append(ei)
        part_of = {}
        for (_tid, p), (t, eis) in groups.items():
            n_node = t.pkey[eis[0]].shape[0]
            scats = []
            for ei in eis:
                w_edge = t.edges[ei][4]
                scats.append((w_edge, t.pkey[ei], np.int32(0),
                              down_weight(t, ei), t.msg_mask[p],
                              np.int32(w_edge)))
            folds, fold_pi, flag_idx = [], [], None
            for pi, ((i, *_b), plane) in enumerate(zip(t.projs, t.planes)):
                if i != p or pi in t.done_folds:
                    continue
                m_ = _lazy_mul(t.beta[i], t.alpha[i])
                if not isinstance(m_, _Lazy):
                    continue
                if (i == t.root and t.tnode is None and flag_idx is None
                        and t.msg_mask[i] is t.mask[i]):
                    flag_idx = len(folds)
                folds.append((plane, m_.with_mask(t.msg_mask[i]),
                              t.plane_bits[pi]))
                fold_pi.append(pi)
            A_list, fold_list, anyp = _fused_node_pass(
                n_node, scats, folds, flag_idx, axis, impl=scatter,
                wsort=wsort)
            for ei, Ah in zip(eis, A_list):
                if axis is not None:
                    Ah = jax.lax.psum(Ah, axis)
                part_of[(id(t), ei)] = Ah
            for pi, f in zip(fold_pi, fold_list):
                t.done_folds[pi] = f
            if anyp is not None:
                t.done_flag = anyp
        parts.extend(part_of[(id(t), ei)] for (t, ei) in bg)
        A = _concat(parts)
        gks, meta = [], []
        for (t, ei) in sm + bg:
            off = offs[(id(t), ei)]
            if t.ckey[ei].shape[0] > _BIG_WAVE_ROWS:
                t.alpha[t.edges[ei][1]] = _Lazy.gather(
                    A, t.ckey[ei], off, t.boolean,
                    kbits=(t.edges[ei][4] - 1).bit_length())
                continue
            gks.append(t.ckey[ei] + np.int32(off))
            meta.append((t, ei, t.ckey[ei].shape[0]))
        g = table_gather(A, _concat(gks), gather) if gks else None
        o = 0
        for (t, ei, n) in meta:
            t.alpha[t.edges[ei][1]] = g[o:o + n]
            o += n

    # ---- flags + sums per tree, emitted in spec order ----
    flags, outs = [], []
    for t in trees:
        mask, msg_mask = t.mask, t.msg_mask
        # the tree's projection folds, built BEFORE the flags so a lazy
        # root flag can fuse into the root projection's fold loop
        # (root_fold = outs index whose any(weight > 0) IS the flag:
        # alpha[root] is always None, so that fold's weight is exactly
        # beta[root] masked by msg_mask[root] — equal to the flag's
        # beta > 0 & mask when no trailing selection retouched the root)
        # nodes with SEVERAL pending lazy folds (a u64 column's 16-bit
        # planes, or several projected columns of one huge node) fold in
        # one fused window pass sharing the weight-product gathers,
        # instead of one weighted_partials_big loop per plane
        by_node: dict = {}
        for pi, ((i, *_b), plane) in enumerate(zip(t.projs, t.planes)):
            if pi in t.done_folds:
                continue
            m = _lazy_mul(t.beta[i], t.alpha[i])
            if isinstance(m, _Lazy):
                by_node.setdefault(i, []).append((pi, plane, m))
        for i, lst in by_node.items():
            if len(lst) < 2 and wsort in (False, None, "off"):
                # a single lazy fold goes through weighted_partials_big
                # below — UNLESS wsort may engage, where the fused
                # pass's sorted windows buy the hier gathers even for
                # one fold (note wsort is a MODE STRING here: the
                # literal "off" must route like False)
                continue
            flag_idx = (0 if (i == t.root and t.tnode is None
                              and t.done_flag is None
                              and msg_mask[i] is mask[i]) else None)
            _al, fold_list, anyp = _fused_node_pass(
                lst[0][1].shape[0], [],
                [(plane, m.with_mask(msg_mask[i]), t.plane_bits[_pi])
                 for (_pi, plane, m) in lst], flag_idx, axis,
                wsort=wsort)
            for (pi, _plane, _m), f in zip(lst, fold_list):
                t.done_folds[pi] = f
            if anyp is not None:
                t.done_flag = anyp

        tree_outs, root_fold = [], None
        for pi, ((i, *_b), plane) in enumerate(zip(t.projs, t.planes)):
            if pi in t.done_folds:
                # already folded inside a fused window loop
                # (_fused_node_pass) — zero extra passes
                tree_outs.append(("done", t.done_folds[pi]))
                continue
            m = _lazy_mul(t.beta[i], t.alpha[i])
            n = plane.shape[0]
            if isinstance(m, _Lazy):
                # folds window by window; the mask (every distributed
                # shard carries a validity mask) becomes a lazy factor,
                # applied window by window too
                if (i == t.root and t.tnode is None and root_fold is None
                        and msg_mask[i] is mask[i]):
                    root_fold = len(outs) + len(tree_outs)
                tree_outs.append((plane, m.with_mask(msg_mask[i])))
                continue
            if m is None:
                w = (jnp.ones(n, jnp.int32) if msg_mask[i] is None
                     else msg_mask[i].astype(jnp.int32))
            else:
                w = (m if msg_mask[i] is None
                     else jnp.where(msg_mask[i], m, 0))
            tree_outs.append((plane, w))
        flags.extend(_none_anywhere(mask[i], axis) for i in t.flag_nodes)
        if t.root >= 0 and t.tnode is None:
            br, mr = t.beta[t.root], mask[t.root]
            if t.done_flag is not None:
                # emitted by the fused down-pass window loop
                flags.append(_none_anywhere(t.done_flag, axis))
            elif isinstance(br, _Lazy):
                if root_fold is not None:
                    # fused: the fold loop emits any(weight > 0) for
                    # free — zero extra passes over the huge node
                    flags.append(("from_fold", root_fold))
                else:
                    # any(weight > 0 & mask) without materializing the
                    # lazy product — windowed OR, O(window) memory
                    # instead of O(rows); any number of star edges
                    flags.append(_none_anywhere(
                        _lazy_any_positive(br, mr, axis), axis))
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
        outs.extend(tree_outs)

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
        total = sum(plane.shape[0] for plane, _w in outs
                    if not isinstance(plane, str))
        if (total > _BIG_WAVE_ROWS
                or any(isinstance(w, _Lazy) for _, w in outs)
                or any(isinstance(p, str) for p, _w in outs)):
            want_any = {f[1] for f in flags if isinstance(f, tuple)}
            folds, anyp = [], {}
            for oi, (plane, w) in enumerate(outs):
                if isinstance(plane, str):       # ("done", fused fold)
                    folds.append(w)
                elif not isinstance(w, _Lazy):
                    folds.append(weighted_partials_big(plane, w,
                                                       vary_axis=axis))
                elif oi in want_any:
                    f, ap = weighted_partials_big(
                        plane, weight_fn=w.window, vary_axis=axis,
                        also_any_positive=True)
                    folds.append(f)
                    anyp[oi] = ap
                else:
                    folds.append(weighted_partials_big(
                        plane, weight_fn=w.window, vary_axis=axis))
            flags = [(_none_anywhere(anyp[f[1]], axis)
                      if isinstance(f, tuple) else f) for f in flags]
            parts = (jnp.stack(folds),)
            return tuple(flags), parts
        cseg = seg_chunk(total, len(outs))
        gap = jnp.zeros(cseg, jnp.int32)
        vs, ws, seg_ids = [], [], []
        for si, (plane, w) in enumerate(outs):
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


def run_ftree(spec, cols, vals, scatter="xla", gather="xla",
              wsort=False):
    """Execute one factorized tree (a single-spec wave). Returns
    (flags, partials): one bool flag per flag_node plus the M-emptiness
    flag, and partials = a 1-tuple holding ONE (n_projs, 5, 3) stack of
    SEG_SHIFT-piece weighted folds (weighted_partials_segments layout —
    decode each row with utils/limbs.py:combine_weighted_segments).
    Traced inline under the fused stage program (ops/stage.py)."""
    return run_ftree_wave(((spec, len(cols), len(vals)),),
                          tuple(cols), tuple(vals),
                          scatter=scatter, gather=gather, wsort=wsort)

