"""Fused stage runner: one compiled program per readback boundary.

On a remote-attached chip every dispatch costs ~2-7 ms of transport
overhead, which dominates the workload once the math is fast. The batch
executor therefore compiles each query into STAGES — maximal runs of
operators between output-shape readbacks (only a non-terminal join's
expansion size needs the host) — and `run_stage` executes one stage as a
single XLA program. A two-join query becomes exactly two dispatches:

  stage 0: filters -> first probe                      (ends: needs size)
  stage 1: expansion -> terminal join + every SUM      (no readback at all)

The plan is a static tuple of op descriptors; the jitted ops from
filter/chain/backend/terminal inline into the stage under the outer jit,
so XLA sees (and fuses across) the whole stage. Dense-backend only — the
sort backend keeps the per-op path.

Op descriptors (all fields static):
  ("ffull", slot, opcode, bucket)      first filter on a pristine slot
  ("flive", slot, opcode)              subsequent filter
  ("eqrows", slot)                     fresh same-slot predicate (wipes)
  ("eqmat", r1, r2, null_flag)         case 3 / joined same-slot filter
  ("probe1", s1, s2)                   case-1 probe — ENDS the stage
  ("probe2", full_row, fresh)          case-2 probe — ENDS the stage
  ("expand_pair", s1, s2, out)         stage-opening case-1 expansion
  ("expand_attach", fresh, out)        stage-opening case-2 expansion
  ("terminal", ex_kind, ex_slot, full_row, proj_specs, n_cols)
  ("project", row)                     non-terminal projection (limb sum)

Column operands arrive in `cols` in plan order; filter constants in
`vals`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .aggregate import _gather_partials
from .backend import (_expand_attach_dense, _expand_pair_dense,
                      _probe_matrix_dense, _probe_rows_dense)
from .chain import eq_filter_matrix, eq_filter_rows
from .filter import filter_full, filter_live
from .join_dense import dense_any_common
from .terminal import terminal_join_and_project


@partial(jax.jit, static_argnames=("plan", "domain"))
def run_stage(live_rows, live_cnt, mat, icount, probe, cols, vals,
              plan, domain):
    """Execute one fused stage. Returns
    (live_rows, live_cnt, mat, icount, probe_out, flags, partials)."""
    lr = list(live_rows)
    lc = list(live_cnt)
    ci = vi = 0
    flags = []
    partials = []
    probe_out = ()
    for op in plan:
        k = op[0]
        if k == "ffull":
            _, slot, opc, bucket = op
            rows, cnt = filter_full(cols[ci], lc[slot], vals[vi], opc, bucket)
            ci += 1
            vi += 1
            lr[slot], lc[slot] = rows, cnt
            flags.append(cnt == 0)
        elif k == "flive":
            _, slot, opc = op
            rows, cnt = filter_live(lr[slot], lc[slot], cols[ci], vals[vi],
                                    opc)
            ci += 1
            vi += 1
            lr[slot], lc[slot] = rows, cnt
            flags.append(cnt == 0)
        elif k == "eqrows":
            _, slot = op
            rows, cnt = eq_filter_rows(cols[ci], cols[ci + 1], lr[slot],
                                       lc[slot])
            ci += 2
            mat, icount = rows[None], cnt
        elif k == "eqmat":
            _, r1, r2, null_flag = op
            colA, colB = cols[ci], cols[ci + 1]
            ci += 2
            if null_flag:
                flags.append(~dense_any_common(colA[mat[r1]], colB[mat[r2]],
                                               icount, domain))
            mat, icount = eq_filter_matrix(colA, colB, mat, r1, r2, icount)
        elif k == "probe1":
            _, s1, s2 = op
            probe_out = _probe_rows_dense(cols[ci], lr[s1], lc[s1],
                                          cols[ci + 1], lr[s2], lc[s2],
                                          domain)
            ci += 2
        elif k == "probe2":
            _, full_row, fresh = op
            probe_out = _probe_matrix_dense(cols[ci], mat,
                                            np.int32(full_row), icount,
                                            cols[ci + 1], lr[fresh],
                                            lc[fresh], domain)
            ci += 2
        elif k == "expand_pair":
            _, s1, s2, out = op
            mat = _expand_pair_dense(*probe[:4], lr[s1], lr[s2], out)
            icount = probe[4]
            probe = ()
        elif k == "expand_attach":
            _, fresh, out = op
            mat = _expand_attach_dense(*probe[:4], mat, lr[fresh], out)
            icount = probe[4]
            probe = ()
        elif k == "terminal":
            _, ex_kind, ex_slot, full_row, proj_specs, n_cols = op
            col_full, col_fresh_join = cols[ci], cols[ci + 1]
            # ex_slot is (fresh_slot, rows_slot); rows_slot is only
            # meaningful when ex_kind == "rows" (case-1 terminal)
            fresh_slot, rows_slot = ex_slot
            src = mat if ex_kind == "mat" else lr[rows_slot]
            cnt = icount if ex_kind == "mat" else lc[rows_slot]
            pc = tuple(cols[ci + 2:ci + 2 + n_cols])
            ci += 2 + n_cols
            total, outs = terminal_join_and_project(
                src, cnt, lr[fresh_slot], lc[fresh_slot], col_full,
                col_fresh_join, pc, (ex_kind, full_row, proj_specs), domain)
            flags.append(total == 0)
            partials.extend(outs)
        elif k == "project":
            _, row = op
            partials.append(_gather_partials(cols[ci], mat[row], icount))
            ci += 1
        else:  # pragma: no cover
            raise ValueError(op)
    return (tuple(lr), tuple(lc), mat, icount, probe_out, tuple(flags),
            tuple(partials))
