"""Exact ILP oracle over the local polytope + subset solves.

Counterpart of the reference's DD_ILP/SAT bridge: ``LP_sat`` rounding
(solver.hxx:529-546, acceptance test/graphical_model.cpp:277-302 — exact
rounding closes the duality gap MP rounding leaves open) and the exact
region solves of combiLP (combiLP.hxx:92-271) / partial_external_solver
(partial_external_solver.hxx:13-96).

TPU-native design: instead of a SAT encoding with incremental clauses, the
(sub)problem is the integral local polytope — the same constraint system
``io/lp_export.build_local_polytope`` already produces from the per-type
``lp_vars``/``lp_coupling`` hooks — handed to HiGHS branch-and-bound
(scipy.optimize.milp).  Subset solves condition the border couplings on a
fixed outside labeling by substituting the outside variables
(``FactorType.lp_fix``) into the constraint rows (moving them to the rhs),
the conditioned analogue of the reference's border reparametrization.
Covers every factor type that implements the hooks — all four model
families.  Host-side; runs once per rounding/combiLP round.
"""
from __future__ import annotations

import numpy as np

from .lp_export import _factor_tables, build_local_polytope


def solve_ilp(engine, subset=None, fixed_prim=None, time_limit=None):
    """Exact MILP solve of the (subset of the) factor graph.

    subset: bool mask [n_factors] of factors to optimize (None = all).
    fixed_prim: primal pytree fixing the factors OUTSIDE the subset; border
    coupling constraints are conditioned on it.

    Returns (prim, objective) where prim is a full primal pytree (outside
    factors copied from fixed_prim) and objective is the total primal cost
    including engine.constant, or (None, inf) when infeasible.
    """
    from scipy.optimize import Bounds, LinearConstraint, milp
    from scipy.sparse import csr_matrix

    tables = _factor_tables(engine)
    cost, rows, b, offsets = build_local_polytope(engine)
    nvar = len(cost)
    nfac = len(tables)
    if subset is None:
        subset = np.ones(nfac, dtype=bool)
    subset = np.asarray(subset, dtype=bool)
    assert subset.any(), "empty ILP subset"
    if not subset.all():
        assert fixed_prim is not None, \
            "subset ILP solve requires fixed_prim for the border"

    sizes = np.asarray([len(c) for (_, _, c, _, _) in tables])
    var_fid = np.repeat(np.arange(nfac), sizes)
    var_inside = subset[var_fid]

    # fixed variable values for outside factors (lp_fix = convert_primal
    # in the primal -> external direction)
    fixed_val = np.zeros(nvar)
    if fixed_prim is not None:
        for fid in np.nonzero(~subset)[0]:
            ft, meta, _, _, _ = tables[fid]
            row = engine.f_local[fid]
            prim_row = {k: np.asarray(v)[row]
                        for k, v in fixed_prim[ft.name].items()}
            fixed_val[offsets[fid]: offsets[fid] + sizes[fid]] = \
                ft.lp_fix(prim_row, meta)

    new_index = -np.ones(nvar, dtype=np.int64)
    inside_vars = np.nonzero(var_inside)[0]
    new_index[inside_vars] = np.arange(len(inside_vars))

    data, ri, ci, rhs = [], [], [], []
    nrows = 0
    for i, row in enumerate(rows):
        bi = b[i]
        entries = []
        for j, v in row.items():
            if var_inside[j]:
                entries.append((new_index[j], v))
            else:
                bi -= v * fixed_val[j]
        if not entries:
            continue
        for j, v in entries:
            ri.append(nrows)
            ci.append(j)
            data.append(v)
        rhs.append(bi)
        nrows += 1

    n_in = len(inside_vars)
    A = csr_matrix((data, (ri, ci)), shape=(nrows, n_in))
    rhs = np.asarray(rhs)
    options = {}
    if time_limit is not None:
        options["time_limit"] = float(time_limit)
    res = milp(c=cost[inside_vars],
               constraints=LinearConstraint(A, rhs, rhs),
               integrality=np.ones(n_in),
               bounds=Bounds(0.0, 1.0), options=options)
    if not res.success or res.x is None:
        return None, float("inf")

    x = np.round(res.x).astype(np.int64)
    prim = {name: {k: np.array(v) for k, v in blk.items()}
            for name, blk in (fixed_prim or engine.init_primal()).items()}
    for fid in np.nonzero(subset)[0]:
        ft, meta, _, _, _ = tables[fid]
        row = engine.f_local[fid]
        o = offsets[fid]
        block = x[new_index[o]: new_index[o] + sizes[fid]]
        for key, lab in ft.lp_read(block, meta).items():
            prim[ft.name][key][row] = lab
    obj = engine.evaluate_primal(prim)
    return prim, float(obj)


def ilp_round(engine, time_limit=None):
    """LP_sat-style exact primal rounding: solve the whole reparametrized
    problem as an ILP (solver.hxx:529-546 analogue; intended for small or
    tightened instances where MP rounding leaves a duality gap)."""
    prim, obj = solve_ilp(engine, time_limit=time_limit)
    return prim, obj
