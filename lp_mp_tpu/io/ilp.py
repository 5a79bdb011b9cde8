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


class IncrementalIlp:
    """Persistent MILP over the integral local polytope with per-round
    bound flips (partial_external_solver.hxx:13-96 semantics, VERDICT r3
    item 7): the constraint system is built ONCE; growing the exact region
    only (a) relaxes the grown factors' variables back to [0, 1] binaries
    and (b) re-selects the active rows — one sparse matvec — instead of
    re-deriving the whole model.

    Semantics match the one-shot conditioned solve exactly:
    - outside factors' variables are fixed (lb = ub = lp_fix value), which
      conditions every border row on the outside labeling — the same
      substitution the reference's border reparametrization performs;
    - rows touching no inside variable are dropped, NOT enforced: the
      outside labeling may be inconsistent (that is *why* combiLP runs) and
      the reference likewise never constrains the LP region against itself
      (combiLP.hxx:92-271 merges region labelings).
    """

    def __init__(self, engine):
        from scipy.sparse import csr_matrix

        self.engine = engine
        self.tables = _factor_tables(engine)
        cost, rows, b, offsets = build_local_polytope(engine)
        self.cost = np.asarray(cost, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.offsets = offsets
        nvar = len(cost)
        self.nvar = nvar
        self.nfac = len(self.tables)
        self.sizes = np.asarray([len(c) for (_, _, c, _, _) in self.tables])
        self.var_fid = np.repeat(np.arange(self.nfac), self.sizes)

        data, ri, ci = [], [], []
        for i, row in enumerate(rows):
            for j, v in row.items():
                ri.append(i)
                ci.append(j)
                data.append(v)
        self.A = csr_matrix((data, (ri, ci)), shape=(len(rows), nvar))
        self.A_pattern = self.A.copy()
        self.A_pattern.data = np.ones_like(self.A_pattern.data)
        self._fix_cache: dict[int, np.ndarray] = {}
        self._fix_cache_prim_id = None

    def _fixed_vals(self, fids, fixed_prim):
        """lp_fix vectors for the given outside factors, cached per fid
        (the LP-region labeling is constant across combiLP rounds).  The
        cache is keyed on the ``fixed_prim`` object identity: a solve with
        a different labeling invalidates it (ADVICE r4)."""
        if self._fix_cache_prim_id != id(fixed_prim):
            self._fix_cache.clear()
            self._fix_cache_prim_id = id(fixed_prim)
        out = {}
        for fid in fids:
            if fid not in self._fix_cache:
                ft, meta, _, _, _ = self.tables[fid]
                row = self.engine.f_local[fid]
                prim_row = {k: np.asarray(v)[row]
                            for k, v in fixed_prim[ft.name].items()}
                self._fix_cache[fid] = np.asarray(ft.lp_fix(prim_row, meta),
                                                  dtype=np.float64)
            out[fid] = self._fix_cache[fid]
        return out

    def invalidate_fixed(self):
        self._fix_cache.clear()

    def solve(self, subset=None, fixed_prim=None, time_limit=None):
        from scipy.optimize import Bounds, LinearConstraint, milp

        if subset is None:
            subset = np.ones(self.nfac, dtype=bool)
        subset = np.asarray(subset, dtype=bool)
        assert subset.any(), "empty ILP subset"
        if not subset.all():
            assert fixed_prim is not None, \
                "subset ILP solve requires fixed_prim for the border"

        var_inside = subset[self.var_fid]
        lo = np.zeros(self.nvar)
        hi = np.ones(self.nvar)
        if not subset.all():
            vals = self._fixed_vals(np.nonzero(~subset)[0], fixed_prim)
            for fid, v in vals.items():
                o = self.offsets[fid]
                lo[o:o + self.sizes[fid]] = v
                hi[o:o + self.sizes[fid]] = v

        # active rows = rows touching >= 1 inside variable (one spmv)
        act = (self.A_pattern @ var_inside.astype(np.float64)) > 0.5
        A = self.A[act]
        rhs = self.b[act]

        options = {}
        if time_limit is not None:
            options["time_limit"] = float(time_limit)
        res = milp(c=self.cost,
                   constraints=LinearConstraint(A, rhs, rhs),
                   integrality=np.ones(self.nvar),
                   bounds=Bounds(lo, hi), options=options)
        # accept time-limit incumbents: HiGHS returns the best feasible
        # integer solution found so far with success=False/status=1, which
        # is exactly what a time-boxed exact rounding oracle should use.
        # Other non-success statuses (infeasible=2, unbounded=3, numerical
        # failure=4) may still carry an x — reject those (ADVICE r4).
        if res.x is None or res.status not in (0, 1):
            return None, float("inf")

        x = np.round(res.x).astype(np.int64)
        prim = {name: {k: np.array(v) for k, v in blk.items()}
                for name, blk in (fixed_prim
                                  or self.engine.init_primal()).items()}
        for fid in np.nonzero(subset)[0]:
            ft, meta, _, _, _ = self.tables[fid]
            row = self.engine.f_local[fid]
            o = self.offsets[fid]
            block = x[o: o + self.sizes[fid]]
            for key, lab in ft.lp_read(block, meta).items():
                prim[ft.name][key][row] = lab
        obj = self.engine.evaluate_primal(prim)
        return prim, float(obj)


def solve_ilp(engine, subset=None, fixed_prim=None, time_limit=None):
    """Exact MILP solve of the (subset of the) factor graph (one-shot
    convenience wrapper over IncrementalIlp; combiLP keeps the
    IncrementalIlp alive across region-growth rounds instead).

    subset: bool mask [n_factors] of factors to optimize (None = all).
    fixed_prim: primal pytree fixing the factors OUTSIDE the subset; border
    coupling constraints are conditioned on it.

    Returns (prim, objective) where prim is a full primal pytree (outside
    factors copied from fixed_prim) and objective is the total primal cost
    including engine.constant, or (None, inf) when infeasible.
    """
    return IncrementalIlp(engine).solve(subset=subset, fixed_prim=fixed_prim,
                                        time_limit=time_limit)


def ilp_round(engine, time_limit=None):
    """LP_sat-style exact primal rounding: solve the whole reparametrized
    problem as an ILP (solver.hxx:529-546 analogue; intended for small or
    tightened instances where MP rounding leaves a duality gap)."""
    prim, obj = solve_ilp(engine, time_limit=time_limit)
    return prim, obj
