"""LP export / local-polytope oracle (LP_external_interface parity,
test/test_model.cpp:40-48 export path)."""
import itertools

import numpy as np
import pytest

from lp_mp_tpu.io.lp_export import export_lp_text, solve_lp_relaxation
from lp_mp_tpu.models.mrf import MrfConstructor
from lp_mp_tpu.solver import Solver
from lp_mp_tpu.visitors import StandardVisitor


def _random_mrf(seed, n=4, L=3, rep="dense"):
    rng = np.random.default_rng(seed)
    s = Solver(visitor=StandardVisitor(max_iter=30))
    mrf = s.add_constructor(MrfConstructor, pairwise_rep=rep)
    for _ in range(n):
        mrf.add_unary_factor(rng.normal(size=L))
    for i in range(n - 1):
        mrf.add_pairwise_factor(i, i + 1, rng.normal(size=(L, L)))
    mrf.add_pairwise_factor(0, n - 1, rng.normal(size=(L, L)))
    return s, mrf


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lp_value_bounds_dbca(seed):
    """DBCA bound <= LP relaxation value; LP value is invariant under the
    zero-sum reparametrization."""
    s, mrf = _random_mrf(seed)
    s.build_engine()
    lp_before = solve_lp_relaxation(s.engine)
    lb = s.solve()
    lp_after = solve_lp_relaxation(s.engine)
    assert lp_before == pytest.approx(lp_after, abs=1e-6)
    assert lb <= lp_after + 1e-6
    # message passing converges to the LP bound on these small instances
    assert lb == pytest.approx(lp_after, abs=1e-3)


def test_potts_lp_matches_dense():
    rng = np.random.default_rng(7)
    L = 3
    potts = 0.7 * (1.0 - np.eye(L))
    vals = {}
    for rep in ("dense", "potts"):
        s = Solver(visitor=StandardVisitor(max_iter=1))
        mrf = s.add_constructor(MrfConstructor, pairwise_rep=rep)
        rng2 = np.random.default_rng(7)
        for _ in range(3):
            mrf.add_unary_factor(rng2.normal(size=L))
        mrf.add_pairwise_factor(0, 1, potts)
        mrf.add_pairwise_factor(1, 2, potts)
        s.build_engine()
        vals[rep] = solve_lp_relaxation(s.engine)
    assert vals["dense"] == pytest.approx(vals["potts"], abs=1e-9)


def test_frustrated_cycle_lp_and_tightened_lp():
    """LP bound 0 on the frustrated cycle; with a triplet factor the export
    includes the marginalization constraints and the LP becomes tight
    (test/graphical_model.cpp:232-246 semantics)."""
    eq = np.array([[0.0, 1.0], [1.0, 0.0]])
    ne = np.array([[1.0, 0.0], [0.0, 1.0]])
    s = Solver(visitor=StandardVisitor(max_iter=5))
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    for _ in range(3):
        mrf.add_unary_factor(np.zeros(2))
    mrf.add_pairwise_factor(0, 1, eq)
    mrf.add_pairwise_factor(1, 2, eq)
    mrf.add_pairwise_factor(0, 2, ne)
    s.build_engine()
    assert solve_lp_relaxation(s.engine) == pytest.approx(0.0, abs=1e-9)
    mrf.add_tightening_triplet(0, 1, 2)
    s.build_engine()
    assert solve_lp_relaxation(s.engine) == pytest.approx(1.0, abs=1e-9)


def test_export_text_format():
    s, mrf = _random_mrf(3, n=3, L=2)
    s.build_engine()
    txt = export_lp_text(s.engine)
    assert txt.startswith("Minimize")
    assert "Subject To" in txt and "Bounds" in txt and txt.endswith("End\n")
    # one simplex constraint per factor: 3 unaries + 3 pairwise
    n_simplex = sum(1 for line in txt.splitlines() if "= 1" in line)
    assert n_simplex == 6
