"""Cycle-inequality separation (reference test/cycle_inequalities.cpp and
test/graphical_model.cpp:232-246).

A frustrated chordless cycle (one negative Potts, rest positive) has LP
bound 0 but integral optimum 1; triplet search over existing triangles can
never find it — the projection-graph cycle search must, triangulating the
cycle into triplets that close the bound through Solve() alone.
"""
import numpy as np
import pytest

from lp_mp_tpu import Solver, StandardTighteningVisitor
from lp_mp_tpu.models.cycle_separation import (cycle_search,
                                               find_violated_cycles,
                                               k_projection_graph)
from lp_mp_tpu.models.mrf import MrfConstructor

NEG_POTTS = np.array([[1.0, 0.0], [0.0, 1.0]])
POS_POTTS = np.array([[0.0, 1.0], [1.0, 0.0]])


def _frustrated_cycle(mrf, n):
    for _ in range(n):
        mrf.add_unary_factor(np.zeros(2))
    mrf.add_pairwise_factor(0, 1, NEG_POTTS)
    for i in range(1, n - 1):
        mrf.add_pairwise_factor(i, i + 1, POS_POTTS)
    mrf.add_pairwise_factor(0, n - 1, POS_POTTS)


def _tightening_solver(max_iter=150):
    return Solver(visitor=StandardTighteningVisitor(
        max_iter=max_iter, tighten=True, tighten_iteration=5,
        tighten_interval=10, tighten_constraints_max=4,
        tighten_reparametrization="damped_uniform"), use_jit=True)


def test_projection_graph_signs():
    s = _tightening_solver()
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    _frustrated_cycle(mrf, 4)
    s.build_engine()
    edges = k_projection_graph(mrf, s.engine)
    # each pairwise factor contributes 4 label-pair edges with margin 1
    assert len(edges) == 16
    by_edge = {}
    for w, p, (i, _), (j, _) in edges:
        assert w == pytest.approx(1.0)
        by_edge.setdefault((i, j), set()).add(p)
    # negative Potts prefers disagreement of equal-label indicators on the
    # diagonal and agreement off it; positive Potts the reverse — each edge
    # contributes both parities across its four projections
    assert by_edge[(0, 1)] == {0, 1}
    assert by_edge[(1, 2)] == {0, 1}


def test_search_finds_odd_cycle():
    # direct search API (cycle_inequalities.cpp:95-105: >= 2 triplets)
    s = _tightening_solver()
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    _frustrated_cycle(mrf, 4)
    s.build_engine()
    for _ in range(20):
        s.engine.compute_pass("damped_uniform")
    assert abs(s.engine.lower_bound()) <= 1e-8
    cycles = find_violated_cycles(mrf, s.engine)
    assert cycles, "no violated cycle found"
    added = cycle_search(mrf, s.engine, max_constraints=8)
    assert added >= 2
    assert len(mrf.triplets) >= 2


@pytest.mark.parametrize("n", [4, 5])
def test_frustrated_cycle_closed_by_solve(n):
    # graphical_model.cpp:232-246 acceptance: lb 0 -> 1.0 via Solve() alone
    s = _tightening_solver()
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    _frustrated_cycle(mrf, n)
    lb = s.solve()
    assert abs(lb - 1.0) <= 1e-6, lb
    assert len(mrf.triplets) >= n - 2


def test_no_false_positives_on_consistent_cycle():
    # all-positive-Potts cycle is LP-tight: nothing to separate
    s2 = _tightening_solver()
    mrf2 = s2.add_constructor(MrfConstructor, pairwise_rep="dense")
    for _ in range(4):
        mrf2.add_unary_factor(np.zeros(2))
    for i in range(3):
        mrf2.add_pairwise_factor(i, i + 1, POS_POTTS)
    mrf2.add_pairwise_factor(0, 3, POS_POTTS)
    s2.build_engine()
    for _ in range(10):
        s2.engine.compute_pass("damped_uniform")
    assert find_violated_cycles(mrf2, s2.engine) == []
