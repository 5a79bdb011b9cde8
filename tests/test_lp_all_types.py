"""Constraint export covers every factor type (VERDICT r2 item 5).

The reference makes every factor exportable to external solvers via
construct_constraints/load_costs/convert_primal (LP_MP.h:104-116,
factors_messages.hxx:3441-3619); here the per-type lp_vars/lp_coupling/
lp_fix/lp_read hooks must make io/lp_export, ilp_round and combi_lp work
for multicut, tomography (counting) and graph matching (equality) models —
not only MRFs.
"""
import itertools

import numpy as np
import pytest

from lp_mp_tpu import Solver, StandardVisitor
from lp_mp_tpu.combilp import combi_lp
from lp_mp_tpu.io.ilp import ilp_round
from lp_mp_tpu.io.lp_export import export_lp_text, solve_lp_relaxation
from lp_mp_tpu.models.multicut import MulticutConstructor
from lp_mp_tpu.models.tomography import DiscreteTomographyConstructor


def _multicut_instance(seed=0, n=6, with_wheel=True):
    rng = np.random.default_rng(seed)
    s = Solver(visitor=StandardVisitor(max_iter=8))
    mc = s.add_constructor(MulticutConstructor)
    costs = {}
    for i in range(n):
        for j in range(i + 1, n):
            c = float(rng.normal())
            mc.add_edge(i, j, c)
            costs[(i, j)] = c
    mc.add_triplet(0, 1, 2)
    mc.add_triplet(1, 2, 3)
    if with_wheel:
        mc.add_odd_3_wheel(0, 1, 2, 3)
    return s, mc, costs


def _multicut_brute(costs, n):
    best = np.inf
    for lab in itertools.product(range(n), repeat=n):
        v = sum(c for (i, j), c in costs.items() if lab[i] != lab[j])
        best = min(best, v)
    return best


@pytest.mark.parametrize("with_wheel", [False, True])
def test_multicut_ilp_round_bounds(with_wheel):
    """With partial triangulation the ILP optimizes the *decomposition*
    (a relaxation of multicut): its value lower-bounds the true optimum
    and upper-bounds the message-passing dual."""
    s, mc, costs = _multicut_instance(seed=3, with_wheel=with_wheel)
    s.build_engine()
    s.engine.compute_pass("anisotropic")
    prim, cost = ilp_round(s.engine)
    assert prim is not None
    opt = _multicut_brute(costs, 6)
    assert cost <= opt + 1e-6
    assert cost >= s.engine.lower_bound() - 1e-6
    assert s.engine.check_primal_consistency(prim)


def test_multicut_ilp_exact_on_complete_triangulation():
    """All C(5,3) triplets on K5: triangle consistency == partition
    consistency, so the ILP value IS the multicut optimum."""
    rng = np.random.default_rng(11)
    n = 5
    s = Solver(visitor=StandardVisitor(max_iter=5))
    mc = s.add_constructor(MulticutConstructor)
    costs = {}
    for i in range(n):
        for j in range(i + 1, n):
            c = float(rng.normal())
            mc.add_edge(i, j, c)
            costs[(i, j)] = c
    for tri in itertools.combinations(range(n), 3):
        mc.add_triplet(*tri)
    s.build_engine()
    s.engine.compute_pass("anisotropic")
    prim, cost = ilp_round(s.engine)
    assert cost == pytest.approx(_multicut_brute(costs, n), abs=1e-6)
    assert s.engine.check_primal_consistency(prim)


def test_multicut_lp_relaxation_bounds_engine():
    s, mc, _ = _multicut_instance(seed=5)
    s.build_engine()
    for _ in range(6):
        s.engine.compute_pass("anisotropic")
    lp = solve_lp_relaxation(s.engine)
    assert s.engine.lower_bound() <= lp + 1e-6
    text = export_lp_text(s.engine)
    assert text.startswith("Minimize") and "Subject To" in text


def test_multicut_combilp_certifies_optimum():
    """combiLP certifies a multicut optimum MP rounding need not reach
    (VERDICT item 5 acceptance): K5, complete triangulation, so the
    decomposition's integral optimum IS the multicut optimum."""
    rng = np.random.default_rng(7)
    n = 5
    s = Solver(visitor=StandardVisitor(max_iter=10))
    mc = s.add_constructor(MulticutConstructor)
    costs = {}
    for i in range(n):
        for j in range(i + 1, n):
            c = float(rng.normal())
            mc.add_edge(i, j, c)
            costs[(i, j)] = c
    for tri in itertools.combinations(range(n), 3):
        mc.add_triplet(*tri)
    lb = s.solve()
    prim, obj = combi_lp(s.engine)
    assert prim is not None
    assert obj == pytest.approx(_multicut_brute(costs, n), abs=1e-5)
    assert obj >= lb - 1e-6


def _tomography_chain(seed=0, nv=5, L=3):
    rng = np.random.default_rng(seed)
    s = Solver(visitor=StandardVisitor(max_iter=8))
    dt = s.add_constructor(DiscreteTomographyConstructor)
    un = rng.normal(size=(nv, L))
    pw = rng.normal(size=(nv - 1, L, L)) * 0.5
    for v in range(nv):
        dt.add_unary_factor(un[v])
        if v:
            dt.add_pairwise_factor(v - 1, v, pw[v - 1])
    smax = (L - 1) * nv
    pc = 0.7 * np.abs(np.arange(smax + 1) - 4.0)
    dt.add_projection(range(nv), pc)
    return s, dt, un, pw, pc


def _tomography_brute(un, pw, pc):
    nv, L = un.shape
    best = np.inf
    for x in itertools.product(range(L), repeat=nv):
        c = sum(un[v][x[v]] for v in range(nv))
        c += sum(pw[v][x[v], x[v + 1]] for v in range(nv - 1))
        c += pc[sum(x)]
        best = min(best, c)
    return best


def test_tomography_ilp_round_matches_brute_force():
    s, dt, un, pw, pc = _tomography_chain(seed=2)
    s.build_engine()
    s.engine.compute_pass("anisotropic")
    prim, cost = ilp_round(s.engine)
    assert prim is not None
    assert cost == pytest.approx(_tomography_brute(un, pw, pc), abs=1e-6)
    assert s.engine.check_primal_consistency(prim)


def test_tomography_lp_export_cross_check():
    """.lp export cross-checks a tomography chain (VERDICT item 5): the LP
    relaxation with the arithmetic counting encoding upper-bounds the ILP
    from below and the engine bound from above."""
    s, dt, un, pw, pc = _tomography_chain(seed=9)
    lb = s.solve()
    lp = solve_lp_relaxation(s.engine)
    _, ilp = ilp_round(s.engine)
    assert lb <= lp + 1e-6
    assert lp <= ilp + 1e-6
    text = export_lp_text(s.engine)
    assert "Subject To" in text


def test_graph_matching_ilp():
    """Equality-message (both-sides) graph matching through the ILP."""
    from lp_mp_tpu.io.torresani import GraphMatchingInput
    from lp_mp_tpu.models.graph_matching import GraphMatchingConstructor

    rng = np.random.default_rng(4)
    n = 3
    assignments = [(i, j, float(rng.normal()))
                   for i in range(n) for j in range(n)]
    inp = GraphMatchingInput(n, n, assignments, [])
    best = min(sum(assignments[i * n + p[i]][2] for i in range(n))
               for p in itertools.permutations(range(n)))
    # unmatched nodes cost 0, so also allow partial matchings in the oracle
    s = Solver(visitor=StandardVisitor(max_iter=10))
    gm = s.add_constructor(GraphMatchingConstructor, construction="both")
    gm.construct(inp)
    s.build_engine()
    s.engine.compute_pass("anisotropic")
    prim, cost = ilp_round(s.engine)
    assert prim is not None
    assert cost <= best + 1e-6          # partial matching may be cheaper
    assert s.engine.check_primal_consistency(prim)
