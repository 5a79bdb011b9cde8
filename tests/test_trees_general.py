"""General tree decomposition: arbitrary topologies, arbitrary factor types.

Acceptance mirrors the reference:
- test/test_model.hxx:139-176 (3 trees sharing one factor, 7 binary
  factors coupled by full-vector equality messages; optimum = 1.0);
- test/test_FWMAP.cpp:11-22 (FWMAP reaches decomposition bound 1.0 and
  write_back_reparametrization preserves it on the original factors);
- tree_decomposition.hxx:154-216 (per-tree primal cost == tree bound).
"""
import itertools

import numpy as np
import pytest

from lp_mp_tpu.engine import Engine
from lp_mp_tpu.factors.potts import PAIRWISE_POTTS
from lp_mp_tpu.factors.simplex import PAIRWISE_SIMPLEX, UNARY_SIMPLEX
from lp_mp_tpu.graph import FactorGraph
from lp_mp_tpu.messages.simplex_marginalization import (
    UNARY_PAIRWISE_1, UNARY_PAIRWISE_2, UNARY_POTTS_1, UNARY_POTTS_2)
from lp_mp_tpu.messages.vector_equality import VECTOR_EQUALITY
from lp_mp_tpu.trees_general import GeneralTreeDecomposition, TreeSpec


def build_test_model():
    """The canonical 3-tree model of test/test_model.hxx:139-176."""
    g = FactorGraph()
    f1 = g.add_factor(UNARY_SIMPLEX, [0.0, 1.0])
    trees = []
    # t1: f1 root, children f2=(1,0), f3=(0,0)
    f2 = g.add_factor(UNARY_SIMPLEX, [1.0, 0.0])
    f3 = g.add_factor(UNARY_SIMPLEX, [0.0, 0.0])
    m12 = g.add_message(VECTOR_EQUALITY, f1, f2)
    m13 = g.add_message(VECTOR_EQUALITY, f1, f3)
    trees.append(TreeSpec([(m12, "left"), (m13, "left")]))
    # t2, t3: chains f1 - f2 - f3 rooted at f2
    for _ in range(2):
        f2 = g.add_factor(UNARY_SIMPLEX, [1.0, 0.0])
        f3 = g.add_factor(UNARY_SIMPLEX, [0.0, 0.0])
        m12 = g.add_message(VECTOR_EQUALITY, f1, f2)
        m23 = g.add_message(VECTOR_EQUALITY, f2, f3)
        trees.append(TreeSpec([(m12, "right"), (m23, "left")]))
    return g, trees


def test_initial_bound_and_validation():
    g, trees = build_test_model()
    dec = GeneralTreeDecomposition(g, trees)
    assert dec.n_trees == 3
    assert np.array_equal(dec.mult[:1], [3])
    # zero multipliers: bound = sum of per-tree optima of divided costs = 1/3
    # (each chain t2/t3 can pick label 1 everywhere at cost 1/3 from f1's
    # share; t1 picks label 0 at cost 0... enumerate to be exact)
    b0 = dec.decomposition_lower_bound()
    # brute force each tree independently
    def tree_opt(costs_list, structure):
        best = np.inf
        for x in itertools.product(range(2), repeat=len(costs_list)):
            ok = all(x[i] == x[j] for i, j in structure)
            if ok:
                best = min(best, sum(c[xi] for c, xi in zip(costs_list, x)))
        return best
    t1 = tree_opt([[0, 1 / 3], [1, 0], [0, 0]], [(0, 1), (0, 2)])
    t2 = tree_opt([[0, 1 / 3], [1, 0], [0, 0]], [(0, 1), (1, 2)])
    assert abs(b0 - (t1 + 2 * t2)) < 1e-6


def test_tree_is_not_a_tree_raises():
    g = FactorGraph()
    f1 = g.add_factor(UNARY_SIMPLEX, [0.0, 1.0])
    f2 = g.add_factor(UNARY_SIMPLEX, [1.0, 0.0])
    m1 = g.add_message(VECTOR_EQUALITY, f1, f2)
    m2 = g.add_message(VECTOR_EQUALITY, f1, f2)
    with pytest.raises(AssertionError):
        GeneralTreeDecomposition(g, [TreeSpec([(m1, "left"), (m2, "left")])])


def _perturbed_start(dec, seed=0, scale=2.0):
    """A random multiplier start so the ascent has real work to do (the
    zero-multiplier bound of the test model is already optimal)."""
    rng = np.random.RandomState(seed)
    return {name: {k: scale * rng.randn(*v.shape).astype(np.asarray(v).dtype)
                   for k, v in blk.items()}
            for name, blk in dec.zeros_like_dual().items()}


def test_subgradient_reaches_optimum():
    g, trees = build_test_model()
    dec = GeneralTreeDecomposition(g, trees)
    w0 = _perturbed_start(dec)
    start = float(np.sum(np.asarray(dec.solve(dec.to_dual(w0))[0])))
    assert start < 1.0 - 1e-3       # genuinely suboptimal start
    best, _, _ = dec.subgradient_ascent(n_iter=300, ub_estimate=1.0, w=w0)
    assert best <= 1.0 + 1e-6
    assert best >= 1.0 - 1e-3


def test_fwmap_reaches_optimum_and_write_back():
    g, trees = build_test_model()
    dec = GeneralTreeDecomposition(g, trees)
    best, lam, _ = dec.fw_map(n_outer=10, n_inner=20, prox_weight=1.0)
    assert abs(best - 1.0) < 1e-4   # test_FWMAP.cpp:18
    # write back: original factors' bound keeps the decomposition bound
    eng = Engine(g)
    dec.write_back_reparametrization(eng, lam)
    lb = eng.lower_bound()
    assert lb >= best - 1e-5        # test_FWMAP.cpp:20-21
    assert lb <= 1.0 + 1e-5


def test_star_layout_reaches_optimum():
    g, trees = build_test_model()
    dec = GeneralTreeDecomposition(g, trees, layout="star")
    w0 = _perturbed_start(dec, seed=3)
    assert float(np.sum(np.asarray(dec.solve(dec.to_dual(w0))[0]))) < 1.0 - 1e-3
    best, _, _ = dec.subgradient_ascent(n_iter=300, ub_estimate=1.0, w=w0)
    assert best >= 1.0 - 1e-3
    # star multipliers: (copies-1)=2 blocks of size 2 for f1, none for
    # the single-copy factors (Lagrangean_factor_star::joint_no_Lagrangean_vars)
    assert dec.n_multipliers() == 2 * 2


def test_single_tree_mixed_types_is_exact_map():
    """One tree containing unary AND pairwise simplex factors: solve() is
    the exact MAP (tree_decomposition.hxx:154-216 per-factor primal ==
    bound invariant)."""
    rng = np.random.RandomState(0)
    g = FactorGraph()
    L = 3
    # star MRF: center u0, leaves u1..u3 through pairwise factors
    us = [g.add_factor(UNARY_SIMPLEX, rng.randn(L)) for _ in range(4)]
    msgs = []
    pws = []
    for k in range(1, 4):
        p = g.add_factor(PAIRWISE_SIMPLEX, rng.randn(L, L))
        pws.append(p)
        # message variable side 1 = center, side 2 = leaf
        m1 = g.add_message(UNARY_PAIRWISE_1, us[0], p)
        m2 = g.add_message(UNARY_PAIRWISE_2, us[k], p)
        msgs.append((m1, "left"))    # parent u0 -> child p
        msgs.append((m2, "right"))   # parent p -> child leaf
    dec = GeneralTreeDecomposition(g, [TreeSpec(msgs)])
    bound, prim, state = dec.solve()
    val = float(np.sum(np.asarray(bound)))

    # brute force
    uc = [np.asarray(g.factors[u.fid][1]) for u in us]
    pc = [np.asarray(g.factors[p.fid][1]) for p in pws]
    best = np.inf
    for x in itertools.product(range(L), repeat=4):
        c = sum(uc[i][x[i]] for i in range(4))
        c += sum(pc[k - 1][x[0], x[k]] for k in range(1, 4))
        best = min(best, c)
    assert abs(val - best) < 1e-5

    # tracked primal attains the bound exactly
    cost = 0.0
    for name, blk in state.items():
        v = np.asarray(dec.eng.ftypes[name].evaluate_primal(blk, prim[name]))
        assert np.all(np.isfinite(v))
        cost += v.sum()
    assert abs(cost - val) < 1e-5


def test_potts_factors_enter_decomposition():
    """Compact Potts factors (non-simplex type) in a general tree."""
    rng = np.random.RandomState(1)
    g = FactorGraph()
    L = 4
    us = [g.add_factor(UNARY_SIMPLEX, rng.randn(L)) for _ in range(3)]
    diff = [0.7, 1.3]
    # chain u0 - p0 - u1 - p1 - u2 rooted at u0: each unary is the
    # message's LEFT endpoint, the potts factor the RIGHT one
    msgs = []
    for k in range(2):
        p = g.add_factor(PAIRWISE_POTTS, (L, diff[k]))
        m1 = g.add_message(UNARY_POTTS_1, us[k], p)
        m2 = g.add_message(UNARY_POTTS_2, us[k + 1], p)
        # parent of p is u_k (left endpoint of m1); parent of u_{k+1} is p
        msgs.append((m1, "left"))
        msgs.append((m2, "right"))
    dec = GeneralTreeDecomposition(g, [TreeSpec(msgs)])
    bound, prim, state = dec.solve()
    val = float(np.sum(np.asarray(bound)))

    uc = [np.asarray(g.factors[u.fid][1]) for u in us]
    best = np.inf
    for x in itertools.product(range(L), repeat=3):
        c = sum(uc[i][x[i]] for i in range(3))
        c += sum(diff[k] * (x[k] != x[k + 1]) for k in range(2))
        best = min(best, c)
    assert abs(val - best) < 1e-5


def test_quadratic_layout_reaches_optimum():
    """Lagrangean_factor_quadratic layout (tree_decomposition.hxx:277-585):
    one multiplier block per copy pair, redundant parameterization of the
    consensus subspace."""
    g, trees = build_test_model()
    dec = GeneralTreeDecomposition(g, trees, layout="quadratic")
    # f1 has 3 copies -> C(3,2)=3 pair blocks of size 2
    assert dec.n_multipliers() == 3 * 2
    rng = np.random.RandomState(5)
    w0 = {name: {k: 2.0 * rng.randn(*np.shape(v)).astype(np.asarray(v).dtype)
                 for k, v in blk.items()}
          for name, blk in dec.zeros_like_w().items()}
    start = float(np.sum(np.asarray(dec.solve(dec.to_dual(w0))[0])))
    assert start < 1.0 - 1e-3       # genuinely suboptimal start
    best, _, _ = dec.subgradient_ascent(n_iter=300, ub_estimate=1.0, w=w0)
    assert 1.0 - 1e-3 <= best <= 1.0 + 1e-6
    # quadratic duals always satisfy the zero-sum consensus constraint
    lam = dec.to_dual(w0)
    proj = dec.project(lam)
    for name in lam:
        for k in lam[name]:
            np.testing.assert_allclose(np.asarray(lam[name][k]),
                                       np.asarray(proj[name][k]),
                                       rtol=1e-5, atol=1e-5)


def test_tree_decomposition_begin_mid_run_switch():
    """--treeDecompositionBegin (tree_decomposition.hxx:918-929): message
    passing first, then the Solver switches to subgradient ascent over the
    decomposition loaded from the current reparametrization."""
    from lp_mp_tpu import Solver
    from lp_mp_tpu.visitors import StandardVisitor

    g, trees = build_test_model()
    # no interleaved rounding: MP solves this model at iteration 0, so the
    # run must outlive the gap check to demonstrate the switch itself
    s = Solver(visitor=StandardVisitor(max_iter=40,
                                       primal_computation_start=2 ** 60),
               tree_decomposition=trees, tree_decomposition_begin=5,
               tree_layout="zero_sum")
    s.graph = g
    lb = s.solve()
    assert s._tree_state is not None and s._tree_state["k"] > 0
    assert 1.0 - 1e-3 <= lb <= 1.0 + 1e-5   # optimum of the 3-tree model
    # write-back preserved the bound on the engine (test_FWMAP.cpp:20-21)
    assert s.engine.lower_bound() >= lb - 1e-4
