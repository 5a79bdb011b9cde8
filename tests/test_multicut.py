"""Multicut factors, separation, end-to-end (test/multicut.cpp,
test/shortest_path.cpp, test/graph_test.cpp semantics)."""
import jax.numpy as jnp
import numpy as np

from lp_mp_tpu import Solver, StandardTighteningVisitor, StandardVisitor
from lp_mp_tpu.factors.multicut import MULTICUT_EDGE, MULTICUT_TRIPLET
from lp_mp_tpu.models.multicut import MulticutConstructor
from lp_mp_tpu.utils.graphs import Graph, bfs_path


def test_edge_factor_lower_bound():
    b = MULTICUT_EDGE.build([1.0])
    assert float(MULTICUT_EDGE.lower_bound({k: jnp.asarray(v) for k, v in b.items()})[0]) == 0.0
    b = MULTICUT_EDGE.build([-1.0])
    assert float(MULTICUT_EDGE.lower_bound({k: jnp.asarray(v) for k, v in b.items()})[0]) == -1.0


def test_triplet_factor_lower_bound():
    b = {k: jnp.asarray(v) for k, v in MULTICUT_TRIPLET.build([None]).items()}
    c = jnp.asarray([[1.0, 2.0, 3.3, 1.5]])
    assert float(MULTICUT_TRIPLET.lower_bound({"c": c})[0]) == 0.0
    c = jnp.asarray([[1.0, -0.5, -0.3, 1.5]])
    assert float(MULTICUT_TRIPLET.lower_bound({"c": c})[0]) == -0.5


def test_bfs_path_thresholds():
    # 4-cycle with weights (shortest_path.cpp:14-45)
    g = Graph(4, [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 2.0), (3, 0, 2.0)])
    bn, path = bfs_path(g, 0, 2)
    assert len(path) == 3
    bn, path = bfs_path(g, 0, 1, threshold=0.5)
    assert len(path) == 2 and bn == 1.0
    bn, path = bfs_path(g, 0, 1, threshold=1.5)
    assert len(path) == 4 and bn == 2.0


def test_graph_enumeration_and_contraction():
    # 4-cycle + chord (graph_test.cpp:9-48): 2 triangles, 1 quadrangle
    g = Graph(4, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1), (0, 2, 1)])
    assert len(g.triangles()) == 2
    assert len(g.quadrangles()) == 1
    gc = g.contract([(0, 1)])
    assert gc.n == 3


def _solve_multicut(edges, tighten=True, max_iter=60):
    vis = StandardTighteningVisitor(
        max_iter=max_iter, tighten=tighten, tighten_iteration=3,
        tighten_interval=5, tighten_constraints_max=10,
        standard_reparametrization="anisotropic",
        rounding_reparametrization="damped_uniform",
        primal_computation_interval=10 ** 9)  # rounding via constructor below
    s = Solver(visitor=vis, use_jit=True)
    mc = s.add_constructor(MulticutConstructor)
    for i, j, w in edges:
        mc.add_edge(i, j, w)
    lb = s.solve()
    return s, mc, lb


def test_triangle_negative_edge():
    # one repulsive edge in a triangle: LP bound -1 without triplet,
    # 0 after cycle tightening (integral optimum 0)
    s, mc, lb0 = _solve_multicut([(0, 1, -1.0), (1, 2, 1.0), (0, 2, 1.0)],
                                 tighten=False, max_iter=10)
    assert abs(lb0 - (-1.0)) < 1e-6

    s, mc, lb = _solve_multicut([(0, 1, -1.0), (1, 2, 1.0), (0, 2, 1.0)])
    assert abs(lb - 0.0) < 1e-6, lb
    assert len(mc.triplets) == 1
    labels, cut, cost = mc.round_gaec()
    assert abs(cost - 0.0) < 1e-9


def test_frustrated_four_cycle():
    edges = [(0, 1, -1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 1.0)]
    s, mc, lb = _solve_multicut(edges)
    assert abs(lb - 0.0) < 1e-6, lb
    prim = mc.compute_primal(s.engine)
    ub = s.engine.evaluate_primal(prim)
    assert abs(ub - 0.0) < 1e-9


def test_gaec_merges_attractive():
    s = Solver(use_jit=True)
    mc = s.add_constructor(MulticutConstructor)
    mc.add_edge(0, 1, 5.0)
    mc.add_edge(1, 2, 5.0)
    mc.add_edge(0, 2, -1.0)
    labels, cut, cost = mc.round_gaec()
    # merging all is optimal: pay nothing vs cutting the -1 edge requires
    # cutting a +5 edge as well
    assert labels[0] == labels[1] == labels[2]
    assert cost == 0.0


def test_multicut_random_monotone():
    rng = np.random.default_rng(0)
    s = Solver(use_jit=True)
    mc = s.add_constructor(MulticutConstructor)
    n = 8
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.5:
                mc.add_edge(i, j, float(rng.normal()))
    e = s.build_engine()
    lb = e.lower_bound()
    for _ in range(5):
        e.compute_pass("anisotropic")
        lb2 = e.lower_bound()
        assert lb2 >= lb - 1e-9
        lb = lb2
    added = mc.tighten(e, 5)
    if added:
        e = s.build_engine()
        lb_t = e.lower_bound()
        assert lb_t >= lb - 1e-6
        for _ in range(10):
            e.compute_pass("anisotropic")
        assert e.lower_bound() >= lb - 1e-6
