"""Pull-pass (scatter-free) parity vs the exact scatter path.

TPU scatter costs ~90 ns/row regardless of hints, so the hot dual pass can
run in pull mode: per-message dense contributions (registry pull_* hooks)
summed into each factor row through padded incidence gathers.  The update
math is identical — only the accumulation order within a factor row
changes — so states must agree to summation-order tolerance and bounds
must stay monotone.  On CPU (these tests) pull is opt-in via
``Engine(pull=True)``; auto mode reserves it for the TPU backend.
"""
import numpy as np
import pytest

from lp_mp_tpu import Solver
from lp_mp_tpu.config import Direction
from lp_mp_tpu.engine import Engine
from lp_mp_tpu.models.mrf import MrfConstructor


def _state_diff(e1, e2):
    return max(float(np.max(np.abs(
        np.asarray(e1.state[t][k], np.float64)
        - np.asarray(e2.state[t][k], np.float64))))
        for t in e1.state for k in e1.state[t])


def _grid_graph(potts, seed=5, H=8, W=8, L=3):
    from lp_mp_tpu.graph import FactorGraph
    rng = np.random.default_rng(seed)
    g = FactorGraph()
    mrf = MrfConstructor(g)
    mrf.add_unary_factors(rng.normal(size=(H * W, L)))
    idx = np.arange(H * W).reshape(H, W)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
    if potts:
        mrf.add_potts_factors(pairs, L,
                              rng.uniform(0.5, 1.5, size=len(pairs)))
    else:
        mrf.add_pairwise_factors(pairs, rng.normal(size=(len(pairs), L, L)))
    return g


@pytest.mark.parametrize("potts", [True, False])
@pytest.mark.parametrize("schedule", ["coloring", "wavefront"])
@pytest.mark.parametrize("mode", ["anisotropic", "uniform", "damped_uniform"])
def test_pull_matches_scatter_mrf(potts, schedule, mode):
    g = _grid_graph(potts)
    e1 = Engine(g, schedule_mode=schedule, pull=False)
    e2 = Engine(g, schedule_mode=schedule, pull=True)
    for _ in range(4):
        e1.compute_pass(mode)
        e2.compute_pass(mode)
    assert _state_diff(e1, e2) < 1e-5
    assert abs(e1.lower_bound() - e2.lower_bound()) < 1e-4


def test_pull_matches_scatter_with_triplets():
    """Dense pairwise + tightening triplets: pairwise_triplet messages."""
    rng = np.random.default_rng(9)
    s2 = Solver()
    m2 = s2.add_constructor(MrfConstructor)
    m2.add_unary_factors(rng.normal(size=(6, 3)))
    for (i, j) in ((0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5)):
        m2.add_pairwise_factor(i, j, rng.normal(size=(3, 3)))
    m2.add_tightening_triplet(0, 1, 2)
    m2.add_tightening_triplet(2, 3, 4)
    e1 = Engine(s2.graph, schedule_mode="coloring", pull=False)
    e2 = Engine(s2.graph, schedule_mode="coloring", pull=True)
    for _ in range(4):
        e1.compute_pass("anisotropic")
        e2.compute_pass("anisotropic")
    assert _state_diff(e1, e2) < 1e-5


def test_pull_matches_scatter_multicut_with_wheels():
    from lp_mp_tpu.models.multicut import MulticutConstructor
    rng = np.random.default_rng(3)
    s = Solver()
    mc = s.add_constructor(MulticutConstructor)
    n = 12
    pairs = np.asarray([(i, j) for i in range(n) for j in range(i + 1, n)
                        if rng.random() < 0.5])
    mc.add_edges(pairs, rng.normal(size=len(pairs)))
    eng0 = Engine(s.graph, schedule_mode="coloring", pull=False)
    mc.tighten(eng0, max_constraints=10)
    e1 = Engine(s.graph, schedule_mode="coloring", pull=False)
    e2 = Engine(s.graph, schedule_mode="coloring", pull=True)
    for _ in range(4):
        e1.compute_pass("anisotropic")
        e2.compute_pass("anisotropic")
    assert _state_diff(e1, e2) < 1e-5
    assert abs(e1.lower_bound() - e2.lower_bound()) < 1e-4


def test_pull_matches_scatter_qap():
    from lp_mp_tpu.io.torresani import GraphMatchingInput
    from lp_mp_tpu.models.graph_matching import GraphMatchingConstructor
    rng = np.random.default_rng(4)
    s = Solver()
    gm = s.add_constructor(GraphMatchingConstructor, construction="left")
    n0 = n1 = 6
    assignments = [(i, j, float(rng.normal()))
                   for i in range(n0) for j in range(n1)]
    aid = {(i, j): k for k, (i, j, _) in enumerate(assignments)}
    edges = []
    for _ in range(40):
        i1, i2 = rng.choice(n0, 2, replace=False)
        j1, j2 = rng.choice(n1, 2, replace=False)
        if j1 != j2:
            edges.append((aid[(i1, j1)], aid[(i2, j2)],
                          float(rng.normal() * 0.3)))
    gm.construct(GraphMatchingInput(n0, n1, assignments, edges))
    e1 = Engine(s.graph, schedule_mode="coloring", pull=False)
    e2 = Engine(s.graph, schedule_mode="coloring", pull=True)
    for _ in range(4):
        e1.compute_pass("anisotropic")
        e2.compute_pass("anisotropic")
    assert _state_diff(e1, e2) < 1e-5


def test_counting_not_pull_supported():
    """Tomography counting messages keep the scatter path (lam key is too
    wide for dense contributions) — auto mode must fall back, not crash."""
    from lp_mp_tpu.models.tomography import DiscreteTomographyConstructor
    rng = np.random.default_rng(5)
    s = Solver()
    dt = s.add_constructor(DiscreteTomographyConstructor)
    for q in range(6):
        dt.add_unary_factor(rng.normal(size=3))
        if q:
            dt.add_pairwise_factor(q - 1, q, rng.normal(size=(3, 3)) * 0.3)
    dt.add_projection(range(6), 0.05 * np.abs(np.arange(13) - 5.0))
    e = Engine(s.graph, schedule_mode="coloring", pull="auto")
    assert not e._pull_supported(e.plans[Direction.forward])
    lb0 = e.lower_bound()
    e.compute_pass("anisotropic")
    assert e.lower_bound() >= lb0 - 1e-6


def test_pull_monotone_lb():
    g = _grid_graph(potts=True, seed=11, H=10, W=10)
    e = Engine(g, schedule_mode="coloring", pull=True)
    prev = e.lower_bound()
    for _ in range(8):
        e.compute_pass("anisotropic")
        cur = e.lower_bound()
        assert cur >= prev - 1e-5
        prev = cur
