"""The lax.scan sweep == the unrolled per-phase sweep, bit-for-bit.

The scan path (engine._make_pass_scan) is the scaling path for large
graphs (compile time O(1) in phase count, cf. the reference engine's
10^6-factor graphs, LP_MP.h:869-1005); the unrolled path stays as the
small-graph oracle.  These tests pin dual-state, lower-bound, and primal
parity between the two on the same schedule, plus batch-construction
parity (add_*_factors vs per-item add_*_factor).
"""
import jax
import numpy as np
import pytest

from lp_mp_tpu import Engine, Solver, StandardVisitor
from lp_mp_tpu.config import Direction
from lp_mp_tpu.models.mrf import MrfConstructor, mrf_labeling
from tests.test_engine_parity import random_mrf, state_allclose


@pytest.mark.parametrize("rep", ["dense", "potts"])
@pytest.mark.parametrize("mode", ["anisotropic", "anisotropic2", "uniform",
                                  "damped_uniform"])
def test_scan_equals_unrolled_dual(mode, rep):
    s, _ = random_mrf(7, n=10, extra_edges=6, pairwise_rep=rep)
    e_unr = Engine(s.graph, schedule_mode="wavefront", pass_style="unrolled")
    e_scn = Engine(s.graph, schedule_mode="wavefront", pass_style="scan")
    for _ in range(3):
        e_unr.compute_pass(mode)
        e_scn.compute_pass(mode)
        assert state_allclose(e_unr.state, e_scn.state)
    assert abs(e_unr.lower_bound() - e_scn.lower_bound()) < 1e-12


@pytest.mark.parametrize("smode", ["wavefront", "coloring"])
def test_scan_equals_unrolled_primal(smode):
    s, _ = random_mrf(11, n=12, extra_edges=5)
    e_unr = Engine(s.graph, schedule_mode=smode, pass_style="unrolled")
    e_scn = Engine(s.graph, schedule_mode=smode, pass_style="scan")
    for _ in range(2):
        e_unr.compute_pass("anisotropic")
        e_scn.compute_pass("anisotropic")
    for d in (Direction.forward, Direction.backward):
        p_unr = e_unr.compute_pass_and_primal("damped_uniform", d)
        p_scn = e_scn.compute_pass_and_primal("damped_uniform", d)
        assert state_allclose(e_unr.state, e_scn.state)
        for name in p_unr:
            for k in p_unr[name]:
                np.testing.assert_array_equal(np.asarray(p_unr[name][k]),
                                              np.asarray(p_scn[name][k]))
        assert (e_unr.evaluate_primal(p_unr) == e_scn.evaluate_primal(p_scn))


def test_scan_monotone_lower_bound():
    s, _ = random_mrf(23, n=20, extra_edges=12)
    e = Engine(s.graph, schedule_mode="coloring", pass_style="scan")
    lb = e.lower_bound()
    for _ in range(8):
        e.compute_pass("anisotropic")
        lb2 = e.lower_bound()
        assert lb2 >= lb - 1e-9
        lb = lb2


def _grid_pairs(H, W):
    idx = np.arange(H * W).reshape(H, W)
    return np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])


@pytest.mark.parametrize("potts", [True, False])
def test_batch_construction_equals_item_construction(potts):
    rng = np.random.default_rng(5)
    H, W, L = 5, 4, 3
    un = rng.normal(size=(H * W, L))
    pairs = _grid_pairs(H, W)
    diffs = rng.uniform(0.2, 1.0, size=len(pairs))
    dense = rng.normal(size=(len(pairs), L, L))

    s_b = Solver(visitor=StandardVisitor(max_iter=10))
    c_b = s_b.add_constructor(MrfConstructor)
    c_b.add_unary_factors(un)
    if potts:
        c_b.add_potts_factors(pairs, L, diffs)
    else:
        c_b.add_pairwise_factors(pairs, dense)

    s_i = Solver(visitor=StandardVisitor(max_iter=10))
    c_i = s_i.add_constructor(MrfConstructor,
                              pairwise_rep="potts" if potts else "dense")
    for u in un:
        c_i.add_unary_factor(u)
    for k, (i, j) in enumerate(pairs):
        if potts:
            m = diffs[k] * (1.0 - np.eye(L))
        else:
            m = dense[k]
        c_i.add_pairwise_factor(int(i), int(j), m)

    lb_b, lb_i = s_b.solve(), s_i.solve()
    assert abs(lb_b - lb_i) < 1e-9
    assert abs(s_b.primal_cost() - s_i.primal_cost()) < 1e-9
    # batch constructor keeps working per-item views
    assert len(c_b.unaries) == H * W
    assert set(map(tuple, pairs.tolist())) == set(c_b.pairwise)
    lab = mrf_labeling(c_b, s_b.engine, s_b.best_primal)
    assert lab.shape == (H * W,)


def test_mixed_item_then_batch_construction():
    """Interleaving per-item and batch adds yields one consistent graph."""
    rng = np.random.default_rng(9)
    L = 3
    s = Solver(visitor=StandardVisitor(max_iter=10))
    c = s.add_constructor(MrfConstructor)
    c.add_unary_factor(rng.normal(size=L))
    c.add_unary_factors(rng.normal(size=(4, L)))
    c.add_unary_factor(rng.normal(size=L))
    c.add_pairwise_factor(0, 1, rng.normal(size=(L, L)))
    c.add_potts_factors(np.array([[1, 2], [3, 4]]), L, np.array([0.5, 0.7]))
    c.add_pairwise_factor(4, 5, rng.normal(size=(L, L)))
    lb = s.solve()
    ub = s.primal_cost()
    assert np.isfinite(ub) and lb <= ub + 1e-9
    assert len(c.unaries) == 6 and len(c.pairwise) == 4


def test_scan_residual_matches_unrolled_small():
    """Explicit pass_style='scan' with update_mode='residual' runs the scan
    body (no fallback) and matches the unrolled pass on a small model —
    smoke twin of test_scan_equals_unrolled_residual_adaptive below."""
    s, _ = random_mrf(3, n=6, extra_edges=2)
    e = Engine(s.graph, schedule_mode="wavefront", pass_style="scan",
               update_mode="residual")
    e.compute_pass("anisotropic")  # must silently fall back, not crash
    e2 = Engine(s.graph, schedule_mode="wavefront", pass_style="unrolled",
                update_mode="residual")
    e2.compute_pass("anisotropic")
    assert state_allclose(e.state, e2.state)


@pytest.mark.parametrize("umode", ["residual", "adaptive"])
@pytest.mark.parametrize("smode", ["wavefront", "coloring"])
def test_scan_equals_unrolled_residual_adaptive(umode, smode):
    """residual/adaptive update modes under lax.scan == unrolled (VERDICT
    r3 item 5: previously these silently fell back to unrolled compilation,
    making them unusable at the scale scan was built for).  Reference:
    send_messages_residual factors_messages.hxx:2959-3007, adaptive
    fm.hxx:2859-2926."""
    s, _ = random_mrf(31, n=14, extra_edges=7)
    e_unr = Engine(s.graph, schedule_mode=smode, pass_style="unrolled",
                   update_mode=umode)
    e_scn = Engine(s.graph, schedule_mode=smode, pass_style="scan",
                   update_mode=umode)
    for it in range(3):
        e_unr.compute_pass("anisotropic")
        e_scn.compute_pass("anisotropic")
        assert state_allclose(e_unr.state, e_scn.state), (umode, smode, it)
    assert abs(e_unr.lower_bound() - e_scn.lower_bound()) < 1e-9
