"""Phase-batched execution == sequential sweep, and monotone lower bounds.

The central exactness claim of the TPU design (SURVEY.md §7): levelized
wavefront phases perform the same block-coordinate steps as the reference's
sequential sweep.  ``schedule_mode='sequential'`` is the in-tree oracle.
"""
import jax
import numpy as np
import pytest

from lp_mp_tpu import Engine, Solver
from lp_mp_tpu.config import Direction
from lp_mp_tpu.models.mrf import MrfConstructor


def random_mrf(seed, n=8, extra_edges=4, maxL=4, pairwise_rep="dense"):
    rng = np.random.default_rng(seed)
    s = Solver(use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep=pairwise_rep)
    Ls = rng.integers(2, maxL + 1, size=n)
    if pairwise_rep == "potts":
        Ls[:] = Ls[0]
    for i in range(n):
        mrf.add_unary_factor(rng.normal(size=Ls[i]))
    edges = {(i, i + 1) for i in range(n - 1)}
    while len(edges) < n - 1 + extra_edges:
        i, j = sorted(rng.integers(0, n, size=2))
        if i != j:
            edges.add((i, j))
    for (i, j) in sorted(edges):
        if pairwise_rep == "potts":
            m = rng.normal() * (1 - np.eye(Ls[i]))
        else:
            m = rng.normal(size=(Ls[i], Ls[j]))
        mrf.add_pairwise_factor(i, j, m)
    return s, mrf


def state_allclose(a, b, tol=1e-9):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    return all(np.allclose(np.asarray(x), np.asarray(y), atol=tol)
               for x, y in zip(flat_a, flat_b))


@pytest.mark.parametrize("rep", ["dense", "potts"])
@pytest.mark.parametrize("mode", ["anisotropic", "anisotropic2", "uniform", "damped_uniform"])
def test_wavefront_equals_sequential(mode, rep):
    s, _ = random_mrf(42, pairwise_rep=rep)
    e_seq = Engine(s.graph, schedule_mode="sequential", use_jit=True)
    e_wav = Engine(s.graph, schedule_mode="wavefront", use_jit=True)
    for it in range(3):
        e_seq.compute_pass(mode)
        e_wav.compute_pass(mode)
    assert state_allclose(e_seq.state, e_wav.state)
    assert abs(e_seq.lower_bound() - e_wav.lower_bound()) < 1e-9


@pytest.mark.parametrize("smode", ["sequential", "wavefront", "coloring"])
@pytest.mark.parametrize("mode", ["anisotropic", "anisotropic2", "uniform", "damped_uniform", "mixed"])
def test_monotone_lower_bound(smode, mode):
    s, _ = random_mrf(7, n=10, extra_edges=6)
    e = Engine(s.graph, schedule_mode=smode, use_jit=True)
    lb = e.lower_bound()
    for it in range(5):
        e.compute_pass(mode)
        lb2 = e.lower_bound()
        assert lb2 >= lb - 1e-9, (smode, mode, it, lb, lb2)
        lb = lb2


def test_jit_equals_eager():
    s, _ = random_mrf(3, n=6, extra_edges=2)
    e1 = Engine(s.graph, schedule_mode="wavefront", use_jit=True)
    e2 = Engine(s.graph, schedule_mode="wavefront", use_jit=True)
    for _ in range(2):
        e1.compute_pass("anisotropic")
        e2.compute_pass("anisotropic")
    assert state_allclose(e1.state, e2.state, tol=1e-10)


def test_primal_pass_monotone_and_consistent():
    s, _ = random_mrf(11, n=8, extra_edges=3)
    e = Engine(s.graph, schedule_mode="wavefront", use_jit=True)
    for _ in range(3):
        e.compute_pass("anisotropic")
    lb_before = e.lower_bound()
    prim = e.compute_pass_and_primal("damped_uniform", Direction.forward)
    assert e.lower_bound() >= lb_before - 1e-9
    assert e.check_primal_consistency(prim)
    ub = e.evaluate_primal(prim)
    assert np.isfinite(ub)
    assert ub >= e.lower_bound() - 1e-9


def test_total_cost_invariant():
    # reparametrization is zero-sum: evaluating any fixed labeling gives the
    # same total cost before and after passes (serialization of the shift)
    s, mrf = random_mrf(13, n=6, extra_edges=2)
    e = Engine(s.graph, schedule_mode="wavefront", use_jit=True)
    prim = e.compute_pass_and_primal("damped_uniform", Direction.forward)
    cost0 = e.evaluate_primal(prim)
    for _ in range(4):
        e.compute_pass("anisotropic")
    cost1 = e.evaluate_primal(prim)
    assert abs(cost0 - cost1) < 1e-8
