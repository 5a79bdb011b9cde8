"""Tree (chain) decomposition engines: exact chain solve, subgradient
ascent, FWMAP proximal FW, write-back (reference tree_decomposition.hxx,
LP_FWMAP.hxx; acceptance mirrors test/test_FWMAP.cpp)."""
import itertools

import numpy as np
import pytest
import jax.numpy as jnp

from lp_mp_tpu.models.mrf import MrfConstructor
from lp_mp_tpu.solver import Solver
from lp_mp_tpu.trees import ChainDecomposition
from lp_mp_tpu.visitors import StandardVisitor


def build_mrf(unaries, pairwise):
    s = Solver(visitor=StandardVisitor(max_iter=1))
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    for u in unaries:
        mrf.add_unary_factor(u)
    for (i, j), m in pairwise.items():
        mrf.add_pairwise_factor(i, j, m)
    return s, mrf


def brute_force(unaries, pairwise):
    n, L = len(unaries), len(unaries[0])
    best = np.inf
    for x in itertools.product(range(L), repeat=n):
        v = sum(unaries[i][x[i]] for i in range(n))
        v += sum(m[x[i], x[j]] for (i, j), m in pairwise.items())
        best = min(best, v)
    return best


def frustrated_cycle(n=4):
    """Binary cycle with one repulsive edge: opt 1, LP bound 0
    (test/graphical_model.cpp:232-246)."""
    eq = np.array([[0.0, 1.0], [1.0, 0.0]])
    ne = np.array([[1.0, 0.0], [0.0, 1.0]])
    unaries = [np.zeros(2) for _ in range(n)]
    pairwise = {(i, i + 1): eq for i in range(n - 1)}
    pairwise[(0, n - 1)] = ne
    return unaries, pairwise


@pytest.mark.parametrize("seed", [0, 1])
def test_chain_solve_exact(seed):
    """A single chain is solved exactly by the batched Viterbi scan."""
    rng = np.random.default_rng(seed)
    n, L = 5, 3
    unaries = [rng.normal(size=L) for _ in range(n)]
    pairwise = {(i, i + 1): rng.normal(size=(L, L)) for i in range(n - 1)}
    _, mrf = build_mrf(unaries, pairwise)
    dec = ChainDecomposition.from_mrf(mrf)
    assert len(dec.chains) == 1
    bound, x = dec.solve(jnp.zeros_like(dec.unary))
    opt = brute_force(unaries, pairwise)
    assert float(jnp.sum(bound)) == pytest.approx(opt, abs=1e-9)
    # labels achieve the bound
    xs = np.asarray(x)[0]
    val = sum(unaries[i][xs[i]] for i in range(n)) + \
        sum(m[xs[i], xs[j]] for (i, j), m in pairwise.items())
    assert val == pytest.approx(opt, abs=1e-9)


def test_decomposition_valid_bound_and_multiplicity():
    rng = np.random.default_rng(3)
    # 2x2 grid: 4 edges -> chains share variables
    L = 3
    unaries = [rng.normal(size=L) for _ in range(4)]
    pairwise = {(0, 1): rng.normal(size=(L, L)), (2, 3): rng.normal(size=(L, L)),
                (0, 2): rng.normal(size=(L, L)), (1, 3): rng.normal(size=(L, L))}
    _, mrf = build_mrf(unaries, pairwise)
    dec = ChainDecomposition.from_mrf(mrf)
    # every pairwise covered exactly once
    covered = sum(len(c) - 1 for c in dec.chains)
    assert covered == len(pairwise)
    opt = brute_force(unaries, pairwise)
    lb0 = float(dec.dual_value(jnp.zeros_like(dec.unary)))
    assert lb0 <= opt + 1e-9


def test_subgradient_ascent_converges():
    unaries, pairwise = frustrated_cycle(4)
    opt = brute_force(unaries, pairwise)  # = 1
    _, mrf = build_mrf(unaries, pairwise)
    dec = ChainDecomposition.from_mrf(mrf)
    best, lam, hist = dec.subgradient_ascent(n_iter=150, ub_estimate=opt,
                                             step=0.5)
    # LP bound of the frustrated cycle is 0; subgradient approaches it
    assert best <= opt + 1e-9
    assert best >= -0.05
    assert best >= hist[0]  # improved over the initial decomposition bound


def test_fw_map_converges_and_beats_init():
    rng = np.random.default_rng(5)
    L = 2
    unaries = [rng.normal(size=L) * 0.3 for _ in range(4)]
    _, pairwise = frustrated_cycle(4)
    _, mrf = build_mrf(unaries, pairwise)
    dec = ChainDecomposition.from_mrf(mrf)
    opt = brute_force(unaries, pairwise)
    best, lam, hist = dec.fw_map(n_outer=8, n_inner=20, prox_weight=0.5)
    assert best <= opt + 1e-9
    assert best >= hist[0] - 1e-9
    # close to the LP bound: within 0.1 of the subgradient reference
    sg_best, _, _ = dec.subgradient_ascent(n_iter=200, ub_estimate=opt, step=0.5)
    assert best >= sg_best - 0.1


def test_write_back_keeps_bound():
    """write_back_reparametrization: engine bound == sum of tree bounds
    (test/test_FWMAP.cpp:11-22 acceptance)."""
    unaries, pairwise = frustrated_cycle(4)
    s, mrf = build_mrf(unaries, pairwise)
    dec = ChainDecomposition.from_mrf(mrf)
    opt = brute_force(unaries, pairwise)
    best, lam, _ = dec.subgradient_ascent(n_iter=100, ub_estimate=opt, step=0.5)
    engine = s.build_engine()
    tree_bound = float(dec.dual_value(lam))
    dec.write_back_reparametrization(engine, lam)
    assert engine.lower_bound() == pytest.approx(tree_bound, abs=1e-6)
    # message passing continues from there without losing the bound
    engine.compute_pass("anisotropic")
    assert engine.lower_bound() >= tree_bound - 1e-9


def test_primal_labels_feasible():
    rng = np.random.default_rng(11)
    L = 3
    unaries = [rng.normal(size=L) for _ in range(4)]
    pairwise = {(0, 1): rng.normal(size=(L, L)), (1, 2): rng.normal(size=(L, L)),
                (2, 3): rng.normal(size=(L, L)), (0, 3): rng.normal(size=(L, L))}
    _, mrf = build_mrf(unaries, pairwise)
    dec = ChainDecomposition.from_mrf(mrf)
    lab = dec.primal_labels(jnp.zeros_like(dec.unary))
    assert lab.shape == (4,)
    assert ((lab >= 0) & (lab < L)).all()
