"""Discrete tomography: counting chain factor + end-to-end vs brute force
(reference surface: test/discrete_tomography.cpp)."""
import itertools

import numpy as np
import pytest
import jax.numpy as jnp

from lp_mp_tpu.factors.counting import COUNTING_CHAIN
from lp_mp_tpu.models.tomography import DiscreteTomographyConstructor
from lp_mp_tpu.solver import Solver
from lp_mp_tpu.visitors import StandardVisitor

POTTS = np.array([[0.0, 1.0, 1.0],
                  [1.0, 0.0, 1.0],
                  [1.0, 1.0, 0.0]])


def brute_force(unaries, pairwise, projections):
    """unaries: list of [L]; pairwise: {(i,j): [L,L]}; projections:
    list of (vars, cost_over_sum)."""
    n = len(unaries)
    L = len(unaries[0])
    best = np.inf
    for x in itertools.product(range(L), repeat=n):
        v = sum(unaries[i][x[i]] for i in range(n))
        for (i, j), m in pairwise.items():
            v += m[x[i], x[j]]
        for vars_, pc in projections:
            s = sum(x[i] for i in vars_)
            v += pc[s] if s < len(pc) else np.inf
        best = min(best, v)
    return best


def test_counting_chain_lower_bound():
    # one chain factor, no MRF: bound = min over labelings of proj cost
    pc = np.array([10.0, 10.0, 0.0, 100.0, 7.0])
    inst = [(3, 3, pc)]
    block = {k: jnp.asarray(v) for k, v in COUNTING_CHAIN.build(inst).items()}
    lb = float(COUNTING_CHAIN.lower_bound(block)[0])
    # sums 0..4 attainable with 3 vars of labels 0..2 -> min over pc[0..4]
    assert lb == pytest.approx(0.0)


def test_counting_chain_padding():
    # two factors of different sizes in one block
    pc1 = np.array([1.0, 0.5])
    pc2 = np.array([3.0, 2.0, 0.25, 9.0])
    block = COUNTING_CHAIN.build([(1, 2, pc1), (3, 2, pc2)])
    block = {k: jnp.asarray(v) for k, v in block.items()}
    lb = np.asarray(COUNTING_CHAIN.lower_bound(block))
    assert lb[0] == pytest.approx(0.5)
    assert lb[1] == pytest.approx(0.25)


def test_counting_chain_compute_primal_restricted():
    pc = np.array([10.0, 10.0, 0.0, 100.0])
    block = {k: jnp.asarray(v) for k, v in
             COUNTING_CHAIN.build([(3, 3, pc)]).items()}
    prim = COUNTING_CHAIN.init_primal(block)
    # fix var 0 = 2: best completion is sum 2 -> vars 1,2 = 0
    prim = {"x": prim["x"].at[0, 0].set(2)}
    out = COUNTING_CHAIN.compute_primal(block, prim)
    x = np.asarray(out["x"])[0]
    assert x[0] == 2
    assert x[1] + x[2] + 2 == 2
    val = float(COUNTING_CHAIN.evaluate_primal(block, out)[0])
    assert val == pytest.approx(0.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_end_to_end_chain(seed):
    """Chain MRF with Potts + one projection; lb <= opt, primal >= opt."""
    rng = np.random.default_rng(seed)
    n, L = 4, 3
    unaries = [rng.normal(size=L) for _ in range(n)]
    pairwise = {(i, i + 1): 0.4 * POTTS for i in range(n - 1)}
    pc = rng.normal(size=2 * n + 1) * 2.0
    projections = [(list(range(n)), pc)]
    opt = brute_force(unaries, pairwise, projections)

    s = Solver(visitor=StandardVisitor(max_iter=50))
    dt = s.add_constructor(DiscreteTomographyConstructor)
    for u in unaries:
        dt.add_unary_factor(u)
    for (i, j), m in pairwise.items():
        dt.add_pairwise_factor(i, j, m)
    dt.add_projection(*projections[0])
    lb = s.solve()
    assert lb <= opt + 1e-6
    ub = s.primal_cost()
    assert ub >= opt - 1e-9
    # chain + single projection is solved exactly by DBCA here
    assert lb == pytest.approx(opt, abs=1e-4)
    assert ub == pytest.approx(opt, abs=1e-4)


def test_reference_style_instance():
    """4 variables, 3 labels, projection cost {10,10,0,100,...} forcing the
    ray sum to 2 (test/discrete_tomography.cpp:35-38 shapes)."""
    n, L = 4, 3
    unaries = [np.zeros(L) for _ in range(n)]
    pairwise = {(i, i + 1): POTTS for i in range(n - 1)}
    pc = np.array([10.0, 10, 0, 100, 100, 100, 100, 100, 100])
    opt = brute_force(unaries, pairwise, [(list(range(n)), pc)])

    s = Solver(visitor=StandardVisitor(max_iter=60))
    dt = s.add_constructor(DiscreteTomographyConstructor)
    for u in unaries:
        dt.add_unary_factor(u)
    for (i, j), m in pairwise.items():
        dt.add_pairwise_factor(i, j, m)
    dt.add_projection(list(range(n)), pc)
    lb = s.solve()
    assert lb <= opt + 1e-6
    assert s.primal_cost() >= opt - 1e-9
    assert s.primal_cost() < np.inf
