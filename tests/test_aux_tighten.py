"""Incremental tightening: bucketed aux triplet pass (no engine recompiles).

VERDICT r1 acceptance: repeated tighten rounds must not re-jit the engine
except on bucket overflow; bounds stay monotone and match the integrated
(full-rebuild) schedule's fixed point.
"""
import numpy as np

from lp_mp_tpu import Solver, StandardTighteningVisitor, StandardVisitor
from lp_mp_tpu.models.mrf import MrfConstructor
from lp_mp_tpu.models.tightening import triplet_search


def _frustrated_grid(mrf, H, W, rng):
    """Binary grid with random repulsive/attractive couplings: plenty of
    frustrated triangles once diagonal chords exist, but we only tighten
    triangles of existing pairwise factors — so add diagonals up front."""
    n = lambda i, j: i * W + j
    # unaries in raster order: variable n(i, j) is the (i*W+j)-th unary
    for i in range(H):
        for j in range(W):
            mrf.add_unary_factor(rng.uniform(-0.2, 0.2, size=2))
    anti = np.array([[0.0, 1.0], [1.0, 0.0]])
    ferro = 1.0 - anti
    for i in range(H):
        for j in range(W):
            if j + 1 < W:
                mrf.add_pairwise_factor(n(i, j), n(i, j + 1),
                                        (anti if rng.rand() < 0.5 else ferro))
            if i + 1 < H:
                mrf.add_pairwise_factor(n(i, j), n(i + 1, j),
                                        (anti if rng.rand() < 0.5 else ferro))
            if i + 1 < H and j + 1 < W:
                # diagonal chord -> triangles exist in the pairwise graph
                mrf.add_pairwise_factor(n(i, j), n(i + 1, j + 1),
                                        (anti if rng.rand() < 0.5 else ferro))


def test_tighten_rounds_do_not_rebuild_engine():
    rng = np.random.RandomState(0)
    s = Solver(visitor=StandardVisitor(max_iter=5), use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    _frustrated_grid(mrf, 6, 6, rng)
    s.solve()
    assert s.n_engine_builds == 1
    lb0 = s.lower_bound()

    lb = lb0
    for r in range(10):
        added = triplet_search(mrf, s.engine, max_constraints=3)
        if added == 0:
            break
        # absorb without rebuild (the Solver.tighten absorption path)
        from lp_mp_tpu.aux_tighten import absorbable
        n0 = s.graph.n_factors - added
        m0 = len(s.graph.messages) - 3 * added
        items = absorbable(s.graph, s.engine, n0, m0)
        assert items is not None
        for fid, data, rows in items:
            s.aux.mrf.add(s.engine, fid, data, rows)
        for _ in range(5):
            s.engine.compute_pass("anisotropic")
            s.aux.run(s.engine)
        lb2 = s.engine.lower_bound() + s.aux.lower_bound()
        assert lb2 >= lb - 1e-6, (r, lb, lb2)
        lb = lb2
    assert s.n_engine_builds == 1          # zero rebuilds across all rounds
    assert s.aux.n > 0
    assert lb > lb0 + 1e-6                 # tightening actually helped


def test_aux_path_matches_rebuild_fixed_point():
    """Frustrated 3-cycle: the aux (MPLP cluster) schedule closes the same
    gap the integrated rebuild schedule does (lb 0 -> 1.0,
    test/graphical_model.cpp:191-204 analogue).  All three couplings
    penalize agreement ([[1,0],[0,1]]), so the odd cycle cannot be
    2-colored and the integral optimum is exactly 1."""
    def build(solver):
        mrf = solver.add_constructor(MrfConstructor, pairwise_rep="dense")
        disagree = np.array([[1.0, 0.0], [0.0, 1.0]])
        for v in range(3):
            mrf.add_unary_factor(np.zeros(2))
        mrf.add_pairwise_factor(0, 1, disagree)
        mrf.add_pairwise_factor(1, 2, disagree)
        mrf.add_pairwise_factor(0, 2, disagree)
        return mrf

    vis = StandardTighteningVisitor(max_iter=60, tighten=True,
                                    tighten_iteration=3, tighten_interval=5,
                                    tighten_constraints_max=5)
    s = Solver(visitor=vis, use_jit=True)
    build(s)
    lb = s.solve()
    assert abs(lb - 1.0) < 1e-5, lb
    # the triplet was absorbed, not rebuilt into the engine
    assert s.n_engine_builds == 1
    assert s.aux.n == 1
    # primal evaluation includes the absorbed triplet's (shifted) cost
    assert s.primal_cost() >= lb - 1e-6


def test_aux_fold_into_rebuild_keeps_bound():
    vis = StandardTighteningVisitor(max_iter=40, tighten=True,
                                    tighten_iteration=3, tighten_interval=5,
                                    tighten_constraints_max=5)
    s = Solver(visitor=vis, use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    disagree = np.array([[1.0, 0.0], [0.0, 1.0]])
    for v in range(3):
        mrf.add_unary_factor(np.zeros(2))
    mrf.add_pairwise_factor(0, 1, disagree)
    mrf.add_pairwise_factor(1, 2, disagree)
    mrf.add_pairwise_factor(0, 2, disagree)
    lb = s.solve()
    assert s.aux.n == 1
    s.build_engine()                       # fold absorbed triplets back
    assert s.aux.n == 0
    lb_folded = s.engine.lower_bound()
    assert lb_folded >= lb - 1e-5


def test_aux_tighten_100x100_no_rebuilds():
    """r1/r2 acceptance (VERDICT r2 item 3): >=10 tighten rounds on a
    ~100x100 frustrated grid with at most 2 engine builds, monotone bound,
    batched triplet separation."""
    rng = np.random.default_rng(0)
    H = W = 100
    s = Solver(visitor=StandardVisitor(max_iter=5), use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    mrf.add_unary_factors(rng.uniform(-0.2, 0.2, size=(H * W, 2)))
    idx = np.arange(H * W).reshape(H, W)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1),
        np.stack([idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()], axis=1)])
    anti = np.array([[0.0, 1.0], [1.0, 0.0]])
    pick = rng.random(len(pairs)) < 0.5
    mrf.add_pairwise_factors(pairs, np.where(pick[:, None, None],
                                             anti, 1.0 - anti))
    s.solve()
    lb0 = lb = s.lower_bound()
    from lp_mp_tpu.aux_tighten import absorbable
    from lp_mp_tpu.models.tightening import triplet_search
    for r in range(10):
        added = triplet_search(mrf, s.engine, max_constraints=20)
        assert added > 0, r
        n0 = s.graph.n_factors - added
        m0 = len(s.graph.messages) - 3 * added
        items = absorbable(s.graph, s.engine, n0, m0)
        assert items is not None
        for fid, data, rows in items:
            s.aux.mrf.add(s.engine, fid, data, rows)
        for _ in range(3):
            s.engine.compute_pass("anisotropic")
            s.aux.run(s.engine)
        lb2 = s.engine.lower_bound() + s.aux.lower_bound()
        assert lb2 >= lb - 1e-6, (r, lb, lb2)
        lb = lb2
    assert s.n_engine_builds <= 2
    assert s.aux.n == 200
    assert lb > lb0 + 100.0      # tightening closed real gap (10.4 -> ~200)


def test_multicut_triplet_absorb_no_rebuild():
    """Cycle-separation rounds that add only multicut triplets on existing
    edges absorb into AuxMulticutTripletPass — no engine rebuild — with a
    monotone bound; the full solve (whose wheel phase may legitimately
    rebuild) still reaches the brute-force multicut optimum."""
    import itertools
    import numpy as np
    from lp_mp_tpu import Solver
    from lp_mp_tpu.models.multicut import MulticutConstructor
    from lp_mp_tpu.visitors import StandardTighteningVisitor

    rng = np.random.default_rng(21)
    n = 5
    pairs = np.asarray([(i, j) for i in range(n) for j in range(i + 1, n)])
    costs = rng.normal(size=len(pairs))

    def mc_cost(lab):
        return sum(c for (i, j), c in zip(pairs, costs)
                   if lab[i] != lab[j])
    opt = min(mc_cost(lab) for lab in
              itertools.product(range(n), repeat=n))

    # absorb path: triplet-only cycle separation, zero rebuilds
    s = Solver()
    mc = s.add_constructor(MulticutConstructor)
    mc.add_edges(pairs, costs)          # complete graph: no chords needed
    s.build_engine()
    for _ in range(5):
        s.engine.compute_pass("anisotropic")
    lb = s.engine.lower_bound()
    for _ in range(4):
        n0, m0 = s.graph.n_factors, len(s.graph.messages)
        added = mc.tighten_cycles(s.engine, max_constraints=10)
        if not added:
            break
        assert s.aux.absorb(s.graph, s.engine, n0, m0)
        for _ in range(5):
            s.engine.compute_pass("anisotropic")
            s.aux.run(s.engine)
        lb2 = s.engine.lower_bound() + s.aux.lower_bound()
        assert lb2 >= lb - 1e-6
        lb = lb2
    assert s.n_engine_builds == 1
    assert s.aux.mc.n > 0

    # full solver reaches the optimum (wheel rounds may rebuild)
    s2 = Solver(visitor=StandardTighteningVisitor(
        max_iter=80, tighten=True, tighten_iteration=5, tighten_interval=10,
        tighten_constraints_max=40))
    mc2 = s2.add_constructor(MulticutConstructor)
    mc2.add_edges(pairs, costs)
    lb = s2.solve()
    assert lb <= opt + 1e-6
    ub = s2.primal_cost()
    assert np.isfinite(ub) and ub >= opt - 1e-9
    assert abs(lb - opt) < 1e-4 and abs(ub - opt) < 1e-4


def test_multicut_absorb_fold_into_rebuild():
    """A later non-absorbable change folds the absorbed multicut triplet
    duals back into a rebuilt engine with the bound preserved."""
    import numpy as np
    from lp_mp_tpu import Solver
    from lp_mp_tpu.models.multicut import MulticutConstructor
    from lp_mp_tpu.engine import Engine

    rng = np.random.default_rng(22)
    n = 6
    pairs = np.asarray([(i, j) for i in range(n) for j in range(i + 1, n)])
    s = Solver()
    mc = s.add_constructor(MulticutConstructor)
    mc.add_edges(pairs, rng.normal(size=len(pairs)))
    s.build_engine()
    n0, m0 = s.graph.n_factors, len(s.graph.messages)
    mc.add_triplet(0, 1, 2)
    mc.add_triplet(2, 3, 4)
    assert s.aux.absorb(s.graph, s.engine, n0, m0)
    for _ in range(5):
        s.engine.compute_pass("anisotropic")
        s.aux.run(s.engine)
    lb_before = s.engine.lower_bound() + s.aux.lower_bound()
    s.build_engine()                    # folds absorbed duals back
    assert not bool(s.aux)
    lb_after = s.engine.lower_bound()
    assert abs(lb_after - lb_before) < 1e-5
