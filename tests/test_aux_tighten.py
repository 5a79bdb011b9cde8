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
            s.aux.add(s.engine, fid, data, rows)
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
            s.aux.add(s.engine, fid, data, rows)
        for _ in range(3):
            s.engine.compute_pass("anisotropic")
            s.aux.run(s.engine)
        lb2 = s.engine.lower_bound() + s.aux.lower_bound()
        assert lb2 >= lb - 1e-6, (r, lb, lb2)
        lb = lb2
    assert s.n_engine_builds <= 2
    assert s.aux.n == 200
    assert lb > lb0 + 100.0      # tightening closed real gap (10.4 -> ~200)
