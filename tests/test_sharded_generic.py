"""ShardedEngine == single-device Engine over a CPU device mesh.

VERDICT r2 item 2 acceptance: multi-device tests showing monotone bounds
and <=1e-6 agreement with the single-device engine on MRF *and* multicut
instances.  The sharded engine executes the same coloring-phase schedule
with op-level work partitioning and psum cut-delta consensus (the
reference's partition push pass, LP_MP.h:1791-1821, made collective)."""
import jax
import numpy as np
import pytest

from lp_mp_tpu import Engine, Solver
from lp_mp_tpu.config import Direction
from lp_mp_tpu.models.mrf import MrfConstructor
from lp_mp_tpu.models.multicut import MulticutConstructor
from lp_mp_tpu.parallel.generic import ShardedEngine
from tests.test_engine_parity import random_mrf, state_allclose

SHARDS = [2, 4, 8]


def fresh_oracle(graph):
    return Engine(graph, schedule_mode="coloring", pass_style="unrolled")


@pytest.mark.parametrize("k", SHARDS)
@pytest.mark.parametrize("rep", ["dense", "potts"])
def test_mrf_dual_parity(k, rep):
    s, _ = random_mrf(42, n=12, extra_edges=6, pairwise_rep=rep)
    e1 = fresh_oracle(s.graph)
    e2 = ShardedEngine(s.graph, devices=jax.devices()[:k])
    for mode in ("anisotropic", "uniform", "damped_uniform"):
        for _ in range(2):
            e1.compute_pass(mode)
            e2.compute_pass(mode)
        assert state_allclose(e1.state, e2.state, tol=1e-9)
    assert abs(e1.lower_bound() - e2.lower_bound()) < 1e-9


@pytest.mark.parametrize("k", SHARDS)
def test_mrf_primal_parity(k):
    s, _ = random_mrf(7, n=14, extra_edges=5)
    e1 = fresh_oracle(s.graph)
    e2 = ShardedEngine(s.graph, devices=jax.devices()[:k])
    for _ in range(3):
        e1.compute_pass("anisotropic")
        e2.compute_pass("anisotropic")
    for d in (Direction.forward, Direction.backward):
        p1 = e1.compute_pass_and_primal("damped_uniform", d)
        p2 = e2.compute_pass_and_primal("damped_uniform", d)
        assert state_allclose(e1.state, e2.state, tol=1e-9)
        p2m = e2.merge_primal(p2)
        for t in p1:
            for key in p1[t]:
                np.testing.assert_array_equal(np.asarray(p1[t][key]),
                                              np.asarray(p2m[t][key]))
        assert abs(e1.evaluate_primal(p1) - e2.evaluate_primal(p2)) < 1e-9
        assert (e1.check_primal_consistency(p1)
                == e2.check_primal_consistency(p2))


def _multicut_with_triplets(seed=3, n=10, p_edge=0.5):
    rng = np.random.default_rng(seed)
    s = Solver()
    mc = s.add_constructor(MulticutConstructor)
    pairs, costs = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p_edge:
                pairs.append((i, j))
                costs.append(rng.normal())
    mc.add_edges(np.asarray(pairs), np.asarray(costs))
    # triplets on all triangles of the first few nodes -> edge<->triplet
    # messages exist, exercising cross-shard one-to-many updates
    added = 0
    for i in range(n):
        for j in range(i + 1, n):
            for kk in range(j + 1, n):
                if ((i, j) in mc.edges and (i, kk) in mc.edges
                        and (j, kk) in mc.edges):
                    mc.add_triplet(i, j, kk)
                    added += 1
    assert added >= 5
    return s, mc


@pytest.mark.parametrize("k", SHARDS)
def test_multicut_dual_parity(k):
    s, mc = _multicut_with_triplets()
    e1 = fresh_oracle(s.graph)
    e2 = ShardedEngine(s.graph, devices=jax.devices()[:k])
    lb_prev = e2.lower_bound()
    assert abs(e1.lower_bound() - lb_prev) < 1e-9
    for _ in range(5):
        e1.compute_pass("anisotropic")
        e2.compute_pass("anisotropic")
        lb1, lb2 = e1.lower_bound(), e2.lower_bound()
        assert abs(lb1 - lb2) < 1e-9
        assert lb2 >= lb_prev - 1e-9       # monotone
        lb_prev = lb2
    assert state_allclose(e1.state, e2.state, tol=1e-9)


@pytest.mark.parametrize("k", [8])
def test_sharded_monotone_on_grid(k):
    """Larger frustrated grid: monotone bound improvement while sharded."""
    rng = np.random.default_rng(0)
    H = W = 12
    s = Solver()
    mrf = s.add_constructor(MrfConstructor)
    mrf.add_unary_factors(rng.uniform(-0.2, 0.2, size=(H * W, 2)))
    idx = np.arange(H * W).reshape(H, W)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
    anti = np.array([[0.0, 1.0], [1.0, 0.0]])
    pick = rng.random(len(pairs)) < 0.5
    mrf.add_pairwise_factors(pairs, np.where(pick[:, None, None],
                                             anti, 1.0 - anti))
    e = ShardedEngine(s.graph, devices=jax.devices()[:k])
    lb = e.lower_bound()
    for _ in range(10):
        e.compute_pass("anisotropic")
        lb2 = e.lower_bound()
        assert lb2 >= lb - 1e-9
        lb = lb2
    # agrees with single-device endpoint
    e1 = fresh_oracle(s.graph)
    for _ in range(10):
        e1.compute_pass("anisotropic")
    assert abs(e1.lower_bound() - lb) < 1e-6


@pytest.mark.parametrize("k", [4])
def test_sharded_state_roundtrip(k):
    """set_state/state round-trips through the shard layout exactly."""
    s, _ = random_mrf(5, n=9, extra_edges=3)
    e = ShardedEngine(s.graph, devices=jax.devices()[:k])
    e.compute_pass("anisotropic")
    snap = e.state
    e.set_state(snap)
    snap2 = e.state
    assert state_allclose(snap, snap2, tol=0.0)
