"""Restricted (primal-conditioned) marginals for non-MRF message types
(VERDICT r3 item 6).

Round 3 wired restricted rounding only into the MRF marginalization
messages; multicut / counting / equality types silently fell back to the
unrestricted marginal.  Pinned here:

- unit semantics vs brute force for the edge<->triplet and unary<->counting
  restricted marginals;
- no-op equivalence: with nothing fixed, restricted == unrestricted for
  every type that now implements the hook;
- direction invariants for the wheel-k conditioning;
- A/B on frustrated multicut instances: the restricted rounding pass
  produces message-consistent primals where plain argmin rounding yields
  inconsistent (infinite-cost) ones, and is never worse in aggregate.

Reference: OneSideMessageContainerView, factors_messages.hxx:513-566.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lp_mp_tpu import Solver
from lp_mp_tpu.config import Direction
from lp_mp_tpu.engine import Engine
from lp_mp_tpu.registry import RESTRICT_BIG
from lp_mp_tpu.factors.multicut import TRIPLET_PATTERNS
from lp_mp_tpu.messages.multicut import (
    MULTICUT_EDGE_TRIPLET_0, MULTICUT_EDGE_TRIPLET_1, wheel_k_message)
from lp_mp_tpu.messages.counting import UNARY_COUNTING
from lp_mp_tpu.messages.equality import EQUALITY
from lp_mp_tpu.messages.vector_equality import VECTOR_EQUALITY
from lp_mp_tpu.models.multicut import MulticutConstructor


# ---------------------------------------------------------------------------
# unit semantics vs brute force
# ---------------------------------------------------------------------------
def test_restricted_edge_triplet_bruteforce():
    rng = np.random.default_rng(0)
    M = 6
    c = rng.normal(size=(M, 4))
    costs = {"c": jnp.asarray(c)}
    e = np.asarray([[-1, -1, -1], [1, -1, -1], [0, -1, -1],
                    [1, 1, 0], [-1, 0, 1], [0, 0, 0]], np.int32)
    prim = {f"e{t}": jnp.asarray(e[:, t - 1]) for t in (1, 2, 3)}
    for msg in (MULTICUT_EDGE_TRIPLET_0, MULTICUT_EDGE_TRIPLET_1):
        mm = np.asarray(msg.restricted_marginal_right(costs, prim, {}))[:, 0]
        s = msg.slot
        for f in range(M):
            # config costs: row r of TRIPLET_PATTERNS costs c[r] (+BIG per
            # violated fixed bit); the implicit all-uncut config costs
            # BIG per fixed-cut bit
            cz = [c[f, r] + RESTRICT_BIG * sum(
                1 for t in range(3)
                if e[f, t] >= 0 and e[f, t] != TRIPLET_PATTERNS[r, t])
                for r in range(4)]
            z = RESTRICT_BIG * np.sum(e[f] == 1)
            cut = min(cz[r] for r in range(4) if TRIPLET_PATTERNS[r, s] == 1)
            unc = min([cz[r] for r in range(4)
                       if TRIPLET_PATTERNS[r, s] == 0] + [z])
            assert mm[f] == pytest.approx(cut - unc, rel=1e-6, abs=1e-4), \
                (msg.name, f)


def test_restricted_edge_side():
    costs = {"c": jnp.asarray([0.7, -0.3, 1.2])}
    for msg in (MULTICUT_EDGE_TRIPLET_0, wheel_k_message(5)):
        prim = {"x": jnp.asarray([-1, 1, 0], jnp.int32)}
        mm = np.asarray(msg.restricted_marginal_left(costs, prim, {}))[:, 0]
        assert mm[0] == pytest.approx(0.7)
        assert mm[1] == pytest.approx(-0.3 - RESTRICT_BIG)
        assert mm[2] == pytest.approx(1.2 + RESTRICT_BIG)


def test_restricted_counting_bruteforce():
    rng = np.random.default_rng(1)
    M, V, L = 1, 4, 3
    S = (L - 1) * V + 1
    lam = rng.normal(size=(M, V, L))
    proj = np.abs(np.arange(S) - 3.0)[None, :] * 0.7
    costs = {"lam": jnp.asarray(lam), "proj": jnp.asarray(proj)}
    x = np.asarray([[-1, 2, -1, 0]], np.int32)     # two fixed chain vars
    prim = {"x": jnp.asarray(x)}
    for pos in range(V):
        data = {"pos": jnp.asarray([pos], jnp.int32)}
        mm = np.asarray(UNARY_COUNTING.restricted_marginal_right(
            costs, prim, data))[0]
        # brute force over all labelings with BIG off fixed lanes
        best = np.full(L, np.inf)
        import itertools
        for lab in itertools.product(range(L), repeat=V):
            val = sum(lam[0, v, lab[v]] for v in range(V)) \
                + proj[0, sum(lab)] \
                + sum(RESTRICT_BIG for v in range(V)
                      if x[0, v] >= 0 and lab[v] != x[0, v])
            best[lab[pos]] = min(best[lab[pos]], val)
        np.testing.assert_allclose(mm, best, rtol=1e-5, atol=1e-3)


def test_restricted_noop_when_unset():
    """With every primal unset, restricted == unrestricted for all newly
    covered types."""
    rng = np.random.default_rng(2)
    # edge / triplet
    ec = {"c": jnp.asarray(rng.normal(size=5))}
    ep = {"x": jnp.full(5, -1, jnp.int32)}
    np.testing.assert_allclose(
        np.asarray(MULTICUT_EDGE_TRIPLET_0.restricted_marginal_left(ec, ep, {})),
        np.asarray(MULTICUT_EDGE_TRIPLET_0.marginal_left(ec, {})))
    tc = {"c": jnp.asarray(rng.normal(size=(5, 4)))}
    tp = {f"e{t}": jnp.full(5, -1, jnp.int32) for t in (1, 2, 3)}
    np.testing.assert_allclose(
        np.asarray(MULTICUT_EDGE_TRIPLET_0.restricted_marginal_right(tc, tp, {})),
        np.asarray(MULTICUT_EDGE_TRIPLET_0.marginal_right(tc, {})))
    # equality / vector equality
    sc = {"c": jnp.asarray(rng.normal(size=(5, 4))),
          "nl": jnp.full(5, 4, jnp.int32)}
    sp = {"x": jnp.full(5, -1, jnp.int32)}
    d = {"li": jnp.asarray([0, 1, 2, 3, 0], jnp.int32),
         "ri": jnp.asarray([1, 1, 0, 2, 3], jnp.int32)}
    np.testing.assert_allclose(
        np.asarray(EQUALITY.restricted_marginal_left(sc, sp, d)),
        np.asarray(EQUALITY.marginal_left(sc, d)))
    np.testing.assert_allclose(
        np.asarray(VECTOR_EQUALITY.restricted_marginal_right(sc, sp, {})),
        np.asarray(VECTOR_EQUALITY.marginal_right(sc, {})))
    # wheel-k
    k = 5
    wk = wheel_k_message(k)
    wc = {"sp": jnp.asarray(rng.normal(size=(3, k))),
          "rim": jnp.asarray(rng.normal(size=(3, k))),
          "tri": jnp.asarray(rng.normal(size=(3, k, 4)) * 0.2)}
    wp = {"e": jnp.full((3, 2 * k), -1, jnp.int32)}
    wd = {"slot": jnp.asarray([0, 3, 7], jnp.int32)}
    np.testing.assert_allclose(
        np.asarray(wk.restricted_marginal_right(wc, wp, wd)),
        np.asarray(wk.marginal_right(wc, wd)), rtol=1e-6)


def test_restricted_wheel_direction():
    """A fully fixed wheel primal drives each slot's conditioned marginal
    hard toward the fixed bit (negative if cut, positive if uncut)."""
    rng = np.random.default_rng(3)
    k = 5
    wk = wheel_k_message(k)
    wc = {"sp": jnp.asarray(rng.normal(size=(1, k))),
          "rim": jnp.asarray(rng.normal(size=(1, k))),
          "tri": jnp.zeros((1, k, 4))}
    # valid config: hub block = {hub, v0, v1} -> spokes 2,3,4 cut, rim
    # edges (1,2) and (4,0) cut
    e = np.asarray([[0, 0, 1, 1, 1, 0, 1, 0, 0, 1]], np.int32)
    wp = {"e": jnp.asarray(e)}
    for slot in range(2 * k):
        wd = {"slot": jnp.asarray([slot], jnp.int32)}
        mm = float(np.asarray(
            wk.restricted_marginal_right(wc, wp, wd))[0, 0])
        if e[0, slot] == 1:
            assert mm < -RESTRICT_BIG / 2, (slot, mm)
        else:
            assert mm > RESTRICT_BIG / 2, (slot, mm)


# ---------------------------------------------------------------------------
# A/B: multicut rounding with triplet factors
# ---------------------------------------------------------------------------
def _tightened_multicut(seed):
    rng = np.random.default_rng(seed)
    h = w = 5
    s = Solver()
    mc = s.add_constructor(MulticutConstructor)
    idx = np.arange(h * w).reshape(h, w)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1),
        np.stack([idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()], axis=1)])
    costs = rng.normal(loc=0.2, scale=1.0, size=len(pairs))
    mc.add_edges(pairs, costs)
    eng = Engine(s.graph)
    for _ in range(3):
        eng.compute_pass("anisotropic")
    mc.tighten(eng, max_constraints=40, max_candidates=200)
    return s.graph, mc


@pytest.mark.parametrize("mode", ["anisotropic", "damped_uniform"])
def test_multicut_restricted_ab(mode):
    wins = ties = losses = 0
    n_consistent_r = n_consistent_mp = 0
    for seed in range(4):
        graph, mc = _tightened_multicut(seed)
        ub = {}
        for restricted in (False, True):
            eng = Engine(graph)
            for _ in range(4):
                eng.compute_pass(mode)
            lb = eng.lower_bound()
            prim = eng.compute_pass_and_primal(mode, Direction.forward,
                                               restricted=restricted)
            ok = eng.check_primal_consistency(prim)
            cost = eng.evaluate_primal(prim)
            ub[restricted] = cost
            if restricted:
                lb_r, n_consistent_r = lb, n_consistent_r + ok
            else:
                lb_mp, n_consistent_mp = lb, n_consistent_mp + ok
        assert lb_r == pytest.approx(lb_mp, abs=1e-4)  # duals untouched
        if ub[True] < ub[False] - 1e-6:
            wins += 1
        elif ub[False] < ub[True] - 1e-6:
            losses += 1
        else:
            ties += 1
    # restricted must make the interleaved rounding message-consistent
    # at least as often, and win in aggregate
    assert n_consistent_r >= n_consistent_mp
    assert n_consistent_r >= 3, f"restricted consistent on {n_consistent_r}/4"
    assert wins + ties >= losses, (wins, ties, losses)
