"""General odd-k-wheel separation (VERDICT r2 item 8).

Pins:
- the k-wheel cut-config table equals brute-force partition enumeration;
- the membership-pattern lower bound and per-slot marginals match a brute
  force over the factor's (relaxed) feasible set;
- the canonical W5 instance: cycle + K4 separation stalls strictly below
  what adding the 5-wheel factor reaches (odd-wheel facets beyond the
  cycle relaxation; no 4-clique exists so the K4 path cannot fire).
"""
import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from lp_mp_tpu import Solver
from lp_mp_tpu.engine import Engine
from lp_mp_tpu.factors.multicut import (_wheel_cut_configs, _wheel_tables,
                                        wheel_k_type)
from lp_mp_tpu.models.multicut import MulticutConstructor


def _relaxed_configs(k):
    """The factor's feasible set: membership patterns x independent free
    rim choices (no all-hubless single-cut exclusion)."""
    A, forced_cut, both_one, free = _wheel_tables(k)
    out = set()
    for p in range(A.shape[0]):
        spoke = tuple(1 - A[p])
        fidx = np.nonzero(free[p])[0]
        base = forced_cut[p].astype(np.int64)
        for bits in itertools.product((0, 1), repeat=len(fidx)):
            rim = base.copy()
            rim[fidx] = bits
            out.add(spoke + tuple(rim))
    return np.array(sorted(out), dtype=np.int64)


def test_wheel_configs_match_partition_enumeration():
    k = 5
    edges = [(0, i + 1) for i in range(k)] + \
            [(i + 1, (i + 1) % k + 1) for i in range(k)]
    seen = set()
    for lbl in itertools.product(range(3), repeat=k + 1):
        seen.add(tuple(int(lbl[a] != lbl[b]) for a, b in edges))
    # 3 block ids suffice? no — use k+1 to be exhaustive
    for lbl in itertools.product(range(k + 1), repeat=k):
        full = (0,) + lbl
        seen.add(tuple(int(full[a] != full[b]) for a, b in edges))
    cfg = {tuple(r) for r in _wheel_cut_configs(k)}
    assert cfg == seen


def _config_vals(sp, rim, tri, R):
    """Brute-force cost of every relaxed config incl. hub-triangle slots."""
    from lp_mp_tpu.factors.multicut import TRIPLET_PATTERNS
    k = sp.shape[1]
    w = np.concatenate([sp, rim], axis=1)               # [F, 2k]
    vals = w @ R.T                                      # [F, C]
    for ci, row in enumerate(R.astype(np.int64)):
        for i in range(k):
            bits = (row[i], row[(i + 1) % k], row[k + i])
            if any(bits):
                r = int(np.nonzero((TRIPLET_PATTERNS ==
                                    np.asarray(bits)).all(axis=1))[0][0])
                vals[:, ci] += tri[:, i, r]
    return vals


def test_wheel_bound_and_marginals_match_bruteforce():
    k = 5
    wt = wheel_k_type(k)
    rng = np.random.default_rng(0)
    sp = rng.normal(size=(7, k))
    rim = rng.normal(size=(7, k))
    tri = rng.normal(size=(7, k, 4)) * 0.5
    costs = {"sp": jnp.asarray(sp), "rim": jnp.asarray(rim),
             "tri": jnp.asarray(tri)}
    R = _relaxed_configs(k).astype(np.float64)          # [C, 2k]
    vals = _config_vals(sp, rim, tri, R)                # [F, C]
    np.testing.assert_allclose(np.asarray(wt.lower_bound(costs)),
                               vals.min(axis=1), rtol=1e-5, atol=1e-5)
    marg = np.asarray(wt.slot_marginals(costs))         # [F, 2k]
    for s in range(2 * k):
        mc = vals[:, R[:, s] == 1].min(axis=1)
        mu = vals[:, R[:, s] == 0].min(axis=1)
        np.testing.assert_allclose(marg[:, s], mc - mu,
                                   rtol=1e-5, atol=1e-5)
    # triangle pattern marginals vs brute force
    from lp_mp_tpu.factors.multicut import TRIPLET_PATTERNS
    tm = np.asarray(wt.tri_marginals(costs))            # [F, k, 4]
    Ri = R.astype(np.int64)
    for i in range(k):
        bits_all = np.stack([Ri[:, i], Ri[:, (i + 1) % k], Ri[:, k + i]],
                            axis=1)
        unc = vals[:, (bits_all == 0).all(axis=1)].min(axis=1)
        for r in range(4):
            sel = (bits_all == TRIPLET_PATTERNS[r]).all(axis=1)
            np.testing.assert_allclose(
                tm[:, i, r], vals[:, sel].min(axis=1) - unc,
                rtol=1e-5, atol=1e-5, err_msg=f"i={i} r={r}")
    # strict configs can only raise the min (relaxation is one-sided)
    S = _wheel_cut_configs(k).astype(np.float64)
    sv = _config_vals(sp, rim, tri, S)
    assert (sv.min(axis=1) >= vals.min(axis=1) - 1e-9).all()


def _w5_solver():
    """W5: hub 0, rim 1..5; attractive spokes (+1), repulsive rim (-1).
    Integral optimum -2 (hub joins the independent rim pair {v1, v3}; all
    rim edges cut); cycle relaxation (triangles) -2.5 — the odd-wheel
    inequality sum(x_rim) - sum(x_spoke) <= 2 cuts that fractional vertex."""
    s = Solver()
    mc = s.add_constructor(MulticutConstructor)
    rim = [1, 2, 3, 4, 5]
    for v in rim:
        mc.add_edge(0, v, 1.0)
    for i in range(5):
        mc.add_edge(rim[i], rim[(i + 1) % 5], -1.0)
    return s, mc


def _converge(s, mc, iters=200):
    eng = Engine(s.graph)
    for _ in range(iters):
        eng.compute_pass("anisotropic")
    return eng


def test_w5_cycle_and_k4_stall_wheel5_improves():
    # Phase 1: cycle separation adds the hub triangles, then stalls at the
    # cycle-relaxation value -2.5 (fractional x_spoke=1/2, x_rim=1 vertex)
    s, mc = _w5_solver()
    eng = _converge(s, mc)
    assert eng.lower_bound() == pytest.approx(-5.0, abs=1e-4)
    while mc.tighten_cycles(eng, 10) > 0:
        eng = _converge(s, mc, iters=400)
    assert len(mc.triplets) == 5          # the five hub triangles
    # K4 separation is dry at the cycle fixed point (no positive-gain K4)
    assert mc.tighten_odd_wheels(eng, 10) == 0
    lb_stalled = eng.lower_bound()
    assert lb_stalled == pytest.approx(-2.5, abs=0.05)

    # Phase 2: general odd-wheel separation finds the 5-wheel around hub 0
    n = mc.tighten_wheels_general(eng, max_constraints=4)
    assert n >= 1
    assert any(len(rim) == 5 and center == 0
               for (center, *_), (_, rim) in mc.wheels_k.items())
    eng3 = Engine(s.graph)
    # carry duals over (Solver.build_engine does this; do it by hand here)
    for name, block in eng.state.items():
        for key, v in block.items():
            sl = tuple(slice(0, d) for d in v.shape)
            eng3.state[name][key] = eng3.state[name][key].at[sl].set(v)
    for _ in range(600):
        eng3.compute_pass("anisotropic")
    lb_wheel = eng3.lower_bound()
    assert lb_wheel > lb_stalled + 0.2, (lb_stalled, lb_wheel)
    assert lb_wheel <= -2.0 + 1e-5     # still a valid bound (opt = -2)


def test_w5_through_solver_tighten():
    """Solver.solve with tightening enabled escapes the -2.5 cycle stall
    and rounds the exact optimum -2."""
    from lp_mp_tpu.visitors import StandardTighteningVisitor
    s, mc = _w5_solver()
    s.visitor = StandardTighteningVisitor(
        max_iter=300, tighten=True, tighten_iteration=30,
        tighten_interval=30, tighten_constraints_max=10)
    lb = s.solve()
    assert any(len(rim) == 5 for _, (_, rim) in mc.wheels_k.items())
    assert lb > -2.3, lb
    assert s.primal_cost() == pytest.approx(-2.0, abs=1e-3)
    assert s.primal_cost() >= lb - 1e-4


def test_wheel_lp_export_and_exact_oracle():
    """The wheel-k lp_vars/lp_coupling hooks feed the LP/ILP oracles: the
    LP relaxation upper-bounds the DBCA bound and the exact ILP recovers
    the integral optimum -2 through the wheel-augmented graph."""
    from lp_mp_tpu.io.ilp import ilp_round
    from lp_mp_tpu.io.lp_export import solve_lp_relaxation
    s, mc = _w5_solver()
    mc.add_odd_wheel_k(0, (1, 2, 3, 4, 5))
    eng = _converge(s, mc, iters=100)
    lb = eng.lower_bound()
    lp = solve_lp_relaxation(eng)
    assert lp >= lb - 1e-4, (lb, lp)
    prim, obj = ilp_round(eng)
    assert prim is not None and obj == pytest.approx(-2.0, abs=1e-5)
    assert eng.check_primal_consistency(prim)


def test_wheel_primal_validity():
    k = 5
    wt = wheel_k_type(k)
    rng = np.random.default_rng(2)
    sp = rng.normal(size=(1, k))
    rim = rng.normal(size=(1, k))
    costs = {"sp": jnp.asarray(sp), "rim": jnp.asarray(rim),
             "tri": jnp.zeros((1, k, 4))}
    # valid: all nodes one block
    e = jnp.zeros((1, 2 * k), jnp.int32)
    assert float(wt.evaluate_primal(costs, {"e": e})[0]) == pytest.approx(0.0)
    # invalid: hub-less rim with exactly one cut
    e = jnp.zeros((1, 2 * k), jnp.int32).at[0, :k].set(1).at[0, k].set(1)
    assert np.isinf(float(wt.evaluate_primal(costs, {"e": e})[0]))
    # valid: hub-less rim all cut (every rim node its own block)
    e = jnp.ones((1, 2 * k), jnp.int32)
    val = float(wt.evaluate_primal(costs, {"e": e})[0])
    assert val == pytest.approx(float(sp.sum() + rim.sum()), rel=1e-5)
