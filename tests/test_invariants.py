"""Algebraic invariants the reference asserts inside its hot path
(factors_messages.hxx:694-711, 820-831, 2457-2464, 2793-2812):

1. message idempotence: after a full receive (omega=1), the sender's
   marginal over the message variables is zero;
2. each receive/send never decreases the 2-factor lower bound;
3. omega validity (sum <= 1, >= 0) for every mode and direction.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lp_mp_tpu import Engine
from lp_mp_tpu.config import Direction, ReparametrizationMode
from lp_mp_tpu import schedule as sched
from lp_mp_tpu.factors.simplex import PAIRWISE_SIMPLEX, UNARY_SIMPLEX
from lp_mp_tpu.messages.simplex_marginalization import UNARY_PAIRWISE_1
from tests.test_engine_parity import random_mrf


def test_receive_idempotent():
    rng = np.random.default_rng(0)
    ub = {k: jnp.asarray(v) for k, v in UNARY_SIMPLEX.build([rng.normal(size=3)]).items()}
    pb = {k: jnp.asarray(v) for k, v in
          PAIRWISE_SIMPLEX.build([rng.normal(size=(3, 4))]).items()}
    idx = np.array([0])
    mt = UNARY_PAIRWISE_1
    delta = mt.marginal_right(pb, {})
    pb = mt.repam_right(pb, idx, -delta, {})
    ub = mt.repam_left(ub, idx, delta, {})
    # second marginal must be zero (test_send_message_* semantics)
    again = np.asarray(mt.marginal_right(pb, {}))
    assert np.allclose(again, 0.0, atol=1e-12)


def test_receive_and_send_monotone_pairwise_bound():
    rng = np.random.default_rng(1)
    ub = {k: jnp.asarray(v) for k, v in UNARY_SIMPLEX.build([rng.normal(size=3)]).items()}
    pb = {k: jnp.asarray(v) for k, v in
          PAIRWISE_SIMPLEX.build([rng.normal(size=(3, 3))]).items()}
    idx = np.array([0])
    mt = UNARY_PAIRWISE_1

    def lb():
        return float(UNARY_SIMPLEX.lower_bound(ub)[0] + PAIRWISE_SIMPLEX.lower_bound(pb)[0])

    before = lb()
    delta = mt.marginal_right(pb, {})
    pb = mt.repam_right(pb, idx, -delta, {})
    ub = mt.repam_left(ub, idx, delta, {})
    after_recv = lb()
    assert after_recv >= before - 1e-12
    # send half the unary's mass back
    delta = 0.5 * mt.marginal_left(ub, {})
    ub = mt.repam_left(ub, idx, -delta, {})
    pb = mt.repam_right(pb, idx, delta, {})
    assert lb() >= after_recv - 1e-12


@pytest.mark.parametrize("mode", list(ReparametrizationMode))
def test_omega_validity_all_modes(mode):
    s, _ = random_mrf(5, n=9, extra_edges=5)
    e = Engine(s.graph, schedule_mode="wavefront", use_jit=True)
    for d in (Direction.forward, Direction.backward):
        w = sched.compute_weights(mode, e.orders[d], e.graph.n_factors,
                                  e.descs, e.updated)
        assert sched.omega_valid(w, e.graph.n_factors, e.descs)


def test_pass_idempotent_at_fixed_point():
    # after convergence, further anisotropic passes keep the bound constant
    s, _ = random_mrf(9, n=6, extra_edges=0)  # tree -> converges fast
    e = Engine(s.graph, schedule_mode="wavefront", use_jit=True)
    for _ in range(30):
        e.compute_pass("anisotropic")
    lb1 = e.lower_bound()
    e.compute_pass("anisotropic")
    assert abs(e.lower_bound() - lb1) < 1e-9
