"""Message marginalization semantics.

Pins the exact values of test/simplex_marginalization.cpp:26-41 and the
Potts-vs-dense equivalence of test/potts_factor.cpp:21-65.
"""
import jax.numpy as jnp
import numpy as np

from lp_mp_tpu.factors.potts import PAIRWISE_POTTS, PairwisePottsType
from lp_mp_tpu.factors.simplex import PAIRWISE_SIMPLEX
from lp_mp_tpu.messages.simplex_marginalization import (UNARY_PAIRWISE_1,
                                                        UNARY_PAIRWISE_2)

COST_PAIRWISE = np.array([[0.1, 0.2, 0.05],
                          [0.3, 0.001, 0.2],
                          [-0.3, -0.001, -0.2],
                          [0.3, 0.001, 0.2]])


def test_marginalize_pairwise_right():
    # leftMessage.send_message_to_left -> row minima (marg accumulates -m)
    block = PAIRWISE_SIMPLEX.build([COST_PAIRWISE])
    blockj = {k: jnp.asarray(v) for k, v in block.items()}
    m = np.asarray(UNARY_PAIRWISE_1.marginal_right(blockj, {}))[0]
    # expected marg = -m with marg[0]=-0.05, [1]=-0.001, [2]=0.3, [3]=-0.001
    assert np.allclose(m, [0.05, 0.001, -0.3, 0.001])


def test_marginalize_pairwise_left():
    block = PAIRWISE_SIMPLEX.build([COST_PAIRWISE])
    blockj = {k: jnp.asarray(v) for k, v in block.items()}
    m = np.asarray(UNARY_PAIRWISE_2.marginal_right(blockj, {}))[0]
    assert np.allclose(m, [-0.3, -0.001, -0.2])


def _dense_potts(L, diff):
    return diff * (1.0 - np.eye(L))


def _check_potts_equal(pb, db):
    pbj = {k: jnp.asarray(v) for k, v in pb.items()}
    dbj = {k: jnp.asarray(v) for k, v in db.items()}
    lb_p = np.asarray(PAIRWISE_POTTS.lower_bound(pbj))
    lb_d = np.asarray(PAIRWISE_SIMPLEX.lower_bound(dbj))
    assert np.allclose(lb_p, lb_d)
    m1_p = np.asarray(PairwisePottsType.marginal(pbj, 1))
    m1_d = np.asarray(jnp.min(dbj["c"], axis=2))
    assert np.allclose(m1_p, m1_d)
    m2_p = np.asarray(PairwisePottsType.marginal(pbj, 2))
    m2_d = np.asarray(jnp.min(dbj["c"], axis=1))
    assert np.allclose(m2_p, m2_d)


def test_potts_vs_dense():
    for diff in (1.0, -1.0):
        pb = PAIRWISE_POTTS.build([(3, diff)])
        db = PAIRWISE_SIMPLEX.build([_dense_potts(3, diff)])
        _check_potts_equal(pb, db)


def test_potts_vs_dense_with_messages():
    # reparametrization slots msg1/msg2 (test/potts_factor.cpp:50-55)
    msg1 = np.array([-0.1, 0.5, 0.8])
    msg2 = np.array([1.5, 1.0, 0.0])
    for diff in (1.0, -1.0):
        pb = PAIRWISE_POTTS.build([(3, diff)])
        pb["msg1"][0] += msg1
        pb["msg2"][0] += msg2
        dense = _dense_potts(3, diff) + msg1[:, None] + msg2[None, :]
        db = PAIRWISE_SIMPLEX.build([dense])
        _check_potts_equal(pb, db)


def test_potts_random_batch():
    rng = np.random.default_rng(3)
    for L in (2, 3, 5, 8):
        diffs = rng.normal(size=4)
        pb = PAIRWISE_POTTS.build([(L, d) for d in diffs])
        m1 = rng.normal(size=(4, L))
        m2 = rng.normal(size=(4, L))
        pb["msg1"] += m1
        pb["msg2"] += m2
        dense = [d * (1 - np.eye(L)) + a[:, None] + b[None, :]
                 for d, a, b in zip(diffs, m1, m2)]
        db = PAIRWISE_SIMPLEX.build(dense)
        _check_potts_equal(pb, db)
