"""Tightening via triplet factors (test/graphical_model.cpp:140-204).

Frustrated 3-cycles have LP bound 0; adding the triplet factor closes the
gap to the integral optimum 1.0.
"""
import numpy as np

from lp_mp_tpu import Solver, StandardTighteningVisitor, StandardVisitor
from lp_mp_tpu.models.mrf import MrfConstructor

NEG_POTTS = np.array([[1.0, 0.0], [0.0, 1.0]])
POS_POTTS = np.array([[0.0, 1.0], [1.0, 0.0]])

NEG_POTTS_23 = np.array([[1.0, 0.0, 2.0], [0.0, 1.0, 2.0]])
POS_POTTS_24 = np.array([[0.0, 1.0, 2.0, 2.0], [1.0, 0.0, 2.0, 2.0]])
POS_POTTS_34 = np.array([[0.0, 1.0, 2.0, 2.0],
                         [1.0, 0.0, 2.0, 2.0],
                         [2.0, 2.0, 2.0, 2.0]])


def _binary_triangle(mrf):
    for _ in range(3):
        mrf.add_unary_factor(np.zeros(2))
    mrf.add_pairwise_factor(0, 1, NEG_POTTS)
    mrf.add_pairwise_factor(0, 2, POS_POTTS)
    mrf.add_pairwise_factor(1, 2, POS_POTTS)


def _multilabel_triangle(mrf):
    mrf.add_unary_factor(np.zeros(2))
    mrf.add_unary_factor(np.zeros(3))
    mrf.add_unary_factor(np.zeros(4))
    mrf.add_pairwise_factor(0, 1, NEG_POTTS_23)
    mrf.add_pairwise_factor(0, 2, POS_POTTS_24)
    mrf.add_pairwise_factor(1, 2, POS_POTTS_34)


def test_frustrated_triangle_without_tightening():
    s = Solver(visitor=StandardVisitor(max_iter=30), use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    _binary_triangle(mrf)
    lb = s.solve()
    assert abs(lb - 0.0) <= 1e-8


def test_binary_triplet_explicit():
    s = Solver(visitor=StandardVisitor(max_iter=100), use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    _binary_triangle(mrf)
    mrf.add_tightening_triplet(0, 1, 2)
    lb = s.solve()
    assert abs(lb - 1.0) <= 1e-8, lb


def test_multilabel_triplet_explicit():
    s = Solver(visitor=StandardVisitor(max_iter=100), use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    _multilabel_triangle(mrf)
    mrf.add_tightening_triplet(0, 1, 2)
    lb = s.solve()
    assert abs(lb - 1.0) <= 1e-8, lb


def test_triplet_search():
    # solver finds the frustrated triangle itself (graphical_model.cpp:191-204)
    s = Solver(visitor=StandardTighteningVisitor(
        max_iter=100, tighten=True, tighten_iteration=5, tighten_interval=10,
        tighten_constraints_max=1,
        tighten_reparametrization="damped_uniform"), use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    _multilabel_triangle(mrf)
    lb = s.solve()
    assert abs(lb - 1.0) <= 1e-8, lb
    assert len(mrf.triplets) == 1
