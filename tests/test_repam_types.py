"""Reparametrization types (--reparametrizationType, LP_MP.h:527-530) and
inconsistent-region extraction (LP_MP.h:1638-1684).

Each update type must keep the dual bound monotone non-decreasing and reach
(at least) the quality of the shared update on a small grid MRF; partition
and overlapping_partition exercise the staged block passes."""
import numpy as np
import pytest

from lp_mp_tpu.config import Direction, ReparametrizationMode
from lp_mp_tpu.engine import Engine
from lp_mp_tpu.graph import FactorGraph
from lp_mp_tpu.models.mrf import MrfConstructor


def small_grid(h=3, w=3, L=3, seed=0, potts=False):
    rng = np.random.default_rng(seed)
    g = FactorGraph()
    mrf = MrfConstructor(g, pairwise_rep="potts" if potts else "dense")
    for _ in range(h * w):
        mrf.add_unary_factor(rng.normal(size=L))
    for r in range(h):
        for c in range(w):
            i = r * w + c
            if c + 1 < w:
                m = rng.normal(size=(L, L)) if not potts \
                    else 0.5 * (1 - np.eye(L))
                mrf.add_pairwise_factor(i, i + 1, m)
            if r + 1 < h:
                m = rng.normal(size=(L, L)) if not potts \
                    else 0.5 * (1 - np.eye(L))
                mrf.add_pairwise_factor(i, i + w, m)
    return g, mrf


@pytest.mark.parametrize("update_mode",
                         ["residual", "adaptive", "partition",
                          "overlapping_partition"])
def test_update_modes_monotone(update_mode):
    g, mrf = small_grid()
    if update_mode in ("partition", "overlapping_partition"):
        # two blocks: top half / bottom half of the grid variables
        us = mrf.unaries
        for a, b in zip(us[:4], us[1:5]):
            g.put_in_same_partition(a, b)
        for a, b in zip(us[5:], us[6:]):
            g.put_in_same_partition(a, b)
    eng = Engine(g, update_mode=update_mode)
    prev = eng.lower_bound()
    for _ in range(8):
        eng.compute_pass(ReparametrizationMode.anisotropic)
        lb = eng.lower_bound()
        assert lb >= prev - 1e-9, f"{update_mode} decreased bound"
        prev = lb

    # shared baseline on the same instance
    g2, _ = small_grid()
    ref = Engine(g2, update_mode="shared")
    for _ in range(8):
        ref.compute_pass(ReparametrizationMode.anisotropic)
    assert prev >= ref.lower_bound() - 0.1


def test_residual_reaches_shared_bound():
    g, _ = small_grid(seed=3)
    e = Engine(g, update_mode="residual")
    for _ in range(30):
        e.compute_pass(ReparametrizationMode.anisotropic)
    g2, _ = small_grid(seed=3)
    s = Engine(g2, update_mode="shared")
    for _ in range(30):
        s.compute_pass(ReparametrizationMode.anisotropic)
    assert e.lower_bound() >= s.lower_bound() - 1e-6


def test_mixed_weights_valid_and_monotone():
    g, _ = small_grid(seed=1)
    e = Engine(g)
    prev = e.lower_bound()
    for _ in range(5):
        e.compute_pass(ReparametrizationMode.mixed)
        lb = e.lower_bound()
        assert lb >= prev - 1e-9
        prev = lb


def test_inconsistent_mask_empty_on_chain():
    # a chain is solved exactly by one forward+backward sweep: the rounded
    # primal is optimal and consistent -> empty inconsistent region
    g = FactorGraph()
    mrf = MrfConstructor(g, pairwise_rep="dense")
    rng = np.random.default_rng(5)
    for _ in range(5):
        mrf.add_unary_factor(rng.normal(size=3))
    for i in range(4):
        mrf.add_pairwise_factor(i, i + 1, rng.normal(size=(3, 3)))
    e = Engine(g)
    for _ in range(10):
        e.compute_pass(ReparametrizationMode.anisotropic)
    prim = e.compute_pass_and_primal(ReparametrizationMode.damped_uniform,
                                     Direction.forward)
    assert e.check_primal_consistency(prim)
    assert abs(e.evaluate_primal(prim) - e.lower_bound()) < 1e-6
    mask = e.get_inconsistent_mask(prim)
    assert not mask.any()


def test_inconsistent_mask_flags_frustrated_cycle():
    # frustrated 4-cycle (test/graphical_model.cpp:232-246): LP bound 0,
    # integral optimum 1 -> rounding cannot be locally optimal everywhere
    g = FactorGraph()
    mrf = MrfConstructor(g, pairwise_rep="dense")
    for _ in range(4):
        mrf.add_unary_factor(np.zeros(2))
    eq = np.array([[0.0, 1.0], [1.0, 0.0]])
    ne = np.array([[1.0, 0.0], [0.0, 1.0]])
    mrf.add_pairwise_factor(0, 1, eq)
    mrf.add_pairwise_factor(1, 2, eq)
    mrf.add_pairwise_factor(2, 3, eq)
    mrf.add_pairwise_factor(0, 3, ne)
    e = Engine(g)
    for _ in range(20):
        e.compute_pass(ReparametrizationMode.anisotropic)
    prim = e.compute_pass_and_primal(ReparametrizationMode.damped_uniform,
                                     Direction.forward)
    assert e.evaluate_primal(prim) >= 1.0 - 1e-6
    mask = e.get_inconsistent_mask(prim)
    assert mask.any()
    # fattening only grows the region
    m2 = e.get_inconsistent_mask(prim, no_fatten_rounds=3)
    assert (m2 | mask).sum() == m2.sum() and m2.sum() >= mask.sum()
