"""Grid Potts model vs the generic engine (red/black coloring schedule).

The specialized shifted-slice implementation must produce the same dual
trajectory as the generic gather/scatter engine compiled with
schedule_mode='coloring' on the same instance, for every supported mode.
"""
import numpy as np
import pytest

from lp_mp_tpu import Engine, Solver
from lp_mp_tpu.config import Direction
from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid
from lp_mp_tpu.models.mrf import MrfConstructor


def build_generic(u, hc, vc):
    H, W, L = u.shape
    s = Solver(schedule_mode="coloring", use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="potts")
    for r in range(H):
        for c in range(W):
            mrf.add_unary_factor(u[r, c])
    for r in range(H):
        for c in range(W):
            if c + 1 < W:
                mrf.add_pairwise_factor(r * W + c, r * W + c + 1,
                                        hc[r, c] * (1 - np.eye(L)))
            if r + 1 < H:
                mrf.add_pairwise_factor(r * W + c, (r + 1) * W + c,
                                        vc[r, c] * (1 - np.eye(L)))
    return s, s.build_engine()


@pytest.mark.parametrize("mode", ["anisotropic", "uniform", "damped_uniform"])
def test_grid_matches_generic_engine(mode):
    u, hc, vc = random_grid(4, 4, 3, seed=5)
    grid = GridPottsModel(u, hc, vc)
    _, eng = build_generic(u, hc, vc)
    lbs_grid, lbs_gen = [], []
    for _ in range(4):
        grid.iterate(mode)
        eng.compute_pass(mode)
        lbs_grid.append(grid.lower_bound())
        lbs_gen.append(eng.lower_bound())
    assert np.allclose(lbs_grid, lbs_gen, atol=1e-8), (lbs_grid, lbs_gen)


def test_grid_monotone_and_gap():
    u, hc, vc = random_grid(8, 8, 3, seed=6)
    grid = GridPottsModel(u, hc, vc)
    lbs = [grid.lower_bound()]
    for _ in range(30):
        grid.iterate("anisotropic")
        lbs.append(grid.lower_bound())
    assert all(b >= a - 1e-9 for a, b in zip(lbs, lbs[1:]))
    x, ub = grid.round_primal("damped_uniform")
    assert ub >= lbs[-1] - 1e-9
    assert x.shape == (8, 8)


def test_run_fast_matches_iterate_anisotropic():
    # fused schedule = same coordinate updates, boundary shifted by one
    # black send; after the same number of rounds the lower bounds agree
    # to the tolerance of the extra half-phase
    u, hc, vc = random_grid(6, 6, 3, seed=7)
    a = GridPottsModel(u, hc, vc)
    b = GridPottsModel(u, hc, vc)
    a.iterate("anisotropic", n=20)
    b.run_fast(20, "anisotropic")
    lb_a, lb_b = a.lower_bound(), b.lower_bound()
    # both converge to the same fixed point
    assert abs(lb_a - lb_b) < 1e-5, (lb_a, lb_b)


def test_run_fast_uniform_exact():
    u, hc, vc = random_grid(5, 5, 2, seed=8)
    a = GridPottsModel(u, hc, vc)
    b = GridPottsModel(u, hc, vc)
    a.iterate("damped_uniform", n=7)
    b.run_fast(7, "damped_uniform")
    assert abs(a.lower_bound() - b.lower_bound()) < 1e-9


def test_single_label_edge_cases():
    u, hc, vc = random_grid(3, 3, 1, seed=9)
    grid = GridPottsModel(u, hc, vc)
    grid.iterate("anisotropic", n=2)
    lb = grid.lower_bound()
    # L=1: bound = total cost, diff never paid
    expect = u.sum()
    assert abs(lb - expect) < 1e-4
