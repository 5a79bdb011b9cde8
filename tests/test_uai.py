"""UAI parsing + the chain MRF known optimum (test/graphical_model.cpp:45-61)."""
import numpy as np

from lp_mp_tpu import Solver, StandardVisitor
from lp_mp_tpu.io.uai import parse_and_build, parse_uai
from lp_mp_tpu.models.mrf import MrfConstructor, mrf_labeling

UAI_TEST_INPUT = """MARKOV
3
2 2 3
3
1 0
2 0 1
2 1 2

2
 0.436 0.564

4
 0.128 0.872
 0.920 0.080

6
 0.210 0.333 0.457
 0.811 0.000 0.189
"""


def test_parse():
    p = parse_uai(UAI_TEST_INPUT)
    assert p["n_vars"] == 3
    assert p["cardinalities"] == [2, 2, 3]
    assert p["scopes"] == [[0], [0, 1], [1, 2]]
    # column-major table layout (reference parser behavior)
    t = p["tables"][1]
    assert t[0, 0] == 0.128 and t[1, 0] == 0.872
    assert t[0, 1] == 0.920 and t[1, 1] == 0.080


def _solve(schedule_mode, pairwise_rep):
    s = Solver(visitor=StandardVisitor(
        max_iter=100,
        standard_reparametrization="anisotropic",
        rounding_reparametrization="anisotropic",
        lower_bound_computation_interval=1,
        primal_computation_interval=5),
        schedule_mode=schedule_mode, use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep=pairwise_rep)
    parse_and_build(UAI_TEST_INPUT, mrf)
    lb = s.solve()
    return s, mrf, lb


def test_chain_lower_bound_0564():
    for mode in ("sequential", "wavefront", "coloring"):
        s, mrf, lb = _solve(mode, "dense")
        assert abs(lb - 0.564) < 1e-8, (mode, lb)
        assert abs(s.primal_cost() - 0.564) < 1e-8


def test_chain_labeling():
    s, mrf, lb = _solve("wavefront", "dense")
    x = mrf_labeling(mrf, s.engine, s.best_primal)
    assert x.tolist() == [0, 0, 2]
