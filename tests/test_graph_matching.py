"""Graph matching: parser, both constructions, bound parity with brute force
(reference surface: test/graph_matching.cpp)."""
import itertools

import numpy as np
import pytest

from lp_mp_tpu.config import Direction
from lp_mp_tpu.io.torresani import parse_torresani
from lp_mp_tpu.models.graph_matching import GraphMatchingConstructor
from lp_mp_tpu.solver import Solver
from lp_mp_tpu.visitors import StandardVisitor

# instance shaped like test/graph_matching.cpp:13-26 (Torresani et al format)
TORRESANI_INPUT = """c example of graph matching problem
p 3 2 4 2
a 0   0 0    1.0
a 1   1 0    -2.0
a 2   1 1    1.5
a 3   2 1    4.0
e     0 2    -0.5
e     1 3    0.5
n0 0 1
n0 1 2
n1 0 1
"""


def brute_force(inp):
    """Exact optimum by enumerating matchings over assignment choices."""
    per_left = [[] for _ in range(inp.n_left)]
    for aid, (i, j, c) in enumerate(inp.assignments):
        per_left[i].append(aid)
    pair_cost = {}
    for (a1, a2, c) in inp.edges:
        pair_cost[(a1, a2)] = pair_cost.get((a1, a2), 0.0) + c
    best = np.inf
    for choice in itertools.product(*[lst + [None] for lst in per_left]):
        used = [inp.assignments[a][1] for a in choice if a is not None]
        if len(used) != len(set(used)):
            continue
        v = sum(inp.assignments[a][2] for a in choice if a is not None)
        for (a1, a2), c in pair_cost.items():
            if a1 in choice and a2 in choice:
                v += c
        best = min(best, v)
    return best


def test_parse():
    inp = parse_torresani(TORRESANI_INPUT)
    assert (inp.n_left, inp.n_right) == (3, 2)
    assert len(inp.assignments) == 4
    assert inp.assignments[1] == (1, 0, -2.0)
    assert inp.edges == [(0, 2, -0.5), (1, 3, 0.5)]


@pytest.mark.parametrize("construction", ["left", "both"])
def test_reference_instance_solved(construction):
    inp = parse_torresani(TORRESANI_INPUT)
    opt = brute_force(inp)
    s = Solver(visitor=StandardVisitor(max_iter=20))
    gm = s.add_constructor(GraphMatchingConstructor, construction=construction)
    gm.construct(inp)
    lb = s.solve()
    assert lb <= opt + 1e-6
    assert lb == pytest.approx(opt, abs=1e-4)  # instance is LP-tight

    prim = gm.compute_primal(s.engine)
    cost = s.engine.evaluate_primal(prim)
    assert cost == pytest.approx(opt, abs=1e-6)
    match = gm.matching(s.engine, prim)
    assert list(match) == [-1, 0, -1]


@pytest.mark.parametrize("construction", ["left", "both"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_instances(construction, seed):
    rng = np.random.default_rng(seed)
    n0 = n1 = 3
    lines = [f"p {n0} {n1} {n0 * n1} 0"]
    aid = 0
    aids = {}
    for i in range(n0):
        for j in range(n1):
            c = float(rng.normal())
            lines.append(f"a {aid} {i} {j} {c}")
            aids[(i, j)] = aid
            aid += 1
    # a few pairwise terms between assignments of distinct left nodes
    n_e = 0
    for _ in range(4):
        i1, i2 = rng.choice(n0, size=2, replace=False)
        j1, j2 = rng.integers(0, n1, size=2)
        if j1 == j2:
            continue
        c = float(rng.normal() * 0.5)
        lines.append(f"e {aids[(i1, j1)]} {aids[(i2, j2)]} {c}")
        n_e += 1
    inp = parse_torresani("\n".join(lines))
    opt = brute_force(inp)

    s = Solver(visitor=StandardVisitor(max_iter=60))
    gm = s.add_constructor(GraphMatchingConstructor, construction=construction)
    gm.construct(inp)
    lb = s.solve()
    assert lb <= opt + 1e-6  # dual bound is valid

    prim = gm.compute_primal(s.engine)
    cost = s.engine.evaluate_primal(prim)
    assert np.isfinite(cost)
    assert cost >= opt - 1e-9  # feasible matching
