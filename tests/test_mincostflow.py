"""Min-cost flow (utils.mincostflow) vs the reference solver's pinned
behavior (test/min_cost_flow.cpp) and brute-force assignment oracles."""
import itertools

import numpy as np
import pytest

from lp_mp_tpu.utils.mincostflow import MinCostFlow, solve_assignment


def test_reference_instance():
    # test/min_cost_flow.cpp:7-31 — 6 nodes, 8 arcs, excess 10 at node 0.
    mcf = MinCostFlow(6)
    e = []
    e.append(mcf.add_edge(0, 1, 0, 4, 1))
    e.append(mcf.add_edge(0, 2, 0, 8, 5))
    e.append(mcf.add_edge(1, 2, 0, 5, 0))
    e.append(mcf.add_edge(2, 4, 0, 10, 1))
    e.append(mcf.add_edge(3, 1, 0, 8, 1))
    e.append(mcf.add_edge(3, 5, 0, 8, 1))
    e.append(mcf.add_edge(4, 3, 0, 8, 0))
    e.append(mcf.add_edge(4, 5, 0, 8, 9))
    mcf.add_node_excess(0, 10)
    mcf.add_node_excess(5, -10)
    assert mcf.solve() == pytest.approx(70.0)
    flows = [mcf.get_flow(i) for i in e]
    assert flows == pytest.approx([4, 6, 4, 10, 0, 8, 8, 2])


def test_lower_bounds():
    # force 2 units through a costly arc via lower bound
    mcf = MinCostFlow(3)
    a = mcf.add_edge(0, 1, 0, 5, 1)
    b = mcf.add_edge(0, 2, 2, 5, 10)
    c = mcf.add_edge(1, 2, 0, 5, 1)
    mcf.add_node_excess(0, 4)
    mcf.add_node_excess(2, -4)
    obj = mcf.solve()
    assert mcf.get_flow(b) >= 2
    assert obj == pytest.approx(2 * 10 + 2 * 2)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_assignment_vs_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n0, n1 = 4, 3
    costs = rng.normal(size=(n0, n1))
    costs[rng.random((n0, n1)) < 0.25] = np.inf
    slack = rng.normal(size=n0) * 0.1

    match = solve_assignment(costs, slack)
    # feasibility
    used = [j for j in match if j >= 0]
    assert len(used) == len(set(used))
    got = sum(costs[i, j] if j >= 0 else slack[i] for i, j in enumerate(match))

    best = np.inf
    for assign in itertools.product(*[list(range(n1)) + [-1]] * n0):
        used = [j for j in assign if j >= 0]
        if len(used) != len(set(used)):
            continue
        v = sum(costs[i, j] if j >= 0 else slack[i] for i, j in enumerate(assign))
        best = min(best, v)
    assert got == pytest.approx(best)
