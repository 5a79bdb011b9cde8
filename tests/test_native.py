"""Native host library (csrc/lpmp_host.cpp) vs Python fallbacks and
reference-pinned behavior (test/min_cost_flow.cpp, graph.hxx,
lib/max_flow.hxx)."""
import numpy as np
import pytest

from lp_mp_tpu import native
from lp_mp_tpu.utils.maxflow import maxflow
from lp_mp_tpu.utils.mincostflow import solve_assignment


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_mcf_reference_instance(lib):
    # test/min_cost_flow.cpp:7-31 pinned flows/objective
    obj, flows = native.mcf_solve(
        6, [0, 0, 1, 2, 3, 3, 4, 4], [1, 2, 2, 4, 1, 5, 3, 5],
        [0] * 8, [4, 8, 5, 10, 8, 8, 8, 8], [1, 5, 0, 1, 1, 1, 0, 9],
        [10, 0, 0, 0, 0, -10])
    assert obj == pytest.approx(70.0)
    np.testing.assert_allclose(flows, [4, 6, 4, 10, 0, 8, 8, 2])


def test_mcf_infeasible_raises(lib):
    with pytest.raises(RuntimeError):
        native.mcf_solve(2, [0], [1], [0.0], [1.0], [1.0], [5.0, -5.0])


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_assignment_matches_python(seed, lib, monkeypatch):
    rng = np.random.default_rng(seed)
    costs = rng.normal(size=(5, 4))
    costs[rng.random((5, 4)) < 0.2] = np.inf
    slack = rng.normal(size=5) * 0.1
    m_native = solve_assignment(costs, slack)

    monkeypatch.setattr(native, "get_lib", lambda: None)
    m_py = solve_assignment(costs, slack)

    def cost_of(m):
        return sum(costs[i, j] if j >= 0 else slack[i] for i, j in enumerate(m))
    assert cost_of(m_native) == pytest.approx(cost_of(m_py))


def test_gaec_simple(lib):
    # attractive pair + repulsive third node
    labels = native.gaec(3, [0, 1, 0], [1, 2, 2], [2.0, -1.0, -1.0])
    assert labels[0] == labels[1]
    assert labels[2] != labels[0]


def test_maxflow_native_vs_fallback(lib, monkeypatch):
    rng = np.random.default_rng(1)
    n = 8
    edges = []
    for _ in range(20):
        u, v = rng.choice(n, size=2, replace=False)
        edges.append((int(u), int(v), float(rng.random() * 3), float(rng.random())))
    f1, side1 = maxflow(n, edges, 0, n - 1)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    f2, side2 = maxflow(n, edges, 0, n - 1)
    assert f1 == pytest.approx(f2)
    assert side1[0] and side2[0]
    assert not side1[n - 1] and not side2[n - 1]


def test_bfs_path_reference_semantics(lib):
    # test/shortest_path.cpp:32-45: threshold 0.5 -> direct edge;
    # threshold 1.5 -> the long way around
    from lp_mp_tpu.utils.graphs import Graph, bfs_path
    g = Graph(4, [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 2.0), (0, 3, 2.0)])
    b, p = bfs_path(g, 0, 1, threshold=0.5)
    assert p == [0, 1] and b == pytest.approx(1.0)
    b, p = bfs_path(g, 0, 1, threshold=1.5)
    assert p == [0, 3, 2, 1] and b == pytest.approx(2.0)
