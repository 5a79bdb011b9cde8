"""SRMP weight computation against hand-derived values (LP_MP.h:1230-1449)."""
import numpy as np

from lp_mp_tpu import Solver
from lp_mp_tpu.config import Direction, ReparametrizationMode
from lp_mp_tpu.models.mrf import MrfConstructor
from lp_mp_tpu import schedule as sched


def _chain(n, L=2, schedule_mode="wavefront"):
    s = Solver(schedule_mode=schedule_mode, use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    rng = np.random.default_rng(0)
    for _ in range(n):
        mrf.add_unary_factor(rng.normal(size=L))
    for i in range(n - 1):
        mrf.add_pairwise_factor(i, i + 1, rng.normal(size=(L, L)))
    s.build_engine()
    return s, mrf


def _weights_by_message(engine, mode, direction):
    w = sched.compute_weights(ReparametrizationMode.convert(mode),
                              engine.orders[direction], engine.graph.n_factors,
                              engine.descs, engine.updated)
    return w


def test_chain_anisotropic_forward():
    s, mrf = _chain(4)
    e = s.engine
    w = _weights_by_message(e, "anisotropic", Direction.forward)
    # message list: for each pairwise p(i,i+1): msg(u_i -> p) then msg(u_{i+1} -> p)
    # SRMP on a chain: interior unary sends omega=1 forward; receives from behind.
    # forward message of u_i (to p(i,i+1)) is message index 2*i
    n_msgs = len(e.descs)
    assert n_msgs == 6
    for i in range(3):
        fwd = 2 * i       # u_i -> p(i,i+1), side 1
        bwd = 2 * i + 1   # u_{i+1} -> p(i,i+1), side 2
        assert w.omega_left[fwd] == 1.0, (i, w.omega_left)
        assert w.omega_left[bwd] == 0.0
        assert not w.recv_left[fwd]   # u_i does not receive from the factor ahead
        assert w.recv_left[bwd]       # u_{i+1} receives from behind
    assert sched.omega_valid(w, e.graph.n_factors, e.descs)


def test_chain_uniform_weights():
    s, mrf = _chain(4)
    e = s.engine
    w = _weights_by_message(e, "uniform", Direction.forward)
    # interior unaries have 2 send messages -> 1/2 each; endpoints 1 -> 1.0
    assert w.omega_left[0] == 1.0           # u_0 single message
    assert w.omega_left[1] == 0.5           # u_1 side
    assert w.omega_left[2] == 0.5
    assert np.all(w.recv_left[: ])          # full receive mask
    wd = _weights_by_message(e, "damped_uniform", Direction.forward)
    assert wd.omega_left[0] == 0.5          # 1/(1+1)
    assert abs(wd.omega_left[1] - 1.0 / 3.0) < 1e-12


def test_grid_anisotropic_interior():
    # 3x3 grid, row-major: interior unary sends 1/2 to right and down factors
    s = Solver(schedule_mode="wavefront", use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    rng = np.random.default_rng(1)
    H = W = 3
    for _ in range(H * W):
        mrf.add_unary_factor(rng.normal(size=2))
    def vid(r, c):
        return r * W + c
    msg_of = {}
    for r in range(H):
        for c in range(W):
            if c + 1 < W:
                mrf.add_pairwise_factor(vid(r, c), vid(r, c + 1), rng.normal(size=(2, 2)))
            if r + 1 < H:
                mrf.add_pairwise_factor(vid(r, c), vid(r + 1, c), rng.normal(size=(2, 2)))
    s.build_engine()
    e = s.engine
    w = _weights_by_message(e, "anisotropic", Direction.forward)
    acc = np.zeros(e.graph.n_factors)
    for i, d in enumerate(e.descs):
        acc[d.left] += w.omega_left[i]
        acc[d.right] += w.omega_right[i]
    # every updated unary except the last sends total mass 1
    center = mrf.unaries[vid(1, 1)].fid
    assert abs(acc[center] - 1.0) < 1e-12
    last = mrf.unaries[vid(2, 2)].fid
    assert acc[last] == 0.0
    # interior sends 1/2 per forward edge: check the two outgoing messages
    sends = [w.omega_left[i] for i, d in enumerate(e.descs) if d.left == center]
    assert sorted(sends) == [0.0, 0.0, 0.5, 0.5]


def test_grid_wavefront_phases():
    # anti-diagonal wavefront: phases = 2*W - 1 on a WxW grid, red-black
    # coloring mode: 2 phases
    s = Solver(schedule_mode="wavefront", use_jit=True)
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    rng = np.random.default_rng(1)
    H = W = 4
    for _ in range(H * W):
        mrf.add_unary_factor(rng.normal(size=2))
    for r in range(H):
        for c in range(W):
            if c + 1 < W:
                mrf.add_pairwise_factor(r * W + c, r * W + c + 1, rng.normal(size=(2, 2)))
            if r + 1 < H:
                mrf.add_pairwise_factor(r * W + c, (r + 1) * W + c, rng.normal(size=(2, 2)))
    e = s.build_engine()
    assert len(e.phases[Direction.forward]) == 2 * W - 1

    s2 = Solver(schedule_mode="coloring", use_jit=True)
    mrf2 = s2.add_constructor(MrfConstructor, pairwise_rep="dense")
    for _ in range(H * W):
        mrf2.add_unary_factor(rng.normal(size=2))
    for r in range(H):
        for c in range(W):
            if c + 1 < W:
                mrf2.add_pairwise_factor(r * W + c, r * W + c + 1, rng.normal(size=(2, 2)))
            if r + 1 < H:
                mrf2.add_pairwise_factor(r * W + c, (r + 1) * W + c, rng.normal(size=(2, 2)))
    e2 = s2.build_engine()
    assert len(e2.phases[Direction.forward]) == 2
