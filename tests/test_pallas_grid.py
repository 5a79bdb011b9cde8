"""Pallas phase kernel vs the mask-form XLA reference (interpret mode).

The fused color-update kernel (ops/pallas_grid.py) is validated here in
Pallas interpret mode on CPU: identical results to a jnp implementation of
the same mask-form phase for every mode/color combination, on several
geometries (including ragged bottom blocks where the center offset is 3).

On hardware the production path is ``phase_update_v2`` (pipelined halo
blocks, no manual DMA), dispatched by GridPottsModel.run_fast(kernel=
"pallas") and measured by bench.py / bench/profile_pallas.py; the v1
manual-DMA kernel below is kept only as an interpret-mode cross-check of
the same math (its dynamic-offset DMA hangs on the axon tunnel,
bench/pallas_dma_hang.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lp_mp_tpu.ops.pallas_grid import phase_update


def build(H, W, L, TH, seed=0):
    P = 2
    Wp = ((W + 2 + 127) // 128) * 128
    Hp = ((H + 2 * P + TH - 1) // TH) * TH
    rng = np.random.default_rng(seed)
    z = lambda: np.zeros((L, Hp, Wp), np.float32)
    u = z(); u[:, P:P + H, 1:1 + W] = rng.normal(size=(L, H, W))
    hm1, hm2, vm1, vm2 = z(), z(), z(), z()
    hm1[:, P:P + H, 1:W] = rng.normal(size=(L, H, W - 1)) * 0.1
    hm2[:, P:P + H, 1:W] = rng.normal(size=(L, H, W - 1)) * 0.1
    vm1[:, P:P + H - 1, 1:1 + W] = rng.normal(size=(L, H - 1, W)) * 0.1
    vm2[:, P:P + H - 1, 1:1 + W] = rng.normal(size=(L, H - 1, W)) * 0.1
    hc = np.zeros((Hp, Wp), np.float32); hc[P:P + H, 1:W] = np.abs(rng.normal(size=(H, W - 1)))
    vc = np.zeros((Hp, Wp), np.float32); vc[P:P + H - 1, 1:1 + W] = np.abs(rng.normal(size=(H - 1, W)))
    geom = (L, Hp, Wp, H, W, P, TH)
    state = {k: jnp.asarray(v) for k, v in
             dict(u=u, hm1=hm1, hm2=hm2, vm1=vm1, vm2=vm2).items()}
    return state, jnp.asarray(hc), jnp.asarray(vc), geom


def masks(geom):
    L, Hp, Wp, H, W, P, TH = geom
    rows = np.arange(Hp)[:, None] + 0 * np.arange(Wp)[None, :]
    cols = 0 * np.arange(Hp)[:, None] + np.arange(Wp)[None, :]
    cell = (rows >= P) & (rows < P + H) & (cols >= 1) & (cols < 1 + W)
    hedge = (cell & (cols < W)).astype(np.float32)
    vedge = (cell & (rows < P + H - 1)).astype(np.float32)
    cellf = cell.astype(np.float32)
    black = np.where(cell, ((rows - P + cols - 1) % 2) == 0, False).astype(np.float32)
    deg = hedge + np.roll(hedge, 1, 1) + vedge + np.roll(vedge, 1, 0)
    return cellf, hedge, vedge, black, cellf - black, deg


def xla_phase(state, hc, vc, geom, recv_color, send_color, leave):
    cellf, hedge, vedge, black, red, deg = (jnp.asarray(m) for m in masks(geom))
    cm = {0: jnp.zeros_like(cellf), 1: black, 2: red}
    recvm, sendm = cm[recv_color], cm[send_color]
    omega = sendm / jnp.maximum(deg + leave, 1.0)
    u, hm1, hm2, vm1, vm2 = (state[k] for k in ("u", "hm1", "hm2", "vm1", "vm2"))

    def marg(own, other, diff):
        m = jnp.min(other, axis=0, keepdims=True)
        ismin = other == m
        cnt = jnp.sum(ismin.astype(jnp.float32), axis=0, keepdims=True)
        s = jnp.min(jnp.where(ismin, 3e38, other), axis=0, keepdims=True)
        s = jnp.where(cnt > 1, m, s)
        me = jnp.where(ismin, s, m)
        return own + jnp.minimum(other, me + diff[None])

    rw = lambda x, k: jnp.roll(x, k, axis=-1)
    rh = lambda x, k: jnp.roll(x, k, axis=-2)
    e1, e2 = marg(hm1, hm2, hc), marg(hm2, hm1, hc)
    v1, v2 = marg(vm1, vm2, vc), marg(vm2, vm1, vc)
    mh1, mh2 = recvm * hedge, rw(recvm, -1) * hedge
    mv1, mv2 = recvm * vedge, rh(recvm, -1) * vedge
    uu = u + e1 * mh1[None] + rw(e2 * mh2[None], 1) + v1 * mv1[None] + rh(v2 * mv2[None], 1)
    d = uu * omega[None]
    return {"u": uu * (1.0 - omega * deg)[None] * cellf[None],
            "hm1": (hm1 - e1 * mh1[None] + d) * hedge[None],
            "hm2": (hm2 - e2 * mh2[None] + rw(d, -1)) * hedge[None],
            "vm1": (vm1 - v1 * mv1[None] + d) * vedge[None],
            "vm2": (vm2 - v2 * mv2[None] + rh(d, -1)) * vedge[None]}


@pytest.mark.parametrize("H,W,L,TH", [(8, 8, 4, 8), (16, 12, 3, 8),
                                      (64, 40, 4, 8), (33, 33, 2, 16)])
def test_phase_kernel_matches_reference(H, W, L, TH):
    state, hc, vc, geom = build(H, W, L, TH, seed=H + W)
    for rc, sc, lv in [(2, 2, 0), (1, 1, 0), (0, 1, 0), (2, 0, 0),
                       (1, 1, 10), (2, 2, 10)]:
        params = jnp.asarray([rc, sc, lv], jnp.int32)
        outp = phase_update(params, state, hc, vc, geom=geom, interpret=True)
        outx = xla_phase(state, hc, vc, geom, rc, sc, lv / 10.0)
        for k in outp:
            err = np.abs(np.asarray(outp[k]) - np.asarray(outx[k])).max()
            assert err < 1e-5, (H, W, L, TH, rc, sc, lv, k, err)
        state = outp  # chain phases so later checks start from rich state


@pytest.mark.parametrize("mode", ["anisotropic", "uniform", "damped_uniform"])
def test_run_fast_pallas_parity(mode):
    """run_fast(kernel='pallas') == run_fast(kernel='xla'): same fused
    schedule, same coordinate updates, through the production model API
    (interpret mode here; hardware execution measured by bench.py)."""
    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid

    u, hc, vc = random_grid(9, 11, 3, seed=42)
    a = GridPottsModel(u, hc, vc, dtype=np.float32)
    b = GridPottsModel(u, hc, vc, dtype=np.float32)
    a.run_fast(3, mode=mode)
    b.run_fast(3, mode=mode, kernel="pallas", interpret=True)
    for k in a.state:
        np.testing.assert_allclose(np.asarray(a.state[k]),
                                   np.asarray(b.state[k]),
                                   atol=5e-5, err_msg=f"{k} mode={mode}")
    assert abs(a.lower_bound() - b.lower_bound()) < 1e-3
