"""Flagship dense grid Potts MRF engine.

The 1000x1000 Potts grid is the north-star benchmark (BASELINE.md).  The
generic gather/scatter engine is exact but index-driven; on a regular grid
the graph structure is implicit, so this model runs the same SRMP
block-coordinate updates as pure shifted-slice arithmetic over

    unary  u   [H, W, L]
    h-edge slots hm1/hm2 [H, W-1, L], diff hc [H, W-1]   (potts factor
    v-edge slots vm1/vm2 [H-1, W, L], diff vc [H-1, W]    layout of
                                                          factors/potts.py)

Red/black schedule: one iteration = forward pass (black cells update, then
red) + backward pass (red, then black).  A cell update = receive the
incident potts factors' min-marginals (per the mode's receive mask), then
send omega-weighted shares of its reparametrized cost back into the potts
slots — exactly the reference UpdateFactor (factors_messages.hxx:2256-2261)
under the blacks-before-reds total order, with SRMP weights closed-form:
sender omega = 1/deg (anisotropic, LP_MP.h:1393-1401) or 1/(deg+leave)
(uniform/damped, LP_MP.h:1437).  Parity with the generic engine in
coloring mode is pinned by tests/test_grid.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReparametrizationMode, real_dtype
from ..ops.reductions import min_except, two_min


def _potts_marginal(own, other, diff):
    """[.., L] marginal of a potts factor toward `own`'s side:
    own[x] + min(other[x], min_{y != x} other[y] + diff)."""
    if other.shape[-1] == 1:
        return own + other
    return own + jnp.minimum(other, min_except(other, axis=-1) + diff[..., None])


def _potts_min_pair(m1, m2, diff):
    """min over (x1,x2) of m1[x1] + m2[x2] + diff*[x1 != x2], last axis."""
    diag = jnp.min(m1 + m2, axis=-1)
    if m1.shape[-1] == 1:
        return diag
    a1, s1, i1 = two_min(m1, axis=-1)
    a2, s2, i2 = two_min(m2, axis=-1)
    off = jnp.where(i1 != i2, a1 + a2, jnp.minimum(a1 + s2, s1 + a2)) + diff
    return jnp.minimum(diag, off)


class GridPottsModel:
    """Grid MRF with unary simplex factors and Potts pairwise factors."""

    def __init__(self, unary, hcost, vcost, dtype=None):
        dtype = dtype or real_dtype()
        unary = np.asarray(unary, dtype=dtype)
        H, W, L = unary.shape
        self.H, self.W, self.L = H, W, L
        self.dtype = dtype
        hcost = np.asarray(hcost, dtype=dtype)
        vcost = np.asarray(vcost, dtype=dtype)
        assert hcost.shape == (H, W - 1) and vcost.shape == (H - 1, W)

        self.state = {
            "u": jnp.asarray(unary),
            "hm1": jnp.zeros((H, W - 1, L), dtype), "hm2": jnp.zeros((H, W - 1, L), dtype),
            "vm1": jnp.zeros((H - 1, W, L), dtype), "vm2": jnp.zeros((H - 1, W, L), dtype),
        }
        self.hc = jnp.asarray(hcost)
        self.vc = jnp.asarray(vcost)

        r = np.arange(H)[:, None] + np.arange(W)[None, :]
        self.black = jnp.asarray((r % 2 == 0).astype(dtype))
        deg = np.full((H, W), 4.0)
        deg[0, :] -= 1; deg[-1, :] -= 1; deg[:, 0] -= 1; deg[:, -1] -= 1
        self.deg = jnp.asarray(deg.astype(dtype))

        self._iterate = jax.jit(self._iterate_impl)
        self._lb = jax.jit(self._lower_bound_impl)
        self._round = jax.jit(self._round_impl)

    # ------------------------------------------------------------------
    def _phase_params(self, mode: ReparametrizationMode, color):
        """(receive_mask [H,W], omega [H,W]) for cells of `color` updating."""
        mode = ReparametrizationMode.convert(mode)
        if mode in (ReparametrizationMode.anisotropic, ReparametrizationMode.anisotropic2):
            # sender color pushes everything (omega=1/deg), receiver color
            # only receives — closed-form SRMP weights for the red/black order
            return None, None  # handled per direction below
        if mode == ReparametrizationMode.uniform:
            return color, 1.0 / self.deg
        if mode == ReparametrizationMode.damped_uniform:
            return color, 1.0 / (self.deg + 1.0)
        if mode == ReparametrizationMode.mixed:
            raise NotImplementedError("mixed mode not supported on grid model")
        raise ValueError(mode)

    def _mode_params(self, mode):
        """Per pass (fwd/bwd), per phase (first/second): (recv_mask, omega)
        as [H,W] arrays; recv_mask/omega are zero where the phase's color
        does not apply."""
        mode = ReparametrizationMode.convert(mode)
        black, red = self.black, 1.0 - self.black
        zero = jnp.zeros_like(self.deg)
        if mode in (ReparametrizationMode.anisotropic, ReparametrizationMode.anisotropic2):
            inv = 1.0 / self.deg
            fwd = ((zero, black * inv), (red, zero))
            bwd = ((zero, red * inv), (black, zero))
            return {"fwd": fwd, "bwd": bwd}
        if mode == ReparametrizationMode.uniform:
            w = 1.0 / self.deg
        elif mode == ReparametrizationMode.damped_uniform:
            w = 1.0 / (self.deg + 1.0)
        else:
            raise NotImplementedError(f"{mode} not supported on grid model")
        fwd = ((black, black * w), (red, red * w))
        bwd = ((red, red * w), (black, black * w))
        return {"fwd": fwd, "bwd": bwd}

    # ------------------------------------------------------------------
    def _receive(self, s, mask):
        """Cells in `mask` pull the full min-marginals of their incident
        potts factors (ReceiveMessages with omega=1)."""
        u, hm1, hm2, vm1, vm2 = s["u"], s["hm1"], s["hm2"], s["vm1"], s["vm2"]
        m = mask[..., None]
        # left side of horizontal edges -> cell (r, c), c < W-1
        d = _potts_marginal(hm1, hm2, self.hc) * m[:, :-1]
        hm1 = hm1 - d
        u = u.at[:, :-1].add(d)
        # right side of horizontal edges -> cell (r, c+1)
        d = _potts_marginal(hm2, hm1, self.hc) * m[:, 1:]
        hm2 = hm2 - d
        u = u.at[:, 1:].add(d)
        # top side of vertical edges -> cell (r, c), r < H-1
        d = _potts_marginal(vm1, vm2, self.vc) * m[:-1]
        vm1 = vm1 - d
        u = u.at[:-1].add(d)
        # bottom side -> cell (r+1, c)
        d = _potts_marginal(vm2, vm1, self.vc) * m[1:]
        vm2 = vm2 - d
        u = u.at[1:].add(d)
        return {"u": u, "hm1": hm1, "hm2": hm2, "vm1": vm1, "vm2": vm2}

    def _send(self, s, omega):
        """Cells send omega * (own reparametrized cost) into each incident
        potts slot (SendMessages from one snapshot,
        factors_messages.hxx:2787-2814)."""
        u = s["u"]
        d = u * omega[..., None]
        hm1 = s["hm1"] + d[:, :-1]
        hm2 = s["hm2"] + d[:, 1:]
        vm1 = s["vm1"] + d[:-1]
        vm2 = s["vm2"] + d[1:]
        cnt = jnp.zeros_like(u)
        cnt = cnt.at[:, :-1].add(d[:, :-1])
        cnt = cnt.at[:, 1:].add(d[:, 1:])
        cnt = cnt.at[:-1].add(d[:-1])
        cnt = cnt.at[1:].add(d[1:])
        return {"u": u - cnt, "hm1": hm1, "hm2": hm2, "vm1": vm1, "vm2": vm2}

    def _phase(self, s, recv_mask, omega):
        s = self._receive(s, recv_mask)
        return self._send(s, omega)

    def _iterate_impl(self, s, params):
        for phase in params["fwd"]:
            s = self._phase(s, *phase)
        for phase in params["bwd"]:
            s = self._phase(s, *phase)
        return s

    # ------------------------------------------------------------------
    def _lower_bound_impl(self, s):
        lb = jnp.sum(jnp.min(s["u"], axis=-1))
        lb += jnp.sum(_potts_min_pair(s["hm1"], s["hm2"], self.hc))
        lb += jnp.sum(_potts_min_pair(s["vm1"], s["vm2"], self.vc))
        return lb

    # ------------------------------------------------------------------
    def _round_impl(self, s, params):
        """One rounding pass (MpRoundingSolver semantics): run the phases,
        labeling each cell by the argmin of its post-receive cost."""
        x = jnp.zeros((self.H, self.W), dtype=jnp.int32)
        for recv_mask, omega in (*params["fwd"], *params["bwd"]):
            s = self._receive(s, recv_mask)
            # pick labels for the cells that just received (mask>0); the
            # argmin is invariant to the positive rescaling done by sends
            am = jnp.argmin(s["u"], axis=-1).astype(jnp.int32)
            upd = (recv_mask + omega) > 0
            x = jnp.where(upd, am, x)
            s = self._send(s, omega)
        ub = jnp.sum(jnp.take_along_axis(s["u"], x[..., None], axis=-1)[..., 0])
        xl, xr = x[:, :-1], x[:, 1:]
        ub += jnp.sum(jnp.take_along_axis(s["hm1"], xl[..., None], -1)[..., 0])
        ub += jnp.sum(jnp.take_along_axis(s["hm2"], xr[..., None], -1)[..., 0])
        ub += jnp.sum(jnp.where(xl != xr, self.hc, jnp.zeros_like(self.hc)))
        xt, xb = x[:-1], x[1:]
        ub += jnp.sum(jnp.take_along_axis(s["vm1"], xt[..., None], -1)[..., 0])
        ub += jnp.sum(jnp.take_along_axis(s["vm2"], xb[..., None], -1)[..., 0])
        ub += jnp.sum(jnp.where(xt != xb, self.vc, jnp.zeros_like(self.vc)))
        return s, x, ub

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def iterate(self, mode="anisotropic", n: int = 1):
        params = self._mode_params(mode)
        for _ in range(n):
            self.state = self._iterate(self.state, params)
        return self

    def lower_bound(self) -> float:
        return float(self._lb(self.state))

    def round_primal(self, mode="damped_uniform"):
        params = self._mode_params(mode)
        self.state, x, ub = self._round(self.state, params)
        return np.asarray(x), float(ub)

    def total_cost(self, x) -> float:
        """Evaluate a labeling against the ORIGINAL costs (invariant under
        reparametrization; used as a cross-check)."""
        raise NotImplementedError


def random_grid(H, W, L, seed=0, potts_scale=1.0):
    rng = np.random.default_rng(seed)
    unary = rng.normal(size=(H, W, L))
    hc = np.abs(rng.normal(size=(H, W - 1))) * potts_scale
    vc = np.abs(rng.normal(size=(H - 1, W))) * potts_scale
    return unary, hc, vc
