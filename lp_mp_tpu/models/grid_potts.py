"""Flagship dense grid Potts MRF engine.

The 1000x1000 Potts grid is the north-star benchmark (BASELINE.md).  The
generic gather/scatter engine is exact but index-driven; on a regular grid
the graph structure is implicit, so this model runs the same SRMP
block-coordinate updates as pure shifted-slice arithmetic.

TPU layout: label-major [L, H, W] so the minor two dims (H, W) map onto the
(sublane, lane) tiles; all label reductions are tiny cross-slice VPU ops
(the two-min trick, vector.hxx:348-449).  State:

    u    [L, H, W]        unary reparametrized costs
    hm1  [L, H, W-1]      potts slot toward left endpoint  (r, c)
    hm2  [L, H, W-1]      potts slot toward right endpoint (r, c+1)
    vm1  [L, H-1, W]      potts slot toward top endpoint   (r, c)
    vm2  [L, H-1, W]      potts slot toward bottom endpoint(r+1, c)
    (potts factor layout of factors/potts.py; diff costs hc/vc static)

Red/black schedule: one iteration = forward pass (black cells update, then
red) + backward pass (red, then black).  A cell update = receive the
incident potts factors' min-marginals (per the mode's receive mask), then
send omega-weighted shares of its reparametrized cost back into the potts
slots — the reference UpdateFactor (factors_messages.hxx:2256-2261) under
the blacks-before-reds total order, with SRMP weights in closed form:
sender omega = 1/deg (anisotropic, LP_MP.h:1393-1401) or 1/(deg+leave)
(uniform/damped, LP_MP.h:1437).  Parity with the generic engine in
coloring mode is pinned by tests/test_grid.py.

``run_fast`` additionally fuses the cross-phase pairs (a cell's receive at
the end of one pass and its send at the start of the next touch no other
state in between) into single receive+send color updates inside one
lax.fori_loop — identical coordinate updates, iteration boundary shifted
by half a phase — and donates buffers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReparametrizationMode, real_dtype
from ..ops.reductions import min_except, two_min


def _potts_marginal(own, other, diff):
    """[L, ...] marginal of a potts factor toward `own`'s side:
    own[x] + min(other[x], min_{y != x} other[y] + diff); labels axis 0."""
    if other.shape[0] == 1:
        return own + other
    return own + jnp.minimum(other, min_except(other, axis=0) + diff[None])


def _potts_min_pair(m1, m2, diff):
    """min over (x1,x2) of m1[x1] + m2[x2] + diff*[x1 != x2]; labels axis 0."""
    diag = jnp.min(m1 + m2, axis=0)
    if m1.shape[0] == 1:
        return diag
    a1, s1, i1 = two_min(m1, axis=0)
    a2, s2, i2 = two_min(m2, axis=0)
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

        self._state = {
            "u": jnp.asarray(np.moveaxis(unary, -1, 0)),
            "hm1": jnp.zeros((L, H, W - 1), dtype), "hm2": jnp.zeros((L, H, W - 1), dtype),
            "vm1": jnp.zeros((L, H - 1, W), dtype), "vm2": jnp.zeros((L, H - 1, W), dtype),
        }
        self._mask_state = None     # Pallas-layout cache (see state property)
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
        self._fast = jax.jit(self._run_fast_impl, static_argnums=(2, 3),
                             donate_argnums=0)
        self._to_mask = jax.jit(self._to_mask_form, static_argnums=1)
        self._from_mask = jax.jit(self._from_mask_form, static_argnums=1)
        self._pallas_costs_cache = None

    # ------------------------------------------------------------------
    def _mode_params(self, mode):
        """Per pass (fwd/bwd), per phase: (recv_mask [H,W], omega [H,W])."""
        mode = ReparametrizationMode.convert(mode)
        black, red = self.black, 1.0 - self.black
        zero = jnp.zeros_like(self.deg)
        if mode in (ReparametrizationMode.anisotropic, ReparametrizationMode.anisotropic2):
            inv = 1.0 / self.deg
            return {"fwd": ((zero, black * inv), (red, zero)),
                    "bwd": ((zero, red * inv), (black, zero))}
        if mode == ReparametrizationMode.uniform:
            w = 1.0 / self.deg
        elif mode == ReparametrizationMode.damped_uniform:
            w = 1.0 / (self.deg + 1.0)
        else:
            raise NotImplementedError(f"{mode} not supported on grid model")
        return {"fwd": ((black, black * w), (red, red * w)),
                "bwd": ((red, red * w), (black, black * w))}

    # ------------------------------------------------------------------
    def _receive(self, s, mask):
        """Cells in `mask` pull the full min-marginals of their incident
        potts factors (ReceiveMessages with omega=1).  Expressed as padded
        full-array adds (no scatters)."""
        u, hm1, hm2, vm1, vm2 = s["u"], s["hm1"], s["hm2"], s["vm1"], s["vm2"]
        m = mask[None]
        d1 = _potts_marginal(hm1, hm2, self.hc) * m[:, :, :-1]
        d2 = _potts_marginal(hm2, hm1, self.hc) * m[:, :, 1:]
        d3 = _potts_marginal(vm1, vm2, self.vc) * m[:, :-1]
        d4 = _potts_marginal(vm2, vm1, self.vc) * m[:, 1:]
        u = (u + jnp.pad(d1, ((0, 0), (0, 0), (0, 1)))
               + jnp.pad(d2, ((0, 0), (0, 0), (1, 0)))
               + jnp.pad(d3, ((0, 0), (0, 1), (0, 0)))
               + jnp.pad(d4, ((0, 0), (1, 0), (0, 0))))
        return {"u": u, "hm1": hm1 - d1, "hm2": hm2 - d2,
                "vm1": vm1 - d3, "vm2": vm2 - d4}

    def _send(self, s, omega):
        """Cells send omega * (own reparametrized cost) into each incident
        potts slot, all from one snapshot (factors_messages.hxx:2787-2814);
        the sender keeps the (1 - omega*deg) residual."""
        u = s["u"]
        d = u * omega[None]
        return {"u": u * (1.0 - omega * self.deg)[None],
                "hm1": s["hm1"] + d[:, :, :-1], "hm2": s["hm2"] + d[:, :, 1:],
                "vm1": s["vm1"] + d[:, :-1], "vm2": s["vm2"] + d[:, 1:]}

    def _phase(self, s, recv_mask, omega):
        return self._send(self._receive(s, recv_mask), omega)

    def _iterate_impl(self, s, params):
        for phase in params["fwd"]:
            s = self._phase(s, *phase)
        for phase in params["bwd"]:
            s = self._phase(s, *phase)
        return s

    def _run_fast_impl(self, s, params, n, fuse):
        """n iterations inside one fori_loop.  With ``fuse`` (anisotropic
        modes only: send-only and receive-only phases), the cross-phase
        pairs merge into two full color updates per round after a send-only
        prologue; otherwise the exact 4-phase round runs."""
        (m1, w1), (m2, w2) = params["fwd"]
        (m3, w3), (m4, w4) = params["bwd"]
        if fuse:
            s = self._phase(s, m1, w1)  # prologue: first color send

            def round_fn(_, s):
                s = self._phase(s, jnp.maximum(m2, m3), w2 + w3)  # second color
                s = self._phase(s, jnp.maximum(m4, m1), w4 + w1)  # first color
                return s
        else:
            def round_fn(_, s):
                for mask, w in ((m1, w1), (m2, w2), (m3, w3), (m4, w4)):
                    s = self._phase(s, mask, w)
                return s

        s = jax.lax.fori_loop(0, n, round_fn, s)
        return s

    # ------------------------------------------------------------------
    # Pallas hot path: the same fused color schedule, each phase one
    # VMEM-fused kernel (ops/pallas_grid.phase_update_v2); ~25x the XLA
    # path on the 1000x1000 benchmark (bench.py reports both).
    # ------------------------------------------------------------------
    def _pallas_geom(self, tile_rows: int = 48):
        # TH=48 measured best on hardware: 2195 it/s vs 880 at TH=8 — the
        # (TH+16)/TH halo read amplification drops from 3.0x to 1.33x
        # (bench/profile_pallas_out.jsonl, slope-timed with true fences)
        H, W, L = self.H, self.W, self.L
        P = 2
        Wp = ((W + 2 + 127) // 128) * 128
        Hp = ((H + 2 * P + tile_rows - 1) // tile_rows) * tile_rows
        return (L, Hp, Wp, H, W, P, tile_rows)

    def _to_mask_form(self, s, geom):
        """Dense state -> [L, Hp, Wp] mask form (pallas_grid layout)."""
        L, Hp, Wp, H, W, P, TH = geom
        z = jnp.zeros((L, Hp, Wp), jnp.float32)
        return {
            "u": z.at[:, P:P + H, 1:1 + W].set(s["u"].astype(jnp.float32)),
            "hm1": z.at[:, P:P + H, 1:W].set(s["hm1"].astype(jnp.float32)),
            "hm2": z.at[:, P:P + H, 1:W].set(s["hm2"].astype(jnp.float32)),
            "vm1": z.at[:, P:P + H - 1, 1:1 + W].set(s["vm1"].astype(jnp.float32)),
            "vm2": z.at[:, P:P + H - 1, 1:1 + W].set(s["vm2"].astype(jnp.float32)),
        }

    def _from_mask_form(self, m, geom):
        L, Hp, Wp, H, W, P, TH = geom
        dt = self.dtype
        return {
            "u": m["u"][:, P:P + H, 1:1 + W].astype(dt),
            "hm1": m["hm1"][:, P:P + H, 1:W].astype(dt),
            "hm2": m["hm2"][:, P:P + H, 1:W].astype(dt),
            "vm1": m["vm1"][:, P:P + H - 1, 1:1 + W].astype(dt),
            "vm2": m["vm2"][:, P:P + H - 1, 1:1 + W].astype(dt),
        }

    def _pallas_costs(self, geom):
        L, Hp, Wp, H, W, P, TH = geom
        hc = jnp.zeros((Hp, Wp), jnp.float32).at[P:P + H, 1:W].set(
            self.hc.astype(jnp.float32))
        vc = jnp.zeros((Hp, Wp), jnp.float32).at[P:P + H - 1, 1:1 + W].set(
            self.vc.astype(jnp.float32))
        return hc, vc

    @property
    def state(self):
        """Dense dual state.  The Pallas hot path keeps the padded mask
        layout cached between run_fast calls (converting both ways per
        call cost ~8% of the kernel's own HBM traffic, measured r5); the
        dense view materializes lazily here."""
        if self._state is None:
            geom = self._pallas_geom()
            self._state = self._from_mask(self._mask_state, geom)
        return self._state

    @state.setter
    def state(self, value):
        self._state = value
        self._mask_state = None

    def _run_fast_pallas(self, mode, n, interpret):
        """n iterations through the fused Pallas phase kernel.  Color codes:
        1=black, 2=red (ops/pallas_grid.phase_update_v2 contract).

        Phases are dispatched from Python (async, pipelined) rather than a
        lax.fori_loop: on the axon runtime, Mosaic custom calls inside an
        XLA while-loop run ~60x slower than the same kernels dispatched
        back-to-back (measured 71 vs 8.7k it/s on the 1000x1000 grid —
        bench/pallas_dma_hang.md artifact)."""
        from ..ops.pallas_grid import phase_update_v2, round_update_v2
        geom = self._pallas_geom()
        if self._pallas_costs_cache is None:
            self._pallas_costs_cache = self._pallas_costs(geom)
        hc, vc = self._pallas_costs_cache
        m = self._mask_state if self._mask_state is not None \
            else self._to_mask(self._state, geom)

        def ph(m, params):
            return phase_update_v2(m, hc, vc, geom=geom, phase_params=params,
                                   interpret=interpret)

        mode = ReparametrizationMode.convert(mode)
        if mode in (ReparametrizationMode.anisotropic,
                    ReparametrizationMode.anisotropic2):
            # fused schedule of _run_fast_impl: send-only prologue on black,
            # then time-tiled kernels covering TWO full rounds per pass
            # (red/black/red/black — 1/4 the HBM traffic of dispatching
            # the four color phases separately; odd remainder runs a
            # single-round kernel)
            m = ph(m, (0, 1, 0.0))
            r = n
            while r >= 2:
                m = round_update_v2(m, hc, vc, geom=geom, n_rounds=2,
                                    interpret=interpret)
                r -= 2
            if r:
                m = round_update_v2(m, hc, vc, geom=geom,
                                    interpret=interpret)
        else:
            leave = 0.0 if mode == ReparametrizationMode.uniform else 1.0
            cyc = ((1, 1, leave), (2, 2, leave), (2, 2, leave), (1, 1, leave))
            for _ in range(n):
                for p in cyc:
                    m = ph(m, p)
        self._mask_state = m
        self._state = None          # dense view stale until accessed

    # ------------------------------------------------------------------
    def _lower_bound_impl(self, s):
        lb = jnp.sum(jnp.min(s["u"], axis=0))
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
            am = jnp.argmin(s["u"], axis=0).astype(jnp.int32)
            upd = (recv_mask + omega) > 0
            x = jnp.where(upd, am, x)
            s = self._send(s, omega)
        xe = x[None]
        ub = jnp.sum(jnp.take_along_axis(s["u"], xe, axis=0)[0])
        xl, xr = x[:, :-1], x[:, 1:]
        ub += jnp.sum(jnp.take_along_axis(s["hm1"], xl[None], 0)[0])
        ub += jnp.sum(jnp.take_along_axis(s["hm2"], xr[None], 0)[0])
        ub += jnp.sum(jnp.where(xl != xr, self.hc, jnp.zeros_like(self.hc)))
        xt, xb = x[:-1], x[1:]
        ub += jnp.sum(jnp.take_along_axis(s["vm1"], xt[None], 0)[0])
        ub += jnp.sum(jnp.take_along_axis(s["vm2"], xb[None], 0)[0])
        ub += jnp.sum(jnp.where(xt != xb, self.vc, jnp.zeros_like(self.vc)))
        return s, x, ub

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def iterate(self, mode="anisotropic", n: int = 1):
        """n exact forward+backward iterations (LP::ComputePass)."""
        params = self._mode_params(mode)
        for _ in range(n):
            self.state = self._iterate(self.state, params)
        return self

    def run_fast(self, n: int, mode="anisotropic", kernel="xla",
                 interpret=False):
        """n iterations, fused schedule, donated buffers (bench hot path).

        kernel="pallas" routes every phase through the fused VMEM kernel
        (ops/pallas_grid.phase_update_v2) — same coordinate updates, same
        state; parity with the XLA path is pinned by tests/test_pallas_grid
        and measured by bench.py on hardware."""
        mode = ReparametrizationMode.convert(mode)
        if kernel == "pallas":
            self._run_fast_pallas(mode, n, interpret)
            return self
        fuse = mode in (ReparametrizationMode.anisotropic,
                        ReparametrizationMode.anisotropic2)
        self.state = self._fast(self.state, self._mode_params(mode), n, fuse)
        return self

    def lower_bound(self) -> float:
        return float(self._lb(self.state))

    def round_primal(self, mode="damped_uniform"):
        params = self._mode_params(mode)
        self.state, x, ub = self._round(self.state, params)
        return np.asarray(x), float(ub)


def random_grid(H, W, L, seed=0, potts_scale=1.0):
    rng = np.random.default_rng(seed)
    unary = rng.normal(size=(H, W, L))
    hc = np.abs(rng.normal(size=(H, W - 1))) * potts_scale
    vc = np.abs(rng.normal(size=(H - 1, W))) * potts_scale
    return unary, hc, vc
