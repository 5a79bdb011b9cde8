"""Multi-chip sharded grid-Potts engine (mask form).

The flagship grid Potts model (models/grid_potts.py) laid out in padded
"mask form" and executed under ``jax.shard_map`` over a 1-D device mesh:
rows are sharded, and each SRMP color phase exchanges a one-row halo with
both neighbors via ``lax.ppermute`` (ICI collective) before a dense local
update.

Mask form (layout shared with ops/pallas_grid.py): five state arrays
``[L, R, C]`` with real cells at rows ``[P, P+H)``, cols ``[1, 1+W)``;
h-edge (r,c)-(r,c+1) stored at (r,c) for c in [1,W); v-edge (r,c)-(r+1,c)
at (r,c) for r in [P, P+H-1); everything outside is inert zeros.  Masks are
recomputed from row/col iota inside the kernel body, so only the data
arrays move through HBM/ICI.

Update semantics are exactly GridPottsModel's red/black SRMP phases
(receive full min-marginals by mask, then send omega-weighted shares — the
reference UpdateFactor, factors_messages.hxx:2256-2261, under the
blacks-before-reds total order).  Because the halo exchange delivers the
*same* neighbor rows the single-chip schedule reads, the sharded sweep
performs identical coordinate updates: bounds match the dense model
bit-for-bit, not merely monotonically (pinned by tests/test_parallel.py at
1/2/4/8 shards).

Distributed design note: the reference has no distributed backend
(SURVEY §2.7); its closest structure is the partitioned pass with push
weights between blocks (LP_MP.h:1931-2051).  Here the partition is the row
sharding and the "push" across the cut is the halo exchange of boundary
rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..config import ReparametrizationMode, real_dtype
from ..models.grid_potts import _potts_min_pair
from ..ops.reductions import min_except

AXIS = "rows"


# ---------------------------------------------------------------------------
# mask-form geometry and dense phase math (layout of ops/pallas_grid.py)
# ---------------------------------------------------------------------------

def _shift_rows(x, k):
    """out[..., r, :] = x[..., r-k, :] with wrap; wrapped rows are always
    either discarded halo rows or masked inert rows."""
    return jnp.roll(x, k, axis=-2)


def _shift_cols(x, k):
    return jnp.roll(x, k, axis=-1)


def _marg(own, other, diff):
    """Potts min-marginal toward ``own``'s side; labels axis 0
    (factors/potts.py.marginal, two-min trick vector.hxx:348-449)."""
    if own.shape[0] == 1:
        return own + other
    return own + jnp.minimum(other, min_except(other, axis=0) + diff[None])


def _masks(rows, cols, H, W, P, dtype):
    """Static geometry masks from global row/col index grids [Rl, C]."""
    f = lambda b: b.astype(dtype)
    cellf = f(rows >= P) * f(rows < P + H) * f(cols >= 1) * f(cols < 1 + W)
    hedge = cellf * f(cols < W)
    vedge = cellf * f(rows < P + H - 1)
    parity = ((rows - P + cols - 1) % 2).astype(dtype)
    black = cellf * (1.0 - parity)
    red = cellf - black
    deg = hedge + _shift_cols(hedge, 1) + vedge + _shift_rows(vedge, 1)
    return {"cellf": cellf, "hedge": hedge, "vedge": vedge,
            "black": black, "red": red, "deg": deg}


def _color(m, code):
    if code == 1:
        return m["black"]
    if code == 2:
        return m["red"]
    return jnp.zeros_like(m["black"])


def _phase_arrays(u, hm1, hm2, vm1, vm2, hc, vc, m, recv_code, send_code,
                  leave):
    """One color phase (receive by mask + send omega shares) on mask-form
    arrays.  Returns the new state and the post-receive cost ``uu`` (for
    rounding).  Row/col shifts wrap; wrapped garbage only ever lands in
    inert or discarded-halo positions (layout contract in the module doc).
    """
    recvm = _color(m, recv_code)
    sendm = _color(m, send_code)
    omega = sendm / jnp.maximum(m["deg"] + leave, 1.0)

    e1 = _marg(hm1, hm2, hc)
    e2 = _marg(hm2, hm1, hc)
    v1 = _marg(vm1, vm2, vc)
    v2 = _marg(vm2, vm1, vc)

    mh1 = recvm * m["hedge"]
    mh2 = _shift_cols(recvm, -1) * m["hedge"]
    mv1 = recvm * m["vedge"]
    mv2 = _shift_rows(recvm, -1) * m["vedge"]

    uu = (u + e1 * mh1[None] + _shift_cols(e2 * mh2[None], 1)
            + v1 * mv1[None] + _shift_rows(v2 * mv2[None], 1))
    d = uu * omega[None]
    resid = 1.0 - omega * m["deg"]

    new = (uu * resid[None] * m["cellf"][None],
           (hm1 - e1 * mh1[None] + d) * m["hedge"][None],
           (hm2 - e2 * mh2[None] + _shift_cols(d, -1)) * m["hedge"][None],
           (vm1 - v1 * mv1[None] + d) * m["vedge"][None],
           (vm2 - v2 * mv2[None] + _shift_rows(d, -1)) * m["vedge"][None])
    return new, uu


def mode_phases(mode):
    """(recv_color, send_color, leave) per phase; colors 0=none 1=black
    2=red.  Mirrors GridPottsModel._mode_params closed-form SRMP weights
    (LP_MP.h:1393-1401 / :1437)."""
    mode = ReparametrizationMode.convert(mode)
    if mode in (ReparametrizationMode.anisotropic,
                ReparametrizationMode.anisotropic2):
        return ((0, 1, 0.0), (2, 0, 0.0), (0, 2, 0.0), (1, 0, 0.0))
    if mode == ReparametrizationMode.uniform:
        lv = 0.0
    elif mode == ReparametrizationMode.damped_uniform:
        lv = 1.0
    else:
        raise NotImplementedError(f"{mode} not supported on grid model")
    return ((1, 1, lv), (2, 2, lv), (2, 2, lv), (1, 1, lv))


# ---------------------------------------------------------------------------
# mask-form construction
# ---------------------------------------------------------------------------

def mask_form(unary, hcost, vcost, n_shards=1, lane=1, dtype=None,
              row_align=1):
    """Pack dense grid inputs into mask form.

    Returns (state dict of [L,R,C], hc_pad [R,C], vc_pad [R,C],
    geom=(L,R,C,H,W,P)).  R is the smallest multiple of ``n_shards`` that
    is >= H+2 (one inert border row each side so every shard halo is in
    bounds), with the per-shard row count additionally rounded up to a
    multiple of ``row_align`` (Pallas tile height); C = W+2 rounded up to
    a multiple of ``lane``.
    """
    dtype = dtype or real_dtype()
    unary = np.asarray(unary, dtype=dtype)
    H, W, L = unary.shape
    P = 1
    Hl = -(-(H + 2) // n_shards)
    Hl = -(-Hl // row_align) * row_align
    R = Hl * n_shards
    C = -(-(W + 2) // lane) * lane
    u = np.zeros((L, R, C), dtype)
    u[:, P:P + H, 1:1 + W] = np.moveaxis(unary, -1, 0)
    hc = np.zeros((R, C), dtype)
    hc[P:P + H, 1:W] = np.asarray(hcost, dtype=dtype)
    vc = np.zeros((R, C), dtype)
    vc[P:P + H - 1, 1:1 + W] = np.asarray(vcost, dtype=dtype)
    zeros = np.zeros((L, R, C), dtype)
    state = {"u": jnp.asarray(u),
             "hm1": jnp.asarray(zeros), "hm2": jnp.asarray(zeros),
             "vm1": jnp.asarray(zeros), "vm2": jnp.asarray(zeros)}
    return state, jnp.asarray(hc), jnp.asarray(vc), (L, R, C, H, W, P)


def to_dense(state, geom):
    """Inverse of mask_form for parity checks: returns (u, hm1, hm2, vm1,
    vm2) in models/grid_potts.py dense shapes."""
    L, R, C, H, W, P = geom
    return (state["u"][:, P:P + H, 1:1 + W],
            state["hm1"][:, P:P + H, 1:W],
            state["hm2"][:, P:P + H, 1:W],
            state["vm1"][:, P:P + H - 1, 1:1 + W],
            state["vm2"][:, P:P + H - 1, 1:1 + W])


# ---------------------------------------------------------------------------
# sharded engine
# ---------------------------------------------------------------------------

class ShardedGridPotts:
    """Row-sharded grid Potts SRMP over an n-device mesh.

    ``iterate`` runs exact forward+backward passes; ``lower_bound`` and
    ``round_primal`` mirror GridPottsModel's API.  With a 1-device mesh the
    halo permutations are empty and the model degenerates to plain jit.
    """

    def __init__(self, unary, hcost, vcost, mesh=None, devices=None,
                 lane=1, dtype=None, tile_rows=48):
        if mesh is None:
            devices = list(devices if devices is not None else jax.devices())
            mesh = Mesh(np.array(devices), (AXIS,))
        self.mesh = mesh
        self.n = mesh.shape[AXIS]
        self.dtype = dtype or real_dtype()
        self.tile_rows = tile_rows

        # exact/cheap layout by default; the Pallas fast path lazily
        # re-packs to (128-lane, tile_rows-row) alignment on first use so
        # XLA-path users of small grids don't pay 48x128 padding (ADVICE r4)
        state, hc, vc, geom = mask_form(unary, hcost, vcost, self.n, lane,
                                        self.dtype, row_align=1)
        self.geom = geom
        L, R, C, H, W, P = geom
        self.Hl = R // self.n

        shard3 = NamedSharding(mesh, PartitionSpec(None, AXIS, None))
        self.state = {k: jax.device_put(v, shard3) for k, v in state.items()}
        # per-shard cost blocks with one halo row each side: [n, Hl+2, C]
        self.hc_ext = jax.device_put(self._ext_blocks(hc),
                                     NamedSharding(mesh, PartitionSpec(AXIS, None, None)))
        self.vc_ext = jax.device_put(self._ext_blocks(vc), self.hc_ext.sharding)
        self.hc, self.vc = hc, vc

        self._steps = {}
        self._rounds = {}
        self._lb = jax.jit(self._lb_impl)
        self._pallas = None          # lazy fused-kernel machinery

    def _ext_blocks(self, x):
        """[R, C] -> stacked per-shard windows [n, Hl+2, C] (zero-filled
        outside the array, matching ppermute's edge zero-fill)."""
        R, C = x.shape
        xp = np.zeros((R + 2, C), x.dtype)
        xp[1:-1] = np.asarray(x)
        return jnp.asarray(np.stack([xp[k * self.Hl:k * self.Hl + self.Hl + 2]
                                     for k in range(self.n)]))

    # -- shard_map bodies --------------------------------------------------
    def _halo_ext(self, x):
        """Prepend the upper neighbor's last row and append the lower
        neighbor's first row (zero rows at the mesh edges)."""
        if self.n == 1:
            zero = jnp.zeros_like(x[:, :1])
            return jnp.concatenate([zero, x, zero], axis=1)
        up = jax.lax.ppermute(x[:, -1:], AXIS,
                              [(i, i + 1) for i in range(self.n - 1)])
        down = jax.lax.ppermute(x[:, :1], AXIS,
                                [(i + 1, i) for i in range(self.n - 1)])
        return jnp.concatenate([up, x, down], axis=1)

    def _local_masks(self):
        L, R, C, H, W, P = self.geom
        k = jax.lax.axis_index(AXIS)
        rows = (k * self.Hl - 1
                + jax.lax.broadcasted_iota(jnp.int32, (self.Hl + 2, C), 0))
        cols = jax.lax.broadcasted_iota(jnp.int32, (self.Hl + 2, C), 1)
        return _masks(rows, cols, H, W, P, self.dtype)

    def _phase_local(self, st, hc, vc, m, phase):
        ext = tuple(self._halo_ext(x) for x in st)
        new, uu = _phase_arrays(*ext, hc, vc, m, *phase)
        return tuple(a[:, 1:-1] for a in new), uu[:, 1:-1]

    def _make_step(self, mode):
        phases = mode_phases(mode)

        def body(u, hm1, hm2, vm1, vm2, hc_ext, vc_ext, n_iter):
            hc, vc = hc_ext[0], vc_ext[0]
            m = self._local_masks()

            def one(_, st):
                for ph in phases:
                    st, _ = self._phase_local(st, hc, vc, m, ph)
                return st

            return jax.lax.fori_loop(0, n_iter, one, (u, hm1, hm2, vm1, vm2))

        p3 = PartitionSpec(None, AXIS, None)
        pc = PartitionSpec(AXIS, None, None)
        f = jax.shard_map(body, mesh=self.mesh,
                          in_specs=(p3,) * 5 + (pc, pc, PartitionSpec()),
                          out_specs=(p3,) * 5)
        return jax.jit(f)

    def _make_round(self, mode):
        """Rounding pass: per phase, label updated cells by the argmin of
        their post-receive cost (MpRoundingSolver semantics,
        models/grid_potts.py._round_impl); primal cost summed via psum."""
        phases = mode_phases(mode)
        L, R, C, H, W, P = self.geom

        def body(u, hm1, hm2, vm1, vm2, hc_ext, vc_ext):
            hc, vc = hc_ext[0], vc_ext[0]
            m = self._local_masks()
            mc = {k: v[1:-1] for k, v in m.items()}
            st = (u, hm1, hm2, vm1, vm2)
            x = jnp.zeros((self.Hl, C), dtype=jnp.int32)
            for ph in phases:
                recvm, sendm = _color(mc, ph[0]), _color(mc, ph[1])
                st, uu = self._phase_local(st, hc, vc, m, ph)
                am = jnp.argmin(uu, axis=0).astype(jnp.int32)
                x = jnp.where((recvm + sendm) > 0, am, x)
            u, hm1, hm2, vm1, vm2 = st
            xd = self._halo_ext(x[None])[0, 1:]  # [Hl+1, C]: local + row below
            xe = x[None]
            ub = jnp.sum(jnp.take_along_axis(u, xe, axis=0)[0] * mc["cellf"])
            xr = _shift_cols(x, -1)
            ub += jnp.sum((jnp.take_along_axis(hm1, xe, 0)[0]
                           + jnp.take_along_axis(hm2, xr[None], 0)[0]
                           + jnp.where(x != xr, hc[1:-1], 0.0)) * mc["hedge"])
            xb = xd[1:]
            ub += jnp.sum((jnp.take_along_axis(vm1, xe, 0)[0]
                           + jnp.take_along_axis(vm2, xb[None], 0)[0]
                           + jnp.where(x != xb, vc[1:-1], 0.0)) * mc["vedge"])
            ub = jax.lax.psum(ub, AXIS)
            return (u, hm1, hm2, vm1, vm2), x, ub

        p3 = PartitionSpec(None, AXIS, None)
        pc = PartitionSpec(AXIS, None, None)
        f = jax.shard_map(body, mesh=self.mesh,
                          in_specs=(p3,) * 5 + (pc, pc),
                          out_specs=((p3,) * 5, PartitionSpec(AXIS, None),
                                     PartitionSpec()))
        return jax.jit(f)

    def _lb_impl(self, state, hc, vc):
        lb = jnp.sum(jnp.min(state["u"], axis=0))
        lb += jnp.sum(_potts_min_pair(state["hm1"], state["hm2"], hc))
        lb += jnp.sum(_potts_min_pair(state["vm1"], state["vm2"], vc))
        return lb

    # -- fused Pallas hot path ----------------------------------------------
    # (VERDICT r3 item 3: the sharded engine must not forfeit the Pallas
    # kernel.  Design: each shard persistently holds an *extended* block
    # [L, Hl + 2*TH, C] — its Hl-row window of the global mask form plus a
    # TH-row halo slab per side.  Per phase, ppermute refreshes the 8 halo
    # rows adjacent to the window (the only halo rows the kernel reads),
    # then ops/pallas_grid.phase_update_sharded runs the same fused VMEM
    # update as the single-chip kernel with masks anchored at the shard's
    # global row offset.  Phases dispatch from Python (Mosaic inside
    # fori_loop is ~60x slower on this runtime, bench/pallas_dma_hang.md).
    def _repack(self, lane, row_align):
        """Re-pack the live state into a (lane, row_align)-aligned mask
        form, preserving duals.  Lazy: only the Pallas fast path needs tile
        alignment, so the constructor keeps the exact lane=1 layout and the
        first run_fast(kernel='pallas') pays one host round-trip instead of
        every small-grid XLA user paying 48x128 padding (ADVICE r4)."""
        L, R, C, H, W, P = self.geom
        u, hm1, hm2, vm1, vm2 = (np.asarray(x)
                                 for x in to_dense(self.state, self.geom))
        state, hc, vc, geom = mask_form(
            np.moveaxis(u, 0, -1), np.asarray(self.hc)[P:P + H, 1:W],
            np.asarray(self.vc)[P:P + H - 1, 1:1 + W],
            self.n, lane, self.dtype, row_align=row_align)
        Ln, Rn, Cn, Hn, Wn, Pn = geom

        def put(key, arr):
            buf = np.zeros((L, Rn, Cn), self.dtype)
            buf[:, Pn:Pn + arr.shape[1], 1:1 + arr.shape[2]] = arr
            state[key] = buf

        put("hm1", hm1)
        put("hm2", hm2)
        put("vm1", vm1)
        put("vm2", vm2)
        self.geom = geom
        self.Hl = Rn // self.n
        shard3 = NamedSharding(self.mesh, PartitionSpec(None, AXIS, None))
        self.state = {k: jax.device_put(jnp.asarray(v), shard3)
                      for k, v in state.items()}
        self.hc_ext = jax.device_put(
            self._ext_blocks(hc),
            NamedSharding(self.mesh, PartitionSpec(AXIS, None, None)))
        self.vc_ext = jax.device_put(self._ext_blocks(vc),
                                     self.hc_ext.sharding)
        self.hc, self.vc = hc, vc
        self._steps, self._rounds = {}, {}

    def _build_pallas(self):
        from ..ops.pallas_grid import phase_update_sharded
        if self.Hl % self.tile_rows or self.geom[2] % 128:
            self._repack(128, self.tile_rows)
        L, R, C, H, W, P = self.geom
        TH, Hl, n = self.tile_rows, self.Hl, self.n
        assert Hl % TH == 0, "_repack guarantees this"
        geom_p = (L, Hl, C, H, W, P, TH)
        p3 = PartitionSpec(None, AXIS, None)
        p2 = PartitionSpec(AXIS, None)
        pc = PartitionSpec(AXIS, None, None)
        keys = ("u", "hm1", "hm2", "vm1", "vm2")

        # static per-shard cost slabs: rows just above/below the window
        def cost_halos(x):
            xg = np.zeros((n * Hl + 16, C), np.float32)
            xg[8:8 + n * Hl] = np.asarray(x, np.float32)
            top = np.stack([xg[k * Hl:k * Hl + 8] for k in range(n)])
            bot = np.stack([xg[8 + (k + 1) * Hl:16 + (k + 1) * Hl]
                            for k in range(n)])
            return (jax.device_put(jnp.asarray(top),
                                   NamedSharding(self.mesh, pc)),
                    jax.device_put(jnp.asarray(bot),
                                   NamedSharding(self.mesh, pc)))

        hc_th, hc_bh = cost_halos(self.hc)
        vc_th, vc_bh = cost_halos(self.vc)
        hc32 = jax.device_put(self.hc.astype(jnp.float32),
                              NamedSharding(self.mesh, p2))
        vc32 = jax.device_put(self.vc.astype(jnp.float32), hc32.sharding)

        phase_cache = {}

        def make_fn(params, interpret):
            """params is a phase tuple, or "round" for the time-tiled
            full anisotropic round (one kernel + one slab exchange)."""
            from ..ops.pallas_grid import round_update_sharded

            def body(u, hm1, hm2, vm1, vm2, hc_l, vc_l,
                     hc_t, hc_b, vc_t, vc_b):
                st = dict(zip(keys, (u, hm1, hm2, vm1, vm2)))

                def slabs(x):
                    if n == 1:
                        z = jnp.zeros_like(x[:, :8])
                        return z, z
                    top = jax.lax.ppermute(
                        x[:, -8:], AXIS, [(i, i + 1) for i in range(n - 1)])
                    bot = jax.lax.ppermute(
                        x[:, :8], AXIS, [(i + 1, i) for i in range(n - 1)])
                    return top, bot

                halos = {k: slabs(v) for k, v in st.items()}
                row0 = (jax.lax.axis_index(AXIS) * Hl).astype(jnp.int32)[None]
                costs = {"hc": (hc_t[0], hc_b[0]), "vc": (vc_t[0], vc_b[0])}
                if params in ("round", "round2"):
                    out = round_update_sharded(
                        st, halos, hc_l, vc_l, costs, row0, geom=geom_p,
                        n_rounds=2 if params == "round2" else 1,
                        interpret=interpret)
                else:
                    out = phase_update_sharded(
                        st, halos, hc_l, vc_l, costs, row0, geom=geom_p,
                        phase_params=params, interpret=interpret)
                return tuple(out[k] for k in keys)

            # check_vma=False: pallas_call outputs carry no vma annotation.
            # NO donation: donate_argnums on a shard_map-wrapped Mosaic call
            # corrupts buffers on the axon runtime (measured: n=1 sharded lb
            # -401841.7 vs -306291.7 dense, bit-exact without donation).
            f = jax.shard_map(body, mesh=self.mesh,
                              in_specs=(p3,) * 5 + (p2, p2) + (pc,) * 4,
                              out_specs=(p3,) * 5, check_vma=False)
            return jax.jit(f)

        def phase(st, params, interpret):
            key = (params, interpret)
            if key not in phase_cache:
                phase_cache[key] = make_fn(params, interpret)
            return phase_cache[key](*st, hc32, vc32, hc_th, hc_bh,
                                    vc_th, vc_bh)

        self._pallas = {"phase": phase, "keys": keys}

    def run_fast(self, n: int, mode="anisotropic", kernel="pallas",
                 interpret=False):
        """n iterations through the fused sharded Pallas kernel — the same
        fused color schedule as GridPottsModel.run_fast(kernel="pallas")
        (send-only prologue, then two full color updates per round), so
        bounds match the single-chip Pallas path exactly.  State stays in
        the base sharded [L, R, C] layout; only 8-row boundary slabs move
        between shards (ppermute) per phase."""
        assert kernel == "pallas"
        mode = ReparametrizationMode.convert(mode)
        if self._pallas is None:
            self._build_pallas()
        pal = self._pallas
        f32 = jnp.float32
        st = tuple(self.state[k] if self.state[k].dtype == f32
                   else self.state[k].astype(f32) for k in pal["keys"])

        def ph(st, params):
            return pal["phase"](st, params, interpret)

        if mode in (ReparametrizationMode.anisotropic,
                    ReparametrizationMode.anisotropic2):
            st = ph(st, (0, 1, 0.0))
            r = n
            while r >= 2:
                st = ph(st, "round2")
                r -= 2
            if r:
                st = ph(st, "round")
        else:
            leave = 0.0 if mode == ReparametrizationMode.uniform else 1.0
            cyc = ((1, 1, leave), (2, 2, leave), (2, 2, leave),
                   (1, 1, leave))
            for _ in range(n):
                for p in cyc:
                    st = ph(st, p)
        dt = self.dtype
        self.state = {k: v if v.dtype == dt else v.astype(dt)
                      for k, v in zip(pal["keys"], st)}
        return self

    # -- public API ---------------------------------------------------------
    def iterate(self, mode="anisotropic", n: int = 1):
        mode = ReparametrizationMode.convert(mode)
        if mode not in self._steps:
            self._steps[mode] = self._make_step(mode)
        s = self.state
        out = self._steps[mode](s["u"], s["hm1"], s["hm2"], s["vm1"],
                                s["vm2"], self.hc_ext, self.vc_ext,
                                jnp.int32(n))
        self.state = dict(zip(("u", "hm1", "hm2", "vm1", "vm2"), out))
        return self

    def lower_bound(self) -> float:
        return float(self._lb(self.state, self.hc, self.vc))

    def round_primal(self, mode="damped_uniform"):
        mode = ReparametrizationMode.convert(mode)
        if mode not in self._rounds:
            self._rounds[mode] = self._make_round(mode)
        s = self.state
        out, x, ub = self._rounds[mode](s["u"], s["hm1"], s["hm2"], s["vm1"],
                                        s["vm2"], self.hc_ext, self.vc_ext)
        self.state = dict(zip(("u", "hm1", "hm2", "vm1", "vm2"), out))
        L, R, C, H, W, P = self.geom
        return np.asarray(x)[P:P + H, 1:1 + W], float(ub)

    def dense_state(self):
        return to_dense(self.state, self.geom)
