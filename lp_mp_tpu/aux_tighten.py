"""Incremental tightening: bucketed auxiliary triplet pass.

The reference mutates its LP in place when tightening adds triplet factors
(Solver::Tighten, solver.hxx:192-212); under XLA a graph rebuild means a
re-jit of every pass.  This module absorbs the common tightening shape —
ternary simplex factors coupled to *existing* dense pairwise factors
(MrfConstructor.add_tightening_triplet) — into a side pass whose compiled
function takes every changing quantity (pairwise row indices, active-row
weights) as ARGUMENTS in size-doubled buckets:

- adding triplets within capacity re-uses the jitted update unchanged
  (same shapes -> XLA cache hit, zero recompiles);
- capacity overflow doubles the bucket (one small re-jit, amortized
  logarithmically — SURVEY §7 "preallocate padded buckets, recompile only
  on bucket growth");
- anything else (new pairwise chord factors, other factor types) falls
  back to the full engine rebuild, after which the absorbed rows are
  folded into the rebuilt engine.

The pass itself is one MPLP-style block-coordinate step per iteration:
each triplet receives the full reparametrized matrices of its three
pairwise factors and returns the three min-marginals with weight 1/3 —
the same fixed point as the integrated schedule (the triplet cluster
update of cycle_inequalities.hxx / Sontag et al.), run after the engine's
unary/pairwise sweep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import PAD_COST, real_dtype
from .factors.simplex import PAIRWISE_SIMPLEX, TERNARY_SIMPLEX
from .messages.pairwise_triplet import (PAIRWISE_TRIPLET_12,
                                        PAIRWISE_TRIPLET_13,
                                        PAIRWISE_TRIPLET_23)

_SLOTS = (PAIRWISE_TRIPLET_12, PAIRWISE_TRIPLET_13, PAIRWISE_TRIPLET_23)
_MIN_CAP = 8


class AuxTripletPass:
    """Side block of tightening triplets over an engine's pairwise block."""

    def __init__(self):
        self.cap = 0
        self.n = 0
        self.c = None               # [cap, L1, L2, L3] triplet duals
        self.lidx = None            # [3, cap] pairwise rows (0 on inactive)
        self.active = None          # [cap] float mask
        self.w_recv = None          # [3, cap] receive weights (1/#sharers)
        self.fids: list[int] = []   # graph factor ids of absorbed triplets
        self._dims = None
        # host-side staging: add() must not touch the device (a tightening
        # round absorbs hundreds of triplets, and one device round-trip per
        # add cost ~15 s per tighten on the tunnel runtime); _sync() writes
        # all pending rows in one batched update
        self._pending: list[tuple[np.ndarray, tuple[int, int, int]]] = []
        self._lidx_host: list[tuple[int, int, int]] = []
        self._update = jax.jit(self._update_impl)
        self._lb = jax.jit(lambda c, m: jnp.sum(
            jnp.minimum(jnp.min(c, axis=(1, 2, 3)), 0.0) * m))
        self._eval = jax.jit(self._eval_impl)

    def __bool__(self):
        return self.n > 0

    # ------------------------------------------------------------------
    def add(self, engine, fid: int, data: np.ndarray,
            pairwise_rows: tuple[int, int, int]) -> None:
        """Absorb one ternary factor with its three pairwise endpoints
        (rows into the engine's dense pairwise block, slot order 12/13/23).
        Host-side staging only; the device arrays update on next use."""
        dims = tuple(data.shape)
        if self._dims is None:
            # label capacity = the engine's padded pairwise width (chords of
            # bigger label counts would not be absorbable anyway)
            Lp = engine.state[PAIRWISE_SIMPLEX.name]["c"].shape[1:]
            self._dims = (max(dims[0], Lp[0]), max(dims[1], Lp[1]),
                          max(dims[2], Lp[0], Lp[1]))
        dims_cap = self._dims
        assert all(d <= dc for d, dc in zip(dims, dims_cap))
        block = np.full(dims_cap, PAD_COST, dtype=real_dtype())
        block[:dims[0], :dims[1], :dims[2]] = data
        self._pending.append((block, tuple(int(r) for r in pairwise_rows)))
        self._lidx_host.append(tuple(int(r) for r in pairwise_rows))
        self.fids.append(fid)
        self.n += 1

    def _sync(self) -> None:
        """Write staged rows into the device arrays (one batched update)
        and refresh the shared-pairwise receive weights."""
        if not self._pending:
            return
        if self.n > self.cap:
            new_cap = max(_MIN_CAP, self.cap)
            while new_cap < self.n:
                new_cap *= 2
            self._grow(new_cap)
        n0 = self.n - len(self._pending)
        blocks = np.stack([b for b, _ in self._pending])
        rows = np.stack([r for _, r in self._pending], axis=1)  # [3, P]
        self.c = self.c.at[n0:self.n].set(jnp.asarray(blocks))
        self.lidx = self.lidx.at[:, n0:self.n].set(
            jnp.asarray(rows, dtype=jnp.int32))
        self.active = self.active.at[n0:self.n].set(1.0)
        self._pending = []
        # receive weight 1/k per message, k = #triplet slots pulling from the
        # same pairwise row: the batched receive splits the marginal evenly,
        # draining the pairwise exactly once (monotone: min is superadditive)
        li = np.asarray(self._lidx_host, dtype=np.int64).T  # [3, n]
        cnt = np.bincount(li.reshape(-1),
                          minlength=int(li.max(initial=0)) + 1)
        w = np.zeros((3, self.cap), dtype=real_dtype())
        w[:, :self.n] = 1.0 / cnt[li]
        self.w_recv = jnp.asarray(w)

    def _grow(self, new_cap: int) -> None:
        dt = real_dtype()
        c = jnp.full((new_cap,) + self._dims, PAD_COST, dtype=dt)
        lidx = jnp.zeros((3, new_cap), dtype=jnp.int32)
        active = jnp.zeros(new_cap, dtype=dt)
        if self.cap:
            c = c.at[:self.cap].set(self.c)
            lidx = lidx.at[:, :self.cap].set(self.lidx)
            active = active.at[:self.cap].set(self.active)
        self.c, self.lidx, self.active, self.cap = c, lidx, active, new_cap

    # ------------------------------------------------------------------
    def _update_impl(self, pw_c, c, lidx, active, w_recv):
        """One triplet cluster update: receive the pairwise matrices (split
        1/k between triplets sharing a factor), send back 1/3 min-marginals.
        Inactive rows carry weight 0 and point at pairwise row 0 — a no-op
        lane."""
        w = active
        # receives: deltas from the pre-update pairwise state
        deltas = []
        for s, mt in enumerate(_SLOTS):
            d = mt.marginal_left({"c": pw_c[lidx[s]]}, {})
            deltas.append(d * w_recv[s][:, None, None])
        for s, mt in enumerate(_SLOTS):
            pw = mt.repam_left({"c": pw_c}, lidx[s], -deltas[s], {})
            pw_c = pw["c"]
            tr = mt.repam_right({"c": c}, jnp.arange(c.shape[0]), deltas[s], {})
            c = tr["c"]
        # sends: 1/3 of each min-marginal, from one post-receive snapshot
        snap = c
        for s, mt in enumerate(_SLOTS):
            d = mt.marginal_right({"c": snap}, {}) * (w / 3.0)[:, None, None]
            tr = mt.repam_right({"c": c}, jnp.arange(c.shape[0]), -d, {})
            c = tr["c"]
            pw = mt.repam_left({"c": pw_c}, lidx[s], d, {})
            pw_c = pw["c"]
        return pw_c, c

    def run(self, engine) -> None:
        if not self.n:
            return
        self._sync()
        pw = engine.state[PAIRWISE_SIMPLEX.name]
        new_pw_c, self.c = self._update(pw["c"], self.c, self.lidx,
                                        self.active, self.w_recv)
        engine.state[PAIRWISE_SIMPLEX.name] = {**pw, "c": new_pw_c}

    # ------------------------------------------------------------------
    def lower_bound(self) -> float:
        if not self.n:
            return 0.0
        self._sync()
        return float(self._lb(self.c, self.active))

    def _eval_impl(self, c, lidx, active, pw_prim):
        tp = TERNARY_SIMPLEX.init_primal({"c": c})
        ridx = jnp.arange(c.shape[0])
        for s, mt in enumerate(_SLOTS):
            tp = mt.propagate_primal_l2r(pw_prim, tp, lidx[s], ridx, {})
        act = active > 0
        ok = True
        for s, mt in enumerate(_SLOTS):
            cons = mt.consistent(pw_prim, tp, lidx[s], ridx, {})
            ok = ok & jnp.all(jnp.where(act, cons, True))
        val = TERNARY_SIMPLEX.evaluate_primal({"c": c}, tp)
        total = jnp.sum(jnp.where(act, val, 0.0))
        return jnp.where(ok, total, jnp.inf)

    def evaluate_primal(self, engine, prim) -> float:
        """Triplet primal by propagation from the pairwise labels; returns
        the triplets' cost, +inf if any active triplet is inconsistent.
        One jitted call: the unjitted op-by-op version paid ~10 dispatch
        round-trips per evaluation on the tunnel runtime."""
        if not self.n:
            return 0.0
        self._sync()
        return float(self._eval(self.c, self.lidx, self.active,
                                prim[PAIRWISE_SIMPLEX.name]))

    # ------------------------------------------------------------------
    def fold_into(self, engine) -> None:
        """After a full rebuild, write absorbed triplet duals into the
        engine's ternary block and reset this pass."""
        if not self.n:
            return
        self._sync()
        name = TERNARY_SIMPLEX.name
        block = dict(engine.state[name])
        rows = engine.f_local[np.asarray(self.fids)]
        tgt = block["c"]
        src = self.c[:self.n]
        if src.shape[1:] != tgt.shape[1:]:
            sl = tuple(slice(0, min(a, b))
                       for a, b in zip(src.shape[1:], tgt.shape[1:]))
            sub = tgt[rows]
            sub = sub.at[(slice(None),) + sl].set(src[(slice(None),) + sl])
            tgt = tgt.at[rows].set(sub)
        else:
            tgt = tgt.at[rows].set(src)
        block["c"] = tgt
        engine.state[name] = block
        self.cap = self.n = 0
        self.c = self.lidx = self.active = self.w_recv = None
        self.fids = []
        self._dims = None
        self._pending = []
        self._lidx_host = []


def absorbable(graph, engine, n0: int, m0: int) -> "list | None":
    """If every factor/message added past (n0, m0) is a ternary simplex
    coupled to EXISTING dense pairwise factors, return the absorption list
    [(fid, data, (row12, row13, row23))]; else None (full rebuild)."""
    new_f = list(range(n0, graph.n_factors))
    if not new_f:
        return None
    for fid in new_f:
        if graph.factors[fid][0] is not TERNARY_SIMPLEX:
            return None
    slots_of: dict[int, dict[int, int]] = {fid: {} for fid in new_f}
    slot_id = {m.name: s for s, m in enumerate(_SLOTS)}
    for mt, l, r, _ in graph.messages[m0:]:
        if mt.name not in slot_id or r not in slots_of or l >= len(engine.f_local):
            return None
        if graph.factors[l][0] is not PAIRWISE_SIMPLEX:
            return None
        slots_of[r][slot_id[mt.name]] = int(engine.f_local[l])
    out = []
    for fid in new_f:
        if sorted(slots_of[fid]) != [0, 1, 2]:
            return None
        _, data = graph.factors[fid]
        out.append((fid, np.asarray(data, dtype=np.float64),
                    tuple(slots_of[fid][s] for s in range(3))))
    return out


class AuxMulticutTripletPass:
    """Multicut twin of AuxTripletPass: tightening triplet factors over an
    engine's multicut EDGE block, absorbed without an engine rebuild when a
    separation round adds only triplets on existing edges (on triangulated
    graphs every round after the chords exist — each rebuild costs a full
    re-jit of every pass, the dominant wall-time of the multicut e2e
    solve).  Same bucket protocol and update semantics: receive the three
    edge costs (split 1/k between triplets sharing an edge), send back 1/3
    min-marginals from one snapshot."""

    def __init__(self):
        from .factors.multicut import MULTICUT_TRIPLET  # noqa: F401
        self.cap = 0
        self.n = 0
        self.c = None               # [cap, 4] triplet duals
        self.lidx = None            # [3, cap] edge rows (0 on inactive)
        self.active = None          # [cap] float mask
        self.w_recv = None
        self.fids: list[int] = []
        self._pending: list[tuple[int, int, int]] = []
        self._update = jax.jit(self._update_impl)
        self._lb = jax.jit(lambda c, m: jnp.sum(
            jnp.minimum(jnp.min(c, axis=1), 0.0) * m))
        self._eval = jax.jit(self._eval_impl)

    def __bool__(self):
        return self.n > 0

    def add(self, engine, fid: int, edge_rows) -> None:
        self._pending.append(tuple(int(r) for r in edge_rows))
        self.fids.append(fid)
        self.n += 1

    def _sync(self) -> None:
        if not self._pending:
            return
        if self.n > self.cap:
            new_cap = max(_MIN_CAP, self.cap)
            while new_cap < self.n:
                new_cap *= 2
            dt = real_dtype()
            c = jnp.zeros((new_cap, 4), dtype=dt)
            lidx = jnp.zeros((3, new_cap), dtype=jnp.int32)
            active = jnp.zeros(new_cap, dtype=dt)
            if self.cap:
                c = c.at[:self.cap].set(self.c)
                lidx = lidx.at[:, :self.cap].set(self.lidx)
                active = active.at[:self.cap].set(self.active)
            self.c, self.lidx, self.active, self.cap = c, lidx, active, new_cap
        n0 = self.n - len(self._pending)
        rows = np.stack(self._pending, axis=1)          # [3, P]
        self.lidx = self.lidx.at[:, n0:self.n].set(
            jnp.asarray(rows, dtype=jnp.int32))
        self.active = self.active.at[n0:self.n].set(1.0)
        self._pending = []
        li = np.asarray(self.lidx)[:, :self.n].astype(np.int64)
        cnt = np.bincount(li.reshape(-1),
                          minlength=int(li.max(initial=0)) + 1)
        w = np.zeros((3, self.cap), dtype=real_dtype())
        w[:, :self.n] = 1.0 / cnt[li]
        self.w_recv = jnp.asarray(w)

    def _update_impl(self, edge_c, c, lidx, active, w_recv):
        from .messages.multicut import (MULTICUT_EDGE_TRIPLET_0,
                                        MULTICUT_EDGE_TRIPLET_1,
                                        MULTICUT_EDGE_TRIPLET_2)
        slots = (MULTICUT_EDGE_TRIPLET_0, MULTICUT_EDGE_TRIPLET_1,
                 MULTICUT_EDGE_TRIPLET_2)
        ridx = jnp.arange(c.shape[0])
        deltas = []
        for s, mt in enumerate(slots):
            d = mt.marginal_left({"c": edge_c[lidx[s]]}, {})
            deltas.append(d * w_recv[s][:, None])
        for s, mt in enumerate(slots):
            edge_c = mt.repam_left({"c": edge_c}, lidx[s], -deltas[s], {})["c"]
            c = mt.repam_right({"c": c}, ridx, deltas[s], {})["c"]
        snap = c
        for s, mt in enumerate(slots):
            d = mt.marginal_right({"c": snap}, {}) * (active / 3.0)[:, None]
            c = mt.repam_right({"c": c}, ridx, -d, {})["c"]
            edge_c = mt.repam_left({"c": edge_c}, lidx[s], d, {})["c"]
        return edge_c, c

    def run(self, engine) -> None:
        if not self.n:
            return
        from .factors.multicut import MULTICUT_EDGE
        self._sync()
        blk = engine.state[MULTICUT_EDGE.name]
        new_c, self.c = self._update(blk["c"], self.c, self.lidx,
                                     self.active, self.w_recv)
        engine.state[MULTICUT_EDGE.name] = {**blk, "c": new_c}

    def lower_bound(self) -> float:
        if not self.n:
            return 0.0
        self._sync()
        return float(self._lb(self.c, self.active))

    def _eval_impl(self, c, lidx, active, edge_x):
        from .factors.multicut import MULTICUT_TRIPLET
        from .messages.multicut import (MULTICUT_EDGE_TRIPLET_0,
                                        MULTICUT_EDGE_TRIPLET_1,
                                        MULTICUT_EDGE_TRIPLET_2)
        slots = (MULTICUT_EDGE_TRIPLET_0, MULTICUT_EDGE_TRIPLET_1,
                 MULTICUT_EDGE_TRIPLET_2)
        tp = MULTICUT_TRIPLET.init_primal({"c": c})
        ridx = jnp.arange(c.shape[0])
        for s, mt in enumerate(slots):
            tp = mt.propagate_primal_l2r({"x": edge_x}, tp, lidx[s], ridx, {})
        act = active > 0
        val = MULTICUT_TRIPLET.evaluate_primal({"c": c}, tp)
        # propagated bits always match the edges, so consistency is by
        # construction; masked inactive rows contribute zero
        total = jnp.sum(jnp.where(act, val, 0.0))
        return jnp.where(jnp.isfinite(total), total, jnp.inf)

    def evaluate_primal(self, engine, prim) -> float:
        if not self.n:
            return 0.0
        from .factors.multicut import MULTICUT_EDGE
        self._sync()
        return float(self._eval(self.c, self.lidx, self.active,
                                prim[MULTICUT_EDGE.name]["x"]))

    def fold_into(self, engine) -> None:
        if not self.n:
            return
        from .factors.multicut import MULTICUT_TRIPLET
        self._sync()
        name = MULTICUT_TRIPLET.name
        block = dict(engine.state[name])
        rows = engine.f_local[np.asarray(self.fids)]
        block["c"] = block["c"].at[rows].set(self.c[:self.n])
        engine.state[name] = block
        self.cap = self.n = 0
        self.c = self.lidx = self.active = self.w_recv = None
        self.fids = []
        self._pending = []


def absorbable_multicut(graph, engine, n0: int, m0: int) -> "list | None":
    """If every factor/message added past (n0, m0) is a multicut triplet
    coupled to EXISTING edge factors, return [(fid, (row0, row1, row2))];
    else None (full rebuild).  Counterpart of ``absorbable`` for the
    multicut FMC."""
    from .factors.multicut import MULTICUT_EDGE, MULTICUT_TRIPLET
    from .messages.multicut import (MULTICUT_EDGE_TRIPLET_0,
                                    MULTICUT_EDGE_TRIPLET_1,
                                    MULTICUT_EDGE_TRIPLET_2)
    slot_id = {m.name: s for s, m in enumerate(
        (MULTICUT_EDGE_TRIPLET_0, MULTICUT_EDGE_TRIPLET_1,
         MULTICUT_EDGE_TRIPLET_2))}
    new_f = list(range(n0, graph.n_factors))
    if not new_f:
        return None
    for fid in new_f:
        if graph.factors[fid][0] is not MULTICUT_TRIPLET:
            return None
    slots_of: dict[int, dict[int, int]] = {fid: {} for fid in new_f}
    for mt, l, r, _ in graph.messages[m0:]:
        if mt.name not in slot_id or r not in slots_of                 or l >= len(engine.f_local):
            return None
        if graph.factors[l][0] is not MULTICUT_EDGE:
            return None
        slots_of[r][slot_id[mt.name]] = int(engine.f_local[l])
    out = []
    for fid in new_f:
        if sorted(slots_of[fid]) != [0, 1, 2]:
            return None
        out.append((fid, tuple(slots_of[fid][s] for s in range(3))))
    return out


class AuxPasses:
    """Composite of the per-FMC absorb passes the Solver holds: routes a
    tightening round's additions to whichever pass can absorb them (MRF
    ternary triplets or multicut triplets), and fans the per-iteration
    run/bound/primal hooks to every active pass."""

    def __init__(self):
        self.mrf = AuxTripletPass()
        self.mc = AuxMulticutTripletPass()

    def __bool__(self):
        return bool(self.mrf) or bool(self.mc)

    @property
    def n(self) -> int:
        """Total absorbed factors across passes."""
        return self.mrf.n + self.mc.n

    def absorb(self, graph, engine, n0: int, m0: int) -> bool:
        items = absorbable(graph, engine, n0, m0)
        if items is not None:
            for fid, data, rows in items:
                self.mrf.add(engine, fid, data, rows)
            return True
        mitems = absorbable_multicut(graph, engine, n0, m0)
        if mitems is not None:
            for fid, rows in mitems:
                self.mc.add(engine, fid, rows)
            return True
        return False

    def run(self, engine) -> None:
        self.mrf.run(engine)
        self.mc.run(engine)

    def lower_bound(self) -> float:
        return self.mrf.lower_bound() + self.mc.lower_bound()

    def evaluate_primal(self, engine, prim) -> float:
        return (self.mrf.evaluate_primal(engine, prim)
                + self.mc.evaluate_primal(engine, prim))

    def fold_into(self, engine) -> None:
        self.mrf.fold_into(engine)
        self.mc.fold_into(engine)
