"""Batched message-passing engine.

TPU-native counterpart of ``LP<FMC>`` (LP_MP.h:200-2056).  The reference
iterates heterogeneous factor objects sequentially; here the factor graph is
compiled to

- one dense padded cost block per *factor type*,
- gather/scatter index arrays per *message type*,
- a static *phase schedule* (schedule.levelize) under which running each
  phase fully batched is exactly equivalent to the reference's sequential
  sweep (``schedule_mode="sequential"`` degenerates to one factor per phase
  and serves as the in-tree oracle for parity tests).

One sweep direction compiles to a single jitted function: per phase,
receive deltas are gathered/reduced/scattered (ReceiveMessages,
factors_messages.hxx:2440-2471), then send deltas are computed from one
post-receive snapshot (SendMessages' tmp_factor semantics,
factors_messages.hxx:2787-2814) and scattered with their omega weights.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import Direction, ReparametrizationMode, real_dtype
from .graph import FactorGraph
from .registry import FactorType, MessageType
from . import schedule as sched


def _gather(block: dict, idx) -> dict:
    return {k: v[idx] for k, v in block.items()}


def _bmul(delta: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Multiply [M, ...] delta by per-message scalar weight [M]."""
    return delta * w.reshape((-1,) + (1,) * (delta.ndim - 1))


@dataclasses.dataclass
class _MsgBlock:
    mtype: MessageType
    lidx: np.ndarray       # [M] local row in left factor block
    ridx: np.ndarray       # [M] local row in right factor block
    gids: np.ndarray       # [M] global message index (for weight slicing)
    data: dict             # static per-message data


@dataclasses.dataclass
class _PhasePlan:
    recv_left: list[tuple[str, np.ndarray]]   # (msg type name, local msg ids)
    recv_right: list[tuple[str, np.ndarray]]
    send_left: list[tuple[str, np.ndarray]]
    send_right: list[tuple[str, np.ndarray]]
    factor_rows: dict[str, np.ndarray]        # factor type name -> local rows
    prop_l2r: list[tuple[str, np.ndarray]]
    prop_r2l: list[tuple[str, np.ndarray]]


class Engine:
    """Compiled model + jitted passes over it."""

    def __init__(self, graph: FactorGraph, schedule_mode: str = "wavefront",
                 use_jit: bool = True):
        assert schedule_mode in ("wavefront", "coloring", "sequential")
        self.graph = graph
        self.schedule_mode = schedule_mode
        self.constant = graph.constant
        n = graph.n_factors

        # ---- factor blocks -------------------------------------------------
        self.ftypes: dict[str, FactorType] = {}
        by_type: dict[str, list] = {}
        self.f_local = np.zeros(n, dtype=np.int64)
        self.f_type = [""] * n
        for fid, (ft, data) in enumerate(graph.factors):
            self.ftypes.setdefault(ft.name, ft)
            rows = by_type.setdefault(ft.name, [])
            self.f_local[fid] = len(rows)
            self.f_type[fid] = ft.name
            rows.append(data)
        self.state = {name: {k: jnp.asarray(v) for k, v in
                             self.ftypes[name].build(rows).items()}
                      for name, rows in by_type.items()}

        # ---- message blocks ------------------------------------------------
        self.mtypes: dict[str, MessageType] = {}
        mb: dict[str, dict] = {}
        for gid, (mt, l, r, data) in enumerate(graph.messages):
            self.mtypes.setdefault(mt.name, mt)
            d = mb.setdefault(mt.name, {"l": [], "r": [], "g": [], "d": []})
            d["l"].append(self.f_local[l])
            d["r"].append(self.f_local[r])
            d["g"].append(gid)
            d["d"].append(data)
        self.msgs: dict[str, _MsgBlock] = {}
        for name, d in mb.items():
            mt = self.mtypes[name]
            built = mt.build(d["d"])
            self.msgs[name] = _MsgBlock(
                mtype=mt,
                lidx=np.asarray(d["l"], dtype=np.int64),
                ridx=np.asarray(d["r"], dtype=np.int64),
                gids=np.asarray(d["g"], dtype=np.int64),
                data={k: jnp.asarray(v) for k, v in built.items()})

        # ---- schedule ------------------------------------------------------
        self.descs = graph.message_descs()
        self.updated = sched.factor_updated_mask(n, self.descs)

        if schedule_mode == "coloring":
            fwd_order = sched.coloring_order(n, self.descs, self.updated)
            bwd_order = fwd_order[::-1]
        else:
            fwd_order = sched.toposort(n, graph.forward_relations)
            bwd_order = sched.toposort(n, graph.backward_relations) \
                if graph.backward_relations else fwd_order[::-1]
        self.orders = {Direction.forward: fwd_order, Direction.backward: bwd_order}

        if schedule_mode == "sequential":
            phases = {d: [[f] for f in o if self.updated[f]]
                      for d, o in self.orders.items()}
        else:
            phases = {d: sched.levelize(o, n, self.descs, self.updated)
                      for d, o in self.orders.items()}
        self.phases = phases
        self.plans = {d: self._build_plans(phases[d]) for d in phases}

        # factors outside the update schedule (no messages — FactorUpdated()
        # skip, factors_messages.hxx:3125-3140) still need a primal in
        # rounding passes: collect their rows per type
        unupd: dict[str, list[int]] = {}
        for fid in range(n):
            if not self.updated[fid]:
                unupd.setdefault(self.f_type[fid], []).append(int(self.f_local[fid]))
        self._unupdated_rows = {k: np.asarray(v) for k, v in unupd.items()}

        self._weights_cache: dict = {}
        self._jit = use_jit
        self._pass_fns = {}
        self._primal_fns = {}
        maybe_jit = jax.jit if use_jit else (lambda f: f)
        for d in (Direction.forward, Direction.backward):
            self._pass_fns[d] = maybe_jit(self._make_pass(self.plans[d], primal=False))
            self._primal_fns[d] = maybe_jit(self._make_pass(self.plans[d], primal=True))
        self._lb_fn = maybe_jit(self._lower_bound_impl)
        self._eval_fn = maybe_jit(self._evaluate_impl)

    # ------------------------------------------------------------------
    def _build_plans(self, phases: Sequence[Sequence[int]]) -> list[_PhasePlan]:
        # per message type, map factor id -> incident message local ids
        by_left: dict[str, dict[int, list[int]]] = {}
        by_right: dict[str, dict[int, list[int]]] = {}
        for name, blk in self.msgs.items():
            dl: dict[int, list[int]] = {}
            dr: dict[int, list[int]] = {}
            for i, (mt, l, r, _) in enumerate(
                    (self.graph.messages[g] for g in blk.gids)):
                dl.setdefault(l, []).append(i)
                dr.setdefault(r, []).append(i)
            by_left[name] = dl
            by_right[name] = dr

        plans = []
        for phase in phases:
            pset = list(phase)
            rl, rr, sl, sr, pl2r, pr2l = [], [], [], [], [], []
            frows: dict[str, list[int]] = {}
            for f in pset:
                frows.setdefault(self.f_type[f], []).append(int(self.f_local[f]))
            for name, blk in self.msgs.items():
                s = blk.mtype.schedule
                left_ids = [i for f in pset for i in by_left[name].get(f, ())]
                right_ids = [i for f in pset for i in by_right[name].get(f, ())]
                if left_ids:
                    if s.left_receives:
                        rl.append((name, np.asarray(left_ids)))
                    if s.sends_to_right:
                        sl.append((name, np.asarray(left_ids)))
                    pl2r.append((name, np.asarray(left_ids)))
                if right_ids:
                    if s.right_receives:
                        rr.append((name, np.asarray(right_ids)))
                    if s.sends_to_left:
                        sr.append((name, np.asarray(right_ids)))
                    pr2l.append((name, np.asarray(right_ids)))
            plans.append(_PhasePlan(
                recv_left=rl, recv_right=rr, send_left=sl, send_right=sr,
                factor_rows={k: np.asarray(v) for k, v in frows.items()},
                prop_l2r=pl2r, prop_r2l=pr2l))
        return plans

    # ------------------------------------------------------------------
    def _make_pass(self, plans: list[_PhasePlan], primal: bool):
        msgs = self.msgs
        ftypes = self.ftypes

        def apply_delta(state, name, ids, delta, from_left: bool):
            """Zero-sum shift: sender -= delta, other side += delta."""
            blk = msgs[name]
            mt = blk.mtype
            ln, rn = mt.left_type.name, mt.right_type.name
            lidx, ridx = blk.lidx[ids], blk.ridx[ids]
            data = _gather(blk.data, ids)
            if from_left:
                state[ln] = mt.repam_left(state[ln], lidx, -delta, data)
                state[rn] = mt.repam_right(state[rn], ridx, delta, data)
            else:
                state[rn] = mt.repam_right(state[rn], ridx, -delta, data)
                state[ln] = mt.repam_left(state[ln], lidx, delta, data)
            return state

        def run_phase(state, prim, w, plan: _PhasePlan):
            # --- receives: all deltas from phase-start state, then apply ---
            ops = []
            for name, ids in plan.recv_left:
                blk = msgs[name]
                mt = blk.mtype
                sl = _gather(state[mt.right_type.name], blk.ridx[ids])
                delta = mt.marginal_right(sl, _gather(blk.data, ids))
                ops.append((name, ids, _bmul(delta, w[name]["recv_left"][ids]), False))
            for name, ids in plan.recv_right:
                blk = msgs[name]
                mt = blk.mtype
                sl = _gather(state[mt.left_type.name], blk.lidx[ids])
                delta = mt.marginal_left(sl, _gather(blk.data, ids))
                ops.append((name, ids, _bmul(delta, w[name]["recv_right"][ids]), True))
            for name, ids, delta, from_left in ops:
                state = apply_delta(state, name, ids, delta, from_left)

            # --- primal: argmin on the post-receive reparametrization ------
            if primal:
                for tname, rows in plan.factor_rows.items():
                    ft = ftypes[tname]
                    cs = _gather(state[tname], rows)
                    ps = _gather(prim[tname], rows)
                    newp = ft.compute_primal(cs, ps)
                    prim[tname] = {k: prim[tname][k].at[rows].set(newp[k])
                                   for k in prim[tname]}

            # --- sends: all deltas from one post-receive snapshot ----------
            ops = []
            for name, ids in plan.send_left:
                blk = msgs[name]
                mt = blk.mtype
                sl = _gather(state[mt.left_type.name], blk.lidx[ids])
                delta = mt.marginal_left(sl, _gather(blk.data, ids))
                ops.append((name, ids, _bmul(delta, w[name]["omega_left"][ids]), True))
            for name, ids in plan.send_right:
                blk = msgs[name]
                mt = blk.mtype
                sl = _gather(state[mt.right_type.name], blk.ridx[ids])
                delta = mt.marginal_right(sl, _gather(blk.data, ids))
                ops.append((name, ids, _bmul(delta, w[name]["omega_right"][ids]), False))
            for name, ids, delta, from_left in ops:
                state = apply_delta(state, name, ids, delta, from_left)

            # --- primal propagation through messages -----------------------
            if primal:
                for name, ids in plan.prop_l2r:
                    blk = msgs[name]
                    mt = blk.mtype
                    ln, rn = mt.left_type.name, mt.right_type.name
                    prim[rn] = mt.propagate_primal_l2r(
                        prim[ln], prim[rn], blk.lidx[ids], blk.ridx[ids],
                        _gather(blk.data, ids))
                for name, ids in plan.prop_r2l:
                    blk = msgs[name]
                    mt = blk.mtype
                    ln, rn = mt.left_type.name, mt.right_type.name
                    prim[ln] = mt.propagate_primal_r2l(
                        prim[ln], prim[rn], blk.lidx[ids], blk.ridx[ids],
                        _gather(blk.data, ids))
            return state, prim

        if primal:
            unupdated = self._unupdated_rows

            def run(state, prim, w):
                state = dict(state)
                prim = dict(prim)
                for plan in plans:
                    state, prim = run_phase(state, prim, w, plan)
                # message-less factors: plain local argmin
                for tname, rows in unupdated.items():
                    ft = ftypes[tname]
                    newp = ft.compute_primal(_gather(state[tname], rows),
                                             _gather(prim[tname], rows))
                    prim[tname] = {k: prim[tname][k].at[rows].set(newp[k])
                                   for k in prim[tname]}
                return state, prim
        else:
            def run(state, w):
                state = dict(state)
                for plan in plans:
                    state, _ = run_phase(state, None, w, plan)
                return state
        return run

    # ------------------------------------------------------------------
    # weights
    # ------------------------------------------------------------------
    def weights(self, mode: ReparametrizationMode, direction: Direction) -> dict:
        mode = ReparametrizationMode.convert(mode)
        key = (mode, direction)
        if key not in self._weights_cache:
            w = sched.compute_weights(mode, self.orders[direction],
                                      self.graph.n_factors, self.descs,
                                      self.updated)
            assert sched.omega_valid(w, self.graph.n_factors, self.descs)
            dtype = real_dtype()
            out = {}
            for name, blk in self.msgs.items():
                g = blk.gids
                out[name] = {
                    "omega_left": jnp.asarray(w.omega_left[g], dtype=dtype),
                    "omega_right": jnp.asarray(w.omega_right[g], dtype=dtype),
                    "recv_left": jnp.asarray(w.recv_left[g], dtype=dtype),
                    "recv_right": jnp.asarray(w.recv_right[g], dtype=dtype),
                }
            self._weights_cache[key] = out
        return self._weights_cache[key]

    # ------------------------------------------------------------------
    # public API (Solver-facing, mirrors LP<FMC>)
    # ------------------------------------------------------------------
    def compute_forward_pass(self, mode) -> None:
        self.state = self._pass_fns[Direction.forward](
            self.state, self.weights(mode, Direction.forward))

    def compute_backward_pass(self, mode) -> None:
        self.state = self._pass_fns[Direction.backward](
            self.state, self.weights(mode, Direction.backward))

    def compute_pass(self, mode) -> None:
        """One iteration = forward + backward sweep (LP_MP.h:869-887)."""
        self.compute_forward_pass(mode)
        self.compute_backward_pass(mode)

    def init_primal(self) -> dict:
        return {name: self.ftypes[name].init_primal(block)
                for name, block in self.state.items()}

    def compute_pass_and_primal(self, mode, direction: Direction) -> dict:
        """Rounding pass: fresh primal, interleaved with the sweep
        (LP_MP.h:913-940; the reference's timestamp lazy-init is a fresh
        init per pass)."""
        prim = self.init_primal()
        self.state, prim = self._primal_fns[direction](
            self.state, prim, self.weights(mode, direction))
        return prim

    def lower_bound(self) -> float:
        return float(self._lb_fn(self.state)) + self.constant

    def _lower_bound_impl(self, state):
        total = jnp.asarray(0.0, dtype=real_dtype())
        for name, block in state.items():
            total = total + jnp.sum(self.ftypes[name].lower_bound(block))
        return total

    def evaluate_primal(self, prim: dict) -> float:
        return float(self._eval_fn(self.state, prim)) + self.constant

    def _evaluate_impl(self, state, prim):
        cost = jnp.asarray(0.0, dtype=real_dtype())
        for name, block in state.items():
            cost = cost + jnp.sum(self.ftypes[name].evaluate_primal(block, prim[name]))
        ok = jnp.asarray(True)
        for name, blk in self.msgs.items():
            mt = blk.mtype
            c = mt.consistent(prim[mt.left_type.name], prim[mt.right_type.name],
                              blk.lidx, blk.ridx, blk.data)
            ok = ok & jnp.all(c)
        return jnp.where(ok, cost, jnp.inf)

    def check_primal_consistency(self, prim: dict) -> bool:
        ok = True
        for name, blk in self.msgs.items():
            mt = blk.mtype
            c = mt.consistent(prim[mt.left_type.name], prim[mt.right_type.name],
                              blk.lidx, blk.ridx, blk.data)
            ok = ok and bool(jnp.all(c))
        return ok

    # snapshots (serialization.hxx analogue: duals are already a pytree)
    def get_state(self):
        return jax.tree_util.tree_map(lambda x: x, self.state)

    def set_state(self, state):
        self.state = state
