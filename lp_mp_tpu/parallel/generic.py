"""Sharded generic engine: the single-device phase schedule executed over a
``jax.sharding.Mesh``, with cut-edge dual consensus via ``psum``.

This is the TPU-native counterpart of the reference's partition pass with
push weights (/root/reference/include/LP_MP.h:1791-1821, :1931-2051), as
SURVEY.md §2.7 specifies: shard the factor graph, run each phase's factor
updates device-parallel, reconcile the deltas that cross shard boundaries
with one ICI collective per application point.

Design (exact, not approximate):

- every factor row gets an *owner* device; each type's block is stored
  stacked ``[n_dev, F_loc, ...]``, sharded over the mesh axis;
- every message-op instance (receive/send of one message in one phase) is
  assigned to the device owning its *sender* row — min-marginal deltas are
  computed from purely local reads (the scan body reads only sender rows);
- the sender-side half of the zero-sum update (``-δ``) is always local;
  the receiver-side half (``+δ``) is scattered either into the local block
  (receiver owned here) or into a compact cut-row delta buffer
  ``[C_t+1, ...]`` that is ``psum``-reduced across the mesh, after which
  each owner adds its slots — every repam is an additive scatter (the
  zero-sum contract, factors_messages.hxx:425-510), so the psum
  application is exact up to float reassociation;
- receives apply before sends within a phase exactly like the
  single-device scan body, so sharded and single-device execution perform
  the *same* block-coordinate steps (tests pin f64 parity at 1e-9);
- primal propagation ops are assigned to the *receiver*'s owner; the cut
  source-primal rows are broadcast by psum (each slot has exactly one
  owner-writer, everyone else contributes zeros).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Direction, real_dtype
from ..engine import Engine, _gather

try:                                    # jax>=0.6 top-level shard_map
    from jax import shard_map as _shard_map

    def _smap(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:                     # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

    def _smap(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)


AXIS = "shard"

# op kind -> (sender side, weight key)
_KINDS = {"rl": ("right", "recv_left"),
          "rr": ("left", "recv_right"),
          "sl": ("left", "omega_left"),
          "sr": ("right", "omega_right")}


def _stack_pad(per_dev: list[np.ndarray], pad: int) -> np.ndarray:
    """Stack per-device 1-D int arrays into [n_dev, W], padded with ``pad``
    (an out-of-bounds index -> dropped writes / clamped reads)."""
    W = max((len(v) for v in per_dev), default=0)
    out = np.full((len(per_dev), max(W, 1)), pad, dtype=np.int32)
    for d, v in enumerate(per_dev):
        out[d, :len(v)] = v
    return out


class ShardedEngine:
    """Engine-compatible facade running passes over a device mesh."""

    def __init__(self, graph, mesh: "Mesh | None" = None,
                 devices: "Sequence | None" = None,
                 schedule_mode: str = "coloring",
                 owner: "np.ndarray | None" = None):
        if mesh is None:
            devices = list(devices if devices is not None else jax.devices())
            mesh = Mesh(np.asarray(devices), (AXIS,))
        assert mesh.axis_names == (AXIS,)
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        # host-side oracle: schedule, weights, blocks (its jitted pass fns
        # are built lazily and never called here)
        base = Engine(graph, schedule_mode=schedule_mode, use_jit=True,
                      pass_style="unrolled")
        self.base = base
        self.graph = graph
        self.constant = graph.constant
        n = graph.n_factors

        # ---- ownership: balanced contiguous chunks of the LOCALITY order
        # (construct_factor_partition contiguity, LP_MP.h:1716-1842).
        # NOT the schedule order: the coloring order groups by color, so
        # contiguous chunks of it put every red-black edge on the cut
        # (measured: 88k cut pairwise rows on a 304x304 grid at n=2, 3.5 MB
        # per collective).  The relation toposort follows the model's
        # construction geometry (row-major for grids), giving boundary-only
        # cuts.
        if owner is None:
            from .. import schedule as _sched
            order = np.asarray(_sched.toposort(n, graph.forward_relations))
            owner = np.zeros(n, dtype=np.int32)
            for d, ch in enumerate(np.array_split(order, self.n_dev)):
                owner[ch] = d
            rest = np.setdiff1d(np.arange(n), order)
            if len(rest):
                owner[rest] = rest % self.n_dev
        self.owner = np.asarray(owner, dtype=np.int32)
        assert self.owner.shape == (n,)
        assert self.owner.max(initial=0) < self.n_dev

        # per type: device and device-local index of each type-local row
        self.row_dev: dict[str, np.ndarray] = {}
        self.row_loc: dict[str, np.ndarray] = {}
        self.F_loc: dict[str, int] = {}
        self._perm: dict[str, list[np.ndarray]] = {}   # dev -> rows (local)
        for tname, fids in base._type_fids.items():
            dev = self.owner[fids]
            loc = np.zeros(len(fids), dtype=np.int32)
            perm = []
            for d in range(self.n_dev):
                rows = np.nonzero(dev == d)[0]
                loc[rows] = np.arange(len(rows))
                perm.append(rows)
            self.row_dev[tname] = dev
            self.row_loc[tname] = loc
            self.F_loc[tname] = max(1, max(len(p) for p in perm))
            self._perm[tname] = perm

        # ---- stacked local state -----------------------------------------
        self._shard1 = NamedSharding(mesh, P(AXIS))
        self._local = {t: self._split_block(t, {k: np.asarray(v)
                                                for k, v in base.state[t]
                                                .items()})
                       for t in base.state}
        valid = {}
        for t in base.state:
            m = np.zeros((self.n_dev, self.F_loc[t]), dtype=bool)
            for d, rows in enumerate(self._perm[t]):
                m[d, :len(rows)] = True
            valid[t] = jax.device_put(m, self._shard1)
        self._valid = valid

        # unupdated factors (FactorUpdated skip): device-local rows
        unupd = {}
        for tname, fids in base._type_fids.items():
            sub = fids[~base.updated[fids]]
            rows = base.f_local[sub]                  # type-local rows
            per = [self.row_loc[tname][rows[self.owner[sub] == d]]
                   for d in range(self.n_dev)]
            if any(len(p) for p in per):
                unupd[tname] = jax.device_put(
                    _stack_pad(per, self.F_loc[tname]), self._shard1)
        self._unupd = unupd

        # ---- plan compilation ----------------------------------------------
        self._xs: dict = {}
        self._xs_phases: dict = {}
        self._cross: dict = {}
        self._nph: dict = {}
        self._find_cut_rows()
        for d in (Direction.forward, Direction.backward):
            self._xs[d] = self._compile_plans(d)
        self._ownD = self._owner_indices(self._cutD_rows, dual=True)
        self._ownP = self._owner_indices(self._cutP_rows, dual=False)

        self._pass_fns = {}
        self._primal_fns = {}
        for d in (Direction.forward, Direction.backward):
            self._pass_fns[d] = jax.jit(self._make_pass(d, primal=False))
            self._primal_fns[d] = jax.jit(self._make_pass(d, primal=True))
        self._lb_fn = jax.jit(self._make_lower_bound())

    # ------------------------------------------------------------------
    # block split/merge between global [F, ...] and stacked [n_dev, F_loc, ...]
    # ------------------------------------------------------------------
    def _split_block(self, tname: str, block: dict) -> dict:
        out = {}
        for k, v in block.items():
            arr = np.zeros((self.n_dev, self.F_loc[tname]) + v.shape[1:],
                           dtype=v.dtype)
            for d, rows in enumerate(self._perm[tname]):
                arr[d, :len(rows)] = v[rows]
            out[k] = jax.device_put(arr, self._shard1)
        return out

    def _merge_block(self, tname: str, stacked: dict) -> dict:
        n_rows = len(self.row_dev[tname])
        out = {}
        for k, v in stacked.items():
            v = np.asarray(v)
            glob = np.zeros((n_rows,) + v.shape[2:], dtype=v.dtype)
            for d, rows in enumerate(self._perm[tname]):
                glob[rows] = v[d, :len(rows)]
            out[k] = glob
        return out

    # ------------------------------------------------------------------
    # plan compilation
    # ------------------------------------------------------------------
    def _msg_ends(self, name: str, kind: str, ids: np.ndarray):
        """(sender type, sender rows, receiver type, receiver rows) for a
        message op; rows are type-local."""
        blk = self.base.msgs[name]
        mt = blk.mtype
        sside = _KINDS[kind][0] if kind in _KINDS else (
            "left" if kind == "pl" else "right")
        if sside == "right":
            return (mt.right_type.name, blk.ridx[ids],
                    mt.left_type.name, blk.lidx[ids])
        return (mt.left_type.name, blk.lidx[ids],
                mt.right_type.name, blk.ridx[ids])

    def _plan_ops(self, plan):
        yield from (("rl", name, ids) for name, ids in plan.recv_left)
        yield from (("rr", name, ids) for name, ids in plan.recv_right)
        yield from (("sl", name, ids) for name, ids, _ in plan.send_left)
        yield from (("sr", name, ids) for name, ids, _ in plan.send_right)

    def _find_cut_rows(self):
        cutD = {t: set() for t in self.base.state}
        cutP = {t: set() for t in self.base.state}
        for d in (Direction.forward, Direction.backward):
            for plan in self.base.plans[d]:
                for kind, name, ids in self._plan_ops(plan):
                    st, sr, rt, rr = self._msg_ends(name, kind, ids)
                    cross = self.row_dev[st][sr] != self.row_dev[rt][rr]
                    cutD[rt].update(rr[cross].tolist())
                for kind, oplist in (("pl", plan.prop_l2r),
                                     ("pr", plan.prop_r2l)):
                    for name, ids in oplist:
                        st, sr, rt, rr = self._msg_ends(name, kind, ids)
                        cross = self.row_dev[st][sr] != self.row_dev[rt][rr]
                        cutP[st].update(sr[cross].tolist())
        self._cutD_rows = {t: np.asarray(sorted(v), dtype=np.int64)
                           for t, v in cutD.items()}
        self._cutP_rows = {t: np.asarray(sorted(v), dtype=np.int64)
                           for t, v in cutP.items()}
        # vectorized slot maps (global type-row -> cut slot, -1 elsewhere):
        # dict lookups per message element made _compile_plans O(E) python
        # (~70 s host build at 2.8e5 factors, bench/sharded_measurements)
        def slot_arr(rows_by_t):
            out = {}
            for t, rows in rows_by_t.items():
                arr = np.full(len(self.row_dev[t]), -1, dtype=np.int32)
                arr[rows] = np.arange(len(rows), dtype=np.int32)
                out[t] = arr
            return out

        self._slotD = slot_arr(self._cutD_rows)
        self._slotP = slot_arr(self._cutP_rows)

    def _owner_indices(self, cut_rows: dict, dual: bool) -> dict:
        """Per type: stacked (slots, rows) a device owns in the cut set.
        For dual application pads drop on the ROW side (row=F_loc); for
        primal broadcast pads drop on the SLOT side (slot=C)."""
        out = {}
        for t, rows in cut_rows.items():
            if len(rows) == 0:
                continue
            per_slot, per_row = [], []
            for d in range(self.n_dev):
                sel = np.nonzero(self.row_dev[t][rows] == d)[0]
                per_slot.append(sel)
                per_row.append(self.row_loc[t][rows[sel]])
            if dual:
                slots = _stack_pad(per_slot, 0)
                rws = _stack_pad(per_row, self.F_loc[t])
            else:
                slots = _stack_pad(per_slot, len(rows))
                rws = _stack_pad(per_row, 0)
            out[t] = (jax.device_put(slots, self._shard1),
                      jax.device_put(rws, self._shard1))
        return out

    def _compile_plans(self, direction: Direction) -> dict:
        """[n_dev, n_phases, W] int32 tensors per (name, kind, field)."""
        base, n_dev = self.base, self.n_dev
        plans = base.plans[direction]
        nph = len(plans)
        self._nph[direction] = nph
        slots: dict = {}

        def put(name, kind, p, fields):
            key = (name, kind)
            if key not in slots:
                slots[key] = [None] * nph
            slots[key][p] = fields

        for p, plan in enumerate(plans):
            for kind, name, ids in self._plan_ops(plan):
                st, sr, rt, rr = self._msg_ends(name, kind, ids)
                sdev = self.row_dev[st][sr]
                rdev = self.row_dev[rt][rr]
                slot = self._slotD[rt]
                CD = len(self._cutD_rows[rt])
                mid_d, srow_d, wl_d, wc_d = [], [], [], []
                for d in range(n_dev):
                    sel = np.nonzero(sdev == d)[0]
                    mid_d.append(ids[sel])
                    srow_d.append(self.row_loc[st][sr[sel]])
                    local = rdev[sel] == d
                    wl_d.append(np.where(local, self.row_loc[rt][rr[sel]],
                                         self.F_loc[rt]))
                    wc_d.append(np.where(local, CD,
                                         slot[rr[sel]]).astype(np.int32))
                put(name, kind, p, {
                    "mid": _stack_pad(mid_d, len(base.msgs[name].gids)),
                    "srow": _stack_pad(srow_d, self.F_loc[st]),
                    "wl": _stack_pad(wl_d, self.F_loc[rt]),
                    "wc": _stack_pad(wc_d, CD)})
            for tname, rows in plan.factor_rows.items():
                dev = self.row_dev[tname][rows]
                per = [self.row_loc[tname][rows[dev == d]]
                       for d in range(n_dev)]
                put(tname, "fr", p,
                    {"rows": _stack_pad(per, self.F_loc[tname])})
            for kind, oplist in (("pl", plan.prop_l2r),
                                 ("pr", plan.prop_r2l)):
                for name, ids in oplist:
                    st, sr, rt, rr = self._msg_ends(name, kind, ids)
                    sdev = self.row_dev[st][sr]
                    rdev = self.row_dev[rt][rr]
                    slotp = self._slotP[st]
                    FL = self.F_loc[st]
                    mid_d, src_d, dst_d = [], [], []
                    for d in range(n_dev):
                        sel = np.nonzero(rdev == d)[0]
                        mid_d.append(ids[sel])
                        local = sdev[sel] == d
                        src_d.append(np.where(
                            local, self.row_loc[st][sr[sel]],
                            FL + slotp[sr[sel]]).astype(np.int32))
                        dst_d.append(self.row_loc[rt][rr[sel]])
                    put(name, kind, p, {
                        "mid": _stack_pad(mid_d, len(base.msgs[name].gids)),
                        "src": _stack_pad(
                            src_d, FL + len(self._cutP_rows[st])),
                        "dst": _stack_pad(dst_d, self.F_loc[rt])})

        # per-phase dicts with tight widths (unrolled few-phase path: no
        # max-W padding, ops only where they occur, collectives skipped
        # when a phase has no cross-shard receivers)
        xs_phase = [dict() for _ in range(nph)]
        cross = [dict() for _ in range(nph)]
        for (name, kind), per_phase in slots.items():
            for p, f in enumerate(per_phase):
                if f is None:
                    continue
                for fkey, arr in f.items():
                    xs_phase[p]["|".join((name, kind, fkey))] = \
                        jax.device_put(np.ascontiguousarray(arr),
                                       self._shard1)
                if kind in _KINDS:
                    mt = self.base.msgs[name].mtype
                    sside = _KINDS[kind][0]
                    rt = (mt.left_type.name if sside == "right"
                          else mt.right_type.name)
                    CD = len(self._cutD_rows[rt])
                    if CD and (f["wc"] < CD).any():
                        cross[p][rt] = True
        self._xs_phases[direction] = xs_phase
        self._cross[direction] = cross

        # densify to [n_dev, nph, W] (scan path for many-phase schedules)
        xs = {}
        for (name, kind), per_phase in slots.items():
            fkeys = next(f for f in per_phase if f is not None).keys()
            for fkey in fkeys:
                W = max(f[fkey].shape[1] for f in per_phase if f is not None)
                pad = self._pad_for(name, kind, fkey)
                arr = np.full((n_dev, nph, W), pad, dtype=np.int32)
                for p, f in enumerate(per_phase):
                    if f is not None:
                        arr[:, p, :f[fkey].shape[1]] = f[fkey]
                xs["|".join((name, kind, fkey))] = jax.device_put(
                    arr, self._shard1)
        return xs

    def _pad_for(self, name: str, kind: str, fkey: str) -> int:
        if kind == "fr":
            return self.F_loc[name]
        mt = self.base.msgs[name].mtype
        if fkey == "mid":
            return len(self.base.msgs[name].gids)
        if kind in ("pl", "pr"):
            st = mt.left_type.name if kind == "pl" else mt.right_type.name
            rt = mt.right_type.name if kind == "pl" else mt.left_type.name
            if fkey == "src":
                return self.F_loc[st] + len(self._cutP_rows[st])
            return self.F_loc[rt]
        sside = _KINDS[kind][0]
        st = mt.right_type.name if sside == "right" else mt.left_type.name
        rt = mt.left_type.name if sside == "right" else mt.right_type.name
        return {"srow": self.F_loc[st], "wl": self.F_loc[rt],
                "wc": len(self._cutD_rows[rt])}[fkey]

    # ------------------------------------------------------------------
    # sharded pass
    # ------------------------------------------------------------------
    def _make_pass(self, direction: Direction, primal: bool):
        base = self.base
        msgs = base.msgs
        ftypes = base.ftypes
        nph = self._nph[direction]
        xs_all = self._xs[direction]
        mesh = self.mesh
        cutD_C = {t: len(r) for t, r in self._cutD_rows.items()}
        cutP_C = {t: len(r) for t, r in self._cutP_rows.items()}
        unupd = self._unupd
        ownD, ownP = self._ownD, self._ownP

        kind_names = {k: sorted({key.split("|")[0] for key in xs_all
                                 if key.split("|")[1] == k})
                      for k in ("rl", "rr", "sl", "sr", "fr", "pl", "pr")}
        # unrolled few-phase path: per-phase op presence + cross flags
        xs_phases = self._xs_phases[direction]
        cross_ph = self._cross[direction]
        unroll = 0 < nph <= 8
        names_ph = [
            {k: sorted({key.split("|")[0] for key in xp
                        if key.split("|")[1] == k})
             for k in ("rl", "rr", "sl", "sr", "fr", "pl", "pr")}
            for xp in xs_phases]

        def compute_delta(state, w, x, kind, name):
            blk = msgs[name]
            mt = blk.mtype
            sside, wkey = _KINDS[kind]
            st = mt.right_type.name if sside == "right" else mt.left_type.name
            mid = x[f"{name}|{kind}|mid"]
            rows = _gather(state[st], x[f"{name}|{kind}|srow"])
            data = _gather(blk.data, mid)
            marg = mt.marginal_right if sside == "right" else mt.marginal_left
            delta = marg(rows, data)
            wv = w[name][wkey][mid]
            return delta * wv.reshape((-1,) + (1,) * (delta.ndim - 1))

        def apply_ops(state, own_d, x, ops, allow=None):
            bufs: dict = {}
            for kind, name, delta in ops:
                blk = msgs[name]
                mt = blk.mtype
                sside = _KINDS[kind][0]
                st = (mt.right_type.name if sside == "right"
                      else mt.left_type.name)
                rt = (mt.left_type.name if sside == "right"
                      else mt.right_type.name)
                data = _gather(blk.data, x[f"{name}|{kind}|mid"])
                repam_s = (mt.repam_right if sside == "right"
                           else mt.repam_left)
                repam_r = (mt.repam_left if sside == "right"
                           else mt.repam_right)
                state[st] = repam_s(state[st], x[f"{name}|{kind}|srow"],
                                    -delta, data)
                state[rt] = repam_r(state[rt], x[f"{name}|{kind}|wl"],
                                    delta, data)
                if cutD_C.get(rt, 0) and (allow is None or rt in allow):
                    if rt not in bufs:
                        bufs[rt] = {k: jnp.zeros(
                            (cutD_C[rt] + 1,) + v.shape[1:], v.dtype)
                            for k, v in state[rt].items()}
                    bufs[rt] = repam_r(bufs[rt], x[f"{name}|{kind}|wc"],
                                       delta, data)
            for t, buf in bufs.items():
                buf = jax.lax.psum(buf, AXIS)
                slots, rows = own_d[t]
                add = _gather(buf, slots)
                state[t] = {k: state[t][k].at[rows].add(
                    add[k].astype(state[t][k].dtype)) for k in state[t]}
            return state

        def exchange_primal(prim, own_p, types):
            out = {}
            for t in types:
                C = cutP_C.get(t, 0)
                if C == 0:
                    continue
                slots, rows = own_p[t]
                vals = _gather(prim[t], rows)
                out[t] = jax.lax.psum(
                    {k: jnp.zeros((C + 1,) + v.shape[1:], v.dtype)
                        .at[slots].set(vals[k])[:C]
                     for k, v in prim[t].items()}, AXIS)
            return out

        def make_body(w, own_d, own_p, names=None, allow=None):
            names = kind_names if names is None else names

            def body(carry, x):
                state, prim = carry
                state = dict(state)
                prim = dict(prim) if primal else prim
                ops = [(k, nm, compute_delta(state, w, x, k, nm))
                       for k in ("rl", "rr") for nm in names[k]]
                state = apply_ops(state, own_d, x, ops, allow)
                if primal:
                    for tname in names["fr"]:
                        rows = x[f"{tname}|fr|rows"]
                        newp = ftypes[tname].compute_primal(
                            _gather(state[tname], rows),
                            _gather(prim[tname], rows))
                        prim[tname] = {k: prim[tname][k].at[rows]
                                       .set(newp[k]) for k in prim[tname]}
                ops = [(k, nm, compute_delta(state, w, x, k, nm))
                       for k in ("sl", "sr") for nm in names[k]]
                state = apply_ops(state, own_d, x, ops, allow)
                if primal:
                    for kind, l2r in (("pl", True), ("pr", False)):
                        names_k = names[kind]
                        if not names_k:
                            continue
                        src_types = {
                            (msgs[nm].mtype.left_type.name if l2r
                             else msgs[nm].mtype.right_type.name)
                            for nm in names_k}
                        cut = exchange_primal(prim, own_p, src_types)
                        for name in names_k:
                            mt = msgs[name].mtype
                            st = (mt.left_type.name if l2r
                                  else mt.right_type.name)
                            rt = (mt.right_type.name if l2r
                                  else mt.left_type.name)
                            data = _gather(msgs[name].data,
                                           x[f"{name}|{kind}|mid"])
                            src = x[f"{name}|{kind}|src"]
                            dst = x[f"{name}|{kind}|dst"]
                            ext = prim[st]
                            if st in cut:
                                ext = {k: jnp.concatenate(
                                    [prim[st][k], cut[st][k]], axis=0)
                                    for k in prim[st]}
                            if l2r:
                                prim[rt] = mt.propagate_primal_l2r(
                                    ext, prim[rt], src, dst, data)
                            else:
                                prim[rt] = mt.propagate_primal_r2l(
                                    prim[rt], ext, dst, src, data)
                return (state, prim), None
            return body

        state_specs = {t: {k: P(AXIS) for k in self._local[t]}
                       for t in self._local}
        xs_specs = {k: P(AXIS) for k in xs_all}
        idx_specs = {t: (P(AXIS), P(AXIS)) for t in ownD}
        idxP_specs = {t: (P(AXIS), P(AXIS)) for t in ownP}
        unupd_specs = {t: P(AXIS) for t in unupd}

        def strip(tree):
            return jax.tree.map(lambda a: a[0], tree)

        def unstrip(tree):
            return jax.tree.map(lambda a: a[None], tree)

        xs_arg = xs_phases if unroll else xs_all
        xsu_specs = [{k: P(AXIS) for k in xp} for xp in xs_phases] \
            if unroll else xs_specs

        if primal:
            def inner(state, prim, w, xs, own_d, own_p, unu):
                state, prim = strip(state), strip(prim)
                xs = strip(xs)
                own_d, own_p, unu = strip(own_d), strip(own_p), strip(unu)
                if unroll:
                    carry = (state, prim)
                    for p in range(nph):
                        carry, _ = make_body(
                            w, own_d, own_p, names_ph[p],
                            cross_ph[p])(carry, xs[p])
                    state, prim = carry
                elif nph:
                    (state, prim), _ = jax.lax.scan(
                        make_body(w, own_d, own_p), (state, prim), xs,
                        length=nph)
                for tname, rows in unu.items():
                    newp = ftypes[tname].compute_primal(
                        _gather(state[tname], rows),
                        _gather(prim[tname], rows))
                    prim[tname] = {k: prim[tname][k].at[rows].set(newp[k])
                                   for k in prim[tname]}
                return unstrip(state), unstrip(prim)

            def run(state, prim, w):
                w_specs = jax.tree.map(lambda _: P(), w)
                prim_specs = {t: {k: P(AXIS) for k in prim[t]} for t in prim}
                fn = _smap(inner, mesh,
                           (state_specs, prim_specs, w_specs, xsu_specs,
                            idx_specs, idxP_specs, unupd_specs),
                           (state_specs, prim_specs))
                return fn(state, prim, w, xs_arg, ownD, ownP, unupd)
        else:
            def inner(state, w, xs, own_d):
                state = strip(state)
                xs = strip(xs)
                own_d = strip(own_d)
                if unroll:
                    carry = (state, None)
                    for p in range(nph):
                        carry, _ = make_body(
                            w, own_d, None, names_ph[p],
                            cross_ph[p])(carry, xs[p])
                    state = carry[0]
                elif nph:
                    (state, _), _ = jax.lax.scan(
                        make_body(w, own_d, None), (state, None), xs,
                        length=nph)
                return unstrip(state)

            def run(state, w):
                w_specs = jax.tree.map(lambda _: P(), w)
                fn = _smap(inner, mesh,
                           (state_specs, w_specs, xsu_specs, idx_specs),
                           state_specs)
                return fn(state, w, xs_arg, ownD)
        return run

    # ------------------------------------------------------------------
    def _make_lower_bound(self):
        base, mesh = self.base, self.mesh
        state_specs = {t: {k: P(AXIS) for k in self._local[t]}
                       for t in self._local}
        valid_specs = {t: P(AXIS) for t in self._valid}

        def inner(state, valid):
            state = jax.tree.map(lambda a: a[0], state)
            total = jnp.zeros((), real_dtype())
            for t, block in state.items():
                lb = base.ftypes[t].lower_bound(block)
                total = total + jnp.where(valid[t][0], lb, 0.0).sum()
            return jax.lax.psum(total, AXIS)[None]

        fn = _smap(inner, mesh, (state_specs, valid_specs), P(AXIS))
        return fn

    # ------------------------------------------------------------------
    def collective_stats(self) -> dict:
        """Per receiver type: cut-row count and bytes moved by one dual
        psum (the [C+1, ...] consensus buffer, all state keys).  Collective
        count per pass = phases x stages-with-cross-receivers; on the
        virtual CPU mesh each collective costs a fixed ~0.25 ms latency,
        so small models are latency-floored while >10^5-factor models
        amortize it (bench/sharded_measurements_out.jsonl)."""
        out = {}
        for t, rows in self._cutD_rows.items():
            if not len(rows):
                continue
            row_bytes = sum(
                int(np.prod(v.shape[2:], dtype=np.int64))
                * np.dtype(v.dtype).itemsize
                for v in self._local[t].values())
            out[t] = {"cut_rows": int(len(rows)),
                      "bytes_per_collective": int((len(rows) + 1)
                                                  * row_bytes)}
        return out

    # ------------------------------------------------------------------
    # Engine-compatible public API
    # ------------------------------------------------------------------
    def weights(self, mode, direction: Direction) -> dict:
        return self.base.weights(mode, direction)

    def compute_forward_pass(self, mode) -> None:
        self._local = self._pass_fns[Direction.forward](
            self._local, self.weights(mode, Direction.forward))

    def compute_backward_pass(self, mode) -> None:
        self._local = self._pass_fns[Direction.backward](
            self._local, self.weights(mode, Direction.backward))

    def compute_pass(self, mode) -> None:
        self.compute_forward_pass(mode)
        self.compute_backward_pass(mode)

    def lower_bound(self) -> float:
        return float(self._lb_fn(self._local, self._valid)[0]) + self.constant

    def init_primal(self) -> dict:
        out = {}
        for t, block in self._local.items():
            flat = {k: v.reshape((-1,) + v.shape[2:])
                    for k, v in block.items()}
            p = self.base.ftypes[t].init_primal(flat)
            out[t] = {k: v.reshape((self.n_dev, self.F_loc[t]) + v.shape[1:])
                      for k, v in p.items()}
        return out

    def compute_pass_and_primal(self, mode, direction: Direction) -> dict:
        prim = self.init_primal()
        self._local, prim = self._primal_fns[direction](
            self._local, prim, self.weights(mode, direction))
        return prim

    # host-side views / oracle delegation --------------------------------
    @property
    def state(self) -> dict:
        return {t: {k: jnp.asarray(v) for k, v in
                    self._merge_block(t, self._local[t]).items()}
                for t in self._local}

    def set_state(self, state) -> None:
        self._local = {t: self._split_block(
            t, {k: np.asarray(v) for k, v in state[t].items()})
            for t in state}

    def merge_primal(self, prim: dict) -> dict:
        return {t: {k: jnp.asarray(v) for k, v in
                    self._merge_block(t, prim[t]).items()} for t in prim}

    def evaluate_primal(self, prim: dict) -> float:
        self.base.state = self.state
        return self.base.evaluate_primal(self.merge_primal(prim))

    def check_primal_consistency(self, prim: dict) -> bool:
        self.base.state = self.state
        return self.base.check_primal_consistency(self.merge_primal(prim))
