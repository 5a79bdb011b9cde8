"""Multicut edge <-> triplet messages.

Reference ``multicut_edge_triplet_message`` (downstream, exercised by
test/multicut.cpp): a 1-dimensional message per (edge factor, triangle
slot).  The marginal over the message variable is the *difference*
min(cost | edge cut) - min(cost | edge uncut); Repam adds the delta to the
edge cost (left) / to the triplet entries whose pattern cuts the edge
(right).  Schedule ``left``: the edge factor drives, triplets stay passive
(same decomposition role as the pairwise factor in the MRF model).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import MessageSchedule
from ..factors.multicut import (MULTICUT_EDGE, MULTICUT_ODD_WHEEL,
                                MULTICUT_TRIPLET, ODD_WHEEL_PATTERNS,
                                TRIPLET_PATTERNS)
from ..registry import RESTRICT_BIG, MessageType, mask_pad


def _edge_restricted(base, x):
    """Edge-side restricted delta (OneSideMessageContainerView on a binary
    cut variable, factors_messages.hxx:513-566): a fixed x=0 makes the cut
    branch RESTRICT_BIG dearer, a fixed x=1 the uncut branch — the marginal
    is cut-minus-uncut so the penalty enters with sign."""
    pen = jnp.where(x == 0, RESTRICT_BIG,
                    jnp.where(x == 1, -RESTRICT_BIG, 0.0))
    return base + pen.reshape(pen.shape + (1,) * (base.ndim - 1))


def _pattern_penalty(e, patterns):
    """[M, P] RESTRICT_BIG per pattern bit inconsistent with a fixed primal
    bit; ``e`` [M, S] with -1 = unset, ``patterns`` [P, S]."""
    viol = (e[:, None, :] >= 0) & (e[:, None, :] != patterns[None])
    return RESTRICT_BIG * jnp.sum(viol, axis=2).astype(jnp.float32)


def _zero_penalty(e):
    """[M] penalty of the implicit all-uncut config under fixed bits."""
    return RESTRICT_BIG * jnp.sum(e == 1, axis=1).astype(jnp.float32)


def _wheel_conditioned(costs, e, k):
    """Wheel-k cost block conditioned on fixed edge primals ``e`` [M, 2k]:
    each fixed slot shifts its cut-vs-uncut price by RESTRICT_BIG so every
    pattern violating a fixed bit loses any min by >= BIG; per-slot the
    shift is a constant over the factor's labelings on the uncut side, so
    relative costs (hence argmin and marginal differences) are exact."""
    sgn = (e == 0).astype(jnp.float32) - (e == 1).astype(jnp.float32)
    return {**costs,
            "sp": costs["sp"] + RESTRICT_BIG * sgn[:, :k],
            "rim": costs["rim"] + RESTRICT_BIG * sgn[:, k:]}


class MulticutEdgeTripletMessage(MessageType):
    left_type = MULTICUT_EDGE
    right_type = MULTICUT_TRIPLET
    schedule = MessageSchedule.left()

    def __init__(self, slot: int):
        assert slot in (0, 1, 2)  # which triangle edge (e12, e13, e23)
        self.slot = slot
        self.name = f"multicut_edge_triplet_{slot}"
        self.cut_rows = np.nonzero(TRIPLET_PATTERNS[:, slot] == 1)[0]
        self.uncut_rows = np.nonzero(TRIPLET_PATTERNS[:, slot] == 0)[0]

    # -- marginals: [M, 1] = theta(cut) - theta(uncut) -----------------------
    def marginal_left(self, left_costs, data):
        return mask_pad(left_costs["c"][:, None])

    def marginal_right(self, right_costs, data):
        c = right_costs["c"]
        cut = jnp.min(c[:, self.cut_rows], axis=1)
        uncut = jnp.minimum(jnp.min(c[:, self.uncut_rows], axis=1), 0.0)
        return mask_pad((cut - uncut)[:, None])

    # -- restricted (primal-conditioned) marginals ------------------------
    def restricted_marginal_left(self, left_costs, left_primal, data):
        return _edge_restricted(mask_pad(left_costs["c"][:, None]),
                                left_primal["x"])

    def restricted_marginal_right(self, right_costs, right_primal, data):
        c = right_costs["c"]
        e = jnp.stack([right_primal["e1"], right_primal["e2"],
                       right_primal["e3"]], axis=1)
        cz = c + _pattern_penalty(e, jnp.asarray(TRIPLET_PATTERNS))
        cut = jnp.min(cz[:, self.cut_rows], axis=1)
        uncut = jnp.minimum(jnp.min(cz[:, self.uncut_rows], axis=1),
                            _zero_penalty(e))
        return mask_pad((cut - uncut)[:, None])

    def repam_left(self, costs, idx, delta, data):
        return {**costs, "c": costs["c"].at[idx].add(delta[:, 0])}

    def repam_right(self, costs, idx, delta, data):
        c = costs["c"]
        add = delta[:, 0:1] * jnp.asarray(TRIPLET_PATTERNS[:, self.slot],
                                          dtype=c.dtype)[None, :]
        return {**costs, "c": c.at[idx].add(add)}

    def pull_left(self, delta, data, costs):
        return {"c": delta[:, 0]}

    def pull_right(self, delta, data, costs):
        pat = jnp.asarray(TRIPLET_PATTERNS[:, self.slot],
                          dtype=costs["c"].dtype)[None, :]
        return {"c": delta[:, 0:1] * pat}

    # -- primal ------------------------------------------------------------
    def _key(self):
        return f"e{self.slot + 1}"

    def propagate_primal_l2r(self, left_primal, right_primal, lidx, ridx, data):
        k = self._key()
        return {**right_primal, k: right_primal[k].at[ridx].set(left_primal["x"][lidx])}

    def propagate_primal_r2l(self, left_primal, right_primal, lidx, ridx, data):
        v = right_primal[self._key()][ridx]
        cur = left_primal["x"][lidx]
        return {**left_primal, "x": left_primal["x"].at[lidx].set(jnp.where(v >= 0, v, cur))}

    def consistent(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        return (l >= 0) & (l == right_primal[self._key()][ridx])

    # -- constraint export: edge cut indicator == sum of triplet configs
    # cutting this slot (triplet config 0 = all-uncut) ---------------------
    def lp_coupling(self, lmeta, rmeta, data):
        return [({1: 1.0}, {1 + int(k): -1.0 for k in self.cut_rows}, 0.0)]


class MulticutEdgeWheelMessage(MessageType):
    """Edge <-> odd-3-wheel, one type per K4 edge slot
    (01, 02, 03, 12, 13, 23) — same decomposition role as the
    edge <-> triplet message, against the 14 wheel cut patterns."""

    left_type = MULTICUT_EDGE
    right_type = MULTICUT_ODD_WHEEL
    schedule = MessageSchedule.left()

    def __init__(self, slot: int):
        assert 0 <= slot < 6
        self.slot = slot
        self.name = f"multicut_edge_wheel_{slot}"
        self.cut_rows = np.nonzero(ODD_WHEEL_PATTERNS[:, slot] == 1)[0]
        self.uncut_rows = np.nonzero(ODD_WHEEL_PATTERNS[:, slot] == 0)[0]

    def marginal_left(self, left_costs, data):
        return mask_pad(left_costs["c"][:, None])

    def marginal_right(self, right_costs, data):
        c = right_costs["c"]
        cut = jnp.min(c[:, self.cut_rows], axis=1)
        uncut = jnp.minimum(jnp.min(c[:, self.uncut_rows], axis=1), 0.0)
        return mask_pad((cut - uncut)[:, None])

    # -- restricted (primal-conditioned) marginals ------------------------
    def restricted_marginal_left(self, left_costs, left_primal, data):
        return _edge_restricted(mask_pad(left_costs["c"][:, None]),
                                left_primal["x"])

    def restricted_marginal_right(self, right_costs, right_primal, data):
        c = right_costs["c"]
        e = jnp.stack([right_primal[f"e{s}"] for s in range(1, 7)], axis=1)
        cz = c + _pattern_penalty(e, jnp.asarray(ODD_WHEEL_PATTERNS))
        cut = jnp.min(cz[:, self.cut_rows], axis=1)
        uncut = jnp.minimum(jnp.min(cz[:, self.uncut_rows], axis=1),
                            _zero_penalty(e))
        return mask_pad((cut - uncut)[:, None])

    def repam_left(self, costs, idx, delta, data):
        return {**costs, "c": costs["c"].at[idx].add(delta[:, 0])}

    def repam_right(self, costs, idx, delta, data):
        c = costs["c"]
        add = delta[:, 0:1] * jnp.asarray(ODD_WHEEL_PATTERNS[:, self.slot],
                                          dtype=c.dtype)[None, :]
        return {**costs, "c": c.at[idx].add(add)}

    def pull_left(self, delta, data, costs):
        return {"c": delta[:, 0]}

    def pull_right(self, delta, data, costs):
        pat = jnp.asarray(ODD_WHEEL_PATTERNS[:, self.slot],
                          dtype=costs["c"].dtype)[None, :]
        return {"c": delta[:, 0:1] * pat}

    # -- primal ------------------------------------------------------------
    def _key(self):
        return f"e{self.slot + 1}"

    def propagate_primal_l2r(self, left_primal, right_primal, lidx, ridx, data):
        k = self._key()
        return {**right_primal, k: right_primal[k].at[ridx].set(left_primal["x"][lidx])}

    def propagate_primal_r2l(self, left_primal, right_primal, lidx, ridx, data):
        v = right_primal[self._key()][ridx]
        cur = left_primal["x"][lidx]
        return {**left_primal, "x": left_primal["x"].at[lidx].set(jnp.where(v >= 0, v, cur))}

    def consistent(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        return (l >= 0) & (l == right_primal[self._key()][ridx])

    def lp_coupling(self, lmeta, rmeta, data):
        return [({1: 1.0}, {1 + int(k): -1.0 for k in self.cut_rows}, 0.0)]


class MulticutEdgeWheelKMessage(MessageType):
    """Edge <-> odd-k-wheel message.  Unlike the K4 slot-per-type scheme,
    one type covers all 2k edge slots of the wheel: the slot index is
    per-message *data*, marginals are computed for every slot at once
    (MulticutWheelKType.slot_marginals) and gathered — 2 jit ops per wheel
    type instead of 2k message types."""

    left_type = MULTICUT_EDGE
    schedule = MessageSchedule.left()

    def __init__(self, k: int):
        from ..factors.multicut import wheel_k_type
        self.k = k
        self.right_type = wheel_k_type(k)
        self.name = f"multicut_edge_wheel_k{k}"

    def build(self, instances):
        return {"slot": np.asarray(list(instances), dtype=np.int32)}

    def build_block(self, batch):
        return {"slot": np.asarray(batch, dtype=np.int32)}

    def item_data(self, block, i):
        return int(block["slot"][i])

    # -- marginals -----------------------------------------------------------
    def marginal_left(self, left_costs, data):
        return mask_pad(left_costs["c"][:, None])

    def marginal_right(self, right_costs, data):
        allm = self.right_type.slot_marginals(right_costs)      # [M, 2k]
        sel = jnp.take_along_axis(allm, data["slot"][:, None].astype(jnp.int32),
                                  axis=1)
        return mask_pad(sel)

    # -- restricted (primal-conditioned) marginals ------------------------
    def restricted_marginal_left(self, left_costs, left_primal, data):
        return _edge_restricted(mask_pad(left_costs["c"][:, None]),
                                left_primal["x"])

    def restricted_marginal_right(self, right_costs, right_primal, data):
        # condition the per-slot cut costs on fixed wheel-edge primals:
        # +BIG on the cut branch where e=0, -BIG (i.e. +BIG on the uncut
        # branch, a per-factor constant shift that cannot change its argmin)
        # where e=1 — then reuse the factor's exact slot-marginal DP
        cond = _wheel_conditioned(right_costs, right_primal["e"], self.k)
        allm = self.right_type.slot_marginals(cond)
        sel = jnp.take_along_axis(allm, data["slot"][:, None].astype(jnp.int32),
                                  axis=1)
        return mask_pad(sel)

    def repam_left(self, costs, idx, delta, data):
        return {**costs, "c": costs["c"].at[idx].add(delta[:, 0])}

    def repam_right(self, costs, idx, delta, data):
        k = self.k
        s = data["slot"]
        d = delta[:, 0]
        sp = costs["sp"].at[idx, jnp.clip(s, 0, k - 1)].add(
            jnp.where(s < k, d, 0.0))
        rim = costs["rim"].at[idx, jnp.clip(s - k, 0, k - 1)].add(
            jnp.where(s >= k, d, 0.0))
        return {**costs, "sp": sp, "rim": rim}

    def pull_left(self, delta, data, costs):
        return {"c": delta[:, 0]}

    def pull_right(self, delta, data, costs):
        k = self.k
        s = data["slot"]
        d = delta[:, 0:1]
        lanes = jnp.arange(k)[None, :]
        sp = jnp.where((s[:, None] < k) & (lanes == s[:, None]), d, 0.0)
        rim = jnp.where((s[:, None] >= k) & (lanes == (s[:, None] - k)),
                        d, 0.0)
        return {"sp": sp, "rim": rim}

    # -- primal ----------------------------------------------------------
    def propagate_primal_l2r(self, left_primal, right_primal, lidx, ridx, data):
        e = right_primal["e"].at[ridx, data["slot"]].set(
            left_primal["x"][lidx])
        return {**right_primal, "e": e}

    def propagate_primal_r2l(self, left_primal, right_primal, lidx, ridx, data):
        v = right_primal["e"][ridx, data["slot"]]
        cur = left_primal["x"][lidx]
        return {**left_primal,
                "x": left_primal["x"].at[lidx].set(jnp.where(v >= 0, v, cur))}

    def consistent(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        return (l >= 0) & (l == right_primal["e"][ridx, data["slot"]])

    # -- constraint export: edge cut == sum of wheel configs cutting slot --
    def lp_coupling(self, lmeta, rmeta, data):
        cut = np.nonzero(rmeta[:, int(data)] == 1)[0]
        return [({1: 1.0}, {int(j): -1.0 for j in cut}, 0.0)]


class MulticutTripletWheelKMessage(MessageType):
    """Hub-triangle triplet <-> odd-k-wheel message over the triplet's
    4-pattern space (reference multicut_triplet_odd_3_wheel_message
    analogue): moves dual mass between the cycle-tightening triplets and
    the wheel — without it the wheel can only drain the (often fully
    reparametrized) edge factors and odd-wheel tightening stalls.

    Per-message data: ``slot`` = rim position i of the triangle
    (hub, v_i, v_{i+1}); ``pw`` [4] maps wheel-order pattern rows
    (spoke_i, spoke_j, rim_i) to triplet-order rows (the triplet's slots
    follow its sorted node key); ``pt`` [4] is the inverse; ``eperm`` [3]
    maps the triplet's edge positions to wheel slot ids (for primal)."""

    left_type = MULTICUT_TRIPLET
    schedule = MessageSchedule.left()

    def __init__(self, k: int):
        from ..factors.multicut import wheel_k_type
        self.k = k
        self.right_type = wheel_k_type(k)
        self.name = f"multicut_triplet_wheel_k{k}"

    def build(self, instances):
        items = list(instances)
        return {"slot": np.asarray([it["slot"] for it in items], np.int32),
                "pw": np.asarray([it["pw"] for it in items], np.int32),
                "pt": np.asarray([it["pt"] for it in items], np.int32),
                "eperm": np.asarray([it["eperm"] for it in items], np.int32)}

    def item_data(self, block, i):
        return {"slot": int(block["slot"][i]),
                "pw": np.asarray(block["pw"][i]),
                "pt": np.asarray(block["pt"][i]),
                "eperm": np.asarray(block["eperm"][i])}

    # -- marginals: [M, 4] over the triplet's pattern order ----------------
    def marginal_left(self, left_costs, data):
        return mask_pad(left_costs["c"])

    def marginal_right(self, right_costs, data):
        allm = self.right_type.tri_marginals(right_costs)       # [M, k, 4]
        mw = jnp.take_along_axis(
            allm, data["slot"][:, None, None].astype(jnp.int32),
            axis=1)[:, 0, :]                                    # wheel order
        mt = jnp.take_along_axis(mw, data["pt"], axis=1)        # triplet order
        return mask_pad(mt)

    # -- restricted (primal-conditioned) marginals ------------------------
    def restricted_marginal_left(self, left_costs, left_primal, data):
        c = left_costs["c"]
        e = jnp.stack([left_primal[f"e{s}"] for s in (1, 2, 3)], axis=1)
        pen = _pattern_penalty(e, jnp.asarray(TRIPLET_PATTERNS))
        return mask_pad(c) + pen - _zero_penalty(e)[:, None]

    def restricted_marginal_right(self, right_costs, right_primal, data):
        cond = _wheel_conditioned(right_costs, right_primal["e"], self.k)
        allm = self.right_type.tri_marginals(cond)
        mw = jnp.take_along_axis(
            allm, data["slot"][:, None, None].astype(jnp.int32),
            axis=1)[:, 0, :]
        mt = jnp.take_along_axis(mw, data["pt"], axis=1)
        return mask_pad(mt)

    def repam_left(self, costs, idx, delta, data):
        return {**costs, "c": costs["c"].at[idx].add(delta)}

    def repam_right(self, costs, idx, delta, data):
        dw = jnp.take_along_axis(delta, data["pw"], axis=1)     # wheel order
        tri = costs["tri"].at[idx, data["slot"]].add(dw)
        return {**costs, "tri": tri}

    def pull_left(self, delta, data, costs):
        return {"c": delta}

    def pull_right(self, delta, data, costs):
        dw = jnp.take_along_axis(delta, data["pw"], axis=1)
        karr = jnp.arange(self.k)[None, :, None]
        return {"tri": jnp.where(karr == data["slot"][:, None, None],
                                 dw[:, None, :], 0.0)}

    # -- primal --------------------------------------------------------------
    def propagate_primal_l2r(self, left_primal, right_primal, lidx, ridx, data):
        vals = jnp.stack([left_primal[f"e{t}"][lidx] for t in (1, 2, 3)],
                         axis=1)
        e = right_primal["e"].at[ridx[:, None], data["eperm"]].set(vals)
        return {**right_primal, "e": e}

    def propagate_primal_r2l(self, left_primal, right_primal, lidx, ridx, data):
        out = dict(left_primal)
        for t in (1, 2, 3):
            v = right_primal["e"][ridx, data["eperm"][:, t - 1]]
            cur = out[f"e{t}"][lidx]
            out[f"e{t}"] = out[f"e{t}"].at[lidx].set(
                jnp.where(v >= 0, v, cur))
        return out

    def consistent(self, left_primal, right_primal, lidx, ridx, data):
        ok = jnp.ones(np.shape(lidx)[0], dtype=bool)
        for t in (1, 2, 3):
            l = left_primal[f"e{t}"][lidx]
            r = right_primal["e"][ridx, data["eperm"][:, t - 1]]
            ok &= (l >= 0) & (l == r)
        return ok

    # -- constraint export: triplet config == sum of wheel configs whose
    # bits on the triangle's 3 wheel slots realize the same pattern ---------
    def lp_coupling(self, lmeta, rmeta, data):
        eperm = np.asarray(data["eperm"])
        rows = []
        bits_all = rmeta[:, eperm]                              # [C, 3]
        # triplet var 0 = all-uncut; vars 1..4 = TRIPLET_PATTERNS rows
        for r in range(-1, 4):
            bits = np.zeros(3, np.int64) if r < 0 else TRIPLET_PATTERNS[r]
            hit = np.nonzero((bits_all == bits).all(axis=1))[0]
            rows.append(({r + 1: 1.0}, {int(j): -1.0 for j in hit}, 0.0))
        return rows


MULTICUT_EDGE_TRIPLET_0 = MulticutEdgeTripletMessage(0)
MULTICUT_EDGE_TRIPLET_1 = MulticutEdgeTripletMessage(1)
MULTICUT_EDGE_TRIPLET_2 = MulticutEdgeTripletMessage(2)
MULTICUT_EDGE_WHEEL = tuple(MulticutEdgeWheelMessage(s) for s in range(6))

_WHEEL_K_MSG_CACHE: dict[int, MulticutEdgeWheelKMessage] = {}
_TRI_WHEEL_K_MSG_CACHE: dict[int, MulticutTripletWheelKMessage] = {}


def wheel_k_message(k: int) -> MulticutEdgeWheelKMessage:
    if k not in _WHEEL_K_MSG_CACHE:
        _WHEEL_K_MSG_CACHE[k] = MulticutEdgeWheelKMessage(k)
    return _WHEEL_K_MSG_CACHE[k]


def triplet_wheel_k_message(k: int) -> MulticutTripletWheelKMessage:
    if k not in _TRI_WHEEL_K_MSG_CACHE:
        _TRI_WHEEL_K_MSG_CACHE[k] = MulticutTripletWheelKMessage(k)
    return _TRI_WHEEL_K_MSG_CACHE[k]
