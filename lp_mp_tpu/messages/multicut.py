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
from ..registry import MessageType, mask_pad


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

    def repam_left(self, costs, idx, delta, data):
        return {**costs, "c": costs["c"].at[idx].add(delta[:, 0])}

    def repam_right(self, costs, idx, delta, data):
        c = costs["c"]
        add = delta[:, 0:1] * jnp.asarray(TRIPLET_PATTERNS[:, self.slot],
                                          dtype=c.dtype)[None, :]
        return {**costs, "c": c.at[idx].add(add)}

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

    def repam_left(self, costs, idx, delta, data):
        return {**costs, "c": costs["c"].at[idx].add(delta[:, 0])}

    def repam_right(self, costs, idx, delta, data):
        c = costs["c"]
        add = delta[:, 0:1] * jnp.asarray(ODD_WHEEL_PATTERNS[:, self.slot],
                                          dtype=c.dtype)[None, :]
        return {**costs, "c": c.at[idx].add(add)}

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


MULTICUT_EDGE_TRIPLET_0 = MulticutEdgeTripletMessage(0)
MULTICUT_EDGE_TRIPLET_1 = MulticutEdgeTripletMessage(1)
MULTICUT_EDGE_TRIPLET_2 = MulticutEdgeTripletMessage(2)
MULTICUT_EDGE_WHEEL = tuple(MulticutEdgeWheelMessage(s) for s in range(6))
