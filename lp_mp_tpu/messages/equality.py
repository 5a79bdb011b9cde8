"""Equality message between single entries of two unary simplex factors.

Counterpart of the graph-matching ``equality_message`` (downstream
``solvers/graph_matching``, API documented by test/graph_matching.cpp):
for assignment a = (left node i -> right node j), the indicator
``x_left == li`` must equal ``x_right == ri`` where ``li`` is j's position
in i's label list and ``ri`` is i's position in j's label list.

The message variable space is the single binary indicator, so the
min-marginal is the scalar ``c[li] - min_{k != li} c[k]`` (min_except,
vector.hxx:315-323) and reparametrization touches one entry per side.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import MessageSchedule
from ..factors.simplex import UNARY_SIMPLEX
from ..ops.reductions import min_except_index
from ..registry import RESTRICT_BIG, MessageType


def condition_simplex(c, nl, x):
    """[M, L] simplex costs with RESTRICT_BIG off a fixed label's lane
    (valid lanes only, so padded lanes are never perturbed); x = -1 keeps
    the costs untouched (OneSideMessageContainerView conditioning,
    factors_messages.hxx:513-566)."""
    lanes = jnp.arange(c.shape[1])[None, :]
    valid = lanes < nl[:, None] if nl is not None \
        else jnp.ones_like(lanes, bool)
    pen = jnp.where((x[:, None] >= 0) & (lanes != x[:, None]) & valid,
                    RESTRICT_BIG, 0.0)
    return c + pen


class EqualityMessage(MessageType):
    """x_left == data['li']  <=>  x_right == data['ri'] (zero-sum scalar shift)."""

    name = "equality"
    left_type = UNARY_SIMPLEX
    right_type = UNARY_SIMPLEX
    schedule = MessageSchedule.full()

    def build(self, instances):
        li = np.asarray([d[0] for d in instances], dtype=np.int32)
        ri = np.asarray([d[1] for d in instances], dtype=np.int32)
        return {"li": li, "ri": ri}

    def _marginal(self, costs, entry):
        c = costs["c"]                       # [M, L] gathered slices
        return min_except_index(c, entry)    # [M] scalar deltas

    def marginal_left(self, left_costs, data):
        return self._marginal(left_costs, data["li"])

    def marginal_right(self, right_costs, data):
        return self._marginal(right_costs, data["ri"])

    # -- restricted (primal-conditioned) marginals ------------------------
    def restricted_marginal_left(self, left_costs, left_primal, data):
        c = condition_simplex(left_costs["c"], left_costs.get("nl"),
                              left_primal["x"])
        return min_except_index(c, data["li"])

    def restricted_marginal_right(self, right_costs, right_primal, data):
        c = condition_simplex(right_costs["c"], right_costs.get("nl"),
                              right_primal["x"])
        return min_except_index(c, data["ri"])

    def repam_left(self, costs, idx, delta, data):
        c = costs["c"]
        return {**costs, "c": c.at[idx, data["li"]].add(delta)}

    def lp_coupling(self, lmeta, rmeta, data):
        li, ri = int(data[0]), int(data[1])
        return [({li: 1.0}, {ri: -1.0}, 0.0)]

    def repam_right(self, costs, idx, delta, data):
        c = costs["c"]
        return {**costs, "c": c.at[idx, data["ri"]].add(delta)}

    @staticmethod
    def _one_hot(delta, entry, width):
        lanes = jnp.arange(width)[None, :]
        return jnp.where(lanes == entry[:, None], delta[:, None], 0.0)

    def pull_left(self, delta, data, costs):
        return {"c": self._one_hot(delta, data["li"], costs["c"].shape[1])}

    def pull_right(self, delta, data, costs):
        return {"c": self._one_hot(delta, data["ri"], costs["c"].shape[1])}

    # -- primal --------------------------------------------------------------
    def propagate_primal_l2r(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        r = right_primal["x"][ridx]
        new = jnp.where((l >= 0) & (l == data["li"]), data["ri"], r)
        return {**right_primal, "x": right_primal["x"].at[ridx].set(new)}

    def propagate_primal_r2l(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        r = right_primal["x"][ridx]
        new = jnp.where((r >= 0) & (r == data["ri"]), data["li"], l)
        return {**left_primal, "x": left_primal["x"].at[lidx].set(new)}

    def consistent(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        r = right_primal["x"][ridx]
        return ((l >= 0) & (r >= 0)) & ((l == data["li"]) == (r == data["ri"]))


EQUALITY = EqualityMessage()
