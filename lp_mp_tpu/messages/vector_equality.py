"""Whole-vector equality message between two unary simplex factors.

Counterpart of the reference's ``test_message`` (test/test_model.hxx:90-137):
``RepamLeft/Right`` add a full cost vector and ``send_message_to_*`` pushes
the normalized cost ``c - min(c)`` — i.e. the two factors must take the same
label, and a send shifts all relative cost onto the other side.  This is the
canonical coupling for tree decompositions over cloned factors
(tree_decomposition.hxx:277-585) and is exercised by the FWMAP/subgradient
acceptance (test/test_FWMAP.cpp:11-22).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import MessageSchedule
from ..factors.simplex import UNARY_SIMPLEX
from ..registry import MessageType, mask_pad


class VectorEqualityMessage(MessageType):
    """x_left == x_right over the full label vector (zero-sum vector shift)."""

    name = "vector_equality"
    left_type = UNARY_SIMPLEX
    right_type = UNARY_SIMPLEX
    schedule = MessageSchedule.left()

    def build(self, instances):
        return {"_": np.zeros(len(instances), dtype=np.int32)}

    def _marginal(self, costs):
        c = costs["c"]                                    # [M, L]
        norm = c - jnp.min(c, axis=1, keepdims=True)      # test_model.hxx:105-121
        return mask_pad(norm)

    def marginal_left(self, left_costs, data):
        return self._marginal(left_costs)

    def marginal_right(self, right_costs, data):
        return self._marginal(right_costs)

    # -- restricted (primal-conditioned) marginals ------------------------
    def _restricted(self, costs, primal):
        from .equality import condition_simplex
        c = condition_simplex(costs["c"], costs.get("nl"), primal["x"])
        return mask_pad(c - jnp.min(c, axis=1, keepdims=True))

    def restricted_marginal_left(self, left_costs, left_primal, data):
        return self._restricted(left_costs, left_primal)

    def restricted_marginal_right(self, right_costs, right_primal, data):
        return self._restricted(right_costs, right_primal)

    def repam_left(self, costs, idx, delta, data):
        return {**costs, "c": costs["c"].at[idx].add(delta)}

    def repam_right(self, costs, idx, delta, data):
        return {**costs, "c": costs["c"].at[idx].add(delta)}

    def pull_left(self, delta, data, costs):
        return {"c": delta}

    def pull_right(self, delta, data, costs):
        return {"c": delta}

    # -- primal --------------------------------------------------------------
    def propagate_primal_l2r(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        r = right_primal["x"][ridx]
        return {**right_primal,
                "x": right_primal["x"].at[ridx].set(jnp.where(l >= 0, l, r))}

    def propagate_primal_r2l(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        r = right_primal["x"][ridx]
        return {**left_primal,
                "x": left_primal["x"].at[lidx].set(jnp.where(r >= 0, r, l))}

    def consistent(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        r = right_primal["x"][ridx]
        return (l >= 0) & (l == r)

    def lp_coupling(self, lmeta, rmeta, data):
        assert lmeta[0] == rmeta[0]
        return [({lab: 1.0}, {lab: -1.0}, 0.0) for lab in range(lmeta[0])]


VECTOR_EQUALITY = VectorEqualityMessage()
