"""Unary <-> pairwise marginalization messages.

Reference ``UnaryPairwiseMessage<Chirality::{left,right}>`` (downstream
``messages/simplex_marginalization_message.hxx``, behavior pinned by
test/simplex_marginalization.cpp:26-41):

- the message variable space is one side of the pairwise factor;
- the pairwise pushes its min-marginal over the other side
  (``send_message_to_left``), the unary pushes its full reparametrized cost
  vector (``send_message_to_right``);
- message schedule is ``left`` (all activity driven by the unary,
  test/test_model.hxx:133 style), so pairwise factors stay passive in the
  MRF sweep.

Here each (chirality, pairwise-representation) pair is its own batched
message type with gather/scatter index arrays.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import MessageSchedule
from ..factors.potts import PAIRWISE_POTTS, PairwisePottsType
from ..factors.simplex import PAIRWISE_SIMPLEX, UNARY_SIMPLEX
from ..registry import MessageType, mask_pad


def fit_width(delta: jnp.ndarray, width: int) -> jnp.ndarray:
    """Slice or zero-pad axis 1 of [M, D] to D=width (padding carries no
    cost shift because invalid lanes are zeroed by mask_pad)."""
    d = delta.shape[1]
    if d == width:
        return delta
    if d > width:
        return delta[:, :width]
    return jnp.pad(delta, ((0, 0), (0, width - d)))


class _UnaryPairwiseBase(MessageType):
    left_type = UNARY_SIMPLEX
    schedule = MessageSchedule.left()
    side: int = 1

    def marginal_left(self, left_costs, data):
        return mask_pad(left_costs["c"])

    def repam_left(self, costs, idx, delta, data):
        c = costs["c"]
        return {**costs, "c": c.at[idx].add(fit_width(delta, c.shape[1]))}

    # -- primal ------------------------------------------------------------
    def _right_key(self):
        return "x1" if self.side == 1 else "x2"

    def propagate_primal_l2r(self, left_primal, right_primal, lidx, ridx, data):
        k = self._right_key()
        return {**right_primal, k: right_primal[k].at[ridx].set(left_primal["x"][lidx])}

    def propagate_primal_r2l(self, left_primal, right_primal, lidx, ridx, data):
        v = right_primal[self._right_key()][ridx]
        cur = left_primal["x"][lidx]
        return {**left_primal, "x": left_primal["x"].at[lidx].set(jnp.where(v >= 0, v, cur))}

    def consistent(self, left_primal, right_primal, lidx, ridx, data):
        l = left_primal["x"][lidx]
        r = right_primal[self._right_key()][ridx]
        return (l >= 0) & (l == r)

    # -- constraint export: unary marginal == pairwise row/col marginal ----
    def lp_coupling(self, lmeta, rmeta, data):
        L = lmeta[0]
        n1, n2 = rmeta
        rows = []
        for lab in range(L):
            if self.side == 1:
                rcoefs = {lab * n2 + l2: -1.0 for l2 in range(n2)}
            else:
                rcoefs = {l1 * n2 + lab: -1.0 for l1 in range(n1)}
            rows.append(({lab: 1.0}, rcoefs, 0.0))
        return rows


class UnaryPairwiseMessage(_UnaryPairwiseBase):
    """Unary <-> dense pairwise simplex, one type per side."""

    right_type = PAIRWISE_SIMPLEX

    def __init__(self, side: int):
        assert side in (1, 2)
        self.side = side
        self.name = f"unary_pairwise_{side}"

    def marginal_right(self, right_costs, data):
        other_axis = 2 if self.side == 1 else 1
        return mask_pad(jnp.min(right_costs["c"], axis=other_axis))

    def repam_right(self, costs, idx, delta, data):
        c = costs["c"]
        if self.side == 1:
            d = fit_width(delta, c.shape[1])[:, :, None]
        else:
            d = fit_width(delta, c.shape[2])[:, None, :]
        return {**costs, "c": c.at[idx].add(d)}


class UnaryPottsMessage(_UnaryPairwiseBase):
    """Unary <-> compact Potts pairwise, one type per side.  O(L) updates
    via the two-min trick (test/potts_factor.cpp equivalence)."""

    right_type = PAIRWISE_POTTS

    def __init__(self, side: int):
        assert side in (1, 2)
        self.side = side
        self.name = f"unary_potts_{side}"

    def marginal_right(self, right_costs, data):
        return mask_pad(PairwisePottsType.marginal(right_costs, self.side))

    def repam_right(self, costs, idx, delta, data):
        key = "msg1" if self.side == 1 else "msg2"
        slot = costs[key]
        return {**costs, key: slot.at[idx].add(fit_width(delta, slot.shape[1]))}


UNARY_PAIRWISE_1 = UnaryPairwiseMessage(1)
UNARY_PAIRWISE_2 = UnaryPairwiseMessage(2)
UNARY_POTTS_1 = UnaryPottsMessage(1)
UNARY_POTTS_2 = UnaryPottsMessage(2)
