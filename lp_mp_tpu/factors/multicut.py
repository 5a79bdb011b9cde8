"""Multicut factors, type-batched.

Reference API (downstream ``solvers/multicut/multicut_factors_messages.hxx``,
pinned by test/multicut.cpp):

- ``multicut_edge_factor``: one cost theta_e; LowerBound = min(0, theta)
  (cut the edge or not).
- ``multicut_triplet_factor``: 4 costs for the non-trivial valid cut
  patterns of a triangle's edges (e12, e13, e23):

      index 0: (1, 1, 0)   index 1: (1, 0, 1)
      index 2: (0, 1, 1)   index 3: (1, 1, 1)

  (a triangle edge labeling is consistent iff not exactly one edge is cut);
  the all-uncut pattern is the implicit zero.  LowerBound = min(0, min c).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..registry import FactorType

# rows: cut patterns for (e12, e13, e23); column j = is edge j cut
TRIPLET_PATTERNS = np.array([[1, 1, 0],
                             [1, 0, 1],
                             [0, 1, 1],
                             [1, 1, 1]], dtype=np.int32)


class MulticutEdgeType(FactorType):
    name = "multicut_edge"

    def build(self, instances):
        c = np.asarray(list(instances), dtype=real_dtype())
        return {"c": c}

    def build_block(self, batch):
        """batch = cost array [N]."""
        return {"c": np.ascontiguousarray(np.asarray(batch,
                                                     dtype=real_dtype()))}

    def item_data(self, block, i):
        return float(block["c"][i])

    def lower_bound(self, costs):
        return jnp.minimum(costs["c"], 0.0)

    def init_primal(self, costs):
        return {"x": jnp.full(costs["c"].shape[0], -1, jnp.int32)}

    def compute_primal(self, costs, primal):
        x = primal["x"]
        am = (costs["c"] < 0).astype(jnp.int32)
        return {"x": jnp.where(x < 0, am, x)}

    def evaluate_primal(self, costs, primal):
        x = primal["x"]
        val = costs["c"] * x.astype(costs["c"].dtype)
        return jnp.where(x >= 0, val, jnp.inf)

    def dual_vector(self, costs):
        return costs["c"][:, None]

    # -- constraint export: configs (uncut, cut) --------------------------
    def lp_vars(self, state_row, data):
        c = float(state_row["c"])
        return np.asarray([0.0, c]), [{0: 1.0, 1: 1.0}], [1.0], None

    def lp_fix(self, prim_row, meta):
        v = np.zeros(2)
        v[int(prim_row["x"])] = 1.0
        return v

    def lp_read(self, values, meta):
        return {"x": int(np.argmax(values))}


class MulticutTripletType(FactorType):
    name = "multicut_triplet"

    def build(self, instances):
        c = np.zeros((len(list(instances)), 4), dtype=real_dtype())
        return {"c": c}

    def lower_bound(self, costs):
        return jnp.minimum(jnp.min(costs["c"], axis=1), 0.0)

    def init_primal(self, costs):
        F = costs["c"].shape[0]
        # cut bits of the three edges, -1 unset
        return {"e1": jnp.full(F, -1, jnp.int32),
                "e2": jnp.full(F, -1, jnp.int32),
                "e3": jnp.full(F, -1, jnp.int32)}

    def evaluate_primal(self, costs, primal):
        c = costs["c"]
        e = jnp.stack([primal["e1"], primal["e2"], primal["e3"]], axis=1)
        pats = jnp.asarray(TRIPLET_PATTERNS)
        match = jnp.all(e[:, None, :] == pats[None], axis=2)  # [F, 4]
        is_zero = jnp.all(e == 0, axis=1)
        n_cut = jnp.sum(jnp.maximum(e, 0), axis=1)
        valid = (jnp.all(e >= 0, axis=1)) & (n_cut != 1)
        val = jnp.where(is_zero, 0.0,
                        jnp.sum(jnp.where(match, c, jnp.zeros_like(c)), axis=1))
        return jnp.where(valid, val, jnp.inf)

    def dual_vector(self, costs):
        return costs["c"]

    # -- constraint export: 5 configs = all-uncut + TRIPLET_PATTERNS ------
    def lp_vars(self, state_row, data):
        c = np.concatenate([[0.0], np.asarray(state_row["c"],
                                              dtype=np.float64)])
        return c, [{k: 1.0 for k in range(5)}], [1.0], None

    def lp_fix(self, prim_row, meta):
        e = np.asarray([int(prim_row["e1"]), int(prim_row["e2"]),
                        int(prim_row["e3"])])
        v = np.zeros(5)
        if not e.any():
            v[0] = 1.0
        else:
            v[1 + int(np.nonzero((TRIPLET_PATTERNS == e)
                                 .all(axis=1))[0][0])] = 1.0
        return v

    def lp_read(self, values, meta):
        k = int(np.argmax(values))
        e = np.zeros(3, np.int64) if k == 0 else TRIPLET_PATTERNS[k - 1]
        return {"e1": int(e[0]), "e2": int(e[1]), "e3": int(e[2])}


def _k4_cut_patterns() -> np.ndarray:
    """All non-trivial cut vectors of K4: one row per partition of 4 nodes
    (minus the single-block partition), columns ordered
    (01, 02, 03, 12, 13, 23).  14 rows."""
    import itertools
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    seen = set()
    for lbl in itertools.product(range(4), repeat=4):
        bits = tuple(int(lbl[i] != lbl[j]) for i, j in edges)
        if any(bits):
            seen.add(bits)
    return np.array(sorted(seen), dtype=np.int32)


# rows: valid cut patterns of the K4 wheel (center + 3-cycle); the implicit
# all-uncut pattern is the zero entry, as in the triplet factor
ODD_WHEEL_PATTERNS = _k4_cut_patterns()


class MulticutOddWheelType(FactorType):
    """Odd-3-wheel (K4) factor: exact min over the 15 partitions of its 4
    nodes.  Downstream ``multicut_odd_3_wheel_factor`` analogue — the
    tightening stage beyond cycle inequalities (odd wheel inequalities are
    facets of the multicut polytope that the cycle relaxation misses; a K4
    with a fractional triangle-LP vertex is the canonical witness)."""

    name = "multicut_odd_wheel"

    def build(self, instances):
        c = np.zeros((len(list(instances)), ODD_WHEEL_PATTERNS.shape[0]),
                     dtype=real_dtype())
        return {"c": c}

    def lower_bound(self, costs):
        return jnp.minimum(jnp.min(costs["c"], axis=1), 0.0)

    def init_primal(self, costs):
        F = costs["c"].shape[0]
        return {f"e{s}": jnp.full(F, -1, jnp.int32) for s in range(1, 7)}

    def evaluate_primal(self, costs, primal):
        c = costs["c"]
        e = jnp.stack([primal[f"e{s}"] for s in range(1, 7)], axis=1)  # [F,6]
        pats = jnp.asarray(ODD_WHEEL_PATTERNS)
        match = jnp.all(e[:, None, :] == pats[None], axis=2)           # [F,14]
        is_zero = jnp.all(e == 0, axis=1)
        valid = jnp.all(e >= 0, axis=1) & (is_zero | jnp.any(match, axis=1))
        val = jnp.where(is_zero, 0.0,
                        jnp.sum(jnp.where(match, c, jnp.zeros_like(c)), axis=1))
        return jnp.where(valid, val, jnp.inf)

    def dual_vector(self, costs):
        return costs["c"]

    # -- constraint export: 15 configs = all-uncut + ODD_WHEEL_PATTERNS ---
    def lp_vars(self, state_row, data):
        c = np.concatenate([[0.0], np.asarray(state_row["c"],
                                              dtype=np.float64)])
        n = 1 + ODD_WHEEL_PATTERNS.shape[0]
        return c, [{k: 1.0 for k in range(n)}], [1.0], None

    def lp_fix(self, prim_row, meta):
        e = np.asarray([int(prim_row[f"e{s}"]) for s in range(1, 7)])
        v = np.zeros(1 + ODD_WHEEL_PATTERNS.shape[0])
        if not e.any():
            v[0] = 1.0
        else:
            v[1 + int(np.nonzero((ODD_WHEEL_PATTERNS == e)
                                 .all(axis=1))[0][0])] = 1.0
        return v

    def lp_read(self, values, meta):
        k = int(np.argmax(values))
        e = (np.zeros(6, np.int64) if k == 0
             else ODD_WHEEL_PATTERNS[k - 1])
        return {f"e{s}": int(e[s - 1]) for s in range(1, 7)}


MULTICUT_EDGE = MulticutEdgeType()
MULTICUT_TRIPLET = MulticutTripletType()
MULTICUT_ODD_WHEEL = MulticutOddWheelType()
