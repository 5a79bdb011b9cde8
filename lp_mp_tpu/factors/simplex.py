"""Simplex factors, type-batched.

Reference API surface (downstream ``factors/simplex_factor.hxx``, pinned by
test/simplex.cpp, test/simplex_marginalization.cpp):

- ``UnarySimplexFactor(cost_vector)``: LowerBound = min cost.
- ``PairwiseSimplexFactor(n1, n2)`` with ``cost(x1, x2)``.
- ``SimpleTighteningTernarySimplexFactor`` analogue: dense ternary simplex.

TPU design: all instances of one type live in one dense padded tensor
(padding = config.PAD_COST); every reduction below is a batched XLA min.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import PAD_COST, real_dtype
from ..registry import FactorType


def _pack_padded(vectors, dtype) -> np.ndarray:
    """Stack variable-length numpy arrays into [F, max] with PAD_COST padding."""
    shapes = [np.shape(v) for v in vectors]
    ndim = len(shapes[0])
    maxs = tuple(max(s[d] for s in shapes) for d in range(ndim))
    out = np.full((len(vectors),) + maxs, PAD_COST, dtype=dtype)
    for i, v in enumerate(vectors):
        out[(i,) + tuple(slice(0, s) for s in np.shape(v))] = v
    return out


class UnarySimplexType(FactorType):
    """All unary simplex factors as one [F, L] tensor."""

    name = "unary_simplex"

    def build(self, instances):
        dtype = real_dtype()
        c = _pack_padded([np.asarray(v, dtype=dtype) for v in instances], dtype)
        nl = np.asarray([len(v) for v in instances], dtype=np.int32)
        return {"c": c, "nl": nl}

    def build_block(self, batch):
        """batch = [N, L] cost array (uniform label count)."""
        c = np.ascontiguousarray(np.asarray(batch, dtype=real_dtype()))
        assert c.ndim == 2
        nl = np.full(c.shape[0], c.shape[1], dtype=np.int32)
        return {"c": c, "nl": nl}

    def item_data(self, block, i):
        return np.asarray(block["c"][i, :int(block["nl"][i])])

    def lower_bound(self, costs):
        return jnp.min(costs["c"], axis=1)

    def init_primal(self, costs):
        return {"x": jnp.full(costs["c"].shape[0], -1, dtype=jnp.int32)}

    def compute_primal(self, costs, primal):
        x = primal["x"]
        am = jnp.argmin(costs["c"], axis=1).astype(jnp.int32)
        return {"x": jnp.where(x < 0, am, x)}

    def evaluate_primal(self, costs, primal):
        x = primal["x"]
        val = jnp.take_along_axis(costs["c"], jnp.maximum(x, 0)[:, None], axis=1)[:, 0]
        return jnp.where(x >= 0, val, jnp.inf)

    def dual_vector(self, costs):
        return costs["c"].reshape(costs["c"].shape[0], -1)

    # -- constraint export (factors_messages.hxx:3441-3619 analogue) -------
    def lp_vars(self, state_row, data):
        nl = int(state_row["nl"])
        c = np.asarray(state_row["c"][:nl], dtype=np.float64)
        return c, [{k: 1.0 for k in range(nl)}], [1.0], (nl,)

    def lp_fix(self, prim_row, meta):
        v = np.zeros(meta[0])
        v[int(prim_row["x"])] = 1.0
        return v

    def lp_read(self, values, meta):
        return {"x": int(np.argmax(values))}


class PairwiseSimplexType(FactorType):
    """All dense pairwise simplex factors as one [F, L1, L2] tensor."""

    name = "pairwise_simplex"

    def build(self, instances):
        dtype = real_dtype()
        c = _pack_padded([np.asarray(v, dtype=dtype) for v in instances], dtype)
        n1 = np.asarray([np.shape(v)[0] for v in instances], dtype=np.int32)
        n2 = np.asarray([np.shape(v)[1] for v in instances], dtype=np.int32)
        return {"c": c, "n1": n1, "n2": n2}

    def build_block(self, batch):
        """batch = [N, L1, L2] cost array (uniform label counts)."""
        c = np.ascontiguousarray(np.asarray(batch, dtype=real_dtype()))
        assert c.ndim == 3
        n1 = np.full(c.shape[0], c.shape[1], dtype=np.int32)
        n2 = np.full(c.shape[0], c.shape[2], dtype=np.int32)
        return {"c": c, "n1": n1, "n2": n2}

    def item_data(self, block, i):
        return np.asarray(block["c"][i, :int(block["n1"][i]),
                                     :int(block["n2"][i])])

    def lower_bound(self, costs):
        return jnp.min(costs["c"], axis=(1, 2))

    def init_primal(self, costs):
        F = costs["c"].shape[0]
        return {"x1": jnp.full(F, -1, jnp.int32), "x2": jnp.full(F, -1, jnp.int32)}

    def compute_primal(self, costs, primal):
        c = costs["c"]
        F, L1, L2 = c.shape
        x1, x2 = primal["x1"], primal["x2"]
        i1 = jnp.arange(L1)[None, :, None]
        i2 = jnp.arange(L2)[None, None, :]
        feas = ((x1[:, None, None] < 0) | (i1 == x1[:, None, None])) & \
               ((x2[:, None, None] < 0) | (i2 == x2[:, None, None]))
        cm = jnp.where(feas, c, jnp.asarray(PAD_COST, c.dtype) * 2)
        flat = cm.reshape(F, -1)
        am = jnp.argmin(flat, axis=1)
        a1 = (am // L2).astype(jnp.int32)
        a2 = (am % L2).astype(jnp.int32)
        return {"x1": jnp.where(x1 < 0, a1, x1), "x2": jnp.where(x2 < 0, a2, x2)}

    def evaluate_primal(self, costs, primal):
        c = costs["c"]
        x1, x2 = primal["x1"], primal["x2"]
        val = c[jnp.arange(c.shape[0]), jnp.maximum(x1, 0), jnp.maximum(x2, 0)]
        return jnp.where((x1 >= 0) & (x2 >= 0), val, jnp.inf)

    def dual_vector(self, costs):
        return costs["c"].reshape(costs["c"].shape[0], -1)

    def lp_vars(self, state_row, data):
        n1, n2 = int(state_row["n1"]), int(state_row["n2"])
        c = np.asarray(state_row["c"][:n1, :n2], dtype=np.float64)
        return (c.ravel(), [{k: 1.0 for k in range(n1 * n2)}], [1.0],
                (n1, n2))

    def lp_fix(self, prim_row, meta):
        v = np.zeros(meta[0] * meta[1])
        v[int(prim_row["x1"]) * meta[1] + int(prim_row["x2"])] = 1.0
        return v

    def lp_read(self, values, meta):
        k = int(np.argmax(values))
        return {"x1": k // meta[1], "x2": k % meta[1]}


class TernarySimplexType(FactorType):
    """Dense ternary simplex [F, L1, L2, L3] — the tightening triplet factor
    (reference SimpleTighteningTernarySimplexFactor analogue,
    test/graphical_model.cpp:140-204)."""

    name = "ternary_simplex"

    def build(self, instances):
        dtype = real_dtype()
        c = _pack_padded([np.asarray(v, dtype=dtype) for v in instances], dtype)
        return {"c": c}

    def lower_bound(self, costs):
        return jnp.min(costs["c"], axis=(1, 2, 3))

    def init_primal(self, costs):
        F = costs["c"].shape[0]
        return {"x1": jnp.full(F, -1, jnp.int32),
                "x2": jnp.full(F, -1, jnp.int32),
                "x3": jnp.full(F, -1, jnp.int32)}

    def compute_primal(self, costs, primal):
        c = costs["c"]
        F, L1, L2, L3 = c.shape
        x1, x2, x3 = primal["x1"], primal["x2"], primal["x3"]
        i1 = jnp.arange(L1)[None, :, None, None]
        i2 = jnp.arange(L2)[None, None, :, None]
        i3 = jnp.arange(L3)[None, None, None, :]
        feas = ((x1[:, None, None, None] < 0) | (i1 == x1[:, None, None, None])) & \
               ((x2[:, None, None, None] < 0) | (i2 == x2[:, None, None, None])) & \
               ((x3[:, None, None, None] < 0) | (i3 == x3[:, None, None, None]))
        cm = jnp.where(feas, c, jnp.asarray(PAD_COST, c.dtype) * 2)
        flat = cm.reshape(F, -1)
        am = flat.argmin(axis=1)
        a1 = (am // (L2 * L3)).astype(jnp.int32)
        a2 = ((am // L3) % L2).astype(jnp.int32)
        a3 = (am % L3).astype(jnp.int32)
        return {"x1": jnp.where(x1 < 0, a1, x1),
                "x2": jnp.where(x2 < 0, a2, x2),
                "x3": jnp.where(x3 < 0, a3, x3)}

    def evaluate_primal(self, costs, primal):
        c = costs["c"]
        x1, x2, x3 = primal["x1"], primal["x2"], primal["x3"]
        val = c[jnp.arange(c.shape[0]), jnp.maximum(x1, 0),
                jnp.maximum(x2, 0), jnp.maximum(x3, 0)]
        return jnp.where((x1 >= 0) & (x2 >= 0) & (x3 >= 0), val, jnp.inf)

    def dual_vector(self, costs):
        return costs["c"].reshape(costs["c"].shape[0], -1)

    def lp_vars(self, state_row, data):
        sh = tuple(np.shape(data))
        c = np.asarray(state_row["c"][tuple(slice(0, s) for s in sh)],
                       dtype=np.float64)
        n = int(np.prod(sh))
        return c.ravel(), [{k: 1.0 for k in range(n)}], [1.0], sh

    def lp_fix(self, prim_row, meta):
        _, l2, l3 = meta
        v = np.zeros(int(np.prod(meta)))
        k = (int(prim_row["x1"]) * l2 + int(prim_row["x2"])) * l3 \
            + int(prim_row["x3"])
        v[k] = 1.0
        return v

    def lp_read(self, values, meta):
        _, l2, l3 = meta
        k = int(np.argmax(values))
        return {"x1": k // (l2 * l3), "x2": (k // l3) % l2, "x3": k % l3}


UNARY_SIMPLEX = UnarySimplexType()
PAIRWISE_SIMPLEX = PairwiseSimplexType()
TERNARY_SIMPLEX = TernarySimplexType()
