"""Counting (discrete tomography projection) factors.

Reference: ``DiscreteTomographyFactorCounting`` + counting messages
(downstream ``solvers/discrete_tomography/*``, surface documented by
test/discrete_tomography.cpp): a projection constrains the SUM of the label
values of the variables along a ray, with a cost vector over the attainable
sums.  The reference decomposes each ray into a binary tree of counting
factors whose messages are min-convolutions (test/min_conv.cpp).

TPU redesign: one *chain* factor per projection holding per-variable
reparametrization slots ``lam [F, V, L]`` and the projection cost
``proj [F, S]``; every bound/marginal is a batched DP over partial sums
whose transition is exactly ``ops.minconv.min_conv`` — O(V·S·L) dense work
that XLA fuses, instead of the reference's pointer-tree.

Padding convention: variables beyond ``nv`` are forced to label 0 with zero
cost (lam[v>=nv] = [0, inf, ...]), labels beyond ``nl`` and sums beyond the
instance's cost-vector length carry +inf.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..ops.minconv import arg_min_conv, min_conv
from ..registry import FactorType

INF = np.inf


def min_corr(b: jnp.ndarray, lam: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """out[s] = min_l lam[..., l] + b[..., s + l] — the backward DP step
    (cross-correlation form of min_conv)."""
    L = lam.shape[-1]
    lamr = lam[..., ::-1]
    full = min_conv(b, lamr, out_size + L - 1)
    return full[..., L - 1:]


class CountingChainType(FactorType):
    """All projection (counting chain) factors as one padded block."""

    name = "counting_chain"

    def build(self, instances):
        """instances: (n_vars, labels_per_var:int, proj_cost: array)."""
        dtype = real_dtype()
        V = max(inst[0] for inst in instances)
        L = max(inst[1] for inst in instances)
        S = max(len(inst[2]) for inst in instances)
        F = len(instances)
        lam = np.full((F, V, L), INF, dtype=dtype)
        proj = np.full((F, S), INF, dtype=dtype)
        nv = np.zeros(F, dtype=np.int32)
        nl = np.zeros(F, dtype=np.int32)
        for f, (n_vars, n_labels, pc) in enumerate(instances):
            lam[f, :n_vars, :n_labels] = 0.0
            lam[f, n_vars:, 0] = 0.0        # padded vars forced to label 0
            proj[f, :len(pc)] = np.asarray(pc, dtype=dtype)
            nv[f] = n_vars
            nl[f] = n_labels
        return {"lam": lam, "proj": proj, "nv": nv, "nl": nl}

    # -- DP ------------------------------------------------------------------
    @staticmethod
    def _forward_all(lam: jnp.ndarray, S: int) -> jnp.ndarray:
        """fwd[v] [.., S] = min cost of vars < v by partial sum; returns the
        stacked [V+1, .., S] table."""
        F = lam.shape[0]
        dp0 = jnp.full(lam.shape[:-2] + (S,), INF, lam.dtype).at[..., 0].set(0.0)

        def step(dp, lam_v):
            nxt = min_conv(dp, lam_v, S)
            return nxt, dp

        lam_t = jnp.moveaxis(lam, -2, 0)          # [V, .., L]
        dpV, fwd = jax.lax.scan(step, dp0, lam_t)
        return jnp.concatenate([fwd, dpV[None]], axis=0)  # [V+1, .., S]

    @staticmethod
    def _backward_all(lam: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
        """bwd[v] [.., S] = min cost of vars >= v plus proj, given prefix sum;
        stacked [V+1, .., S]."""
        S = proj.shape[-1]

        def step(b, lam_v):
            nxt = min_corr(b, lam_v, S)
            return nxt, b

        lam_t = jnp.moveaxis(lam, -2, 0)[::-1]    # reversed var order
        b0, bwd_rev = jax.lax.scan(step, proj, lam_t)
        bwd = jnp.concatenate([b0[None], bwd_rev[::-1]], axis=0)
        return bwd                                 # bwd[v], v=0..V

    def lower_bound(self, costs):
        lam, proj = costs["lam"], costs["proj"]
        S = proj.shape[-1]
        fwd = self._forward_all(lam, S)
        return jnp.min(fwd[-1] + proj, axis=-1)

    # -- primal ----------------------------------------------------------------
    def init_primal(self, costs):
        F, V, _ = costs["lam"].shape
        return {"x": jnp.full((F, V), -1, jnp.int32)}

    def compute_primal(self, costs, primal):
        """Restricted argmin: honor already-fixed labels, DP + backtrack."""
        lam, proj = costs["lam"], costs["proj"]
        F, V, L = lam.shape
        S = proj.shape[-1]
        x = primal["x"]                            # [F, V]
        fixed = x >= 0
        sel = jax.nn.one_hot(jnp.maximum(x, 0), L, dtype=bool)
        lam_eff = jnp.where(fixed[..., None],
                            jnp.where(sel, lam, INF), lam)

        dp0 = jnp.full((F, S), INF, lam.dtype).at[:, 0].set(0.0)

        def fstep(dp, lam_v):
            nxt, arg_i = arg_min_conv(dp, lam_v, S)  # arg over prefix sums
            return nxt, arg_i

        lam_t = jnp.moveaxis(lam_eff, 1, 0)         # [V, F, L]
        dpV, ptr = jax.lax.scan(fstep, dp0, lam_t)  # ptr: [V, F, S]

        s_star = jnp.argmin(dpV + proj, axis=-1)    # [F]

        def bstep(s, ptr_v):
            i = jnp.take_along_axis(ptr_v, s[:, None], axis=1)[:, 0]
            label = s - i
            return i, label

        _, labels_rev = jax.lax.scan(bstep, s_star, ptr[::-1])
        labels = labels_rev[::-1]                   # [V, F]
        newx = jnp.moveaxis(labels, 0, 1).astype(jnp.int32)
        return {"x": jnp.where(fixed, x, newx)}

    def evaluate_primal(self, costs, primal):
        lam, proj = costs["lam"], costs["proj"]
        F, V, L = lam.shape
        x = primal["x"]
        ok = jnp.all(x >= 0, axis=1)
        xc = jnp.maximum(x, 0)
        lv = jnp.take_along_axis(lam, xc[..., None], axis=2)[..., 0]  # [F, V]
        total = jnp.sum(lv, axis=1)
        s = jnp.sum(xc, axis=1)
        s_ok = s < proj.shape[-1]
        pv = proj[jnp.arange(F), jnp.clip(s, 0, proj.shape[-1] - 1)]
        val = total + jnp.where(s_ok, pv, INF)
        return jnp.where(ok, val, INF)

    def dual_vector(self, costs):
        F = costs["lam"].shape[0]
        return jnp.concatenate([costs["lam"].reshape(F, -1),
                                costs["proj"].reshape(F, -1)], axis=1)

    # -- constraint export --------------------------------------------------
    # Arithmetic encoding instead of the exponential config table: per
    # member slot k a label simplex y[k, :], a sum simplex z[:], and the
    # linear tie sum_{k,l} l*y[k,l] == sum_s s*z[s].  Exact for the MILP
    # (integral y forces z); a relaxation of the exact counting marginal
    # polytope for the LP (still a valid lower bound) — the same shape DD_ILP
    # builds for counting factors.
    def lp_vars(self, state_row, data):
        nv, nl, pc = data
        S = len(pc)
        lam = np.asarray(state_row["lam"][:nv, :nl], dtype=np.float64)
        proj = np.asarray(state_row["proj"][:S], dtype=np.float64)
        costs = np.concatenate([lam.ravel(), proj])
        rows, rhs = [], []
        for k in range(nv):
            rows.append({k * nl + l: 1.0 for l in range(nl)})
            rhs.append(1.0)
        z0 = nv * nl
        rows.append({z0 + s: 1.0 for s in range(S)})
        rhs.append(1.0)
        tie = {k * nl + l: float(l) for k in range(nv) for l in range(1, nl)}
        for s in range(1, S):
            tie[z0 + s] = -float(s)
        rows.append(tie)
        rhs.append(0.0)
        return costs, rows, rhs, (nv, nl, S, state_row["lam"].shape[0])

    def lp_fix(self, prim_row, meta):
        nv, nl, S, _ = meta
        x = np.asarray(prim_row["x"])[:nv]
        v = np.zeros(nv * nl + S)
        v[np.arange(nv) * nl + x] = 1.0
        v[nv * nl + int(x.sum())] = 1.0
        return v

    def lp_read(self, values, meta):
        nv, nl, S, vmax = meta
        y = values[:nv * nl].reshape(nv, nl)
        x = np.zeros(vmax, dtype=np.int32)   # padded slots -> label 0
        x[:nv] = np.argmax(y, axis=1)
        return {"x": x}


COUNTING_CHAIN = CountingChainType()
