"""Tree (chain) decomposition engines over the same factor graph.

Counterpart of the reference's alternate optimization engines
(tree_decomposition.hxx, LP_FWMAP.hxx, LP_conic_bundle.hxx):

- ``factor_tree`` / ``LP_with_trees`` (tree_decomposition.hxx:11-995):
  decompose the LP into trees, clone shared factors with their cost divided
  by multiplicity, couple the clones with Lagrange multipliers, solve each
  tree exactly.
- ``LP_subgradient_ascent`` (tree_decomposition.hxx:998-1029): projected
  subgradient on the consensus multipliers.
- ``LP_tree_FWMAP`` (LP_FWMAP.hxx:10-139): proximal block-coordinate
  Frank-Wolfe over per-tree marginal averages.

TPU redesign: trees are *monotone chains* over the MRF's pairwise graph
(the classical TRW/SRMP decomposition), padded into dense blocks
``unary [T, V, L]`` / ``pairwise [T, V-1, L, L]`` so that every exact tree
solve is ONE batched Viterbi ``lax.scan`` over all trees at once — the
reference's pointer-chasing ``send_message_up``/``track_solution_down``
(tree_decomposition.hxx:107-161) becomes a min-plus matrix scan.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .config import real_dtype
from .factors.potts import PAIRWISE_POTTS
from .factors.simplex import PAIRWISE_SIMPLEX, UNARY_SIMPLEX
from .models.mrf import MrfConstructor

BIG = 1e15


@dataclasses.dataclass
class ChainDecomposition:
    """Edge-disjoint chain cover of an MRF's pairwise graph.

    copies: list over (tree, position) of variable ids; a variable with k
    copies has its unary cost split evenly (f->divide(n),
    tree_decomposition.hxx:797-826).
    """
    unary: jnp.ndarray          # [T, V, L] base shares (padded with BIG)
    pairwise: jnp.ndarray       # [T, V-1, L, L] (padded with 0)
    var_of: np.ndarray          # [T, V] variable id or -1 (padding)
    n_vars: int
    n_labels: int
    group_index: jnp.ndarray    # [T, V] consensus-group id (var id; pads -> n_vars)
    group_size: jnp.ndarray     # [n_vars+1] #copies per group (pads -> 1)
    chains: list                # list of [var ids] per tree
    mrf: "MrfConstructor | None" = None

    # ------------------------------------------------------------------
    @classmethod
    def from_mrf(cls, mrf: MrfConstructor, graph=None) -> "ChainDecomposition":
        n = len(mrf.unaries)
        g = mrf.graph

        def unary_cost(i):
            ft, data = g.factors[mrf.unaries[i].fid]
            return np.asarray(data, dtype=np.float64)

        def pairwise_cost(i, j):
            ref = mrf.pairwise[(i, j)]
            ft, data = g.factors[ref.fid]
            if ft is PAIRWISE_POTTS:
                L, diff = data
                return diff * (1.0 - np.eye(L))
            return np.asarray(data, dtype=np.float64)

        # greedy edge-disjoint path cover
        unused = set(mrf.pairwise.keys())
        adj: dict[int, set[int]] = {}
        for (i, j) in unused:
            adj.setdefault(i, set()).add(j)
            adj.setdefault(j, set()).add(i)
        chains: list[list[int]] = []
        while unused:
            (i, j) = next(iter(unused))
            unused.discard((i, j))
            path = [i, j]
            # extend at the tail
            while True:
                t = path[-1]
                nxt = next((v for v in adj.get(t, ()) if
                            (min(t, v), max(t, v)) in unused and v not in path), None)
                if nxt is None:
                    break
                unused.discard((min(t, nxt), max(t, nxt)))
                path.append(nxt)
            # extend at the head
            while True:
                h = path[0]
                nxt = next((v for v in adj.get(h, ()) if
                            (min(h, v), max(h, v)) in unused and v not in path), None)
                if nxt is None:
                    break
                unused.discard((min(h, nxt), max(h, nxt)))
                path.insert(0, nxt)
            chains.append(path)
        covered = {v for c in chains for v in c}
        for i in range(n):
            if i not in covered:
                chains.append([i])  # isolated unary = length-1 chain

        L = max(len(unary_cost(i)) for i in range(n))
        T = len(chains)
        V = max(len(c) for c in chains)
        mult = np.zeros(n, dtype=np.int64)
        for c in chains:
            for v in c:
                mult[v] += 1

        dtype = real_dtype()
        unary = np.full((T, V, L), BIG, dtype=dtype)
        pair = np.zeros((T, max(V - 1, 1), L, L), dtype=dtype)
        var_of = np.full((T, V), -1, dtype=np.int64)
        for t, c in enumerate(chains):
            for p, v in enumerate(c):
                uc = unary_cost(v)
                unary[t, p, :len(uc)] = uc / mult[v]
                unary[t, p, len(uc):] = BIG
                var_of[t, p] = v
            for p in range(len(c) - 1):
                a, b = c[p], c[p + 1]
                m = pairwise_cost(min(a, b), max(a, b))
                if a > b:
                    m = m.T
                pair[t, p, :m.shape[0], :m.shape[1]] = m
                pair[t, p, m.shape[0]:, :] = BIG
                pair[t, p, :, m.shape[1]:] = BIG
            # padding positions: forced label 0, zero cost, zero coupling
            for p in range(len(c), V):
                unary[t, p, 0] = 0.0
            for p in range(max(len(c) - 1, 0), V - 1):
                pair[t, p, :, :] = 0.0

        group = np.where(var_of >= 0, var_of, n)
        gsize = np.ones(n + 1, dtype=np.int64)
        gsize[:n] = np.maximum(mult, 1)
        return cls(unary=jnp.asarray(unary), pairwise=jnp.asarray(pair),
                   var_of=var_of, n_vars=n, n_labels=L,
                   group_index=jnp.asarray(group),
                   group_size=jnp.asarray(gsize), chains=chains, mrf=mrf)

    # ------------------------------------------------------------------
    def project(self, lam: jnp.ndarray) -> jnp.ndarray:
        """Project multipliers onto the consensus subspace: per variable,
        copies sum to zero (Lagrangean_factor_zero_sum semantics)."""
        T, V, L = lam.shape
        flat_g = self.group_index.reshape(-1)
        flat = lam.reshape(T * V, L)
        sums = jax.ops.segment_sum(flat, flat_g, num_segments=self.n_vars + 1)
        mean = sums / self.group_size[:, None]
        out = (flat - mean[flat_g]).reshape(T, V, L)
        mask = (self.var_of >= 0)[:, :, None]  # padding positions carry no dual
        return jnp.where(mask, out, 0.0)

    # ------------------------------------------------------------------
    def solve(self, lam: jnp.ndarray):
        """Exact batched chain solve (send_message_up + root argmin +
        track_solution_down, tree_decomposition.hxx:107-161).

        Returns (bound_per_tree [T], argmin labels [T, V])."""
        u = self.unary + lam
        pw = self.pairwise
        T, V, L = u.shape

        def fstep(m, inputs):
            u_v, p_prev = inputs          # [T, L], [T, L, L]
            tot = m[:, :, None] + p_prev  # [T, L, L]
            best = jnp.min(tot, axis=1) + u_v
            arg = jnp.argmin(tot, axis=1)
            return best, arg

        if V == 1:
            bound = jnp.min(u[:, 0], axis=-1)
            return bound, jnp.argmin(u[:, 0], axis=-1)[:, None].astype(jnp.int32)

        m0 = u[:, 0]
        u_rest = jnp.moveaxis(u[:, 1:], 1, 0)         # [V-1, T, L]
        pw_t = jnp.moveaxis(pw[:, :V - 1], 1, 0)      # [V-1, T, L, L]
        mV, args = jax.lax.scan(fstep, m0, (u_rest, pw_t))
        bound = jnp.min(mV, axis=-1)

        xV = jnp.argmin(mV, axis=-1)                  # [T]

        def bstep(x, arg_v):
            prev = jnp.take_along_axis(arg_v, x[:, None], axis=1)[:, 0]
            return prev, x

        x0, xs = jax.lax.scan(bstep, xV, args[::-1])
        labels = jnp.concatenate([x0[None], xs[::-1]], axis=0)  # [V, T]
        return bound, jnp.moveaxis(labels, 0, 1).astype(jnp.int32)

    def dual_value(self, lam: jnp.ndarray) -> jnp.ndarray:
        bound, _ = self.solve(lam)
        return jnp.sum(bound)

    # ------------------------------------------------------------------
    def subgradient_ascent(self, n_iter: int = 100, ub_estimate: "float | None" = None,
                           step: float = 1.0, lam: "jnp.ndarray | None" = None):
        """Projected (Polyak) subgradient ascent (LP_subgradient_ascent,
        tree_decomposition.hxx:998-1029).  Returns (best bound, lam, history)."""
        if lam is None:
            lam = jnp.zeros_like(self.unary)
        solve = jax.jit(self.solve)
        project = jax.jit(self.project)
        best = -np.inf
        best_lam = lam
        hist = []
        for k in range(n_iter):
            bound, x = solve(lam)
            val = float(jnp.sum(bound))
            hist.append(val)
            if val > best:
                best, best_lam = val, lam
            g = jax.nn.one_hot(x, self.n_labels, dtype=lam.dtype)
            g = project(g)
            gnorm = float(jnp.sum(g * g))
            if gnorm < 1e-14:
                break  # consensus reached: decomposition agrees
            if ub_estimate is not None and ub_estimate > val:
                alpha = step * (ub_estimate - val) / gnorm
            else:
                alpha = step / np.sqrt(k + 1.0)
            lam = lam + alpha * g
        return best, best_lam, hist

    # ------------------------------------------------------------------
    def fw_map(self, n_outer: int = 10, n_inner: int = 20,
               prox_weight: float = 1.0, n_iter: "int | None" = None):
        """Proximal-point + Frank-Wolfe (FW-MAP, LP_FWMAP.hxx:10-139 /
        BCFW-Bundle): each outer step maximizes the proximal dual model

            max_lam  g(lam) - (1/2w) ||lam - lam0||^2

        by solving its Fenchel-primal penalized problem with Frank-Wolfe:

            min_{mu_t in conv(chi_t)} sum_t <theta_t + lam0, mu_t>
                + (w/2) sum_groups sum_copies ||mu_copy - mu_group_mean||^2

        (linear oracle = batched chain solve with tilted unaries, exact
        line search), then recenters lam0 <- lam0 + w proj(mu*) (the prox-model argmax).
        Returns (best bound, lam, history)."""
        if n_iter is not None:   # convenience: total budget
            n_outer = max(1, n_iter // n_inner)
        w = prox_weight
        solve = jax.jit(self.solve)
        project = jax.jit(self.project)
        L = self.n_labels

        def edge_marg(onehot):
            # [T, V, L] one-hots -> [T, V-1, L, L] outer products
            return onehot[:, :-1, :, None] * onehot[:, 1:, None, :]

        # mask BIG padding so <pairwise, mu_e> stays finite
        pw_f = jnp.where(self.pairwise < BIG / 2, self.pairwise, 0.0)
        un_f = jnp.where(self.unary < BIG / 2, self.unary, 0.0)

        lam0 = jnp.zeros_like(self.unary)
        x0 = self.solve(lam0)[1]
        mu = jax.nn.one_hot(x0, L, dtype=self.unary.dtype)
        mu_e = edge_marg(mu)
        best = -np.inf
        best_lam = lam0
        hist = []
        for _ in range(n_outer):
            for _ in range(n_inner):
                dev = project(mu)           # mu - group mean, per copy
                # linear oracle: chain solve with consensus-penalty tilt
                _, x = solve(lam0 + w * dev)
                s = jax.nn.one_hot(x, L, dtype=mu.dtype)
                s_e = edge_marg(s)
                d, d_e = s - mu, s_e - mu_e
                # exact line search on the quadratic objective
                lin = float(jnp.sum((un_f + lam0 + w * dev) * d) +
                            jnp.sum(pw_f * d_e))
                pd = project(d)
                curv = float(w * jnp.sum(pd * pd))
                gamma = 1.0 if curv <= 1e-14 else min(1.0, max(0.0, -lin / curv))
                mu = mu + gamma * d
                mu_e = mu_e + gamma * d_e
                # dual point of the prox model and its true bound
                lam_k = lam0 + w * project(mu)
                bound, _ = solve(lam_k)
                val = float(jnp.sum(bound))
                hist.append(val)
                if val > best:
                    best, best_lam = val, lam_k
            lam0 = lam0 + w * project(mu)   # proximal recenter (descent step,
            #                                 LP_FWMAP.hxx:119-133)
        return best, best_lam, hist

    # ------------------------------------------------------------------
    def primal_labels(self, lam: jnp.ndarray) -> np.ndarray:
        """Majority-vote labeling across copies (rounding from trees)."""
        _, x = self.solve(lam)
        votes = np.zeros((self.n_vars, self.n_labels), dtype=np.int64)
        xx = np.asarray(x)
        for t in range(xx.shape[0]):
            for p in range(xx.shape[1]):
                v = self.var_of[t, p]
                if v >= 0:
                    votes[v, xx[t, p]] += 1
        return votes.argmax(axis=1)

    # ------------------------------------------------------------------
    def write_back_reparametrization(self, engine, lam: jnp.ndarray) -> None:
        """Push every chain's bound mass into its root unary by exact
        upward min-marginal shifts, then write the reparametrized duals
        into the engine's blocks (write_back_reparametrization,
        tree_decomposition.hxx:970-988).  Afterwards
        engine.lower_bound() == sum of tree bounds (test/test_FWMAP.cpp
        acceptance).  Requires dense pairwise factors."""
        mrf = self.mrf
        u = np.asarray(self.unary + lam, dtype=np.float64)
        pw = np.asarray(self.pairwise, dtype=np.float64).copy()
        T, V, L = u.shape

        new_unary = {i: np.zeros(L) for i in range(self.n_vars)}
        new_pair: dict[tuple[int, int], np.ndarray] = {}
        for t, c in enumerate(self.chains):
            uu = u[t].copy()
            for p in range(len(c) - 1):
                # unary p -> pairwise p: rows += u_p ; u_p = 0
                pw[t, p] += uu[p][:, None]
                uu[p][:] = 0.0
                # pairwise p -> unary p+1: col-min shift
                m2 = pw[t, p].min(axis=0)
                pw[t, p] -= m2[None, :]
                uu[p + 1] += m2
            for p, v in enumerate(c):
                new_unary[v] += uu[p][:len(new_unary[v])]
            for p in range(len(c) - 1):
                a, b = c[p], c[p + 1]
                m = pw[t, p]
                if a > b:
                    m = m.T
                la, lb = min(a, b), max(a, b)
                new_pair[(la, lb)] = m

        state = engine.state
        uc = np.asarray(state[UNARY_SIMPLEX.name]["c"]).copy()
        for i, ref in enumerate(mrf.unaries):
            row = engine.f_local[ref.fid]
            w = min(uc.shape[1], len(new_unary[i]))
            uc[row, :w] = new_unary[i][:w]
        state[UNARY_SIMPLEX.name]["c"] = jnp.asarray(uc)
        if PAIRWISE_SIMPLEX.name in state:
            pc = np.asarray(state[PAIRWISE_SIMPLEX.name]["c"]).copy()
            for (i, j), m in new_pair.items():
                ref = mrf.pairwise[(i, j)]
                row = engine.f_local[ref.fid]
                pc[row, :m.shape[0], :m.shape[1]] = m[:pc.shape[1], :pc.shape[2]]
            state[PAIRWISE_SIMPLEX.name]["c"] = jnp.asarray(pc)
        engine.state = state
