"""General tree decomposition over arbitrary factor/message types.

Counterpart of the reference's ``factor_tree`` / ``LP_with_trees``
(tree_decomposition.hxx:11-995) without the chain/MRF restriction of
``trees.ChainDecomposition``:

- a *tree* is any acyclic set of messages over the factor graph
  (``factor_tree::add_message(msg, Chirality)``, tree_decomposition.hxx:
  39-104: the chirality names the endpoint closer to the root);
- factors shared between trees are cloned with their dual state divided by
  multiplicity (``f->divide(n)``, tree_decomposition.hxx:797-826);
- clone consensus is enforced through Lagrange multipliers with the
  reference's index layouts (tree_decomposition.hxx:277-585):
  ``zero_sum`` (copies sum to zero), ``star`` (hub collects +blocks, every
  other copy carries -block), ``fwmap`` (one shared block per factor, the
  consensus lives in the prox term as in BCFW-Bundle);
- ``LP_subgradient_ascent`` (tree_decomposition.hxx:998-1029) and the
  FW-MAP proximal bundle method (LP_FWMAP.hxx:10-139) optimize the
  decomposition dual.

TPU design: all trees are solved simultaneously by ONE jitted function.
Tree nodes live in the same type-batched blocks as the main engine; the
upward sweep (``send_message_up``, factors_messages.hxx:1553-1570) is a
sequence of depth-levelled batched marginal shifts (all messages whose
child sits at depth d fire together), the downward solution tracking
(``track_solution_down``, factors_messages.hxx:1573-1602) reuses the
engine's batched primal-propagation operators.  Subgradients in dual
coordinates are obtained as ``jax.grad`` of the (linear) primal evaluation
— the generic analogue of ``FactorTypeAdapter::subgradient``
(LP_MP.h:78-79) for every factor type at once.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .config import PAD_COST
from .engine import Engine, _gather
from .graph import FactorGraph, MessageRef


# ---------------------------------------------------------------------------
# pytree helpers over dual-state dicts {type: {key: array}}
# ---------------------------------------------------------------------------
def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _tdot(a, b) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(_tmap(lambda x, y: jnp.vdot(x, y), a, b))
    return sum(leaves)


def _is_dual(arr) -> bool:
    return jnp.issubdtype(arr.dtype, jnp.floating)


def _finite(c):
    """Mask PAD lanes to zero (for inner products with indicator vectors)."""
    return jnp.where(jnp.abs(c) >= PAD_COST / 2, jnp.zeros_like(c), c)


@dataclasses.dataclass
class TreeSpec:
    """One tree: list of (message, parent_side) pairs, parent_side in
    {"left","right"} naming the endpoint closer to the root — the
    ``Chirality`` argument of ``factor_tree::add_message``
    (test/test_model.hxx:150-174)."""
    messages: list  # [(MessageRef | int, "left"|"right")]


class GeneralTreeDecomposition:
    """Lagrangean decomposition of a FactorGraph into arbitrary trees."""

    def __init__(self, graph: FactorGraph, trees: list, layout: str = "zero_sum"):
        assert layout in ("zero_sum", "star", "fwmap", "quadratic")
        self.layout = layout
        self.orig = graph
        n_orig = graph.n_factors

        # ---- normalize tree specs; validate tree shape --------------------
        # (tree_decomposition.hxx:39-104: every factor except the root has
        # exactly one parent edge, edge count = node count - 1)
        norm: list[list[tuple[int, str]]] = []
        for t in trees:
            msgs = t.messages if isinstance(t, TreeSpec) else t
            norm.append([(m.mid if isinstance(m, MessageRef) else int(m), side)
                         for m, side in msgs])
        covered = set()
        tree_nodes: list[list[int]] = []
        tree_edges: list[list[tuple[int, int, int]]] = []  # (mid, parent, child)
        for tn in norm:
            nodes: set[int] = set()
            edges = []
            child_seen: set[int] = set()
            for mid, side in tn:
                _, l, r, _ = graph.messages[mid]
                parent, child = (l, r) if side == "left" else (r, l)
                assert child not in child_seen, \
                    f"factor {child} has two parents: not a tree"
                child_seen.add(child)
                nodes.update((l, r))
                edges.append((mid, parent, child))
            roots = nodes - child_seen
            assert len(roots) == 1, f"tree is not connected/acyclic (roots={roots})"
            assert len(edges) == len(nodes) - 1
            tree_nodes.append(sorted(nodes))
            tree_edges.append(edges)
            covered.update(nodes)
        # factors outside every tree become singleton trees so their bound
        # still enters the decomposition (LP_with_trees keeps them as-is)
        for f in range(n_orig):
            if f not in covered:
                tree_nodes.append([f])
                tree_edges.append([])
        self.n_trees = len(tree_nodes)

        # ---- clone graph (construct_decomposition, t_d.hxx:769-887) -------
        mult = np.zeros(n_orig, dtype=np.int64)
        for nodes in tree_nodes:
            for f in nodes:
                mult[f] += 1
        cg = FactorGraph()
        clone_of: list[dict[int, "FactorRef"]] = []
        clone2orig: list[int] = []
        clone2tree: list[int] = []
        for t, nodes in enumerate(tree_nodes):
            cmap = {}
            for f in nodes:
                ft, data = graph.factors[f]
                cmap[f] = cg.add_factor(ft, data)
                clone2orig.append(f)
                clone2tree.append(t)
            clone_of.append(cmap)
        self._tree_depth = []
        cedges = []  # (clone mid, parent clone fid, child clone fid, depth)
        for t, edges in enumerate(tree_edges):
            cmap = clone_of[t]
            depth = {next(iter(set(cmap) -
                               {c for _, _, c in edges})): 0} if edges else {}
            # BFS depths over the validated tree
            pend = list(edges)
            while pend:
                rest = []
                for mid, p, c in pend:
                    if p in depth:
                        depth[c] = depth[p] + 1
                    else:
                        rest.append((mid, p, c))
                        continue
                assert len(rest) < len(pend), "tree not connected"
                pend = rest
            for mid, p, c in edges:
                mt, l, r, data = graph.messages[mid]
                ref = cg.add_message(mt, clone_of[t][l], clone_of[t][r], data)
                cedges.append((ref.mid, cmap[p].fid, cmap[c].fid, depth[c]))
            self._tree_depth.append(depth)
        self.mult = mult
        self.clone2orig = np.asarray(clone2orig, dtype=np.int64)
        self.clone2tree = np.asarray(clone2tree, dtype=np.int64)

        # the Engine gives us type-batched blocks, message index arrays and
        # lower-bound/evaluate reductions for free; its sweep schedule is
        # unused here
        self.eng = Engine(cg, schedule_mode="coloring", use_jit=False)

        # divide clone duals by multiplicity (f->divide(n))
        m_of_row = {name: mult[self.clone2orig[self.eng._type_fids[name]]]
                    for name in self.eng.state}
        self.base = {
            name: {k: (jnp.where(
                        jnp.abs(v) >= PAD_COST / 2, v,
                        v / jnp.asarray(m_of_row[name], dtype=v.dtype).reshape(
                            (-1,) + (1,) * (v.ndim - 1))) if _is_dual(v) else v)
                   for k, v in block.items()}
            for name, block in self.eng.state.items()}

        # ---- per-type row maps ---------------------------------------------
        self._rows_tree = {name: self.clone2tree[fids]
                           for name, fids in self.eng._type_fids.items()}
        self._rows_group = {name: self.clone2orig[fids]
                            for name, fids in self.eng._type_fids.items()}
        # hub = first clone (lowest tree id) of each original factor
        self._rows_hub = {}
        for name, fids in self.eng._type_fids.items():
            grp = self._rows_group[name]
            first = np.full(n_orig, -1, dtype=np.int64)
            for i, g in enumerate(grp):
                if first[g] < 0:
                    first[g] = i
            self._rows_hub[name] = first[grp] == np.arange(len(grp))

        # ---- depth-levelled up/down plans ----------------------------------
        # map clone-graph message gid -> (type name, local index)
        loc: dict[int, tuple[str, int]] = {}
        for name, blk in self.eng.msgs.items():
            for i, g in enumerate(blk.gids):
                loc[int(g)] = (name, i)
        # group (depth, type, child_side) -> local ids
        groups: dict[tuple[int, str, bool], list[int]] = {}
        clone_depth = np.zeros(cg.n_factors, dtype=np.int64)
        for mid, p, c, d in cedges:
            name, i = loc[mid]
            child_left = (self.eng.msgs[name].lfid[i] == c)
            groups.setdefault((d, name, bool(child_left)), []).append(i)
            clone_depth[c] = d
        self.max_depth = max((d for d, _, _ in groups), default=0)
        self.up_plan = [(name, np.asarray(ids), cl)
                        for (d, name, cl) in sorted(groups, key=lambda k: -k[0])
                        for ids in [groups[(d, name, cl)]]]
        # downward, bucketed by child depth so propagation at depth d sees
        # depth d-1 primals already tracked (track_solution_down order)
        self.down_plan = [[(name, np.asarray(groups[(dd, name, cl)]), cl)
                           for (dd, name, cl) in sorted(groups) if dd == d]
                          for d in range(1, self.max_depth + 1)]
        # factor rows per (depth, type) for staged primal argmins
        self._depth_rows: list[dict[str, np.ndarray]] = []
        for d in range(self.max_depth + 1):
            per: dict[str, list[int]] = {}
            for name, fids in self.eng._type_fids.items():
                rows = np.nonzero(clone_depth[fids] == d)[0]
                # depth 0 includes singleton factors (depth array default 0)
                if len(rows):
                    per[name] = rows
            self._depth_rows.append({k: np.asarray(v) for k, v in per.items()})

        # all (i, j) clone-row pairs within each original factor's copy set
        # (Lagrangean_factor_quadratic, tree_decomposition.hxx:277-585: one
        # multiplier block per copy pair; w_ij enters copy i as +w and copy
        # j as -w, so the consensus subspace is parameterized redundantly)
        self._pairs = {}
        for name, fids in self.eng._type_fids.items():
            grp = self.clone2orig[fids]
            rows_of: dict[int, list[int]] = {}
            for i, g2 in enumerate(grp):
                rows_of.setdefault(int(g2), []).append(i)
            pi, pj = [], []
            for rows in rows_of.values():
                for a in range(len(rows)):
                    for b in range(a + 1, len(rows)):
                        pi.append(rows[a])
                        pj.append(rows[b])
            self._pairs[name] = (np.asarray(pi, dtype=np.int64),
                                 np.asarray(pj, dtype=np.int64))

        self._solve_jit = jax.jit(self._solve_impl)
        self._n_orig = n_orig

    # ------------------------------------------------------------------
    # multipliers
    # ------------------------------------------------------------------
    def zeros_like_dual(self):
        return {name: {k: jnp.zeros_like(v)
                       for k, v in blk.items() if _is_dual(v)}
                for name, blk in self.base.items()}

    def _with_dual(self, fn):
        """Apply fn(type name, key, arr) over a dual pytree."""
        def go(tree):
            return {name: {k: fn(name, k, v) for k, v in blk.items()}
                    for name, blk in tree.items()}
        return go

    def project(self, lam):
        """Project multipliers onto the consensus subspace: per original
        factor, copies sum to zero (Lagrangean_factor_zero_sum).  Valid
        bounds require lam in this subspace."""
        def go(name, k, v):
            grp = self._rows_group[name]
            s = jax.ops.segment_sum(v, grp, num_segments=self._n_orig)
            cnt = jax.ops.segment_sum(jnp.ones(v.shape[0], v.dtype), grp,
                                      num_segments=self._n_orig)
            mean = s / cnt.reshape((-1,) + (1,) * (v.ndim - 1))
            return v - mean[grp]
        return self._with_dual(go)(lam)

    def star_to_dual(self, w):
        """Star layout (Lagrangean_factor_star, t_d.hxx:315-404): w lives on
        non-hub copies; lam(copy) = -w(copy), lam(hub) = sum_copies w."""
        def go(name, k, v):
            hubm = jnp.asarray(self._rows_hub[name])
            grp = self._rows_group[name]
            nh = jnp.where(hubm.reshape((-1,) + (1,) * (v.ndim - 1)),
                           jnp.zeros_like(v), v)
            s = jax.ops.segment_sum(nh, grp, num_segments=self._n_orig)
            hub_b = hubm.reshape((-1,) + (1,) * (v.ndim - 1))
            return jnp.where(hub_b, s[grp], -nh)
        return self._with_dual(go)(w)

    def star_pullback(self, g):
        """d(bound)/dw under the star layout: gw(copy) = g(hub) - g(copy)."""
        def go(name, k, v):
            hubm = jnp.asarray(self._rows_hub[name])
            grp = self._rows_group[name]
            hub_b = hubm.reshape((-1,) + (1,) * (v.ndim - 1))
            hubval = jax.ops.segment_sum(jnp.where(hub_b, v, jnp.zeros_like(v)),
                                         grp, num_segments=self._n_orig)
            return jnp.where(hub_b, jnp.zeros_like(v), hubval[grp] - v)
        return self._with_dual(go)(g)

    def quad_to_dual(self, w):
        """Quadratic layout (Lagrangean_factor_quadratic, t_d.hxx:277-585):
        one multiplier block per copy pair; lam(i) = sum_j>i w_ij
        - sum_j<i w_ji.  Lies in the zero-sum subspace by construction."""
        out = {}
        for name, blk in w.items():
            pi, pj = self._pairs[name]
            n_rows = next(iter(self.base[name].values())).shape[0]
            out[name] = {}
            for k, v in blk.items():
                z = jnp.zeros((n_rows,) + v.shape[1:], v.dtype)
                out[name][k] = z.at[pi].add(v).at[pj].add(-v)
        return out

    def quad_pullback(self, g):
        """d(bound)/dw_ij = g(copy i) - g(copy j)."""
        out = {}
        for name, blk in g.items():
            pi, pj = self._pairs[name]
            out[name] = {k: v[pi] - v[pj] for k, v in blk.items()}
        return out

    def zeros_like_w(self):
        """Zero multipliers in LAYOUT coordinates (pair blocks for
        quadratic; clone-dual shaped otherwise)."""
        if self.layout != "quadratic":
            return self.zeros_like_dual()
        out = {}
        for name, blk in self.base.items():
            pi, _ = self._pairs[name]
            out[name] = {k: jnp.zeros((len(pi),) + v.shape[1:], v.dtype)
                         for k, v in blk.items() if _is_dual(v)}
        return out

    def to_dual(self, w):
        if self.layout == "star":
            return self.star_to_dual(w)
        if self.layout == "quadratic":
            return self.quad_to_dual(w)
        # zero_sum / fwmap (shared block): consensus by projection
        return self.project(w)

    def pullback(self, g):
        if self.layout == "star":
            return self.star_pullback(g)
        if self.layout == "quadratic":
            return self.quad_pullback(g)
        return self.project(g)

    def n_multipliers(self) -> int:
        """Size of the external multiplier vector (joint_no_Lagrangean_vars):
        zero_sum/quadratic-style = dual size of every copy; star =
        (copies-1) blocks per factor; fwmap = one shared block per factor."""
        total = 0
        for name, blk in self.base.items():
            dual = [v for v in blk.values() if _is_dual(v)]
            per_row = sum(int(np.prod(v.shape[1:])) for v in dual)
            grp = self._rows_group[name]
            k = np.bincount(grp, minlength=self._n_orig)
            k = k[k > 0]
            if self.layout == "star":
                total += per_row * int(np.sum(k - 1))
            elif self.layout == "fwmap":
                total += per_row * len(k)
            elif self.layout == "quadratic":
                total += per_row * int(np.sum(k * (k - 1) // 2))
            else:
                total += per_row * int(np.sum(k))
        return total

    # ------------------------------------------------------------------
    # exact batched tree solve
    # ------------------------------------------------------------------
    def _apply_shift(self, state, name, ids, delta, sender_left: bool):
        blk = self.eng.msgs[name]
        mt = blk.mtype
        ln, rn = mt.left_type.name, mt.right_type.name
        lidx, ridx = blk.lidx[ids], blk.ridx[ids]
        data = _gather(blk.data, ids)
        if sender_left:
            state[ln] = mt.repam_left(state[ln], lidx, -delta, data)
            state[rn] = mt.repam_right(state[rn], ridx, delta, data)
        else:
            state[rn] = mt.repam_right(state[rn], ridx, -delta, data)
            state[ln] = mt.repam_left(state[ln], lidx, delta, data)
        return state

    def _solve_impl(self, lam):
        """Returns (bound_per_tree [T], primal pytree, swept state)."""
        # add multipliers onto the divided base duals
        state = {name: dict(blk) for name, blk in self.base.items()}
        for name, blk in lam.items():
            for k, v in blk.items():
                state[name][k] = jnp.where(
                    jnp.abs(state[name][k]) >= PAD_COST / 2,
                    state[name][k], state[name][k] + v)

        # upward sweep: full-weight min-marginal pushes, deepest level first
        # (send_message_up == send with omega=1, factors_messages.hxx:1553-1570)
        for name, ids, child_left in self.up_plan:
            blk = self.eng.msgs[name]
            mt = blk.mtype
            if child_left:
                sl = _gather(state[mt.left_type.name], blk.lidx[ids])
                delta = mt.marginal_left(sl, _gather(blk.data, ids))
            else:
                sl = _gather(state[mt.right_type.name], blk.ridx[ids])
                delta = mt.marginal_right(sl, _gather(blk.data, ids))
            state = self._apply_shift(state, name, ids, delta, child_left)

        # per-tree bound = sum of factor bounds after the sweep: the DP
        # optimum (leftover mins are constants, the root carries the rest)
        from .config import real_dtype
        bound = jnp.zeros(self.n_trees, dtype=real_dtype())
        for name, blk in state.items():
            lb = self.eng.ftypes[name].lower_bound(blk)
            bound = bound + jax.ops.segment_sum(
                lb, self._rows_tree[name], num_segments=self.n_trees)

        # downward: root argmin, then track_solution_down level by level
        prim = {name: self.eng.ftypes[name].init_primal(blk)
                for name, blk in state.items()}

        def primal_at(depth_rows, prim):
            for tname, rows in depth_rows.items():
                ft = self.eng.ftypes[tname]
                newp = ft.compute_primal(_gather(state[tname], rows),
                                         _gather(prim[tname], rows))
                prim[tname] = {k: prim[tname][k].at[rows].set(newp[k])
                               for k in prim[tname]}
            return prim

        prim = primal_at(self._depth_rows[0], prim)
        for d in range(1, self.max_depth + 1):
            for name, ids, child_left in self.down_plan[d - 1]:
                blk = self.eng.msgs[name]
                mt = blk.mtype
                ln, rn = mt.left_type.name, mt.right_type.name
                data = _gather(blk.data, ids)
                if child_left:   # parent is right: propagate right -> left
                    prim[ln] = mt.propagate_primal_r2l(
                        prim[ln], prim[rn], blk.lidx[ids], blk.ridx[ids], data)
                else:
                    prim[rn] = mt.propagate_primal_l2r(
                        prim[ln], prim[rn], blk.lidx[ids], blk.ridx[ids], data)
            prim = primal_at(self._depth_rows[d], prim)
        return bound, prim, state

    def solve(self, lam=None):
        if lam is None:
            lam = self.zeros_like_dual()
        return self._solve_jit(lam)

    def decomposition_lower_bound(self, lam=None) -> float:
        bound, _, _ = self.solve(lam)
        return float(jnp.sum(bound))

    # ------------------------------------------------------------------
    # subgradient in dual coordinates
    # ------------------------------------------------------------------
    def _indicator(self, prim):
        """d(primal cost)/d(dual state): the labeling indicator in every
        factor's dual coordinates — the generic FactorTypeAdapter::
        subgradient (LP_MP.h:78-79) via jax.grad of the linear evaluation."""
        def total(dual):
            s = 0.0
            for name, blk in dual.items():
                full = {**self.base[name], **blk}
                v = self.eng.ftypes[name].evaluate_primal(full, prim[name])
                s = s + jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0))
            return s
        dual0 = self.zeros_like_dual()
        return jax.grad(total)(dual0)

    # ------------------------------------------------------------------
    # optimizers
    # ------------------------------------------------------------------
    def subgradient_ascent(self, n_iter: int = 100, step: float = 1.0,
                           ub_estimate: "float | None" = None, w=None):
        """Projected/Polyak subgradient ascent on the chosen layout
        (LP_subgradient_ascent, tree_decomposition.hxx:998-1029)."""
        if w is None:
            w = self.zeros_like_w()

        @jax.jit
        def grad_at(w):
            bound, prim, _ = self._solve_impl(self.to_dual(w))
            g = self.pullback(self._indicator(prim))
            return jnp.sum(bound), g, _tdot(g, g)

        best, best_w, hist = -np.inf, w, []
        for k in range(n_iter):
            val, g, gnorm = grad_at(w)
            val, gnorm = float(val), float(gnorm)
            hist.append(val)
            if val > best:
                best, best_w = val, w
            if gnorm < 1e-14:
                break   # consensus: all copies agree
            if ub_estimate is not None and ub_estimate > val:
                alpha = step * (ub_estimate - val) / gnorm
            else:
                alpha = step / np.sqrt(k + 1.0)
            w = _tmap(lambda wi, gi: wi + alpha * gi, w, g)
        return best, best_w, hist

    def fw_map(self, n_outer: int = 10, n_inner: int = 20,
               prox_weight: float = 1.0):
        """Proximal-point + Frank-Wolfe over the decomposition
        (LP_FWMAP.hxx:10-139 / BCFW-Bundle): linear oracle = batched tree
        solve with consensus-penalty-tilted duals, exact line search on the
        quadratic prox model, recenter after each outer round."""
        w = prox_weight
        lam0 = self.zeros_like_dual()
        base_fin = {name: {k: _finite(v) for k, v in blk.items() if _is_dual(v)}
                    for name, blk in self.base.items()}

        @jax.jit
        def oracle(lam):
            bound, prim, _ = self._solve_impl(lam)
            return jnp.sum(bound), self._indicator(prim)

        @jax.jit
        def fw_step(lam0, mu):
            dev = self.project(mu)
            _, s = oracle(_tmap(jnp.add, lam0, _tmap(lambda x: w * x, dev)))
            d = _tmap(jnp.subtract, s, mu)
            tilt = _tmap(lambda c, l, dv: c + l + w * dv, base_fin, lam0, dev)
            lin = _tdot(tilt, d)
            pd = self.project(d)
            curv = w * _tdot(pd, pd)
            gamma = jnp.where(curv <= 1e-14, 1.0,
                              jnp.clip(-lin / jnp.where(curv <= 1e-14, 1.0, curv),
                                       0.0, 1.0))
            mu = _tmap(lambda m, di: m + gamma * di, mu, d)
            lam_k = _tmap(lambda l, p: l + w * p, lam0, self.project(mu))
            val, _ = oracle(lam_k)
            return mu, lam_k, val

        # start from the zero-multiplier tree optimum
        _, mu = oracle(lam0)
        best, best_lam, hist = -np.inf, lam0, []
        for _ in range(n_outer):
            for _ in range(n_inner):
                mu, lam_k, val = fw_step(lam0, mu)
                val = float(val)
                hist.append(val)
                if val > best:
                    best, best_lam = val, lam_k
            lam0 = _tmap(lambda l, p: l + w * p, lam0, self.project(mu))
        return best, best_lam, hist

    # ------------------------------------------------------------------
    def consensus_primal(self, prim):
        """Per original factor: the hub clone's labels + agreement flag."""
        out: dict[int, dict] = {}
        agree = True
        for name, fids in self.eng._type_fids.items():
            grp = self._rows_group[name]
            hub = self._rows_hub[name]
            for key, arr in prim[name].items():
                a = np.asarray(arr)
                for i in np.nonzero(hub)[0]:
                    out.setdefault(int(grp[i]), {})[key] = a[i]
                for g in np.unique(grp):
                    rows = np.nonzero(grp == g)[0]
                    if len(rows) > 1 and len(np.unique(a[rows])) > 1:
                        agree = False
        return out, agree

    # ------------------------------------------------------------------
    def load_duals(self, engine: Engine) -> None:
        """Rebuild the divided base duals from an engine's CURRENT
        reparametrization — the --treeDecompositionBegin mid-run engine
        switch (tree_decomposition.hxx:918-929): message passing runs
        first, then the decomposition continues from the reparametrized
        costs it produced."""
        for name, blk in self.base.items():
            fids = self.eng._type_fids[name]
            src_rows = engine.f_local[self.clone2orig[fids]]
            m = self.mult[self.clone2orig[fids]]
            for k, v in blk.items():
                if not _is_dual(v):
                    continue
                src = jnp.asarray(engine.state[name][k])[src_rows]
                if src.shape[1:] != v.shape[1:]:
                    pads = [(0, 0)] + [(0, c - s) for s, c in
                                       zip(src.shape[1:], v.shape[1:])]
                    src = jnp.pad(src, pads, constant_values=PAD_COST)
                mb = jnp.asarray(m, dtype=v.dtype).reshape(
                    (-1,) + (1,) * (v.ndim - 1))
                blk[k] = jnp.where(jnp.abs(v) >= PAD_COST / 2, v, src / mb)
        # self.base is baked into the previous trace as a constant
        self._solve_jit = jax.jit(self._solve_impl)

    # ------------------------------------------------------------------
    def write_back_reparametrization(self, engine: Engine, lam=None) -> None:
        """Push every tree's mass rootward (the upward sweep), then write
        sum-of-clones duals into an Engine built on the ORIGINAL graph
        (write_back_reparametrization, tree_decomposition.hxx:970-988).
        Afterwards engine.lower_bound() >= decomposition bound
        (test/test_FWMAP.cpp:20-21 acceptance)."""
        if lam is None:
            lam = self.zeros_like_dual()
        _, _, swept = self.solve(lam)
        state = dict(engine.state)
        for name, blk in swept.items():
            rows_orig = engine.f_local[self.clone2orig[self.eng._type_fids[name]]]
            newb = dict(state[name])
            for k, v in blk.items():
                if not _is_dual(v):
                    continue
                tgt = jnp.where(jnp.abs(newb[k]) >= PAD_COST / 2,
                                newb[k], jnp.zeros_like(newb[k]))
                contrib = _finite(v)
                if contrib.shape[1:] != tgt.shape[1:]:
                    # clone block may be padded narrower than the original's
                    pads = [(0, 0)] + [(0, t - c) for c, t in
                                       zip(contrib.shape[1:], tgt.shape[1:])]
                    contrib = jnp.pad(contrib, pads)
                tgt = tgt.at[rows_orig].add(contrib)
                newb[k] = tgt
            state[name] = newb
        engine.state = state
