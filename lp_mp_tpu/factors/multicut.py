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

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PAD_COST, real_dtype
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


def _wheel_tables(k: int):
    """Membership-pattern tables for an odd-k-wheel (hub + k-cycle rim).

    A partition of the wheel restricted to its 2k edges is determined by
    a_i = [rim node i in the hub's block] plus, for rim edges whose both
    endpoints have a=0, a free cut/uncut choice (two hub-less neighbors may
    or may not share a block).  Enumerating a in {0,1}^k is exact and O(2^k)
    — the TPU-native replacement for Bell-number partition enumeration
    (ODD_WHEEL_PATTERNS does K4 explicitly; this scales to any odd k).

    Returns (A [P,k], forced_cut [P,k], both_one [P,k], free [P,k]) over the
    rim edges i -> (i, i+1 mod k).
    """
    P = 1 << k
    A = ((np.arange(P)[:, None] >> np.arange(k)[None, :]) & 1).astype(np.int32)
    An = np.roll(A, -1, axis=1)
    forced_cut = A != An
    both_one = (A == 1) & (An == 1)
    free = (A == 0) & (An == 0)
    return A, forced_cut, both_one, free


def _wheel_cut_configs(k: int) -> np.ndarray:
    """All valid cut vectors (spoke bits 0..k-1, rim bits k..2k-1) of the
    odd-k-wheel, for LP/ILP constraint export.  Derived from the membership
    patterns: spoke i cut iff a_i = 0; rim forced by (a_i, a_{i+1}); free
    0-0 rim edges enumerate both choices; the all-a-zero patterns exclude
    exactly-one-rim-cut (that would cut an edge inside one block)."""
    import itertools
    A, forced_cut, both_one, free = _wheel_tables(k)
    seen = set()
    for p in range(A.shape[0]):
        spoke = tuple(1 - A[p])
        free_idx = np.nonzero(free[p])[0]
        base = forced_cut[p].astype(np.int64)
        for bits in itertools.product((0, 1), repeat=len(free_idx)):
            rim = base.copy()
            rim[free_idx] = bits
            if not A[p].any() and rim.sum() == 1:
                continue
            seen.add(spoke + tuple(rim))
    return np.array(sorted(seen), dtype=np.int32)


class MulticutWheelKType(FactorType):
    """General odd-k-wheel factor (hub + odd k-cycle rim, k >= 3): exact min
    over all partitions of its k+1 nodes via the membership-pattern DP of
    ``_wheel_tables``.  One batched type per k; state = reparametrization
    slots sp [F,k] (spokes, hub-v_i) and rim [F,k] (v_i-v_{i+1}).  Odd-wheel
    inequalities are multicut facets the cycle relaxation misses — the
    generalization of the K4 odd-3-wheel beyond 4-cliques (VERDICT r2
    item 8; downstream odd_wheel separation surface).

    The dual reductions price each hub-less (0-0) rim edge's cut choice
    independently, which admits one family of invalid configs (all rim
    nodes hub-less with exactly ONE rim cut).  That only *enlarges* the
    factor's feasible set, so LowerBound stays a valid (marginally weaker)
    bound; evaluate_primal and the LP-export configs enforce strict
    partition validity."""

    def __init__(self, k: int):
        assert k >= 3 and k % 2 == 1, "odd wheels require odd rim length"
        self.k = k
        self.name = f"multicut_wheel_k{k}"
        A, forced_cut, both_one, free = _wheel_tables(k)
        self._A = A
        self._forced_cut = forced_cut
        self._both_one = both_one
        self._free = free
        # hub-triangle pattern row under forced-cut membership: triangle i
        # bits are (spoke_i_cut, spoke_j_cut, 1) = (1,0,1) row 1 / (0,1,1)
        # row 2 of TRIPLET_PATTERNS
        si = 1 - A
        self._si = si
        self._idx_fc = np.where(si == 1, 1, 2).astype(np.int32)   # [P, k]
        self._configs = None   # lazy LP-export table

    def build(self, instances):
        n = len(list(instances))
        z = np.zeros((n, self.k), dtype=real_dtype())
        # tri [F, k, 4]: reparametrization slots of the k hub triangles
        # (hub, v_i, v_{i+1}) over TRIPLET_PATTERNS in wheel edge order
        # (spoke_i, spoke_{i+1}, rim_i) — the triplet <-> wheel message
        # target (reference multicut_triplet_odd_3_wheel_message analogue)
        tri = np.zeros((n, self.k, 4), dtype=real_dtype())
        return {"sp": z, "rim": z.copy(), "tri": tri}

    def item_data(self, block, i):
        return None

    # -- pattern costs -------------------------------------------------------
    def _free_choice(self, rim, tri):
        """[F, 1, k] cheaper price of a hub-less rim edge: uncut (triangle
        pattern (1,1,0)) vs cut (rim cost + pattern (1,1,1))."""
        tri0 = tri[:, :, 0][:, None, :]
        tri3 = tri[:, :, 3][:, None, :]
        return jnp.minimum(rim[:, None, :] + tri3, tri0)

    def _pattern_costs(self, sp, rim, tri):
        """[F, 2^k] cost of every membership pattern (free rim edges take
        their cheaper choice, priced jointly with the triangle slots)."""
        A = jnp.asarray(self._A, dtype=sp.dtype)
        fc = jnp.asarray(self._forced_cut)
        fr = jnp.asarray(self._free)
        base = sp @ (1.0 - A).T                                 # [F, P]
        oh_fc = jax.nn.one_hot(self._idx_fc, 4, dtype=sp.dtype)  # [P, k, 4]
        t_fc = jnp.einsum("fkr,pkr->fpk", tri, oh_fc)           # [F, P, k]
        contr = jnp.where(fc[None], rim[:, None, :] + t_fc,
                          jnp.where(fr[None], self._free_choice(rim, tri),
                                    0.0))
        return base + jnp.sum(contr, axis=2)

    def lower_bound(self, costs):
        return jnp.min(self._pattern_costs(costs["sp"], costs["rim"],
                                           costs["tri"]), axis=1)

    def slot_marginals(self, costs):
        """[F, 2k] per-edge-slot marginal min(cost|cut) - min(cost|uncut);
        slots 0..k-1 = spokes, k..2k-1 = rim edges."""
        sp, rim, tri = costs["sp"], costs["rim"], costs["tri"]
        base = self._pattern_costs(sp, rim, tri)                # [F, P]
        freec = self._free_choice(rim, tri)                     # [F, 1, k]
        big = jnp.asarray(PAD_COST, base.dtype)
        outs = []
        A = self._A
        for i in range(self.k):                                 # spokes
            cut = jnp.min(jnp.where(A[None, :, i] == 0, base, big), axis=1)
            unc = jnp.min(jnp.where(A[None, :, i] == 1, base, big), axis=1)
            outs.append(cut - unc)
        for i in range(self.k):                                 # rim edges
            fc = self._forced_cut[None, :, i]
            bo = self._both_one[None, :, i]
            fr = self._free[None, :, i]
            ri = rim[:, i:i + 1]
            t0 = tri[:, i, 0][:, None]
            t3 = tri[:, i, 3][:, None]
            fi = freec[:, :, i]
            cut_v = jnp.where(fc, base,
                              jnp.where(fr, base - fi + ri + t3, big))
            unc_v = jnp.where(bo, base,
                              jnp.where(fr, base - fi + t0, big))
            outs.append(jnp.min(cut_v, axis=1) - jnp.min(unc_v, axis=1))
        return jnp.stack(outs, axis=1)

    def tri_marginals(self, costs):
        """[F, k, 4] min-marginal of each hub triangle's pattern slots vs
        the all-uncut baseline, in wheel edge order (spoke_i, spoke_j,
        rim_i): m[i, r] = min(cost | triangle i realizes pattern r)
        - min(cost | triangle i uncut)."""
        sp, rim, tri = costs["sp"], costs["rim"], costs["tri"]
        base = self._pattern_costs(sp, rim, tri)                # [F, P]
        freec = self._free_choice(rim, tri)
        big = jnp.asarray(PAD_COST, base.dtype)
        si = self._si
        out = []
        for i in range(self.k):
            fc = self._forced_cut[None, :, i]
            bo = self._both_one[None, :, i]
            fr = self._free[None, :, i]
            ri = rim[:, i:i + 1]
            t0 = tri[:, i, 0][:, None]
            t3 = tri[:, i, 3][:, None]
            fi = freec[:, :, i]
            base_unc = jnp.min(jnp.where(bo, base, big), axis=1)
            rows = []
            # row 0 = (1,1,0): hub-less, rim uncut;  row 3 = (1,1,1)
            rows.append(jnp.min(jnp.where(fr, base - fi + t0, big), axis=1))
            # row 1 = (1,0,1): spoke_i cut, spoke_j uncut, rim cut
            m1 = fc & (si[None, :, i] == 1)
            rows.append(jnp.min(jnp.where(m1, base, big), axis=1))
            # row 2 = (0,1,1)
            m2 = fc & (si[None, :, i] == 0)
            rows.append(jnp.min(jnp.where(m2, base, big), axis=1))
            rows.append(jnp.min(jnp.where(fr, base - fi + ri + t3, big),
                                axis=1))
            out.append(jnp.stack(rows, axis=1) - base_unc[:, None])
        return jnp.stack(out, axis=1)

    # -- primal --------------------------------------------------------------
    def init_primal(self, costs):
        F = costs["sp"].shape[0]
        return {"e": jnp.full((F, 2 * self.k), -1, jnp.int32)}

    def evaluate_primal(self, costs, primal):
        k = self.k
        e = primal["e"]
        sp_cut = e[:, :k]
        rim_cut = e[:, k:]
        a = 1 - sp_cut
        an = jnp.roll(a, -1, axis=1)
        set_ok = jnp.all(e >= 0, axis=1)
        # rim edge forced cut iff membership differs; forced uncut iff both 1
        ok = jnp.all(jnp.where(a != an, rim_cut == 1, True), axis=1)
        ok &= jnp.all(jnp.where((a == 1) & (an == 1), rim_cut == 0, True),
                      axis=1)
        # all-hubless rim: a single cut rim edge would split one block
        all_zero = jnp.all(a == 0, axis=1)
        ok &= jnp.where(all_zero, jnp.sum(rim_cut, axis=1) != 1, True)
        val = jnp.sum(costs["sp"] * sp_cut, axis=1) + \
            jnp.sum(costs["rim"] * rim_cut, axis=1)
        # hub-triangle slot costs under the realized triangle patterns
        tri = costs["tri"]
        bits = jnp.stack([sp_cut, jnp.roll(sp_cut, -1, axis=1), rim_cut],
                         axis=2)                                # [F, k, 3]
        pats = jnp.asarray(TRIPLET_PATTERNS)                    # [4, 3]
        match = jnp.all(bits[:, :, None, :] == pats[None, None], axis=3)
        val = val + jnp.sum(jnp.where(match, tri, 0.0), axis=(1, 2))
        return jnp.where(set_ok & ok, val, jnp.inf)

    def dual_vector(self, costs):
        F = costs["sp"].shape[0]
        return jnp.concatenate([costs["sp"], costs["rim"],
                                costs["tri"].reshape(F, -1)], axis=1)

    # -- constraint export ---------------------------------------------------
    def configs(self) -> np.ndarray:
        if self._configs is None:
            self._configs = _wheel_cut_configs(self.k)
        return self._configs

    def lp_vars(self, state_row, data):
        cfg = self.configs().astype(np.float64)
        w = np.concatenate([np.asarray(state_row["sp"], dtype=np.float64),
                            np.asarray(state_row["rim"], dtype=np.float64)])
        c = cfg @ w
        # add hub-triangle slot costs per config
        tri = np.asarray(state_row["tri"], dtype=np.float64)   # [k, 4]
        k = self.k
        for j, row in enumerate(self.configs()):
            for i in range(k):
                bits = (row[i], row[(i + 1) % k], row[k + i])
                hit = np.nonzero((TRIPLET_PATTERNS ==
                                  np.asarray(bits)).all(axis=1))[0]
                if len(hit):
                    c[j] += tri[i, int(hit[0])]
        return c, [{j: 1.0 for j in range(len(c))}], [1.0], cfg

    def lp_fix(self, prim_row, meta):
        e = np.asarray(prim_row["e"], dtype=np.int32)
        v = np.zeros(meta.shape[0])
        hit = np.nonzero((meta == e).all(axis=1))[0]
        v[int(hit[0])] = 1.0
        return v

    def lp_read(self, values, meta):
        return {"e": meta[int(np.argmax(values))].astype(np.int64)}


MULTICUT_EDGE = MulticutEdgeType()
MULTICUT_TRIPLET = MulticutTripletType()
MULTICUT_ODD_WHEEL = MulticutOddWheelType()

_WHEEL_K_CACHE: dict[int, MulticutWheelKType] = {}


def wheel_k_type(k: int) -> MulticutWheelKType:
    """Singleton odd-k-wheel factor type per rim length."""
    if k not in _WHEEL_K_CACHE:
        _WHEEL_K_CACHE[k] = MulticutWheelKType(k)
    return _WHEEL_K_CACHE[k]
