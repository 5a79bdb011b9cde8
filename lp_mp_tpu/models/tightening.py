"""Cutting-plane tightening: triplet search.

MPLP-style frustrated-triangle separation (reference
``problem_constructors/cycle_inequalities.hxx``, acceptance pinned by
test/graphical_model.cpp:191-204): for each triangle of existing pairwise
factors, score the guaranteed dual increase of adding its triplet —

    score = min_{x1,x2,x3} [ th_ij + th_ik + th_jk ]
            - (min th_ij + min th_ik + min th_jk)

on the *current reparametrization*; add the top-scoring triplets.
Runs on host once per tightening round (not in the hot path).
"""
from __future__ import annotations

import numpy as np


def _pairwise_matrix(constructor, engine, i: int, j: int) -> np.ndarray:
    from ..factors.simplex import PAIRWISE_SIMPLEX
    p = constructor.pairwise[(i, j)]
    assert p.ftype is PAIRWISE_SIMPLEX
    row = engine.f_local[p.fid]
    c = np.asarray(engine.state[PAIRWISE_SIMPLEX.name]["c"][row], dtype=np.float64)
    ft, data = engine.graph.factors[p.fid]
    n1, n2 = data.shape
    return c[:n1, :n2]


def triangle_candidates(constructor):
    """All triangles in the pairwise-factor graph (graph.hxx:172-218
    sorted-adjacency intersection analogue, host NumPy)."""
    nbrs: dict[int, set[int]] = {}
    for (i, j) in constructor.pairwise:
        nbrs.setdefault(i, set()).add(j)
        nbrs.setdefault(j, set()).add(i)
    out = []
    for (i, j) in sorted(constructor.pairwise):
        common = nbrs.get(i, set()) & nbrs.get(j, set())
        for k in sorted(common):
            if k > j:
                out.append((i, j, k))
    return out


def triplet_score(constructor, engine, i: int, j: int, k: int) -> float:
    tij = _pairwise_matrix(constructor, engine, i, j)
    tik = _pairwise_matrix(constructor, engine, i, k)
    tjk = _pairwise_matrix(constructor, engine, j, k)
    joint = (tij[:, :, None] + tik[:, None, :] + tjk[None, :, :]).min()
    indep = tij.min() + tik.min() + tjk.min()
    return float(joint - indep)


def triplet_search(constructor, engine, max_constraints: int,
                   min_score: float = 1e-8) -> int:
    if max_constraints <= 0:
        return 0
    scored = []
    for (i, j, k) in triangle_candidates(constructor):
        if (i, j, k) in constructor.triplets:
            continue
        s = triplet_score(constructor, engine, i, j, k)
        if s > min_score:
            scored.append((s, (i, j, k)))
    scored.sort(reverse=True)
    added = 0
    for s, (i, j, k) in scored[:max_constraints]:
        constructor.add_tightening_triplet(i, j, k)
        added += 1
    return added
