"""Export the factor-graph LP relaxation (local polytope).

Counterpart of ``LP_external_solver`` / DD_ILP's ``problem_export``
(LP_external_interface.hxx:22-83, exercised by test/test_model.cpp:40-48):
every factor contributes a probability simplex over its configurations,
every message contributes the marginalization constraints gluing its two
endpoint simplices, and the objective is the current (reparametrized) cost
— whose LP value is invariant under the zero-sum message shifts, which
makes this module a strong correctness oracle for the whole engine.

Two consumers: ``export_lp_text`` writes CPLEX .lp format;
``solve_lp_relaxation`` solves the same LP with scipy/HiGHS.
"""
from __future__ import annotations

import numpy as np

SUPPORTED_FACTORS = {"unary_simplex", "pairwise_simplex", "pairwise_potts",
                     "ternary_simplex"}


def _factor_tables(engine):
    """Per factor id: (name, config shape, flat cost vector).  Potts factors
    are densified; padded lanes are dropped via the stored sizes."""
    out = []
    state = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
             for k, v in engine.state.items()}
    for fid, (ft, data) in enumerate(engine.graph.factors):
        row = engine.f_local[fid]
        name = ft.name
        if name == "unary_simplex":
            nl = int(state[name]["nl"][row])
            c = state[name]["c"][row, :nl]
            out.append((name, (nl,), c.ravel()))
        elif name == "pairwise_simplex":
            n1 = int(state[name]["n1"][row])
            n2 = int(state[name]["n2"][row])
            c = state[name]["c"][row, :n1, :n2]
            out.append((name, (n1, n2), c.ravel()))
        elif name == "pairwise_potts":
            nl = int(state[name]["nl"][row])
            m1 = state[name]["msg1"][row, :nl]
            m2 = state[name]["msg2"][row, :nl]
            diff = state[name]["diff"][row]
            c = m1[:, None] + m2[None, :] + diff * (1.0 - np.eye(nl))
            out.append((name, (nl, nl), c.ravel()))
        elif name == "ternary_simplex":
            sh = np.shape(data)
            c = state[name]["c"][row][tuple(slice(0, s) for s in sh)]
            out.append((name, sh, c.ravel()))
        else:
            raise NotImplementedError(
                f"LP export does not support factor type {name!r}")
    return out


def build_local_polytope(engine):
    """Returns (c, A_eq rows as list of {var: coef}, b_eq, var_offsets)."""
    tables = _factor_tables(engine)
    offsets = []
    total = 0
    for (_, shape, c) in tables:
        offsets.append(total)
        total += int(np.prod(shape))
    cost = np.concatenate([c for (_, _, c) in tables]) if tables else np.zeros(0)

    rows: list[dict[int, float]] = []
    b: list[float] = []
    # simplex constraint per factor
    for fid, (_, shape, _) in enumerate(tables):
        n = int(np.prod(shape))
        rows.append({offsets[fid] + k: 1.0 for k in range(n)})
        b.append(1.0)

    # marginalization constraints per message
    for (mt, l, r, data) in engine.graph.messages:
        lname, lsh, _ = tables[l]
        rname, rsh, _ = tables[r]
        lo, ro = offsets[l], offsets[r]
        name = mt.name
        if name in ("unary_pairwise_1", "unary_potts_1",
                    "unary_pairwise_2", "unary_potts_2"):
            side = 1 if name.endswith("_1") else 2
            L = lsh[0]
            n1, n2 = rsh
            for lab in range(L):
                row = {lo + lab: 1.0}
                if side == 1:
                    for l2 in range(n2):
                        row[ro + lab * n2 + l2] = row.get(ro + lab * n2 + l2, 0.0) - 1.0
                else:
                    for l1 in range(n1):
                        row[ro + l1 * n2 + lab] = row.get(ro + l1 * n2 + lab, 0.0) - 1.0
                rows.append(row)
                b.append(0.0)
        elif name.startswith("pairwise_triplet_"):
            # pairwise (a,b) == triplet marginal over the remaining axis
            pair = name[-2:]
            n1, n2 = lsh
            t1, t2, t3 = rsh
            for a in range(n1):
                for bb in range(n2):
                    row = {lo + a * n2 + bb: 1.0}
                    if pair == "12":
                        idxs = [(a, bb, k) for k in range(t3)]
                    elif pair == "13":
                        idxs = [(a, k, bb) for k in range(t2)]
                    else:
                        idxs = [(k, a, bb) for k in range(t1)]
                    for (x, y, z) in idxs:
                        j = ro + (x * t2 + y) * t3 + z
                        row[j] = row.get(j, 0.0) - 1.0
                    rows.append(row)
                    b.append(0.0)
        elif name == "equality":
            li, ri = int(data[0]), int(data[1])
            rows.append({lo + li: 1.0, ro + ri: -1.0})
            b.append(0.0)
        else:
            raise NotImplementedError(
                f"LP export does not support message type {name!r}")
    return cost, rows, b, offsets


def solve_lp_relaxation(engine) -> float:
    """LP relaxation value via scipy/HiGHS — cross-check oracle for
    engine.lower_bound() (the DBCA bound can never exceed it)."""
    from scipy.optimize import linprog
    from scipy.sparse import csr_matrix

    cost, rows, b, _ = build_local_polytope(engine)
    data, ri, ci = [], [], []
    for i, row in enumerate(rows):
        for j, v in row.items():
            ri.append(i)
            ci.append(j)
            data.append(v)
    A = csr_matrix((data, (ri, ci)), shape=(len(rows), len(cost)))
    res = linprog(cost, A_eq=A, b_eq=np.asarray(b), bounds=(0, None),
                  method="highs")
    if not res.success:
        raise RuntimeError(f"LP solve failed: {res.message}")
    return float(res.fun) + engine.constant


def export_lp_text(engine) -> str:
    """CPLEX .lp format (DD_ILP problem_export analogue)."""
    cost, rows, b, _ = build_local_polytope(engine)
    lines = ["Minimize", " obj:"]
    terms = []
    for j, cj in enumerate(cost):
        if cj != 0.0:
            terms.append(f" {'+' if cj >= 0 else '-'} {abs(cj):.17g} x{j}")
    lines.append("".join(terms) if terms else " 0 x0")
    lines.append("Subject To")
    for i, row in enumerate(rows):
        terms = []
        for j, v in sorted(row.items()):
            terms.append(f" {'+' if v >= 0 else '-'} {abs(v):.17g} x{j}")
        lines.append(f" c{i}:{''.join(terms)} = {b[i]:.17g}")
    lines.append("Bounds")
    for j in range(len(cost)):
        lines.append(f" 0 <= x{j}")
    lines.append("End")
    return "\n".join(lines) + "\n"


def export_lp_file(engine, path: str) -> None:
    with open(path, "w") as f:
        f.write(export_lp_text(engine))
