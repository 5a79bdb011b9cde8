"""Structured (scatter-free AND gather-free) pull pass.

TPU redesign of the generic engine's hot dual sweep.  The reference engine
walks factors sequentially at cache speed (LP_MP.h:869-1005); round 4's
pull pass replaced scatters with HBM gathers, but random row gathers on
this hardware run ~5 ns/row — 48M gathered rows per iteration on the
1000x1000 grid (~240 ms) made the generic engine *slower* than the 2017
single-thread CPU baseline.

Design (round 5): every gather site in the pass is driven by STATIC index
arrays, and for structured models (grids, chains, dense assignment blocks)
those arrays are affine-strided.  We exploit that in three steps:

1. **Slot-major layout**: per op (message type x direction), messages are
   re-indexed into "slots": slot g holds at most one message per receiving
   factor row, with lane u = the receiver's local row.  The receiver-side
   application then needs NO index arithmetic at all — contributions add
   lane-for-lane onto a contiguous row range of the receiver block.

2. **Strided pattern fitting**: the remaining per-slot sender map
   ``f[u] = sender row of slot-g's message at receiver u`` is fitted to
       f[u] = b + (u // P) * T + (u % P)
   which covers identity (b=0, T=P), constant offsets (T=P), row-major
   grids with unequal widths (T = P±1, compiled as overlapping-block
   slab reads), and broadcast rays (T=0).  A fitted map compiles to
   pad+slice+reshape — pure streaming reads XLA fuses into the
   surrounding arithmetic; its inverse (sender-side accumulation) is the
   mirrored reshape plus static-slice adds.  Single-chunk model builds
   that interleave several edge orientations in one slot are split into
   per-orientation sheets by exact-membership extraction (``decompose``).
   Unfittable sheets fall back to one explicit gather / scatter-add,
   which is exactly what the round-4 pull pass paid everywhere.

3. **Traffic minimization** (this pass is HBM-bound): same-pattern sheets
   with disjoint lanes are merged, every slot is restricted to the tight
   lane range it covers, contributions accumulate straight into the state
   arrays via static-slice adds (no fresh zero blocks), and
   overlapping-block reads stop at the highest valid residue.

The result: on strided models the whole dual sweep is dense elementwise
math + static slices — no gather or scatter instructions at all.
Semantics are the round-4 pull pass's (shared update mode, snapshot sends
per phase stage; MessageContainer zero-sum contract,
factors_messages.hxx:425-510), pinned by tests/test_pull_pass.py parity
against the exact scatter engine.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .config import real_dtype


# ---------------------------------------------------------------------------
# pattern fitting
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Strided:
    """f[u] = b + (u // P) * T + (u % P).  T >= P: disjoint blocks; T < P:
    overlapping blocks (compiled as ceil(P/T) concatenated slab reads);
    T == 0: broadcast (every block reads the same P rows)."""
    b: int
    T: int
    P: int


def _verify(pattern: Strided, u: np.ndarray, f: np.ndarray) -> bool:
    b, T, P = pattern.b, pattern.T, pattern.P
    if P <= 0 or T < 0:
        return False
    return bool((f == b + (u // P) * T + (u % P)).all())


def fit_pattern(f: np.ndarray, valid: np.ndarray) -> "Strided | None":
    """Fit ``f`` on valid lanes to the strided form, else None.

    Candidates: constant offset (T=P covers identity too); block period
    inferred from the change points of d[u] = f[u] - u (d is constant on
    [kP, (k+1)P) and steps by T-P at block boundaries); broadcast (T=0).
    Verification is exact and vectorized, so a wrong candidate can never
    produce a wrong pass — only a fallback."""
    u = np.nonzero(valid)[0]
    if len(u) == 0:
        return None
    fv = f[u].astype(np.int64)
    d = fv - u
    R = len(valid)
    # constant offset: f = u + b  ->  (b, T=1, P=1); the unit period keeps
    # lane-range restriction exact (lo rounds to itself)
    if d.min() == d.max():
        cand = Strided(int(d[0]), 1, 1)
        if _verify(cand, u, fv):
            return cand
    # general strided: d changes value exactly at block boundaries k*P
    ch = np.nonzero(d[1:] != d[:-1])[0] + 1          # indices into u
    cands: list[Strided] = []
    if len(ch):
        for P in {int(u[ch[0]]), int(u[ch[0]] - u[0])} | (
                {int(u[ch[1]] - u[ch[0]])} if len(ch) > 1 else set()):
            if P <= 0:
                continue
            # T from the per-block step of d: d = b + k*(T - P)
            k = u // P
            dk = np.unique(k)
            if len(dk) < 2:
                continue
            i0 = int(np.searchsorted(k, dk[0]))
            i1 = int(np.searchsorted(k, dk[1]))
            step, rem = divmod(int(d[i1] - d[i0]), int(dk[1] - dk[0]))
            if rem:
                continue
            T = step + P
            b = int(d[i0]) - int(dk[0]) * step
            cands.append(Strided(b, T, P))
    for cand in cands:
        if _verify(cand, u, fv):
            return cand
    return None


def _candidate_periods(f: np.ndarray, valid: np.ndarray) -> list[int]:
    """Period guesses for sheet extraction, from the gaps between lanes
    where d = f - u changes (a strided sheet of period P mixed with other
    sheets produces jump lanes whose gaps are P or split P into a few
    parts — so the most frequent gaps and sums of adjacent gaps cover it)."""
    u = np.nonzero(valid)[0]
    if len(u) < 3:
        return []
    d = f[u].astype(np.int64) - u
    jumps = u[1:][d[1:] != d[:-1]]
    if len(jumps) < 1:
        return []
    gaps = np.diff(jumps)
    cands: list[int] = [int(jumps[0]), int(jumps[0]) + 1]
    if len(gaps):
        vals, counts = np.unique(gaps, return_counts=True)
        cands += [int(v) for v in vals[np.argsort(-counts)][:3]]
        if len(gaps) > 1:
            s = gaps[:-1] + gaps[1:]
            vals, counts = np.unique(s, return_counts=True)
            cands += [int(v) for v in vals[np.argsort(-counts)][:2]]
    seen, out = set(), []
    for p in cands:
        if p > 0 and p not in seen:
            seen.add(p)
            out.append(p)
    return out[:6]


def _forced_fit(f: np.ndarray, rem: np.ndarray, P: int):
    """Best (pattern, membership) with the given period, anchored at a few
    lanes of ``rem`` (anchors on a minority sheet give low membership and
    lose; membership tests are exact, so a bad anchor can't corrupt)."""
    u = np.nonzero(rem)[0]
    if len(u) < 2:
        return None, None
    best = (0, None, None)
    lanes = np.arange(len(rem))
    for a0 in (0, len(u) // 3, (2 * len(u)) // 3):
        u0 = int(u[a0])
        # partner with the same residue in a later block
        part = u[(u % P == u0 % P) & (u // P > u0 // P)]
        if not len(part):
            continue
        u1 = int(part[0])
        T, rem_div = divmod((int(f[u1]) - int(f[u0])) * P, u1 - u0)
        if rem_div or T < 0:
            continue
        b = int(f[u0]) - (u0 // P) * T - (u0 % P)
        m = rem & (f == b + (lanes // P) * T + (lanes % P))
        cnt = int(m.sum())
        if cnt > best[0]:
            best = (cnt, Strided(b, T, P), m)
    return best[1], best[2]


def decompose(f: np.ndarray, valid: np.ndarray, row_cap: int,
              max_sheets: int = 6) -> list:
    """Split one slot's sender map into strided sheets:
    [(Strided | None, valid_mask)].  A single-chunk model build (e.g. all
    grid edges in one add_potts_factors call) interleaves orientations in
    one slot; sheet extraction recovers each orientation's strided map and
    leaves anything unexplained on a gather-fallback sheet."""
    def capped(pat: "Strided | None") -> "Strided | None":
        if pat is not None and pat.T > 0:
            R1 = -(-len(valid) // pat.P)
            if R1 * pat.T > row_cap:
                return None
        return pat

    whole = capped(fit_pattern(f, valid))
    if whole is not None:
        return [(whole, valid)]
    sheets = []
    rem = valid.copy()
    for _ in range(max_sheets):
        n_rem = int(rem.sum())
        if n_rem == 0:
            return sheets
        pat = capped(fit_pattern(f, rem))
        if pat is not None:
            sheets.append((pat, rem))
            return sheets
        best_cnt, best = 0, None
        for P in _candidate_periods(f, rem):
            pat, m = _forced_fit(f, rem, P)
            pat = capped(pat)
            if pat is not None and int(m.sum()) > best_cnt:
                best_cnt, best = int(m.sum()), (pat, m)
        if best is None or best_cnt < max(64, n_rem // 5):
            break
        sheets.append(best)
        rem = rem & ~best[1]
    if rem.any():
        sheets.append((None, rem))
    return sheets


# ---------------------------------------------------------------------------
# strided reads / inverse accumulation (all static slices)
# ---------------------------------------------------------------------------

def _pad_rows(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    if lo == 0 and hi == 0:
        return x
    return jnp.pad(x, ((lo, hi),) + ((0, 0),) * (x.ndim - 1))


def _span_add(acc: jnp.ndarray, g: jnp.ndarray, start: int) -> jnp.ndarray:
    """acc with g added at rows [start, start+len(g)).  Near-full spans use
    a padded elementwise add: chained adds then fuse into ONE pass over
    the array, whereas every .at[].add lowers to a dynamic-update-slice —
    a fusion barrier that rewrites the whole buffer (the compiled 1000^2
    forward sweep carried 30 of them, ~0.8 GB of extra writes)."""
    n_rows = acc.shape[0]
    end = start + g.shape[0]
    # threshold from TPU A/B on the 1000^2 grid: fusing the half-span
    # sends too took 72.4 -> 92.2 it/s; below ~1/4 span the full-array
    # pass costs more than the in-place slice rewrite
    if g.shape[0] >= 0.25 * n_rows:
        return acc + _pad_rows(g, start, n_rows - end)
    return acc.at[start:end].add(g)


def strided_read(src: jnp.ndarray, pat: Strided, n_lanes: int,
                 res_limit: "int | None" = None) -> jnp.ndarray:
    """out[u] = src[b + (u//P)*T + (u%P)] for u < n_lanes (garbage on
    lanes whose pattern row falls outside [0, len(src)) and, when
    ``res_limit`` is given, on lanes with u%P >= res_limit — callers mask
    those).  Pure pad+slice+reshape: no gather instructions."""
    b, T, P = pat.b, pat.T, pat.P
    R1 = -(-n_lanes // P)
    N = src.shape[0]
    tail = src.shape[1:]
    zt = ((0, 0),) * len(tail)
    if T == 0:
        lo, hi = max(0, -b), max(0, b + P - N)
        slab = _pad_rows(src, lo, hi)[b + lo: b + lo + P]
        out = jnp.broadcast_to(slab[None], (R1,) + slab.shape)
        return out.reshape((R1 * P,) + tail)[:n_lanes]
    cover = P if res_limit is None else min(P, res_limit)
    K = -(-cover // T) if T < P else 1      # overlapping-block sub-reads
    need = (K - 1) * T + R1 * T if T < P else R1 * T
    need = max(need, (R1 - 1) * T + min(P, T))
    lo, hi = max(0, -b), max(0, b + need - N)
    sp = _pad_rows(src, lo, hi)
    if T >= P:
        slab = sp[b + lo: b + lo + R1 * T]
        blk = slab.reshape((R1, T) + tail)[:, :P]
    else:
        parts = []
        for k in range(K):
            w = min(T, cover - k * T)
            s = sp[b + lo + k * T: b + lo + k * T + R1 * T]
            parts.append(s.reshape((R1, T) + tail)[:, :w])
        blk = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        if cover < P:
            blk = jnp.pad(blk, ((0, 0), (0, P - cover)) + zt)
    return blk.reshape((R1 * P,) + tail)[:n_lanes]


def strided_accumulate_into(acc: jnp.ndarray, contrib: jnp.ndarray,
                            pat: Strided,
                            res_limit: "int | None" = None) -> jnp.ndarray:
    """acc with contrib[u] added at row f[u] = b + (u//P)*T + (u%P).
    Lanes whose pattern row is outside [0, len(acc)) — and, if
    ``res_limit`` is given, lanes with u%P >= res_limit — MUST be zero in
    ``contrib``.  Static-slice adds only."""
    b, T, P = pat.b, pat.T, pat.P
    n_rows = acc.shape[0]
    n_lanes = contrib.shape[0]
    R1 = -(-n_lanes // P)
    tail = contrib.shape[1:]
    zt = ((0, 0),) * len(tail)
    cp = jnp.pad(contrib, ((0, R1 * P - n_lanes),) + zt)
    blk = cp.reshape((R1, P) + tail)

    def add_span(acc, g, start):
        span = g.shape[0]
        lo = max(0, -start)
        hi = min(span, n_rows - start)
        if hi <= lo:
            return acc
        return _span_add(acc, g[lo:hi], start + lo)

    if T == 0:
        return add_span(acc, jnp.sum(blk, axis=0), b)
    if T >= P:
        if T > P:
            blk = jnp.pad(blk, ((0, 0), (0, T - P)) + zt)
        return add_span(acc, blk.reshape((R1 * T,) + tail), b)
    cover = P if res_limit is None else min(P, res_limit)
    K = -(-cover // T)
    for k in range(K):
        w = min(T, cover - k * T)
        g = blk[:, k * T: k * T + w]
        if w < T:
            g = jnp.pad(g, ((0, 0), (0, T - w)) + zt)
        acc = add_span(acc, g.reshape((R1 * T,) + tail), b + k * T)
    return acc


def strided_accumulate(contrib: jnp.ndarray, pat: Strided,
                       n_rows: int) -> jnp.ndarray:
    """Scatter contrib into a fresh zero [n_rows, ...] array (test/compat
    wrapper over strided_accumulate_into)."""
    zero = jnp.zeros((n_rows,) + contrib.shape[1:], contrib.dtype)
    return strided_accumulate_into(zero, contrib, pat)


# ---------------------------------------------------------------------------
# plan construction
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Slot:
    pattern: "Strided | None"     # sender map (lane-range-adjusted)
    lane_lo: int                  # first receiver row this slot covers
    n_lanes: int                  # rows covered: [lane_lo, lane_lo+n_lanes)
    res_limit: "int | None"       # max valid residue + 1 (T < P read bound)
    sigma: np.ndarray             # [n_lanes] original message id (clamped)
    lane_valid: np.ndarray        # [n_lanes] bool: lane holds a message
    data: dict                    # per-message static data, slot layout
    sidx: "jnp.ndarray | None"    # fallback: [n_lanes] clamped sender rows
    inv_idx: "jnp.ndarray | None"  # fallback: clamped scatter rows


@dataclasses.dataclass
class _Op:
    name: str
    kind: str                     # recv_left | recv_right | send_left | send_right
    sender: str                   # "left" | "right"
    wkey: str
    sender_type: str
    recv_type: str
    slots: list
    n_recv_rows: int
    n_send_rows: int


def _slot_key(kind: str):
    """(receiver rows, sender rows, sender side, weight key) per op kind."""
    return {
        "recv_left": ("lidx", "ridx", "right", "recv_left"),
        "recv_right": ("ridx", "lidx", "left", "recv_right"),
        "send_left": ("ridx", "lidx", "left", "omega_left"),
        "send_right": ("lidx", "ridx", "right", "omega_right"),
    }[kind]


def build_op(engine, name: str, kind: str) -> _Op:
    """Slot-major plan for one (message type, direction) op: group the
    type's messages by (build chunk, rank within (chunk, receiver row)),
    lay each group out on receiver-row lanes, fit/decompose the sender
    maps into strided sheets, merge same-pattern disjoint sheets, and
    restrict each sheet to the lane range it actually covers."""
    from .engine import _cumcount

    blk = engine.msgs[name]
    mt = blk.mtype
    rk, sk, sender, wkey = _slot_key(kind)
    recv_rows = np.asarray(getattr(blk, rk))
    send_rows = np.asarray(getattr(blk, sk))
    recv_t = mt.left_type.name if rk == "lidx" else mt.right_type.name
    send_t = mt.left_type.name if sk == "lidx" else mt.right_type.name
    n_recv = int(next(iter(engine.state[recv_t].values())).shape[0])
    n_send = int(next(iter(engine.state[send_t].values())).shape[0])
    M = len(blk.gids)
    chunk = blk.chunk_of if blk.chunk_of is not None \
        else np.zeros(M, dtype=np.int64)
    rank = _cumcount(chunk * np.int64(n_recv) + recv_rows)
    group = chunk * (int(rank.max()) + 1 if M else 1) + rank
    data_np = {k: np.asarray(v) for k, v in blk.data.items()}
    row_cap = 4 * max(n_send, n_recv) + n_recv

    # 1. sheets over full lane space
    sheets = []   # [pattern | None, valid, f, sigma]
    for gval in np.unique(group):
        ids = np.nonzero(group == gval)[0]
        lanes = recv_rows[ids]
        sigma = np.zeros(n_recv, dtype=np.int64)
        lane_valid = np.zeros(n_recv, dtype=bool)
        sigma[lanes] = ids
        lane_valid[lanes] = True
        f = np.zeros(n_recv, dtype=np.int64)
        f[lanes] = send_rows[ids]
        for pat, vmask in decompose(f, lane_valid, row_cap):
            sheets.append([pat, vmask, f, sigma])

    # 2. merge same-pattern sheets with disjoint lanes (e.g. the V-edge
    # sheet split across rank slots by last-column receivers)
    merged = []
    for pat, vmask, f, sigma in sheets:
        placed = False
        if pat is not None:
            for m in merged:
                if m[0] == pat and not (m[1] & vmask).any():
                    m[1] = m[1] | vmask
                    m[2] = np.where(vmask, f, m[2])
                    m[3] = np.where(vmask, sigma, m[3])
                    placed = True
                    break
        if not placed:
            merged.append([pat, vmask.copy(), f.copy(), sigma.copy()])

    # 3. range-restrict and finalize
    slots = []
    for pat, vmask, f, sigma in merged:
        u = np.nonzero(vmask)[0]
        lo, hi = int(u[0]), int(u[-1]) + 1
        res_limit = None
        if pat is not None:
            lo = (lo // pat.P) * pat.P          # keep the block structure
            pat = Strided(pat.b + (lo // pat.P) * pat.T, pat.T, pat.P)
            if 0 < pat.T < pat.P:
                res_limit = int(((u - lo) % pat.P).max()) + 1
        n_lanes = hi - lo
        sig = sigma[lo:hi]
        vm = vmask[lo:hi]
        sidx = inv = None
        if pat is None:
            fr = f[lo:hi]
            sidx = jnp.asarray(np.where(vm, fr, 0).astype(np.int32))
            # clamped scatter target: invalid lanes carry zero contribution
            inv = jnp.asarray(np.where(vm, fr, 0).astype(np.int32))
        slots.append(_Slot(
            pattern=pat, lane_lo=lo, n_lanes=n_lanes, res_limit=res_limit,
            sigma=sig, lane_valid=vm,
            data={k: jnp.asarray(v[sig]) for k, v in data_np.items()},
            sidx=sidx, inv_idx=inv))
    return _Op(name=name, kind=kind, sender=sender, wkey=wkey,
               sender_type=send_t, recv_type=recv_t, slots=slots,
               n_recv_rows=n_recv, n_send_rows=n_send)


def build_pull_plans(engine, plans):
    """Per phase: {"recv": [(op_key, phase_ids)], "send": [...]} where
    op_key indexes a shared per-(name, kind) _Op table (slot layouts are
    phase-independent; only the folded weights differ per phase)."""
    ops: dict[tuple, _Op] = {}
    phases = []
    for plan in plans:
        stages = {"recv": [], "send": []}
        for stage, kind, lst in (
                ("recv", "recv_left", plan.recv_left),
                ("recv", "recv_right", plan.recv_right),
                ("send", "send_left", [(n, i) for n, i, _ in plan.send_left]),
                ("send", "send_right", [(n, i) for n, i, _ in plan.send_right])):
            for name, ids in lst:
                key = (name, kind)
                if key not in ops:
                    ops[key] = build_op(engine, name, kind)
                stages[stage].append((key, np.asarray(ids)))
        phases.append(stages)
    return ops, phases


def fold_weights(engine, ops, phases, w_np) -> list:
    """Per phase/stage/op/slot: the static per-lane weight — message
    weight x lane validity x phase membership — as one [n_lanes] device
    array.  Built once per (mode, direction) on the host and cached by
    Engine."""
    dtype = real_dtype()
    out = []
    for stages in phases:
        ph = {"recv": [], "send": []}
        for stage in ("recv", "send"):
            for key, ids in stages[stage]:
                op = ops[key]
                M = len(engine.msgs[op.name].gids)
                in_phase = np.zeros(M, dtype=bool)
                in_phase[ids] = True
                wvec = np.asarray(w_np[op.name][op.wkey], dtype=dtype)
                slot_w = []
                for slot in op.slots:
                    fw = wvec[slot.sigma] * (slot.lane_valid
                                             & in_phase[slot.sigma])
                    slot_w.append(jnp.asarray(fw.astype(dtype)))
                ph[stage].append(slot_w)
        out.append(ph)
    return out


# ---------------------------------------------------------------------------
# pass runner
# ---------------------------------------------------------------------------

def make_pull_pass(engine, plans):
    """Returns (run, fold) — ``run(state, pw)`` is the jittable dual sweep,
    ``fold(w_np)`` builds its per-(mode, direction) weight pytree."""
    ops, phases = build_pull_plans(engine, plans)
    msgs = engine.msgs

    def run_stage(state, ops_in_stage, slot_ws):
        # accumulate straight onto the state arrays (snapshot semantics:
        # every read below uses `state`, never `acc`)
        acc: dict = {}

        def get(tname, key):
            k = (tname, key)
            if k not in acc:
                acc[k] = state[tname][key]
            return acc[k]

        for (key, _ids), slot_w in zip(ops_in_stage, slot_ws):
            op = ops[key]
            mt = msgs[op.name].mtype
            marginal = (mt.marginal_left if op.sender == "left"
                        else mt.marginal_right)
            recv_pull = (mt.pull_right if op.sender == "left"
                         else mt.pull_left)
            send_pull = (mt.pull_left if op.sender == "left"
                         else mt.pull_right)
            sblock = state[op.sender_type]
            for slot, w in zip(op.slots, slot_w):
                if slot.pattern is not None:
                    srows = {k: strided_read(v, slot.pattern, slot.n_lanes,
                                             slot.res_limit)
                             for k, v in sblock.items()}
                else:
                    srows = {k: v[slot.sidx] for k, v in sblock.items()}
                marg = marginal(srows, slot.data)
                delta = marg * w.reshape((-1,) + (1,) * (marg.ndim - 1))
                rc = recv_pull(delta, slot.data, state[op.recv_type])
                sc = send_pull(-delta, slot.data, sblock)
                lo = slot.lane_lo
                for k, t in rc.items():
                    acc[(op.recv_type, k)] = _span_add(
                        get(op.recv_type, k), t, lo)
                for k, t in sc.items():
                    cur = get(op.sender_type, k)
                    if slot.pattern is not None:
                        acc[(op.sender_type, k)] = strided_accumulate_into(
                            cur, t, slot.pattern, slot.res_limit)
                    else:
                        acc[(op.sender_type, k)] = cur.at[slot.inv_idx].add(t)
        new_state = dict(state)
        for (tname, k), a in acc.items():
            b = dict(new_state[tname])
            b[k] = a
            new_state[tname] = b
        return new_state

    def run(state, pw):
        state = dict(state)
        for stages, ph_w in zip(phases, pw):
            state = run_stage(state, stages["recv"], ph_w["recv"])
            state = run_stage(state, stages["send"], ph_w["send"])
        return state

    def fold(w_np):
        return fold_weights(engine, ops, phases, w_np)

    return run, fold


def pull_stats(engine, direction=None) -> dict:
    """Diagnostics: slots per op and how many fitted a strided pattern."""
    from .config import Direction
    d = direction if direction is not None else Direction.forward
    ops, phases = build_pull_plans(engine, engine.plans[d])
    out = {}
    for (name, kind), op in ops.items():
        fitted = sum(1 for s in op.slots if s.pattern is not None)
        out[f"{name}|{kind}"] = {
            "slots": len(op.slots), "strided": fitted,
            "patterns": [(dataclasses.astuple(s.pattern)
                          if s.pattern else None,
                          s.lane_lo, s.n_lanes) for s in op.slots]}
    return out
