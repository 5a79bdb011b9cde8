"""Benchmark driver: the five BASELINE.json workloads on real TPU.

Emits one JSON line per workload as it completes, and re-emits the ONE
driver-parsed summary line (flagship 1000x1000 Potts grid dual-iterations/s
with every other workload embedded under "notes") after EVERY workload —
the last JSON line on stdout is therefore always a complete summary of
everything measured so far, and a driver timeout can never erase finished
measurements (VERDICT r3 item 2).

Workloads (BASELINE.json "configs"), flagship first:
  1. 1000x1000 grid Potts MRF   — fused Pallas phase kernel (flagship) and
                                   the XLA fused path, it/s + iters/time to
                                   1e-4 relative gap
  2. same grid, generic engine   — structured pull pass (engine_pull)
  3. chain MRF (simplex+Potts)  — 100k variables, it/s + time to 1e-4
                                   relative gap vs the exact DP optimum
  4. multicut + cycle separation — 1.5e5-edge graph, post-tighten sweep it/s
  5. graph matching (QAP)        — synthetic dense instance, it/s, lb vs
                                   MCF-rounded ub
  6. discrete tomography chains  — counting/min-conv factors, it/s
  7. solver-level end-to-end     — Solver.solve() with visitor policy,
                                   tightening and rounding on one modest
                                   instance per model family; final lb, best
                                   ub, relative gap, wall time (the
                                   reference's acceptance is solver-level,
                                   test/graphical_model.cpp)

Measurement hygiene on the axon runtime (bench/pallas_dma_hang.md and
bench/timing.py): ``block_until_ready`` does NOT reliably fence here, so
every it/s figure uses slope timing between true device-to-host fences
(fixed fence count per leg so the ~30-60 ms tunnel round-trip cancels).
Each workload runs in its own subprocess (Mosaic execution degrades later
XLA dispatch and vice versa), time-boxed so the whole bench fits the
driver budget.

Reference baseline: single-thread C++ replica of the reference's
sequential SRMP grid sweep (bench/reference_grid.cpp) — the reference repo
itself publishes no numbers (BASELINE.md).
"""
import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

H = W = 1000
L = 4

REPO = pathlib.Path(__file__).resolve().parent
MEASURED = REPO / "BASELINE_MEASURED.json"


def _cached(key: str, compute):
    """Memoise expensive, deterministic scalars in BASELINE_MEASURED.json."""
    d = {}
    if MEASURED.exists():
        try:
            d = json.loads(MEASURED.read_text())
        except Exception:
            d = {}
    if key in d:
        return d[key]
    v = compute()
    d[key] = v
    MEASURED.write_text(json.dumps(d))
    return v


def reference_its() -> float:
    """Single-thread C++ SRMP sweep it/s (build+run bench/reference_grid)."""
    def compute():
        src = REPO / "bench" / "reference_grid.cpp"
        exe = REPO / "bench" / "reference_grid"
        if not exe.exists() or exe.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                            str(src), "-o", str(exe)], check=True)
        out = subprocess.run([str(exe), str(H), str(W), str(L), "10"],
                             check=True, capture_output=True, text=True)
        return float(json.loads(out.stdout.strip())["its"])
    try:
        return float(_cached("reference_its", compute))
    except Exception:
        return float("nan")


def emit(rec: dict) -> dict:
    print(json.dumps(rec), flush=True)
    return rec


# ---------------------------------------------------------------------------
# measurement helpers (trustworthy timing: bench/timing.py)
# ---------------------------------------------------------------------------
def state_fence(get_state):
    """True d2h fence data-depending on every leaf of ``get_state()``."""
    import jax
    import jax.numpy as jnp
    from bench.timing import make_fence

    @jax.jit
    def probe(state):
        leaves = jax.tree_util.tree_leaves(state)
        return sum(jnp.sum(jnp.ravel(lf)[:8].astype(jnp.float32))
                   for lf in leaves)

    return make_fence(lambda: probe(get_state()))


def session_axpy_gbps(reps: int = 3) -> dict:
    """Same-session HBM ceiling: median/min/max GB/s of a 128 MB axpy by
    slope timing.  The service's ceiling swings >2x between windows
    (bench/pallas_dma_hang.md #5), so every workload records its own —
    'pct_of_axpy' is the only number comparable across sessions."""
    import jax
    import jax.numpy as jnp
    from bench.timing import slope_time
    n = 32 * 1024 * 1024
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9
    y = jnp.ones((n,), jnp.float32)

    @jax.jit
    def axpy(x, y):
        return x * 1.0001 + y

    state = {"v": x}

    def step():
        state["v"] = axpy(state["v"], y)

    def fence():
        v = float(np.asarray(state["v"][:8]).sum())
        assert v == v
        return v

    step()
    fence()
    vals = []
    for _ in range(reps):
        dt = slope_time(step, fence, k_lo=10, k_hi=50, nchunks=5, repeats=1)
        vals.append(3 * 4 * n / dt / 1e9)
    vals.sort()
    return {"median": round(vals[len(vals) // 2], 1),
            "min": round(vals[0], 1), "max": round(vals[-1], 1)}


def measured_its(step, fence, per_call: int = 1) -> float:
    """it/s of ``step()`` (= per_call iterations) by fenced slope timing.

    k values adapt to one fenced probe call so slow workloads stay cheap
    while fast ones get enough reps for the slope to dominate tunnel
    jitter; queue depth stays bounded (axon hygiene)."""
    from bench.timing import slope_time
    t0 = time.perf_counter()
    step()
    fence()
    est = time.perf_counter() - t0
    if est > 1.0:
        k_lo, k_hi, nch, reps = 2, 6, 2, 1
    elif est > 0.25:
        k_lo, k_hi, nch, reps = 5, 15, 5, 1
    else:
        k_lo, k_hi, nch, reps = 10, 30, 5, 2
    dt = slope_time(step, fence, k_lo=k_lo, k_hi=k_hi, nchunks=nch,
                    repeats=reps)
    return per_call / dt


def iters_to_gap(step, lb_fn, target: float, rel: float = 1e-4,
                 chunk: int = 20, max_iters: int = 4000):
    """Untimed replay: iterations until (target-lb) <= rel*|target|.
    ``lb_fn`` performs a true d2h fetch, so no extra fence is needed.
    Returns (iters, lb_reached, gap_reached)."""
    scale = max(1.0, abs(target))
    it = 0
    lb = lb_fn()
    while target - lb > rel * scale and it < max_iters:
        for _ in range(chunk):
            step()
        it += chunk
        lb = lb_fn()
    return it, lb, (target - lb) / scale


# ---------------------------------------------------------------------------
# workloads
# ---------------------------------------------------------------------------
def bench_grid():
    """Flagship: fused Pallas phase kernel + XLA fused path on one grid.

    Variance protocol (VERDICT r4 item 5): 3 independent slope
    measurements (median + spread reported), the same-session axpy
    ceiling, and the modeled HBM traffic of the production 2-round kernel
    so pct_of_axpy is directly comparable to bench/profile_pallas_out."""
    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid

    axpy = session_axpy_gbps()
    u, hc, vc = random_grid(H, W, L, seed=1)
    m = GridPottsModel(u, hc, vc)
    fence = state_fence(lambda: m.state)
    m.run_fast(20, kernel="pallas")          # compile + warmup
    fence()
    meas = sorted(measured_its(lambda: m.run_fast(20, kernel="pallas"),
                               fence, per_call=20) for _ in range(3))
    pallas_its = meas[1]
    # modeled bytes/iteration of the production 2-round TH=48 kernel
    # (bench/profile_pallas.py accounting: 5 state arrays read+write with
    # (TH+16)/TH halo amplification + 2 cost reads, two phases per launch)
    TH = 48
    Wp = ((W + 2 + 127) // 128) * 128
    Hp = ((H + 2 + TH - 1) // TH) * TH
    amp = (TH + 16) / TH
    model_gb = (5 * L * Hp * Wp * 4 * (1 + amp)
                + 2 * Hp * Wp * 4 * amp) / 2 / 1e9
    pct = round(100.0 * model_gb * pallas_its / axpy["median"], 1)
    lb_pallas = m.lower_bound()

    # convergence trace (untimed): iterations to 1e-4 relative gap vs the
    # bound after a long run of the same kernel; fence every 100 iterations
    # so the dispatch queue stays bounded (axon hygiene)
    m2 = GridPottsModel(u, hc, vc)
    fence2 = state_fence(lambda: m2.state)
    for _ in range(15):
        m2.run_fast(100, kernel="pallas")
        fence2()
    target = m2.lower_bound()
    m3 = GridPottsModel(u, hc, vc)
    it_gap, _, gap = iters_to_gap(
        lambda: m3.run_fast(20, kernel="pallas"), m3.lower_bound,
        target, chunk=1, max_iters=150)
    it_gap *= 20

    mx = GridPottsModel(u, hc, vc)
    fence_x = state_fence(lambda: mx.state)
    mx.run_fast(20, kernel="xla")
    fence_x()
    xla_its = measured_its(lambda: mx.run_fast(20, kernel="xla"),
                           fence_x, per_call=20)
    lb_xla = mx.lower_bound()
    assert abs(lb_pallas - lb_xla) <= 1e-3 * max(1.0, abs(lb_xla)), \
        (lb_pallas, lb_xla)
    return emit({
        "metric": f"dual_iterations_per_s_{H}x{W}_potts_L{L}_pallas",
        "value": round(pallas_its, 2), "unit": "iter/s",
        "notes": {"xla_path_its": round(xla_its, 2),
                  "its_spread": [round(meas[0], 2), round(meas[2], 2)],
                  "axpy_GBps": axpy,
                  "model_GB_per_iter": round(model_gb, 4),
                  "pct_of_axpy_bw": pct,
                  "lower_bound_after_bench": round(float(lb_pallas), 3),
                  "iters_to_1e4_gap_vs_self3000": it_gap,
                  "time_to_1e4_gap_s": round(it_gap / pallas_its, 4),
                  "gap_reached": float(f"{gap:.2e}"),
                  "target_lb": round(target, 3),
                  "timing": "slope, d2h fence (bench/timing.py)"}})


def bench_grid_generic():
    """Generic engine (structured pull pass, engine_pull) on the same
    1000x1000 grid the hand-written kernel runs — the reference bar is one
    engine serving every factor type at full speed (LP_MP.h:869-1005).
    Reports it/s, the strided-sheet diagnostic (every op should compile to
    slices, no gathers), the session axpy ceiling, and time/iters to a
    1e-3 gap against the schedule's own converged bound."""
    from lp_mp_tpu.engine import Engine
    from lp_mp_tpu.engine_pull import pull_stats
    from lp_mp_tpu.graph import FactorGraph
    from lp_mp_tpu.models.mrf import MrfConstructor

    axpy = session_axpy_gbps()

    def build():
        rng = np.random.default_rng(1)
        g = FactorGraph()
        mrf = MrfConstructor(g)
        mrf.add_unary_factors(rng.normal(size=(H * W, L)))
        idx = np.arange(H * W).reshape(H, W)
        pairs = np.concatenate([
            np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
            np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
        mrf.add_potts_factors(pairs, L,
                              rng.uniform(0.5, 1.5, size=len(pairs)))
        return Engine(g, schedule_mode="auto", pass_style="auto")

    t0 = time.perf_counter()
    eng = build()
    t_build = time.perf_counter() - t0
    stats = pull_stats(eng)
    slots = sum(v["slots"] for v in stats.values())
    strided = sum(v["strided"] for v in stats.values())
    fence = state_fence(lambda: eng.state)
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    fence()
    its = measured_its(step, fence)

    # converged bound of this schedule (memoised once; the LP optimum is
    # schedule-independent but the approach path is not)
    def converge():
        e = build()
        for _ in range(40):
            e.compute_pass("anisotropic")
        prev = e.lower_bound()
        for _ in range(40):
            for _ in range(100):
                e.compute_pass("anisotropic")
            cur = e.lower_bound()
            if cur - prev < 1e-4 * max(1.0, abs(cur)):
                break
            prev = cur
        return cur

    target = float(_cached("grid_generic_coloring_lb", converge))
    e2 = build()
    it_gap, lb_reached, gap = iters_to_gap(
        lambda: e2.compute_pass("anisotropic"), e2.lower_bound,
        target, rel=1e-3, chunk=50, max_iters=3000)
    return emit({
        "metric": "grid_potts_1000x1000_generic_engine",
        "value": round(its, 2), "unit": "iter/s",
        "notes": {"schedule": eng.schedule_mode,
                  "build_s": round(t_build, 2),
                  "pull_slots": slots, "pull_strided": strided,
                  "axpy_GBps": axpy,
                  "iters_to_1e3_gap": it_gap,
                  "time_to_1e3_gap_s": round(it_gap / its, 2),
                  "gap_reached": float(f"{gap:.2e}"),
                  "target_lb": round(target, 3),
                  "lb_after_bench": round(eng.lower_bound(), 3)}})


def _chain_instance(n: int, Lc: int, seed: int):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, Lc)), rng.normal(size=(n - 1, Lc, Lc))


def chain_optimum(un, pw) -> float:
    """Exact chain optimum by vectorized min-plus tree reduction.

    Replaces the 100k-step Python DP loop (VERDICT r3 weak 6): build all
    edge matrices M_e[a,b] = pw[e][a,b] + un[e+1,b], reduce with
    associative min-plus products in log2(n) vectorized levels."""
    n, Lc = un.shape
    M = pw + un[1:, None, :]                     # [n-1, L, L]
    while M.shape[0] > 1:
        k = M.shape[0]
        if k % 2:
            last = M[-1:]
            M = M[:-1]
        else:
            last = None
        M = (M[0::2][:, :, :, None] + M[1::2][:, None, :, :]).min(axis=2)
        if last is not None:
            M = np.concatenate([M[:-1],
                                (M[-1][:, :, None] + last[0][None])
                                .min(axis=1)[None]])
    return float((un[0][:, None] + M[0]).min())


def bench_chain():
    from lp_mp_tpu.engine import Engine
    from lp_mp_tpu.graph import FactorGraph
    from lp_mp_tpu.models.mrf import MrfConstructor

    n, Lc = 100_000, 8
    un, pw = _chain_instance(n, Lc, seed=2)
    opt = float(_cached(f"chain_opt_n{n}_L{Lc}_seed2",
                        lambda: chain_optimum(un, pw)))

    g = FactorGraph()
    mrf = MrfConstructor(g)
    mrf.add_unary_factors(un)
    pairs = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    mrf.add_pairwise_factors(pairs, pw)
    eng = Engine(g, schedule_mode="auto", pass_style="auto")
    fence = state_fence(lambda: eng.state)
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    fence()
    its = measured_its(step, fence)
    eng2 = Engine(g, schedule_mode="auto", pass_style="auto")
    it_gap, lb_reached, gap = iters_to_gap(
        lambda: eng2.compute_pass("anisotropic"),
        eng2.lower_bound, opt, chunk=5, max_iters=200)
    return emit({
        "metric": "chain_mrf_100000vars_L8",
        "value": round(its, 2), "unit": "iter/s",
        "notes": {"exact_optimum": round(opt, 3),
                  "iters_to_1e4_gap_vs_exact": it_gap,
                  "time_to_1e4_gap_s": round(it_gap / its, 4),
                  "gap_reached": float(f"{gap:.2e}"),
                  "lb_reached": round(lb_reached, 3)}})


def bench_multicut():
    from lp_mp_tpu import Solver
    from lp_mp_tpu.engine import Engine
    from lp_mp_tpu.models.multicut import MulticutConstructor

    # 200x250 grid + diagonals ~= 1.5e5 edges; mostly attractive with a
    # negative fraction so cycle separation has work to do
    rows, cols = 200, 250
    rng = np.random.default_rng(3)
    idx = np.arange(rows * cols).reshape(rows, cols)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1),
        np.stack([idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()], axis=1)])
    costs = rng.normal(loc=0.6, scale=1.0, size=len(pairs))
    s = Solver()
    mc = s.add_constructor(MulticutConstructor)
    mc.add_edges(pairs, costs)
    eng = Engine(s.graph, schedule_mode="auto", pass_style="auto")
    t0 = time.perf_counter()
    n_trip = mc.tighten(eng, max_constraints=500, max_candidates=2000)
    t_tighten = time.perf_counter() - t0
    eng = Engine(s.graph, schedule_mode="auto", pass_style="auto")
    fence = state_fence(lambda: eng.state)
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    fence()
    its = measured_its(step, fence)
    lb = eng.lower_bound()
    labels, _, ub = mc.round_gaec()
    return emit({
        "metric": "multicut_150500edges_cycle_separation",
        "value": round(its, 2), "unit": "iter/s",
        "notes": {"n_edges": int(len(pairs)), "triplets_added": int(n_trip),
                  "tighten_round_s": round(t_tighten, 2),
                  "lb_after_bench": round(lb, 3),
                  "gaec_ub": round(float(ub), 3)}})


def bench_qap():
    from lp_mp_tpu import Solver
    from lp_mp_tpu.io.torresani import GraphMatchingInput
    from lp_mp_tpu.models.graph_matching import GraphMatchingConstructor
    from lp_mp_tpu.engine import Engine

    n0 = n1 = 32
    rng = np.random.default_rng(4)
    assignments = [(i, j, float(rng.normal()))
                   for i in range(n0) for j in range(n1)]
    aid = {(i, j): k for k, (i, j, _) in enumerate(assignments)}
    edges = []
    for _ in range(3000):
        i1, i2 = rng.choice(n0, 2, replace=False)
        j1, j2 = rng.choice(n1, 2, replace=False)
        if j1 != j2:
            edges.append((aid[(i1, j1)], aid[(i2, j2)],
                          float(rng.normal() * 0.3)))
    inp = GraphMatchingInput(n0, n1, assignments, edges)
    s = Solver()
    gm = s.add_constructor(GraphMatchingConstructor, construction="left")
    gm.construct(inp)
    eng = Engine(s.graph, schedule_mode="auto", pass_style="auto")
    fence = state_fence(lambda: eng.state)
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    fence()
    its = measured_its(step, fence)
    lb = eng.lower_bound()
    prim = gm.compute_primal(eng)
    ub = eng.evaluate_primal(prim)
    return emit({
        "metric": "qap_32x32_3000quadratic",
        "value": round(its, 2), "unit": "iter/s",
        "notes": {"lb": round(lb, 3), "mcf_rounded_ub": round(float(ub), 3),
                  "rel_gap": float(f"{(ub - lb) / max(1, abs(ub)):.2e}")}})


def bench_tomography():
    from lp_mp_tpu import Solver
    from lp_mp_tpu.engine import Engine
    from lp_mp_tpu.models.tomography import DiscreteTomographyConstructor

    n_chains, nv, Lc = 100, 64, 3
    rng = np.random.default_rng(5)
    s = Solver()
    dt = s.add_constructor(DiscreteTomographyConstructor)
    v = 0
    for _ in range(n_chains):
        first = v
        for q in range(nv):
            dt.add_unary_factor(rng.normal(size=Lc))
            if q:
                dt.add_pairwise_factor(v - 1, v,
                                       rng.normal(size=(Lc, Lc)) * 0.3)
            v += 1
        smax = (Lc - 1) * nv
        target = int(rng.integers(0, smax))
        pc = 0.05 * np.abs(np.arange(smax + 1) - target)
        dt.add_projection(range(first, v), pc)
    eng = Engine(s.graph, schedule_mode="auto", pass_style="auto")
    fence = state_fence(lambda: eng.state)
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    fence()
    its = measured_its(step, fence)
    return emit({
        "metric": "tomography_100chains_64vars_counting",
        "value": round(its, 2), "unit": "iter/s",
        "notes": {"lb_after_bench": round(eng.lower_bound(), 3)}})


def bench_sharded():
    """Sharded fast path on a 1-device mesh (the one real chip): the fused
    Pallas kernel under shard_map with halo-slab ppermutes must not give
    up the dense kernel's throughput (VERDICT r3 item 3; multi-shard
    correctness is pinned at 2/4/8 shards on the CPU mesh by
    tests/test_parallel.py, and CPU-mesh scaling is recorded by
    bench/sharded_measurements.py)."""
    import jax
    from lp_mp_tpu.models.grid_potts import random_grid
    from lp_mp_tpu.parallel.grid import ShardedGridPotts

    axpy = session_axpy_gbps()
    u, hc, vc = random_grid(H, W, L, seed=1)
    m = ShardedGridPotts(u, hc, vc, devices=jax.devices()[:1],
                         dtype=np.float32)
    fence = state_fence(lambda: m.state)
    m.run_fast(10, kernel="pallas")
    fence()
    meas = sorted(measured_its(lambda: m.run_fast(20, kernel="pallas"),
                               fence, per_call=20) for _ in range(3))
    return emit({
        "metric": "grid_potts_1000x1000_sharded_pallas_1dev",
        "value": round(meas[1], 2), "unit": "iter/s",
        "notes": {"lb_after_bench": round(m.lower_bound(), 3),
                  "its_spread": [round(meas[0], 2), round(meas[2], 2)],
                  "axpy_GBps": axpy,
                  "halo": "8-row ppermute slabs per phase"}})


def bench_solver_e2e():
    """Solver.solve() end-to-end on one modest instance per model family:
    visitor policy, tightening, interleaved rounding — final lb, best ub,
    relative gap, wall time (VERDICT r3 item 8; reference acceptance is
    solver-level, test/graphical_model.cpp)."""
    from lp_mp_tpu import Solver
    from lp_mp_tpu.models.mrf import MrfConstructor
    from lp_mp_tpu.models.multicut import MulticutConstructor
    from lp_mp_tpu.models.graph_matching import GraphMatchingConstructor
    from lp_mp_tpu.models.tomography import DiscreteTomographyConstructor
    from lp_mp_tpu.io.torresani import GraphMatchingInput
    from lp_mp_tpu.visitors import StandardTighteningVisitor, StandardVisitor

    out = {}

    def record(name, s, t0):
        lb, ub = s.lower_bound(), s.primal_cost()
        out[name] = {
            "lb": round(lb, 4), "ub": round(ub, 4),
            "rel_gap": float(f"{(ub - lb) / max(1.0, abs(ub)):.2e}"),
            "wall_s": round(time.perf_counter() - t0, 2)}
        # cumulative re-emit: the tunnel is variably slow, so if the
        # workload timebox fires mid-model the finished models survive
        emit({"metric": "solver_e2e_final_gaps",
              "value": max(r["rel_gap"] for r in out.values()),
              "unit": "max_rel_gap", "notes": dict(out)})

    # fast models first: the summary re-emits after each, so a timebox
    # mid-run keeps everything finished
    # Tomography: 10 chains of 32 vars with counting projections
    rng = np.random.default_rng(10)
    s = Solver(visitor=StandardVisitor(max_iter=60),
               schedule_mode="auto", pass_style="auto")
    dtc = s.add_constructor(DiscreteTomographyConstructor)
    v = 0
    for _ in range(10):
        first = v
        for q in range(32):
            dtc.add_unary_factor(rng.normal(size=3))
            if q:
                dtc.add_pairwise_factor(v - 1, v,
                                        rng.normal(size=(3, 3)) * 0.3)
            v += 1
        smax = 2 * 32
        pc = 0.05 * np.abs(np.arange(smax + 1) - int(rng.integers(0, smax)))
        dtc.add_projection(range(first, v), pc)
    t0 = time.perf_counter()
    s.solve()
    record("tomography_10x32", s, t0)


    # QAP 16x16 dense + quadratic costs, MCF-rounded primal via constructor
    rng = np.random.default_rng(9)
    n0 = n1 = 16
    assignments = [(i, j, float(rng.normal()))
                   for i in range(n0) for j in range(n1)]
    aid = {(i, j): k for k, (i, j, _) in enumerate(assignments)}
    edges = []
    for _ in range(600):
        i1, i2 = rng.choice(n0, 2, replace=False)
        j1, j2 = rng.choice(n1, 2, replace=False)
        if j1 != j2:
            edges.append((aid[(i1, j1)], aid[(i2, j2)],
                          float(rng.normal() * 0.3)))
    s = Solver(visitor=StandardVisitor(max_iter=60),
               schedule_mode="auto", pass_style="auto")
    gm = s.add_constructor(GraphMatchingConstructor, construction="left")
    gm.construct(GraphMatchingInput(n0, n1, assignments, edges))
    t0 = time.perf_counter()
    s.solve()
    record("qap_16x16", s, t0)

    # MRF: 24x24 8-connected frustrated Potts grid.  Diagonals give the
    # pairwise graph triangles, so triplet_search additions go through the
    # aux absorb path (no engine rebuild/recompile) — the SURVEY §7
    # preallocated-bucket plan exercised at solver level.  Dense pairwise
    # (not compact Potts): triplet coupling needs the full [L,L]
    # reparametrization slots, exactly as the reference's tightening
    # FMC_SRMP_T uses simplex pairwise (test/graphical_model.cpp:35-42).
    rng = np.random.default_rng(7)
    hh = ww = 24
    s = Solver(visitor=StandardTighteningVisitor(
        max_iter=150, tighten=True, tighten_iteration=20,
        tighten_interval=60, tighten_slope=0.05,
        tighten_constraints_max=800), rounding="restricted",
        schedule_mode="auto", pass_style="auto")
    mrf = s.add_constructor(MrfConstructor)
    mrf.add_unary_factors(rng.normal(size=(hh * ww, 2)) * 1.0)
    idx = np.arange(hh * ww).reshape(hh, ww)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1),
        np.stack([idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, 1:].ravel(), idx[1:, :-1].ravel()], axis=1)])
    pairs = np.sort(pairs, axis=1)
    w = rng.uniform(0.2, 0.6, size=len(pairs))
    w[rng.random(len(pairs)) < 0.10] *= -1.0
    eye = np.eye(2)
    mrf.add_pairwise_factors(pairs, w[:, None, None] * (1.0 - eye)[None])
    t0 = time.perf_counter()
    s.solve()
    record("mrf_grid24_8conn_frustrated_tighten", s, t0)
    out["mrf_grid24_8conn_frustrated_tighten"]["engine_builds"] = \
        s.n_engine_builds

    # Multicut: 40x40 grid, cycle separation in the solve loop
    rng = np.random.default_rng(8)
    idx = np.arange(40 * 40).reshape(40, 40)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
    costs = rng.normal(loc=0.4, scale=1.0, size=len(pairs))
    s = Solver(visitor=StandardTighteningVisitor(
        max_iter=200, tighten=True, tighten_iteration=10,
        tighten_interval=20, tighten_slope=0.05,
        tighten_constraints_max=600), schedule_mode="auto",
        pass_style="auto")
    mc = s.add_constructor(MulticutConstructor)
    mc.add_edges(pairs, costs)
    t0 = time.perf_counter()
    s.solve()
    record("multicut_grid40_cycle_sep", s, t0)


WORKLOADS = {
    "grid": bench_grid,
    "sharded": bench_sharded,
    "generic_grid": bench_grid_generic,
    "chain": bench_chain,
    "multicut": bench_multicut,
    "qap": bench_qap,
    "tomography": bench_tomography,
    "solver_e2e": bench_solver_e2e,
}

# per-workload subprocess time boxes (s).  Generous: XLA compiles on this
# runtime are 5-20x slower for ~10-30 min after Mosaic kernels have
# executed anywhere on the service (pathology #5 at service level), and
# cache-cold compiles mid-bench have blown 150 s boxes that the same
# workload finishes in 40 s standalone.  The parent stops launching once
# BENCH_BUDGET_S is spent, and the cumulative summary is re-emitted after
# every workload, so generous boxes cannot lose completed results.
TIMEBOX = {"grid": 420, "sharded": 220, "generic_grid": 300, "chain": 150,
           "multicut": 260, "qap": 200, "tomography": 180, "solver_e2e": 700}


def run_one(name: str) -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    WORKLOADS[name]()


def emit_summary(results, pallas_its, grid_notes, ref, pending):
    # headline = best PRODUCTION fused-kernel path measured this run: the
    # dense 2-round kernel or the sharded driver at n=1 (same kernel family;
    # whichever the current service window favors — both records with
    # spread + same-session axpy are under "workloads")
    kernel = "pallas 2-round (ops/pallas_grid.round_update_v2)"
    sh = results.get("grid_potts_1000x1000_sharded_pallas_1dev")
    if sh and isinstance(sh.get("its"), (int, float)) and (
            pallas_its is None or sh["its"] > pallas_its):
        pallas_its = sh["its"]
        kernel = "pallas 2-round, sharded driver n=1 "                  "(ops/pallas_grid.round_update_sharded)"
    vs = (pallas_its / ref if pallas_its is not None
          and ref == ref and ref > 0 else None)
    emit({
        "metric": f"dual_iterations_per_s_{H}x{W}_potts_L{L}",
        "value": pallas_its,
        "unit": "iter/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "notes": {
            "kernel": kernel,
            "isolation": "one subprocess per workload",
            "timing": "slope, d2h fences (bench/timing.py)",
            "pending_workloads": pending,
            **{k: v for k, v in grid_notes.items()},
            "workloads": results,
        },
    })


def main():
    """Each workload runs in its own subprocess: the axon runtime degrades
    XLA dispatch after Mosaic kernels have run (and vice versa,
    bench/pallas_dma_hang.md pathologies #4/#5) — in-process numbers for
    whatever runs second are off by up to ~1000x.  The cumulative summary
    is re-emitted after every workload so the last stdout JSON line is
    always complete for whatever has finished."""
    budget = float(os.environ.get("BENCH_BUDGET_S", 2400))
    t_start = time.perf_counter()
    ref = reference_its()

    results = {}
    pallas_its = None
    grid_notes = {}

    def attempt(name, left):
        """Run one workload subprocess; returns True on success."""
        nonlocal pallas_its, grid_notes
        try:
            out = subprocess.run(
                [sys.executable, str(REPO / "bench.py"), "--workload", name],
                capture_output=True, text=True,
                timeout=min(TIMEBOX[name], left), check=False)
            rec = None
            for line in out.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
            if rec is None:
                tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
                results[name] = {"error": " | ".join(tail)[-300:]}
                return False
            emit(rec)
            results.pop(name, None)
            # key the headline value by its unit ("its" only for iter/s —
            # solver_e2e's value is a max relative gap, not a rate)
            vkey = "its" if rec.get("unit") == "iter/s" else rec.get(
                "unit", "value")
            results[rec["metric"]] = {vkey: rec["value"],
                                      **rec.get("notes", {})}
            if name == "grid":
                pallas_its = rec["value"]
                grid_notes = rec.get("notes", {})
            return True
        except subprocess.TimeoutExpired:
            results[name] = {"error": f"timeboxed at {TIMEBOX[name]}s"}
        except Exception as e:                          # pragma: no cover
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        return False

    names = list(WORKLOADS)
    failed = []
    for wi, name in enumerate(names):
        left = budget - (time.perf_counter() - t_start)
        if left < 60:
            for skipped in names[wi:]:
                results[skipped] = {"skipped": "bench budget exhausted"}
            emit_summary(results, pallas_its, grid_notes, ref, [])
            break
        if not attempt(name, left):
            failed.append(name)
        emit_summary(results, pallas_its, grid_notes, ref,
                     pending=names[wi + 1:])

    # one retry round: the axon service speed swings by >10x between
    # windows (bench/pallas_dma_hang.md) — a workload that timed out often
    # succeeds minutes later, and the cumulative summary emission makes
    # retries free of risk
    for name in failed:
        left = budget - (time.perf_counter() - t_start)
        if left < 90:
            break
        results[name] = {"retrying": True}
        attempt(name, left)
        emit_summary(results, pallas_its, grid_notes, ref, pending=[])


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--workload":
        run_one(sys.argv[2])
    else:
        main()
