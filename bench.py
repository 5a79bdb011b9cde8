"""Benchmark driver: the five BASELINE.json workloads on real TPU.

Emits one JSON line per workload as it completes, then ONE final summary
line (the driver-parsed artifact): the flagship 1000x1000 Potts grid
dual-iterations/s with every other workload embedded under "notes".

Workloads (BASELINE.json "configs"):
  1. 1000x1000 grid Potts MRF   — fused Pallas phase kernel (flagship) and
                                   the generic engine, it/s + iters/time to
                                   1e-4 relative gap vs a converged bound
  2. chain MRF (simplex+Potts)  — 100k variables, it/s + time to 1e-4
                                   relative gap vs the exact DP optimum
  3. multicut + cycle separation — 10^5-edge graph, post-tighten sweep it/s
  4. graph matching (QAP)        — synthetic dense instance, it/s, lb vs
                                   MCF-rounded ub
  5. discrete tomography chains  — counting/min-conv factors, it/s

Measurement hygiene on the axon runtime (bench/pallas_dma_hang.md):
Pallas first (Mosaic degrades after large XLA executables); dispatch
queues bounded (deep async queues have wedged the tunnel); convergence
traces recorded on untimed replays so timed loops stay pure.

Reference baseline: single-thread C++ replica of the reference's
sequential SRMP grid sweep (bench/reference_grid.cpp) — the reference repo
itself publishes no numbers (BASELINE.md).
"""
import json
import pathlib
import subprocess
import time

import numpy as np

H = W = 1000
L = 4

REPO = pathlib.Path(__file__).resolve().parent
MEASURED = REPO / "BASELINE_MEASURED.json"


def reference_its() -> float:
    """Single-thread C++ SRMP sweep it/s (build+run bench/reference_grid)."""
    if MEASURED.exists():
        try:
            return float(json.loads(MEASURED.read_text())["reference_its"])
        except Exception:
            pass
    src = REPO / "bench" / "reference_grid.cpp"
    exe = REPO / "bench" / "reference_grid"
    if src.exists():
        try:
            if not exe.exists() or exe.stat().st_mtime < src.stat().st_mtime:
                subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                                str(src), "-o", str(exe)], check=True)
            out = subprocess.run([str(exe), str(H), str(W), str(L), "10"],
                                 check=True, capture_output=True, text=True)
            its = float(json.loads(out.stdout.strip())["its"])
            MEASURED.write_text(json.dumps({"reference_its": its}))
            return its
        except Exception:
            pass
    return float("nan")


def emit(rec: dict) -> dict:
    print(json.dumps(rec), flush=True)
    return rec


# ---------------------------------------------------------------------------
# measurement helpers
# ---------------------------------------------------------------------------
CHUNK = 10          # bounded dispatch queue (axon runtime hygiene)


def timed_its(step, block, n_iters: int) -> float:
    """it/s of ``step()`` with dispatch queues bounded at CHUNK."""
    import math
    t0 = time.perf_counter()
    done = 0
    while done < n_iters:
        k = min(CHUNK, n_iters - done)
        for _ in range(k):
            step()
        block()
        done += k
    return n_iters / (time.perf_counter() - t0)


def iters_to_gap(step, block, lb_fn, target: float, rel: float = 1e-4,
                 chunk: int = 20, max_iters: int = 4000):
    """Untimed replay: iterations until (target-lb) <= rel*|target|.
    Returns (iters, lb_reached, gap_reached)."""
    scale = max(1.0, abs(target))
    it = 0
    lb = lb_fn()
    while target - lb > rel * scale and it < max_iters:
        for _ in range(chunk):
            step()
        block()
        it += chunk
        lb = lb_fn()
    return it, lb, (target - lb) / scale


def engine_block(eng):
    import jax

    def block():
        jax.block_until_ready(eng.state)
    return block


# ---------------------------------------------------------------------------
# workloads
# ---------------------------------------------------------------------------
def bench_grid_pallas():
    import jax
    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid

    def block(m):
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), m.state)

    u, hc, vc = random_grid(H, W, L, seed=1)
    m = GridPottsModel(u, hc, vc)
    m.run_fast(20, kernel="pallas")     # compile + warmup
    block(m)
    t0 = time.perf_counter()
    for _ in range(5):
        m.run_fast(100, kernel="pallas")
        block(m)
    its = 500 / (time.perf_counter() - t0)

    # convergence trace (untimed): iterations to 1e-4 relative gap vs the
    # bound after a long run of the same kernel
    m2 = GridPottsModel(u, hc, vc)
    for _ in range(30):
        m2.run_fast(100, kernel="pallas")
        block(m2)
    target = m2.lower_bound()
    m3 = GridPottsModel(u, hc, vc)
    it_gap, lb_reached, gap = iters_to_gap(
        lambda: m3.run_fast(20, kernel="pallas"), lambda: None,
        m3.lower_bound, target, chunk=1, max_iters=150)
    it_gap *= 20
    lb = m.lower_bound()
    return m, its, lb, {
        "iters_to_1e4_gap_vs_self3000": it_gap,
        "time_to_1e4_gap_s": round(it_gap / its, 4),
        "gap_reached": float(f"{gap:.2e}"), "target_lb": round(target, 3)}


def bench_grid_generic():
    from lp_mp_tpu.engine import Engine
    from lp_mp_tpu.graph import FactorGraph
    from lp_mp_tpu.models.mrf import MrfConstructor

    rng = np.random.default_rng(1)
    g = FactorGraph()
    mrf = MrfConstructor(g)
    mrf.add_unary_factors(rng.normal(size=(H * W, L)))
    idx = np.arange(H * W).reshape(H, W)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
    mrf.add_potts_factors(pairs, L, rng.uniform(0.5, 1.5, size=len(pairs)))
    eng = Engine(g, schedule_mode="auto", pass_style="auto")
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    engine_block(eng)()
    its = timed_its(step, engine_block(eng), 200)
    return emit({
        "metric": "grid_potts_1000x1000_generic_engine",
        "value": round(its, 2), "unit": "iter/s",
        "notes": {"schedule": "coloring(2 phases)",
                  "lb_after_bench": round(eng.lower_bound(), 3)}})


def bench_chain():
    from lp_mp_tpu.engine import Engine
    from lp_mp_tpu.graph import FactorGraph
    from lp_mp_tpu.models.mrf import MrfConstructor

    n, Lc = 100_000, 8
    rng = np.random.default_rng(2)
    un = rng.normal(size=(n, Lc))
    pw = rng.normal(size=(n - 1, Lc, Lc))
    # exact optimum by DP (chains are trees; min-sum DP is exact)
    f = un[0].copy()
    for e in range(n - 1):
        f = (f[:, None] + pw[e]).min(axis=0) + un[e + 1]
    opt = float(f.min())

    g = FactorGraph()
    mrf = MrfConstructor(g)
    mrf.add_unary_factors(un)
    pairs = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    mrf.add_pairwise_factors(pairs, pw)
    eng = Engine(g, schedule_mode="auto", pass_style="auto")
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    engine_block(eng)()
    its = timed_its(step, engine_block(eng), 100)
    eng2 = Engine(g, schedule_mode="auto", pass_style="auto")
    it_gap, lb_reached, gap = iters_to_gap(
        lambda: eng2.compute_pass("anisotropic"), engine_block(eng2),
        eng2.lower_bound, opt, chunk=5, max_iters=400)
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
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    engine_block(eng)()
    its = timed_its(step, engine_block(eng), 100)
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
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    engine_block(eng)()
    its = timed_its(step, engine_block(eng), 100)
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
    step = lambda: eng.compute_pass("anisotropic")          # noqa: E731
    step()
    engine_block(eng)()
    its = timed_its(step, engine_block(eng), 50)
    return emit({
        "metric": "tomography_100chains_64vars_counting",
        "value": round(its, 2), "unit": "iter/s",
        "notes": {"lb_after_bench": round(eng.lower_bound(), 3)}})


def bench_grid():
    """Flagship: pallas + xla grid paths in one clean process."""
    import jax
    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid

    m, pallas_its, lb_pallas, grid_conv = bench_grid_pallas()

    u, hc, vc = random_grid(H, W, L, seed=1)
    m = GridPottsModel(u, hc, vc)
    m.run_fast(25, kernel="xla")
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), m.state)
    t0 = time.perf_counter()
    for _ in range(4):
        m.run_fast(25, kernel="xla")
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), m.state)
    xla_its = 100 / (time.perf_counter() - t0)
    lb_xla = m.lower_bound()
    assert abs(lb_pallas - lb_xla) <= 1e-3 * max(1.0, abs(lb_xla)), \
        (lb_pallas, lb_xla)
    return emit({
        "metric": f"dual_iterations_per_s_{H}x{W}_potts_L{L}_pallas",
        "value": round(pallas_its, 2), "unit": "iter/s",
        "notes": {"xla_path_its": round(xla_its, 2),
                  "lower_bound_after_bench": round(float(lb_pallas), 3),
                  **grid_conv}})


WORKLOADS = {
    "grid": bench_grid,
    "generic_grid": bench_grid_generic,
    "chain": bench_chain,
    "multicut": bench_multicut,
    "qap": bench_qap,
    "tomography": bench_tomography,
}


def run_one(name: str) -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    WORKLOADS[name]()


def main():
    """Each workload runs in its own subprocess: the axon runtime degrades
    XLA dispatch after Mosaic kernels have run (and vice versa,
    bench/pallas_dma_hang.md pathologies #4/#5) — in-process numbers for
    whatever runs second are off by up to ~1000x."""
    import subprocess
    import sys

    results = {}
    pallas_its = None
    grid_notes = {}
    for name in WORKLOADS:
        try:
            out = subprocess.run(
                [sys.executable, str(REPO / "bench.py"), "--workload", name],
                capture_output=True, text=True, timeout=1200, check=False)
            rec = None
            for line in out.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    emit(rec)
            if rec is None:
                tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
                results[name] = {"error": " | ".join(tail)[-300:]}
                continue
            results[rec["metric"]] = {"its": rec["value"],
                                      **rec.get("notes", {})}
            if name == "grid":
                pallas_its = rec["value"]
                grid_notes = rec.get("notes", {})
        except Exception as e:                          # pragma: no cover
            results[name] = {"error": f"{type(e).__name__}: {e}"}

    ref = reference_its()
    vs = (pallas_its / ref if pallas_its is not None
          and ref == ref and ref > 0 else None)
    emit({
        "metric": f"dual_iterations_per_s_{H}x{W}_potts_L{L}",
        "value": pallas_its,
        "unit": "iter/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "notes": {
            "kernel": "pallas_fused_phase (ops/pallas_grid.phase_update_v2)",
            "isolation": "one subprocess per workload",
            **{k: v for k, v in grid_notes.items()},
            "workloads": results,
        },
    })


if __name__ == "__main__":
    import sys
    if len(sys.argv) >= 3 and sys.argv[1] == "--workload":
        run_one(sys.argv[2])
    else:
        main()
