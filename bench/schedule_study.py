"""Direct time-to-gap: wavefront vs coloring on the generic engine (TPU).

VERDICT r4 item 7: the auto-schedule cutover (engine.py) was tuned from
per-pass it/s times a CPU-measured iteration penalty — never from direct
wall-clock-to-gap at scale.  This study measures, per grid size and
schedule, the wall seconds to reach a 1e-3 and 1e-4 relative gap against
a converged reference bound, all on the real TPU with the production
engine configuration (pass_style='auto', pull='auto').

Usage: python bench/schedule_study.py [sizes...]   (default 100 300 1000)
Appends one JSON line per size to bench/schedule_study_out.jsonl.
"""
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LEG_TIMEBOX_S = 240.0


def build(nside: int):
    from lp_mp_tpu.engine import Engine  # noqa: F401 (import check)
    from lp_mp_tpu.graph import FactorGraph
    from lp_mp_tpu.models.mrf import MrfConstructor
    rng = np.random.default_rng(1)
    g = FactorGraph()
    mrf = MrfConstructor(g)
    L = 4
    mrf.add_unary_factors(rng.normal(size=(nside * nside, L)))
    idx = np.arange(nside * nside).reshape(nside, nside)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
    mrf.add_potts_factors(pairs, L, rng.uniform(0.5, 1.5, size=len(pairs)))
    return g


def leg(g, schedule: str, target: float, rels=(1e-3, 1e-4)):
    """Wall seconds (compile excluded) to each relative gap, timeboxed."""
    from lp_mp_tpu.engine import Engine
    t0 = time.perf_counter()
    eng = Engine(g, schedule_mode=schedule, pass_style="auto")
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.compute_pass("anisotropic")
    eng.lower_bound()
    compile_s = time.perf_counter() - t0
    scale = max(1.0, abs(target))
    out = {"build_s": round(build_s, 2), "compile_s": round(compile_s, 2),
           "n_phases": len(eng.plans[list(eng.plans)[0]])}
    t_run = 0.0
    iters = 1
    pending = list(rels)
    lb = eng.lower_bound()
    while pending and t_run < LEG_TIMEBOX_S:
        t0 = time.perf_counter()
        for _ in range(10):
            eng.compute_pass("anisotropic")
        lb = eng.lower_bound()          # true d2h fetch ends the chunk
        t_run += time.perf_counter() - t0
        iters += 10
        while pending and target - lb <= pending[0] * scale:
            out[f"s_to_{pending[0]:g}"] = round(t_run, 2)
            out[f"iters_to_{pending[0]:g}"] = iters
            pending.pop(0)
    for r in pending:
        out[f"s_to_{r:g}"] = None
    out["gap_end"] = float(f"{(target - lb) / scale:.2e}")
    out["iters_run"] = iters
    return out


def converged_target(g) -> float:
    """Converged coloring-engine bound (the schedules share the LP
    optimum; coloring is the faster prober)."""
    from lp_mp_tpu.engine import Engine
    eng = Engine(g, schedule_mode="coloring", pass_style="auto")
    prev = -np.inf
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 2 * LEG_TIMEBOX_S:
        for _ in range(200):
            eng.compute_pass("anisotropic")
        cur = eng.lower_bound()
        if cur - prev < 1e-5 * max(1.0, abs(cur)):
            return cur
        prev = cur
    return cur


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    sizes = [int(a) for a in sys.argv[1:]] or [100, 300, 1000]
    out_path = REPO / "bench" / "schedule_study_out.jsonl"
    for nside in sizes:
        g = build(nside)
        target = converged_target(g)
        rec = {"metric": "schedule_time_to_gap", "grid": nside,
               "n_factors": g.n_factors, "backend": jax.default_backend(),
               "target_lb": round(target, 3),
               "coloring": leg(g, "coloring", target),
               "wavefront": leg(g, "wavefront", target)}
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
