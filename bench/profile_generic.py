"""Profile the generic engine's dual sweep on the 1000x1000 grid (TPU).

VERDICT r4 item 1: the generic engine ran 2.94 it/s (0.43x the 2017
single-thread C++ baseline) because the round-4 pull pass issued ~48M
random HBM row gathers per iteration.  Round 5's structured pull pass
(engine_pull) compiles those gathers to static slices; this script
measures the same workload as bench.bench_grid_generic plus a slot/sheet
diagnostic, and cross-checks the lower bound against the hand-written
grid model after the same iteration count.

Run on TPU:  python bench/profile_generic.py [H W L iters]
Appends one JSON line to bench/profile_generic_out.jsonl.
"""
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from bench.timing import slope_time
    from lp_mp_tpu.engine import Engine
    from lp_mp_tpu.engine_pull import pull_stats
    from lp_mp_tpu.graph import FactorGraph
    from lp_mp_tpu.models.mrf import MrfConstructor

    rec = {"metric": "profile_generic", "H": H, "W": W, "L": L,
           "backend": jax.default_backend()}

    rng = np.random.default_rng(1)
    g = FactorGraph()
    mrf = MrfConstructor(g)
    mrf.add_unary_factors(rng.normal(size=(H * W, L)))
    idx = np.arange(H * W).reshape(H, W)
    pairs = np.concatenate([
        np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
        np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
    mrf.add_potts_factors(pairs, L, rng.uniform(0.5, 1.5, size=len(pairs)))

    t0 = time.perf_counter()
    eng = Engine(g, schedule_mode="auto", pass_style="auto")
    rec["build_s"] = round(time.perf_counter() - t0, 2)
    rec["schedule"] = eng.schedule_mode
    stats = pull_stats(eng)
    rec["pull"] = {k: {"slots": v["slots"], "strided": v["strided"]}
                   for k, v in stats.items()}

    # fence: d2h scalar data-depending on the state
    import jax.numpy as jnp

    @jax.jit
    def probe(state):
        return sum(jnp.sum(jnp.ravel(lf)[:8].astype(jnp.float32))
                   for lf in jax.tree_util.tree_leaves(state))

    def fence():
        v = float(np.asarray(probe(eng.state)))
        assert v == v
        return v

    step = lambda: eng.compute_pass("anisotropic")      # noqa: E731
    t0 = time.perf_counter()
    step()
    fence()
    rec["first_iter_s"] = round(time.perf_counter() - t0, 2)
    dt = slope_time(step, fence, k_lo=5, k_hi=25, nchunks=5, repeats=2)
    rec["its"] = round(1.0 / dt, 2)
    rec["lb_after_bench"] = round(eng.lower_bound(), 3)
    print(json.dumps(rec), flush=True)
    out = REPO / "bench" / "profile_generic_out.jsonl"
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
