"""Convergence-quality study: wavefront vs coloring vs the C++ replica.

VERDICT r3 item 4: it/s is meaningless if a schedule needs several times
the iterations — this script tables iterations-to-1e-4-relative-gap on a
frustrated Potts grid for

  * ``cpp``       — bench/reference_grid.cpp, the sequential row-major SRMP
                    sweep (the reference's exact update order,
                    LP_MP.h:989-991);
  * ``wavefront`` — generic engine, anti-diagonal levelization of the same
                    row-major order (identical coordinate updates to cpp:
                    factors in one level are mutually non-adjacent, so the
                    level-parallel sweep commutes — engine parity suite);
  * ``coloring``  — generic engine, red/black 2-phase schedule (different
                    block-coordinate steps: each color receives from the
                    other color with SRMP weights computed on the coloring
                    order).

All three run the anisotropic (SRMP) mode.  The target bound is the best
bound any method reaches after a long run; iterations-to-gap is measured
against ``target - 1e-4 * |target|``.  Runs on CPU in f64 (iteration
counts are hardware-independent; conftest-style x64 for exactness).

Usage: python bench/convergence_schedules.py [H W L frustrated_frac]
Emits one JSON line (appended to bench/convergence_schedules_out.jsonl).
"""
import json
import pathlib
import struct
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import os                                                    # noqa: E402
# force CPU: the driver env exports JAX_PLATFORMS=axon (TPU tunnel), but
# iteration counts are hardware-independent and per-pass host dispatch over
# the tunnel would make this study take hours
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np                                           # noqa: E402
import jax                                                   # noqa: E402
jax.config.update("jax_platforms", "cpu")


def build_instance(H, W, L, frac, seed=21):
    """Frustrated grid: |N(0,1)| Potts couplings, ``frac`` sign-flipped
    (repulsive) — the slow-convergence regime where schedule order
    matters; plain attractive grids converge in a handful of sweeps."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(H, W, L))
    hc = np.abs(rng.normal(size=(H, W - 1)))
    vc = np.abs(rng.normal(size=(H - 1, W)))
    hc[rng.random(hc.shape) < frac] *= -1.0
    vc[rng.random(vc.shape) < frac] *= -1.0
    return u, hc, vc


def cpp_lb(exe, H, W, L, iters, binfile):
    out = subprocess.run([str(exe), str(H), str(W), str(L), str(iters + 1),
                          str(binfile)], check=True, capture_output=True,
                         text=True)
    return float(json.loads(out.stdout.strip())["lb"])


def iters_to_gap(lb_at, target, rel=1e-4, max_iters=3000, chunk=10):
    """lb_at(n) -> lb after n iterations (cumulative stepping allowed)."""
    thresh = target - rel * max(1.0, abs(target))
    n = 0
    while n < max_iters:
        n += chunk
        if lb_at(n) >= thresh:
            return n
        if n >= 200:
            chunk = 50
        if n >= 1000:
            chunk = 200
    return None


def main():
    H, W, L = 128, 128, 4
    frac = 0.3
    if len(sys.argv) > 3:
        H, W, L = map(int, sys.argv[1:4])
    if len(sys.argv) > 4:
        frac = float(sys.argv[4])

    u, hc, vc = build_instance(H, W, L, frac)

    # C++ replica on the identical instance
    binfile = pathlib.Path("/tmp/conv_instance.bin")
    with open(binfile, "wb") as f:
        for arr in (u, hc, vc):
            f.write(np.asarray(arr, "<f8").tobytes())
    src = ROOT / "bench" / "reference_grid.cpp"
    exe = ROOT / "bench" / "reference_grid"
    if not exe.exists() or exe.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                        str(src), "-o", str(exe)], check=True)

    from lp_mp_tpu.engine import Engine
    from lp_mp_tpu.graph import FactorGraph
    from lp_mp_tpu.models.mrf import MrfConstructor

    def make_engine(schedule):
        g = FactorGraph()
        mrf = MrfConstructor(g)
        mrf.add_unary_factors(u.reshape(-1, L))
        idx = np.arange(H * W).reshape(H, W)
        pairs = np.concatenate([
            np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
            np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
        diffs = np.concatenate([hc.ravel(), vc.ravel()])
        mrf.add_potts_factors(pairs, L, diffs)
        return Engine(g, schedule_mode=schedule, pass_style="scan")

    # converged target: long runs of every method, best bound wins
    targets = []
    eng_t = make_engine("wavefront")
    for _ in range(2000 // 50):
        for _ in range(50):
            eng_t.compute_pass("anisotropic")
    targets.append(eng_t.lower_bound())
    targets.append(cpp_lb(exe, H, W, L, 2000, binfile))
    eng_c = make_engine("coloring")
    for _ in range(2000):
        eng_c.compute_pass("anisotropic")
    targets.append(eng_c.lower_bound())
    target = max(targets)

    results = {"targets": {"wavefront_2000": round(targets[0], 6),
                           "cpp_2000": round(targets[1], 6),
                           "coloring_2000": round(targets[2], 6)},
               "target": round(target, 6)}

    # iterations-to-gap per method
    state = {"eng": None, "done": 0}

    def eng_lb_at(schedule):
        def lb_at(n):
            if state["eng"] is None:
                state["eng"] = make_engine(schedule)
                state["done"] = 0
            for _ in range(n - state["done"]):
                state["eng"].compute_pass("anisotropic")
            state["done"] = n
            return state["eng"].lower_bound()
        state["eng"] = None
        return lb_at

    results["iters_to_1e4"] = {}
    for sched in ("wavefront", "coloring"):
        results["iters_to_1e4"][sched] = iters_to_gap(eng_lb_at(sched),
                                                      target)

    cpp_cache = {}

    def cpp_at(n):
        if n not in cpp_cache:
            cpp_cache[n] = cpp_lb(exe, H, W, L, n, binfile)
        return cpp_cache[n]

    results["iters_to_1e4"]["cpp"] = iters_to_gap(cpp_at, target)

    out = {"H": H, "W": W, "L": L, "frustrated_frac": frac, **results}
    line = json.dumps(out)
    print(line)
    with open(pathlib.Path(__file__).parent
              / "convergence_schedules_out.jsonl", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
