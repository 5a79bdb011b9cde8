"""Benchmark driver: dual-iterations/s on the 1000x1000 Potts grid.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference repo publishes no numbers (BASELINE.md); the baseline here is
a single-thread C++ replica of the reference's sequential SRMP grid sweep
(bench/reference_grid.cpp, double precision, -O3) measured on this host —
the honest stand-in for header-only LP_MP on this workload.  If the C++
baseline binary is unavailable, falls back to the recorded number in
BASELINE_MEASURED.json.
"""
import json
import os
import pathlib
import subprocess
import time

H = W = 1000
L = 4
WARMUP = 3
ITERS = 50

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


def main():
    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid
    import jax

    u, hc, vc = random_grid(H, W, L, seed=1)
    m = GridPottsModel(u, hc, vc)
    chunk = 25
    m.run_fast(chunk)  # compile + warmup
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), m.state)
    n_chunks = 4
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        m.run_fast(chunk)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), m.state)
    dt = time.perf_counter() - t0
    its = n_chunks * chunk / dt
    assert m.lower_bound() > -float("inf")

    ref = reference_its()
    vs = its / ref if ref == ref and ref > 0 else None
    print(json.dumps({
        "metric": f"dual_iterations_per_s_{H}x{W}_potts_L{L}",
        "value": round(its, 2),
        "unit": "iter/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
