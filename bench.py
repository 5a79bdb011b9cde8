"""Benchmark driver: dual-iterations/s on the 1000x1000 Potts grid.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
production hot path (the fused Pallas phase kernel,
GridPottsModel.run_fast(kernel="pallas")), with the plain-XLA path and the
lower bound reached recorded in "notes".

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


def measure(m, kernel: str, chunk: int, n_chunks: int) -> float:
    import jax
    m.run_fast(chunk, kernel=kernel)  # compile + warmup
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), m.state)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        m.run_fast(chunk, kernel=kernel)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), m.state)
    return n_chunks * chunk / (time.perf_counter() - t0)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid

    u, hc, vc = random_grid(H, W, L, seed=1)

    # pallas FIRST: on the axon runtime, Mosaic kernels degrade ~14x after
    # any large pure-XLA executable has run in the same process
    # (bench/pallas_dma_hang.md artifact) — order the measurements so the
    # production path is measured clean
    m = GridPottsModel(u, hc, vc)
    pallas_its = measure(m, "pallas", chunk=100, n_chunks=5)
    lb_pallas = m.lower_bound()

    m = GridPottsModel(u, hc, vc)
    xla_its = measure(m, "xla", chunk=25, n_chunks=4)
    lb_xla = m.lower_bound()
    # the two paths run identical coordinate updates; bound drift beyond
    # f32 noise would mean the kernel broke
    assert abs(lb_pallas - lb_xla) <= 1e-3 * max(1.0, abs(lb_xla)), \
        (lb_pallas, lb_xla)

    ref = reference_its()
    vs = pallas_its / ref if ref == ref and ref > 0 else None
    print(json.dumps({
        "metric": f"dual_iterations_per_s_{H}x{W}_potts_L{L}",
        "value": round(pallas_its, 2),
        "unit": "iter/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "notes": {
            "kernel": "pallas_fused_phase (ops/pallas_grid.phase_update_v2)",
            "xla_path_its": round(xla_its, 2),
            "pallas_vs_xla": round(pallas_its / xla_its, 2),
            "lower_bound_after_bench": round(float(lb_pallas), 3),
        },
    }))


if __name__ == "__main__":
    main()
