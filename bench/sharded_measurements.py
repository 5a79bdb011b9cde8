"""Sharded-engine scaling measurements on the virtual CPU mesh.

VERDICT r3 item 3: record it/s and host-compile cost for the sharded
engines at benchmark-ish scale across shard counts.  Real multi-chip
hardware is not available (one TPU behind the axon tunnel), so scaling
evidence comes from the 8-device virtual CPU mesh: the numbers quantify
sharding *overhead* (collectives + partitioned phases vs the dense path on
the identical backend), not TPU throughput — bench.py measures the
single-real-chip paths.

Covers:
  1. ShardedGridPotts on a 304x304 grid — XLA iterate path and the fused
     Pallas schedule (interpret mode; Mosaic needs a real TPU) at
     n = 1/2/4/8, plus the dense single-device model as the baseline;
  2. ShardedEngine (parallel/generic.py) on a 304x304-grid MRF and on a
     ~1e5-edge multicut with triplets at n = 2/4/8: build + first-pass
     compile time and steady it/s, vs the dense generic Engine.

Usage: python bench/sharded_measurements.py [--quick]
Emits one JSON line (appended to bench/sharded_measurements_out.jsonl).
"""
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax                                                   # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402


def timed_its(step, sync, n=20):
    step()
    sync()
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    sync()
    return n / (time.perf_counter() - t0)


def grid_measurements(H, W, L, shard_counts):
    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid
    from lp_mp_tpu.parallel.grid import ShardedGridPotts

    u, hc, vc = random_grid(H, W, L, seed=1)
    out = {}

    dense = GridPottsModel(u, hc, vc, dtype=np.float32)
    sync = lambda: jax.block_until_ready(dense.state["u"])   # noqa: E731
    out["dense_xla_its"] = round(timed_its(
        lambda: dense.iterate("anisotropic"), sync), 2)

    for n in shard_counts:
        m = ShardedGridPotts(u, hc, vc, devices=jax.devices()[:n],
                             dtype=np.float32)
        sync = lambda: jax.block_until_ready(m.state["u"])   # noqa: E731
        t0 = time.perf_counter()
        m.iterate("anisotropic")
        sync()
        compile_s = time.perf_counter() - t0
        its = timed_its(lambda: m.iterate("anisotropic"), sync)
        out[f"sharded_xla_n{n}"] = {"its": round(its, 2),
                                    "compile_s": round(compile_s, 1)}
        t0 = time.perf_counter()
        m.run_fast(1, kernel="pallas", interpret=True)
        sync()
        pal_compile = time.perf_counter() - t0
        pits = timed_its(lambda: m.run_fast(1, kernel="pallas",
                                            interpret=True), sync, n=5)
        out[f"sharded_pallas_interp_n{n}"] = {
            "its": round(pits, 2), "compile_s": round(pal_compile, 1)}
    return out


def generic_measurements(shard_counts):
    from lp_mp_tpu.engine import Engine
    from lp_mp_tpu import Solver
    from lp_mp_tpu.models.mrf import MrfConstructor
    from lp_mp_tpu.models.multicut import MulticutConstructor
    from lp_mp_tpu.parallel.generic import ShardedEngine

    out = {}
    H = W = 304
    L = 3
    rng = np.random.default_rng(2)

    def build_mrf_graph():
        s = Solver()
        mrf = s.add_constructor(MrfConstructor)
        mrf.add_unary_factors(rng.normal(size=(H * W, L)))
        idx = np.arange(H * W).reshape(H, W)
        pairs = np.concatenate([
            np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
            np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
        mrf.add_potts_factors(pairs, L,
                              rng.uniform(0.5, 1.5, size=len(pairs)))
        return s.graph

    def build_mc_graph():
        s = Solver()
        mc = s.add_constructor(MulticutConstructor)
        rows, cols = 250, 200
        idx = np.arange(rows * cols).reshape(rows, cols)
        pairs = np.concatenate([
            np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1),
            np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)])
        mc.add_edges(pairs, rng.normal(loc=0.4, size=len(pairs)))
        # a band of triplets so the sharded pass has >1 factor type
        for r in range(0, rows - 1, 25):
            for c in range(0, cols - 1, 25):
                mc.add_triplet(idx[r, c], idx[r, c + 1], idx[r + 1, c])
        return s.graph

    for name, builder in (("mrf_304x304", build_mrf_graph),
                          ("multicut_99k_edges", build_mc_graph)):
        g = builder()
        t0 = time.perf_counter()
        eng = Engine(g, schedule_mode="auto", pass_style="auto")
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        eng.compute_pass("anisotropic")
        jax.block_until_ready(eng.state)
        compile_s = time.perf_counter() - t0
        its = timed_its(lambda: eng.compute_pass("anisotropic"),
                        lambda: jax.block_until_ready(eng.state), n=10)
        out[name] = {"dense": {"its": round(its, 2),
                               "build_s": round(build_s, 1),
                               "compile_s": round(compile_s, 1)},
                     "n_factors": int(g.n_factors)}
        for n in shard_counts:
            t0 = time.perf_counter()
            se = ShardedEngine(g, devices=jax.devices()[:n])
            build_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            se.compute_pass("anisotropic")
            jax.block_until_ready(se.state)
            compile_s = time.perf_counter() - t0
            its = timed_its(lambda: se.compute_pass("anisotropic"),
                            lambda: jax.block_until_ready(se.state), n=10)
            out[name][f"sharded_n{n}"] = {
                "its": round(its, 2), "build_s": round(build_s, 1),
                "compile_s": round(compile_s, 1),
                "collectives": se.collective_stats()}
    return out


def main():
    quick = "--quick" in sys.argv
    shard_counts = (2, 8) if quick else (1, 2, 4, 8)
    out = {"backend": "cpu-8dev-virtual-mesh",
           "grid_304": grid_measurements(304, 304, 3, shard_counts),
           "generic": generic_measurements((2, 8) if quick
                                           else (2, 4, 8))}
    line = json.dumps(out)
    print(line)
    with open(pathlib.Path(__file__).parent
              / "sharded_measurements_out.jsonl", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
