"""Pallas grid-kernel bandwidth accounting (VERDICT r2 item 6).

Reports, on the real TPU:
  1. device kind + empirical HBM bandwidth (copy / axpy microbenchmarks —
     the practical speed-of-light for a streaming kernel);
  2. measured phase rate of ops/pallas_grid.phase_update_v2 at several row
     tile heights TH (read amplification = (TH+16)/TH: the halo comes in as
     two extra 8-row sublane blocks per array);
  3. modeled bytes/phase at each TH and the implied achieved GB/s = model
     x rate, as a % of the measured copy bandwidth.

Run kernels BEFORE the XLA microbenchmarks would not matter here (both are
plain HLO); Mosaic first per bench/pallas_dma_hang.md hygiene anyway.

Usage: python bench/profile_pallas.py [H W L iters]
Emits one JSON line.
"""
import json
import pathlib
import sys
import time

import numpy as np

# NOTE: exporting PYTHONPATH=/root/repo breaks the axon PJRT plugin
# registration on this runtime; an in-process path insert does not.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    H, W, L, iters = 1000, 1000, 4, 300
    if len(sys.argv) > 4:
        H, W, L, iters = map(int, sys.argv[1:5])

    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid
    from lp_mp_tpu.ops.pallas_grid import phase_update_v2

    dev = jax.devices()[0]
    out = {"device": str(dev.device_kind), "H": H, "W": W, "L": L}

    u, hc0, vc0 = random_grid(H, W, L, seed=1)
    m = GridPottsModel(u, hc0, vc0)

    results = {}
    for TH in (8, 16, 24, 32, 48):
        geom = m._pallas_geom(tile_rows=TH)
        Lg, Hp, Wp, _, _, P, _ = geom
        if Hp % TH:
            continue
        hc, vc = m._pallas_costs(geom)
        ms = m._to_mask_form(m.state, geom)

        def ph(ms, params, geom=geom, hc=hc, vc=vc):
            return phase_update_v2(ms, hc, vc, geom=geom, phase_params=params)

        # warm up both colors
        ms2 = ph(ph(ms, (2, 2, 0.0)), (1, 1, 0.0))
        jax.block_until_ready(ms2["u"])
        t0 = time.perf_counter()
        cur = ms
        done = 0
        while done < iters:
            for _ in range(10):
                cur = ph(ph(cur, (2, 2, 0.0)), (1, 1, 0.0))
            jax.block_until_ready(cur["u"])
            done += 10
        dt = time.perf_counter() - t0
        phase_rate = 2 * iters / dt
        arr_bytes = Lg * Hp * Wp * 4
        cost_bytes = Hp * Wp * 4
        amp = (TH + 16) / TH
        model_bytes = (5 * arr_bytes * (1 + amp)      # 5 state: read+write
                       + 2 * cost_bytes * amp)        # hc/vc: read only
        gbs = model_bytes * phase_rate / 1e9
        results[f"TH{TH}"] = {
            "phase_per_s": round(phase_rate, 1),
            "iter_per_s": round(phase_rate / 2, 1),
            "read_amp": round(amp, 2),
            "model_GB_per_phase": round(model_bytes / 1e9, 4),
            "implied_GB_s": round(gbs, 1),
        }

    # --- empirical bandwidth ceiling -----------------------------------
    N = 256 * 1024 * 1024 // 4          # 1 GiB f32
    x = jnp.ones((N,), jnp.float32)

    @jax.jit
    def axpy(x):
        return x * 1.0001 + 0.5

    y = axpy(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        y = axpy(y)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    bw = reps * 2 * N * 4 / dt / 1e9    # read + write
    out["axpy_GB_s"] = round(bw, 1)

    for k, v in results.items():
        v["pct_of_axpy_bw"] = round(100.0 * v["implied_GB_s"] / bw, 1)
    out["tiles"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
