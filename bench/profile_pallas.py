"""Pallas grid-kernel bandwidth accounting (VERDICT r2 item 6 / r3 item 1).

Reports, on the real TPU, using the trustworthy slope-timing + true-fence
methodology of bench/timing.py (plain block_until_ready does not fence on
the axon tunnel — see that module's docstring for the evidence):

  1. device kind + empirical HBM bandwidth (axpy microbenchmark — the
     practical speed-of-light for a streaming kernel);
  2. measured phase time of ops/pallas_grid.phase_update_v2 at several row
     tile heights TH (read amplification = (TH+16)/TH: the halo comes in as
     two extra 8-row sublane blocks per array);
  3. modeled bytes/phase at each TH and the implied achieved GB/s, as a %
     of the measured axpy bandwidth;
  4. the same numbers for the XLA (non-Pallas) fused phase for contrast.

Usage: python bench/profile_pallas.py [H W L iters]
Emits one JSON line (also appended to bench/profile_pallas_out.jsonl).
"""
import json
import pathlib
import sys
import time

# NOTE: exporting PYTHONPATH=/root/repo breaks the axon PJRT plugin
# registration on this runtime; an in-process path insert does not.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench.timing import make_fence, slope_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    H, W, L = 1000, 1000, 4
    if len(sys.argv) > 3:
        H, W, L = map(int, sys.argv[1:4])

    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid
    from lp_mp_tpu.ops.pallas_grid import phase_update_v2

    dev = jax.devices()[0]
    out = {"device": str(dev.device_kind), "H": H, "W": W, "L": L,
           "method": "slope timing, d2h scalar fence (bench/timing.py)"}

    # --- empirical bandwidth ceiling (measured FIRST: Mosaic execution
    # degrades later XLA dispatch on this runtime, but plain HLO before
    # Mosaic is clean) ---------------------------------------------------
    N = 256 * 1024 * 1024 // 4          # 1 GiB f32
    x = jnp.ones((N,), jnp.float32)

    @jax.jit
    def axpy(x):
        return x * 1.0001 + 0.5

    @jax.jit
    def probe_vec(y):
        return jnp.sum(y[:8])

    box = {"y": axpy(x)}
    fence = make_fence(lambda: probe_vec(box["y"]))
    fence()

    def step():
        box["y"] = axpy(box["y"])

    dt = slope_time(step, fence, k_lo=5, k_hi=25)
    bw = 2 * N * 4 / dt / 1e9           # read + write
    out["axpy_GB_s"] = round(bw, 1)
    del box["y"], x

    u, hc0, vc0 = random_grid(H, W, L, seed=1)
    m = GridPottsModel(u, hc0, vc0)

    tiles = (8, 16, 24, 32, 48)
    for a in sys.argv[1:]:
        if a.startswith("--tiles="):
            tiles = tuple(int(t) for t in a.split("=", 1)[1].split(","))

    results = {}
    for TH in tiles:
        geom = m._pallas_geom(tile_rows=TH)
        Lg, Hp, Wp, _, _, P, _ = geom
        if Hp % TH:
            continue
        hc, vc = m._pallas_costs(geom)
        ms = {"cur": m._to_mask(m.state, geom)}

        def ph(s, params, geom=geom, hc=hc, vc=vc):
            return phase_update_v2(s, hc, vc, geom=geom, phase_params=params)

        def step(ms=ms, ph=ph):
            ms["cur"] = ph(ph(ms["cur"], (2, 2, 0.0)), (1, 1, 0.0))

        @jax.jit
        def probe(s):
            return jnp.sum(s["u"][:, :8, :8])

        fence = make_fence(lambda ms=ms, probe=probe: probe(ms["cur"]))
        step(); fence()                  # compile both colors
        dt_iter = slope_time(step, fence, k_lo=10, k_hi=50)
        phase_t = dt_iter / 2
        arr_bytes = Lg * Hp * Wp * 4
        cost_bytes = Hp * Wp * 4
        amp = (TH + 16) / TH
        model_bytes = (5 * arr_bytes * (1 + amp)      # 5 state: read+write
                       + 2 * cost_bytes * amp)        # hc/vc: read only
        gbs = model_bytes / phase_t / 1e9
        results[f"TH{TH}"] = {
            "phase_us": round(phase_t * 1e6, 1),
            "iter_per_s": round(1.0 / dt_iter, 1),
            "read_amp": round(amp, 2),
            "model_GB_per_phase": round(model_bytes / 1e9, 4),
            "implied_GB_s": round(gbs, 1),
            "pct_of_axpy_bw": round(100.0 * gbs / bw, 1),
        }

    out["tiles"] = results

    # --- time-tiled full round (red+black in ONE kernel pass): per-round
    # bytes equal one phase's, so the model traffic per ITERATION halves --
    from lp_mp_tpu.ops.pallas_grid import round_update_v2
    TH = 48
    geom = m._pallas_geom(tile_rows=TH)
    Lg, Hp, Wp, _, _, P, _ = geom
    hc, vc = m._pallas_costs(geom)
    ms = {"cur": m._to_mask(m.state, geom)}

    def rstep():
        ms["cur"] = round_update_v2(ms["cur"], hc, vc, geom=geom)

    @jax.jit
    def rprobe(s):
        return jnp.sum(s["u"][:, :8, :8])

    rfence = make_fence(lambda: rprobe(ms["cur"]))
    rstep(); rfence()
    dt_r = slope_time(rstep, rfence, k_lo=10, k_hi=50)
    arr_bytes = Lg * Hp * Wp * 4
    cost_bytes = Hp * Wp * 4
    amp = (TH + 16) / TH
    model_bytes = 5 * arr_bytes * (1 + amp) + 2 * cost_bytes * amp
    out["fused_round_TH48"] = {
        "iter_per_s": round(1.0 / dt_r, 1),
        "round_us": round(dt_r * 1e6, 1),
        "model_GB_per_iter": round(model_bytes / 1e9, 4),
        "implied_GB_s": round(model_bytes / dt_r / 1e9, 1),
        "pct_of_axpy_bw": round(100.0 * model_bytes / dt_r / 1e9 / bw, 1),
    }

    def r2step():
        ms["cur"] = round_update_v2(ms["cur"], hc, vc, geom=geom, n_rounds=2)

    r2step(); rfence()
    dt_r2 = slope_time(r2step, rfence, k_lo=10, k_hi=50)
    out["fused_2rounds_TH48"] = {
        "iter_per_s": round(2.0 / dt_r2, 1),
        "kernel_us": round(dt_r2 * 1e6, 1),
        "model_GB_per_iter": round(model_bytes / 2e9, 4),
        "implied_GB_s": round(model_bytes / dt_r2 / 1e9, 1),
        "pct_of_axpy_bw": round(100.0 * model_bytes / dt_r2 / 1e9 / bw, 1),
    }
    del ms["cur"]

    # --- XLA fused phase for contrast -----------------------------------
    m2 = GridPottsModel(u, hc0, vc0)
    box2 = {"m": m2}

    def xla_step():
        box2["m"].run_fast(1, kernel="xla")

    @jax.jit
    def probe2(s):
        return jnp.sum(s["u"][:, :8, :8])

    fence2 = make_fence(lambda: probe2(box2["m"].state))
    xla_step(); fence2()
    dt_x = slope_time(xla_step, fence2, k_lo=5, k_hi=25)
    out["xla_iter_per_s"] = round(1.0 / dt_x, 1)

    line = json.dumps(out)
    print(line)
    with open(pathlib.Path(__file__).parent / "profile_pallas_out.jsonl",
              "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
