"""Lower-bound parity check: TPU red/black SRMP vs the reference's
sequential row-major SRMP (bench/reference_grid.cpp) on the SAME instance.

Target (BASELINE.md): <= 1e-4 relative gap at convergence.  The two
schedules are different block-coordinate orders of the same dual ascent, so
they may stall at slightly different fixed points; this script measures the
actual gap.

Usage: python bench/parity_check.py [H W L iters]
"""
import json
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(H=200, W=200, L=4, iters=500):
    from lp_mp_tpu.models.grid_potts import GridPottsModel, random_grid

    u, hc, vc = random_grid(H, W, L, seed=1)
    inst = pathlib.Path("/tmp/grid_instance.bin")
    with inst.open("wb") as f:
        f.write(np.ascontiguousarray(u, dtype=np.float64).tobytes())
        f.write(np.ascontiguousarray(hc, dtype=np.float64).tobytes())
        f.write(np.ascontiguousarray(vc, dtype=np.float64).tobytes())

    src = REPO / "bench" / "reference_grid.cpp"
    exe = REPO / "bench" / "reference_grid"
    if not exe.exists() or exe.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                        str(src), "-o", str(exe)], check=True)
    out = subprocess.run([str(exe), str(H), str(W), str(L), str(iters), str(inst)],
                         check=True, capture_output=True, text=True)
    ref = json.loads(out.stdout.strip())

    m = GridPottsModel(u, hc, vc)
    m.run_fast(iters, "anisotropic")
    lb = m.lower_bound()

    rel = abs(lb - ref["lb"]) / max(1.0, abs(ref["lb"]))
    print(json.dumps({
        "H": H, "W": W, "L": L, "iters": iters,
        "lb_reference_rowmajor_f64": ref["lb"],
        "lb_tpu_redblack_f32": lb,
        "relative_gap": rel,
        "pass_1e-4": rel <= 1e-4,
    }, indent=2))


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
