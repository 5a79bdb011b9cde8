"""CLI entry points + sqlite/jsonl metric visitors
(solver.hxx:490-546 main() macros; sqlite_visitor.hxx schema)."""
import json
import sqlite3

import numpy as np
import pytest

from lp_mp_tpu.cli import main

UAI_CHAIN = """MARKOV
3
2 2 3
5
1 0
1 1
1 2
2 0 1
2 1 2

2
 0.436 0.564

2
 0.128 0.872

3
 0.920 0.080 0.222

4
 1e10 0.872
 0.920 0.080

6
 1e10 0.333 0.457
 0.811 0.000 0.189
"""


def test_cli_mrf(tmp_path, capsys):
    inp = tmp_path / "chain.uai"
    inp.write_text(UAI_CHAIN)
    out = tmp_path / "primal.txt"
    rc = main(["mrf", str(inp), "--maxIter", "20", "-v", "0",
               "--outputFile", str(out)])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "lower bound:" in cap and "upper bound:" in cap
    lb = float([l for l in cap.splitlines() if l.startswith("lower")][0].split(":")[1])
    ub = float([l for l in cap.splitlines() if l.startswith("upper")][0].split(":")[1])
    assert lb <= ub + 1e-9
    labels = [int(x) for x in out.read_text().split()]
    assert len(labels) == 3


def test_cli_gm(tmp_path, capsys):
    inp = tmp_path / "inst.tkr"
    inp.write_text("p 2 2 4 1\na 0 0 0 1.0\na 1 0 1 -1.0\n"
                   "a 2 1 0 -2.0\na 3 1 1 3.0\ne 1 2 -0.5\n")
    rc = main(["gm", str(inp), "--maxIter", "20", "-v", "0",
               "--construction", "both"])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "lower bound:" in cap


def test_cli_multicut_with_sqlite(tmp_path, capsys):
    inp = tmp_path / "mc.txt"
    inp.write_text("# triangle\n0 1 -1.0\n1 2 1.0\n0 2 1.0\n")
    db = tmp_path / "bench.db"
    rc = main(["multicut", str(inp), "--maxIter", "30", "-v", "0",
               "--tighten", "--tightenIteration", "3", "--tightenInterval", "5",
               "--databaseFile", str(db), "--datasetName", "tiny"])
    assert rc == 0
    conn = sqlite3.connect(db)
    n = conn.execute("SELECT COUNT(*) FROM iterations").fetchone()[0]
    assert n >= 1
    row = conn.execute(
        "SELECT lowerBound FROM iterations ORDER BY iteration DESC LIMIT 1"
    ).fetchone()
    assert row[0] == pytest.approx(0.0, abs=1e-6)


def test_jsonl_visitor(tmp_path):
    from lp_mp_tpu.models.mrf import MrfConstructor
    from lp_mp_tpu.solver import Solver
    from lp_mp_tpu.visitors_db import JsonlVisitor
    path = tmp_path / "metrics.jsonl"
    s = Solver(visitor=JsonlVisitor(max_iter=5, jsonl_path=str(path)))
    mrf = s.add_constructor(MrfConstructor)
    rng = np.random.default_rng(0)
    for _ in range(3):
        mrf.add_unary_factor(rng.normal(size=2))
    mrf.add_pairwise_factor(0, 1, rng.normal(size=(2, 2)))
    mrf.add_pairwise_factor(1, 2, rng.normal(size=(2, 2)))
    s.solve()
    recs = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(recs) >= 1
    assert {"iteration", "time_ms", "lower_bound"} <= set(recs[0])


def test_memory_cap_terminates_cleanly():
    # --maxMemory enforcement (standard_visitor.hxx:156-162): a tiny cap
    # triggers one final rounding iteration and clean termination with the
    # best-so-far primal
    import numpy as np
    from lp_mp_tpu import Solver, StandardVisitor
    from lp_mp_tpu.models.mrf import MrfConstructor
    from lp_mp_tpu.visitors import _memory_used_mb

    assert _memory_used_mb() > 1.0  # RSS reader works on this platform
    s = Solver(visitor=StandardVisitor(max_iter=100000, max_memory_mb=1.0))
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    rng = np.random.default_rng(0)
    for _ in range(4):
        mrf.add_unary_factor(rng.normal(size=3))
    for i in range(3):
        mrf.add_pairwise_factor(i, i + 1, rng.normal(size=(3, 3)))
    lb = s.solve()
    assert s.visitor.cur_iter < 100  # terminated early, not by max_iter
    assert np.isfinite(lb)
    assert np.isfinite(s.primal_cost())  # final rounding iteration ran
