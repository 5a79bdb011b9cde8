"""Checkpoint/snapshot round-trips (serialization.hxx / factor_archive.hxx
equivalents)."""
import numpy as np
import pytest

from lp_mp_tpu.checkpoint import (load_checkpoint, restore, save_checkpoint,
                                  snapshot)
from lp_mp_tpu.models.mrf import MrfConstructor
from lp_mp_tpu.solver import Solver
from lp_mp_tpu.visitors import StandardVisitor


def _solver(seed=0):
    rng = np.random.default_rng(seed)
    s = Solver(visitor=StandardVisitor(max_iter=10))
    mrf = s.add_constructor(MrfConstructor, pairwise_rep="dense")
    for _ in range(4):
        mrf.add_unary_factor(rng.normal(size=3))
    for i in range(3):
        mrf.add_pairwise_factor(i, i + 1, rng.normal(size=(3, 3)))
    return s


def test_snapshot_restore_inmemory():
    s = _solver()
    s.build_engine()
    snap = snapshot(s.engine)
    lb0 = s.engine.lower_bound()
    s.engine.compute_pass("anisotropic")
    assert s.engine.lower_bound() >= lb0 - 1e-12
    restore(s.engine, snap)
    assert s.engine.lower_bound() == pytest.approx(lb0, abs=1e-12)


def test_disk_roundtrip(tmp_path):
    s = _solver()
    lb = s.solve()
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, s.engine, best_primal=s.best_primal,
                    best_primal_cost=s.best_primal_cost, iteration=10)

    s2 = _solver()
    s2.build_engine()
    prim, cost, it = load_checkpoint(path, s2.engine)
    assert it == 10
    assert cost == pytest.approx(s.best_primal_cost)
    assert s2.engine.lower_bound() == pytest.approx(lb, abs=1e-12)
    assert s2.engine.evaluate_primal(prim) == pytest.approx(cost, abs=1e-9)
