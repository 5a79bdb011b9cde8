"""Checkpoint / resume.

The reference keeps only in-memory snapshots (factor_archive.hxx,
serialization.hxx) and the best primal as a string (solver.hxx:145-158);
here dual state is a pytree of dense blocks, so real disk checkpointing is
one ``np.savez``.  ``snapshot``/``restore`` cover the in-memory uses
(combiLP-style save/rollback, restricted-rounding state saves,
factors_messages.hxx:2343-2356).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def snapshot(engine) -> dict:
    """In-memory dual-state snapshot (factor_archive save_factor analogue)."""
    return jax.tree_util.tree_map(lambda x: x, engine.state)


def restore(engine, snap: dict) -> None:
    engine.state = jax.tree_util.tree_map(jnp.asarray, snap)


def save_checkpoint(path: str, engine, best_primal=None,
                    best_primal_cost: float = float("inf"),
                    iteration: int = 0) -> None:
    flat = _flatten({"state": engine.state})
    if best_primal is not None:
        flat.update(_flatten({"primal": best_primal}))
    flat["meta/constant"] = np.asarray(engine.constant)
    flat["meta/best_primal_cost"] = np.asarray(best_primal_cost)
    flat["meta/iteration"] = np.asarray(iteration)
    np.savez(path, **flat)


def load_checkpoint(path: str, engine):
    """Restores engine.state in place; returns (best_primal or None,
    best_primal_cost, iteration)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    tree = _unflatten(flat)
    engine.state = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                    for k, v in tree["state"].items()}
    prim = tree.get("primal")
    if prim is not None:
        prim = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                for k, v in prim.items()}
    meta = tree["meta"]
    return prim, float(meta["best_primal_cost"]), int(meta["iteration"])
