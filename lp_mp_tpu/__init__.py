"""lp_mp_tpu: TPU-native dual block coordinate ascent framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
pawelswoboda/LP_MP (message passing on Lagrangean decompositions of
discrete optimization problems: MAP-MRF, multicut, graph matching,
discrete tomography).  See SURVEY.md for the blueprint.
"""
from .config import (Chirality, Direction, LpControl, MessageSchedule,
                     ReparametrizationMode, set_dtype)
from .engine import Engine
from .graph import FactorGraph
from .solver import Solver
from .visitors import StandardTighteningVisitor, StandardVisitor

__all__ = [
    "Chirality", "Direction", "LpControl", "MessageSchedule",
    "ReparametrizationMode", "set_dtype", "Engine", "FactorGraph",
    "Solver", "StandardVisitor", "StandardTighteningVisitor",
]

__version__ = "0.1.0"
