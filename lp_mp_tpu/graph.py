"""Factor graph builder.

Python counterpart of ``LP<FMC>``'s model-construction API
(LP_MP.h:238-285, add_factor / add_message / AddFactorRelation):
downstream problem constructors call these, then ``Engine`` compiles the
graph into type-batched arrays + a phase schedule.
"""
from __future__ import annotations

import dataclasses
from typing import Any

from .registry import FactorType, MessageType
from .schedule import MessageDesc


@dataclasses.dataclass(frozen=True)
class FactorRef:
    ftype: FactorType
    fid: int  # global factor id (insertion order, like LP::f_)


@dataclasses.dataclass(frozen=True)
class MessageRef:
    mtype: MessageType
    mid: int


class FactorGraph:
    def __init__(self):
        self.factors: list[tuple[FactorType, Any]] = []
        self.messages: list[tuple[MessageType, int, int, Any]] = []
        self.forward_relations: list[tuple[int, int]] = []
        self.backward_relations: list[tuple[int, int]] = []
        self.partition_pairs: list[tuple[int, int]] = []
        self.constant: float = 0.0

    # -- construction (LP_MP.h:238-285) ------------------------------------
    def add_factor(self, ftype: FactorType, data: Any) -> FactorRef:
        self.factors.append((ftype, data))
        return FactorRef(ftype, len(self.factors) - 1)

    def add_message(self, mtype: MessageType, left: FactorRef, right: FactorRef,
                    data: Any = None) -> MessageRef:
        assert left.ftype is mtype.left_type, \
            f"left factor type {left.ftype.name} != {mtype.left_type.name}"
        assert right.ftype is mtype.right_type, \
            f"right factor type {right.ftype.name} != {mtype.right_type.name}"
        self.messages.append((mtype, left.fid, right.fid, data))
        return MessageRef(mtype, len(self.messages) - 1)

    def add_factor_relation(self, f1: FactorRef, f2: FactorRef) -> None:
        """AddFactorRelation: f1 before f2 forward, f2 before f1 backward
        (LP_MP.h:697-702)."""
        self.forward_relation(f1, f2)
        self.backward_relation(f2, f1)

    def forward_relation(self, f1: FactorRef, f2: FactorRef) -> None:
        assert f1.fid != f2.fid
        self.forward_relations.append((f1.fid, f2.fid))

    def backward_relation(self, f1: FactorRef, f2: FactorRef) -> None:
        assert f1.fid != f2.fid
        self.backward_relations.append((f1.fid, f2.fid))

    def put_in_same_partition(self, f1: FactorRef, f2: FactorRef) -> None:
        """Group factors into one block for staged partition passes
        (LP_MP.h:465-475 ``partition_graph``)."""
        self.partition_pairs.append((f1.fid, f2.fid))

    def add_to_constant(self, x: float) -> None:
        self.constant += x

    # -- host views ---------------------------------------------------------
    @property
    def n_factors(self) -> int:
        return len(self.factors)

    def message_descs(self) -> list[MessageDesc]:
        return [MessageDesc(l, r, mt.schedule) for mt, l, r, _ in self.messages]
