"""Provenance events — the NiFi provenance-reporting analog.

The reference emits a provenance SEND event after each external-store
write (PartialUpdateMongo.java:255, PutMongoWithDuplicateCheck.java:149,
SocketIOProcessor.java:296). In Spark the natural unit is the ACTION
(one job/commit), not the record: a sink records one SEND event per
completed batch with row counts and wall time — the same observable
audit trail at 1/N-millionth the event volume.

Kept deliberately tiny and explicit: a ProvenanceLog that sinks call
around their external writes (see sinks/socketio.py), plus a timing
context manager. No global state, no listener plumbing — a user who
wants Spark-native lineage gets it from the SQL UI / event log, which
records every plan anyway.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class ProvenanceEvent:
    """One SEND/COMMIT audit record (NiFi ProvenanceReporter.send analog)."""

    event_type: str  # SEND | COMMIT | ROUTE
    target: str  # sink uri / table path / relationship name
    n_rows: int
    duration_s: float
    wall_time: float
    detail: str = ""


@dataclass
class ProvenanceLog:
    events: list[ProvenanceEvent] = field(default_factory=list)
    sink: Callable[[ProvenanceEvent], None] | None = None

    def record(self, ev: ProvenanceEvent) -> None:
        self.events.append(ev)
        if self.sink is not None:
            self.sink(ev)

    @contextmanager
    def send(self, target: str, detail: str = "") -> Iterator[dict]:
        """Time an external write; caller sets ctx['n_rows'] before exit.

        Mirrors the reference's StopWatch-around-send pattern
        (PartialUpdateMongo.java:458,467-479)."""
        ctx: dict = {"n_rows": 0}
        t0 = time.perf_counter()
        yield ctx
        self.record(
            ProvenanceEvent(
                event_type="SEND",
                target=target,
                n_rows=int(ctx["n_rows"]),
                duration_s=time.perf_counter() - t0,
                wall_time=time.time(),
                detail=detail,
            )
        )
