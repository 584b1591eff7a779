"""Training lifecycle events — parity with the reference's
photon-client event package (EventEmitter.scala:20-90 listener
registry + Try-isolated dispatch, Event.scala:15-75 event case
classes, EventListener.scala:18-35 handle/close contract):
``GameTrainingDriver`` emits setup / training-start / per-model
optimization-log / model-selection / training-finish events to
registered listeners, and clearing the registry closes every listener.

Python rendering: frozen-dataclass events, an ``EventListener`` base,
and an ``EventEmitter`` mixin. ``send_event`` isolates listener
failures exactly like the reference's ``Try(eventListener.handle(...))``
— a broken monitoring hook must never kill a multi-hour training job —
and ``clear_listeners`` likewise swallows ``close()`` errors.

Wiring: ``GameEstimator`` mixes this in (training start/finish +
per-coordinate-update events); ``cli.train`` forwards its optional
``listeners`` to the estimator and additionally emits setup,
per-sweep-entry optimization logs, and the selection event.
"""

from __future__ import annotations

import threading
import time as _time
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Event:
    """Base class for all consumable events (Event.scala:28)."""


@dataclass(frozen=True)
class SetupEvent(Event):
    """Job-setup event (PhotonSetupEvent, Event.scala:37): carries the
    user-facing configuration of the run."""

    params: dict = field(default_factory=dict)


@dataclass(frozen=True)
class TrainingStartEvent(Event):
    """Training began (TrainingStartEvent, Event.scala:44)."""

    time: float


@dataclass(frozen=True)
class TrainingFinishEvent(Event):
    """Training concluded (TrainingFinishEvent, Event.scala:51)."""

    time: float


@dataclass(frozen=True)
class CoordinateUpdateEvent(Event):
    """One coordinate-descent update completed — the per-model
    granularity of PhotonOptimizationLogEvent (Event.scala:58-66)
    mapped onto the GAME loop: (iteration, coordinate) plus the
    update's validation metrics when an evaluator ran."""

    iteration: int
    coordinate: str
    metrics: dict | None = None


@dataclass(frozen=True)
class OptimizationLogEvent(Event):
    """Full optimization of ONE swept model (PhotonOptimizationLogEvent,
    Event.scala:58-66): the regularization-weight overrides it was
    trained with and its validation metric."""

    index: int
    reg_weights: dict = field(default_factory=dict)
    metric: float | None = None


@dataclass(frozen=True)
class ModelSelectionEvent(Event):
    """T8 selection outcome: which sweep entry won and with what
    metric."""

    index: int
    reg_weights: dict = field(default_factory=dict)
    metric: float | None = None


class EventListener:
    """Base class for all event consumers (EventListener.scala:18-35)."""

    def handle(self, event: Event) -> None:
        raise NotImplementedError

    def close(self) -> None:
        """Clean-up hook, invoked by ``EventEmitter.clear_listeners``."""


class EventEmitter:
    """Mixin for event producers (EventEmitter.scala:24-90). Listener
    registration, dispatch, and clearing are lock-protected; dispatch
    and close errors are swallowed per listener (the reference's
    ``Try``) so observers cannot break the training job.

    The reference's ``Lock.synchronized`` is a reentrant JVM monitor,
    so a listener may call back into the emitter from ``handle``;
    Python's ``threading.Lock`` is not reentrant, so dispatch/close
    here SNAPSHOT the listener list under the lock and invoke the
    callbacks outside it — same observable semantics, no deadlock."""

    def _emitter_state(self) -> tuple[threading.Lock, list[EventListener]]:
        # lazily initialized so dataclass subclasses need no __init__
        # cooperation
        if not hasattr(self, "_ev_lock"):
            self._ev_lock = threading.Lock()
            self._ev_listeners: list[EventListener] = []
        return self._ev_lock, self._ev_listeners

    def register_listener(self, listener: EventListener) -> None:
        lock, listeners = self._emitter_state()
        with lock:
            listeners.append(listener)

    def listeners(self) -> list[EventListener]:
        """Snapshot of the registered listeners (for forwarding to a
        nested emitter, e.g. driver → estimator)."""
        lock, listeners = self._emitter_state()
        with lock:
            return list(listeners)

    def clear_listeners(self) -> None:
        """Close and remove all registered listeners."""
        lock, listeners = self._emitter_state()
        with lock:
            snapshot = list(listeners)
            listeners.clear()
        for li in snapshot:
            try:
                li.close()
            except Exception:
                pass

    def send_event(self, event: Event) -> None:
        lock, listeners = self._emitter_state()
        with lock:
            snapshot = list(listeners)
        for li in snapshot:
            try:
                li.handle(event)
            except Exception:
                pass


def now() -> float:
    """Event timestamp source (Unix seconds)."""
    return _time.time()


class JsonLinesFileListener(EventListener):
    """File-backed listener: one JSON object per event, APPENDED and
    flushed as it happens — a hard crash (SIGKILL/OOM) of a multi-hour
    job loses at most the tail of the log, and a pre-existing log at
    the same path is extended, never destroyed. (An earlier rendering
    buffered everything and wrote only in ``close()``, which is exactly
    the wrong durability trade for the long-job capture this listener
    is pitched for.) ``cli.train`` still closes its listeners in a
    finally block; register a fresh instance per job.

    Events are rendered as ``{"event": <class name>, "ts": <unix sec>,
    **dataclass fields}``; non-JSON-serializable field values fall back
    to ``repr`` so one exotic config value cannot void the whole log
    (dispatch would swallow the error silently). The CLI exposes this
    via ``cfg["event_log"] = <path>``."""

    def __init__(self, path: str) -> None:
        self.path = path
        # fail FAST on an unwritable/mistyped path: handle() runs inside
        # the emitter's error-swallowing dispatch, so a path error
        # discovered only at write time would silently void the whole
        # log of a multi-hour job. Append mode: never truncate.
        self._fh = open(path, "a", encoding="utf-8")
        self._closed = False

    def handle(self, event: Event) -> None:
        import dataclasses
        import json as _json

        if self._closed:
            raise RuntimeError(
                f"JsonLinesFileListener({self.path!r}) already closed — "
                "listeners are per-job; register a fresh instance"
            )
        row = {"event": type(event).__name__, "ts": now()}
        for f in dataclasses.fields(event):
            row[f.name] = getattr(event, f.name)
        self._fh.write(_json.dumps(row, sort_keys=True, default=repr) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._fh.close()


class CollectingListener(EventListener):
    """Test/debug listener that records events in order and whether it
    was closed — the shape of the reference's TestEventListener."""

    def __init__(self) -> None:
        self.events: list[Event] = []
        self.closed = False

    def handle(self, event: Event) -> None:
        self.events.append(event)

    def close(self) -> None:
        self.closed = True


def params_summary(cfg: dict) -> dict:
    """JSON-safe shallow summary of a train config for SetupEvent
    (drop values that may not serialize cleanly)."""
    out: dict[str, Any] = {}
    for k, v in cfg.items():
        if isinstance(v, (str, int, float, bool, type(None))):
            out[k] = v
        elif isinstance(v, (list, dict)):
            out[k] = f"<{type(v).__name__}:{len(v)}>"
        else:
            out[k] = f"<{type(v).__name__}>"
    return out
