"""Process-local event bus replacing the reference's DOM event dispatch.

The reference communicates through three document-level events
(headtrackrStatus src/main.js:70-77, facetrackingEvent src/facetrackr.js:112-125,
headtrackingEvent src/headposition.js:183-188).  Here the same three event types
flow through an in-process bus with the same payload field names.

A module-level default bus mirrors the single global ``document``; Tracker
instances can be given private buses for multi-session isolation.
"""

import threading

__all__ = ["Event", "EventBus", "default_bus", "add_event_listener",
           "remove_event_listener", "dispatch_event",
           "FACETRACKING", "HEADTRACKING", "STATUS"]

FACETRACKING = "facetrackingEvent"
HEADTRACKING = "headtrackingEvent"
STATUS = "headtrackrStatus"


class Event:
    """A dispatched event: ``type`` plus payload fields as attributes."""

    def __init__(self, type_, payload=None):
        self.type = type_
        for k, v in (payload or {}).items():
            setattr(self, k, v)

    def __repr__(self):
        fields = {k: v for k, v in self.__dict__.items() if k != "type"}
        return f"Event({self.type!r}, {fields})"


class EventBus:
    def __init__(self):
        self._listeners = {}
        self._lock = threading.Lock()

    def add_event_listener(self, type_, callback):
        with self._lock:
            self._listeners.setdefault(type_, []).append(callback)
        return callback

    def remove_event_listener(self, type_, callback):
        with self._lock:
            try:
                self._listeners.get(type_, []).remove(callback)
            except ValueError:
                pass

    def dispatch_event(self, type_, payload=None):
        ev = payload if isinstance(payload, Event) else Event(type_, payload)
        with self._lock:
            listeners = list(self._listeners.get(type_, []))
        for cb in listeners:
            cb(ev)
        return ev

    def clear(self):
        with self._lock:
            self._listeners.clear()


default_bus = EventBus()


def add_event_listener(type_, callback):
    return default_bus.add_event_listener(type_, callback)


def remove_event_listener(type_, callback):
    default_bus.remove_event_listener(type_, callback)


def dispatch_event(type_, payload=None):
    return default_bus.dispatch_event(type_, payload)
