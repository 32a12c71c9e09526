"""Agent observability — structured tracing for client/sandbox interactions.

The analog of the reference's tracing package (``strake.tracing``,
``python/strake/tracing/session.py``): JSON-lines trace records with
pluggable emitters, an ``AgentSession`` context manager bracketing one
agent invocation, and a ``@span`` decorator for timed tool calls. All
entry points are safe when tracing is disabled (``NullEmitter``), and the
whole module is stdlib-only.

Gate: ``GRAFT_TRACE_ENABLED`` env var (default enabled, like the
reference); ``graft.connect(..., trace_dir=...)`` turns per-query tracing
on for a connection.
"""

import datetime as _dt
import functools as _functools
import json as _json
import os as _os
import threading as _threading
import time as _time
import uuid as _uuid

__all__ = [
    "TraceEmitter", "NullEmitter", "JsonLinesFileEmitter",
    "get_emitter", "set_emitter", "AgentSession", "span",
]


def _enabled():
    return _os.environ.get("GRAFT_TRACE_ENABLED", "true").lower() in (
        "1", "true", "yes")


def _utc_iso():
    return _dt.datetime.now(_dt.timezone.utc).isoformat()


class TraceEmitter:
    """Pluggable sink for trace records."""

    def emit(self, record):
        raise NotImplementedError

    def flush(self):
        pass


class NullEmitter(TraceEmitter):
    """Drop-all emitter used when tracing is disabled."""

    def emit(self, record):
        pass


class JsonLinesFileEmitter(TraceEmitter):
    """Append records as JSON lines, one ``<date>_<session_id>.jsonl``
    file per session for easy correlation and cleanup."""

    def __init__(self, trace_dir):
        self.trace_dir = _os.path.abspath(trace_dir)
        _os.makedirs(self.trace_dir, exist_ok=True)
        # One open file per session_id: the emitter is a module-level
        # singleton shared by every session in the process, so pinning a
        # single handle to the first record's session would append later
        # sessions into the first session's file.
        self._files = {}

    # Cap on simultaneously open per-session files: a long-lived service
    # with many short sessions must not leak fds — evicted (closed)
    # sessions transparently reopen in append mode on their next emit.
    MAX_OPEN_FILES = 64

    def emit(self, record):
        sid = record.get("session_id", "unknown")
        f = self._files.get(sid)
        if f is None:
            if len(self._files) >= self.MAX_OPEN_FILES:
                oldest_sid = next(iter(self._files))
                self._files.pop(oldest_sid).close()
            day = _dt.datetime.now(_dt.timezone.utc).strftime("%Y%m%d")
            path = _os.path.join(self.trace_dir, "%s_%s.jsonl" % (day, sid))
            f = open(path, "a", encoding="utf-8")
            self._files[sid] = f
        f.write(_json.dumps(record, default=str) + "\n")

    def flush(self):
        for f in self._files.values():
            f.flush()

    def close(self):
        for f in self._files.values():
            f.close()
        self._files = {}


_emitter = None
_lock = _threading.Lock()


def get_emitter(trace_dir=None):
    """Module-level emitter, created (or redirected) on demand.

    Disabled tracing always yields a NullEmitter; a ``trace_dir``
    argument re-points the singleton at that directory.
    """
    global _emitter
    with _lock:
        if not _enabled():
            if not isinstance(_emitter, NullEmitter):
                _emitter = NullEmitter()
            return _emitter
        if trace_dir is None:
            if _emitter is None:
                _emitter = NullEmitter()
            return _emitter
        target = _os.path.abspath(trace_dir)
        if isinstance(_emitter, JsonLinesFileEmitter) and \
                _emitter.trace_dir == target:
            return _emitter
        if isinstance(_emitter, JsonLinesFileEmitter):
            _emitter.close()
        _emitter = JsonLinesFileEmitter(target)
        return _emitter


def set_emitter(emitter):
    """Override the module-level emitter (tests, custom sinks)."""
    global _emitter
    with _lock:
        _emitter = emitter


class AgentSession:
    """Context manager for one agent invocation: a ``session_start``
    record on entry, arbitrary events in between, and a ``session_end``
    with duration and termination reason on exit."""

    def __init__(self, emitter=None, metadata=None):
        self.session_id = _uuid.uuid4().hex
        self.emitter = emitter if emitter is not None else get_emitter()
        self.metadata = dict(metadata or {})
        self.termination_reason = "natural"
        self._start = None

    def __enter__(self):
        self._start = _time.monotonic()
        self.emitter.emit(dict(
            {"event": "session_start", "session_id": self.session_id,
             "timestamp": _utc_iso()}, **self.metadata))
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        if exc_type is not None:
            self.termination_reason = "error:%s" % exc_type.__name__
        self.emitter.emit({
            "event": "session_end",
            "session_id": self.session_id,
            "timestamp": _utc_iso(),
            "termination_reason": self.termination_reason,
            "duration_ms": round((_time.monotonic() - self._start) * 1000, 2),
        })
        self.emitter.flush()

    def record_event(self, event_type, data=None):
        self.emitter.emit(dict(
            {"event": event_type, "session_id": self.session_id,
             "timestamp": _utc_iso()}, **(data or {})))


def span(span_type="tool_call", name=None, capture_args=False):
    """Decorator emitting a timed span record around a function call.

    ``capture_args`` defaults to False for privacy (same stance as the
    reference): argument values never reach the trace unless opted in.
    """
    def decorator(fn):
        label = name or fn.__name__

        @_functools.wraps(fn)
        def wrapper(*args, **kwargs):
            emitter = get_emitter()
            start = _time.monotonic()
            status, error = "ok", None
            try:
                return fn(*args, **kwargs)
            except BaseException as e:
                status, error = "error", "%s: %s" % (type(e).__name__, e)
                raise
            finally:
                record = {
                    "event": "span",
                    "span_type": span_type,
                    "name": label,
                    "timestamp": _utc_iso(),
                    "status": status,
                    "duration_ms": round((_time.monotonic() - start) * 1000, 2),
                }
                if error is not None:
                    record["error"] = error
                if capture_args:
                    record["args"] = [repr(a)[:200] for a in args]
                emitter.emit(record)
        return wrapper
    return decorator
