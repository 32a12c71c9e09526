"""Python client for the graft engine's serving layer.

The analog of the reference's Python client (`python/strake/__init__.py`,
`__init__.pyi`: ``strake.connect(...).sql(...)`` -> ``pyarrow.Table``),
re-expressed over graft's wire surface instead of PyO3 bindings:

- ``sql()`` executes over the Arrow IPC bulk endpoint
  (``POST /api/v1/query_arrow``) and returns a ``pyarrow.Table`` —
  the same columnar-delivery contract the reference gets from
  Flight SQL / zero-copy PyArrow.
- ``sql_rows()`` is the dependency-free control-plane twin
  (``POST /api/v1/query``, JSON rows) for environments without pyarrow.
- ``trace()`` / ``schema()`` mirror ``StrakeConnection.trace`` /
  prepared-statement planning: the plan and result schema without
  executing (``POST /api/v1/explain``).
- ``trace_run()`` EXECUTES with tracing (``POST /api/v1/trace``):
  the query report plus per-operator runtime metrics.
- ``describe()`` mirrors ``StrakeConnection.describe``: a pretty table
  listing, or one table's columns.
- ``tables()`` is Flight SQL ``CommandGetTables`` discovery
  (``GET /api/v1/tables``): one Arrow batch whose ``table_schema``
  column carries each table's encapsulated IPC schema bytes.
- ``run_python()`` submits a script to the server-side sandbox
  ("Code Mode", reference ``mcp.py:258-296``).

Only the standard library is required; ``pyarrow`` is imported lazily by
the Arrow-returning methods.
"""

import json as _json
import urllib.error as _urlerror
import urllib.parse as _urlparse
import urllib.request as _urlrequest

__all__ = [
    "connect", "GraftConnection", "FlightConnection",
    "GraftError", "ConnectionError", "QueryError", "AuthError",
]


class GraftError(Exception):
    """Base class for client errors (reference: StrakeException)."""


class ConnectionError(GraftError):  # noqa: A001 - mirrors the reference name
    """The server could not be reached."""


class QueryError(GraftError):
    """The server rejected the request (bad SQL, unknown table, ...)."""


class AuthError(GraftError):
    """Missing/invalid API key or insufficient permissions."""


def connect(url=None, api_key=None, timeout=60.0, trace_dir=None,
            mode=None, config=None, data_dir=None, boot_timeout=180.0):
    """Connect to a graft server — remote or embedded.

    :param url: base URL, e.g. ``http://localhost:8080``. Omit it (or pass
        ``mode="embedded"``) to BOOT the engine as a child JVM against
        ``config``/``data_dir`` and connect to its ephemeral port — the
        UX of the reference's default in-process ``connect()``
        (``python/src/backend/embedded.rs``); a JVM engine can't live
        inside CPython, so "embedded" means a lifecycle-managed child
        process whose engine dies with this connection.
    :param api_key: bearer token resolved server-side to an
        AuthenticatedUser (permissions + row policies). Embedded mode
        generates a private random key for the child automatically.
    :param timeout: per-request timeout in seconds.
    :param trace_dir: directory for JSON-lines session traces (reference:
        ``strake.connect(trace_dir=...)``); every query emits a timed
        record with the statement's hash — never its text.
    :param mode: ``"embedded"`` to force the child-JVM boot path.
    :param config: sources.yaml registered at boot (embedded mode).
    :param data_dir: parquet table directory registered at boot
        (embedded mode).
    :param boot_timeout: seconds to wait for the child JVM to serve.

    ``mode="flight"`` (or a ``grpc://`` url) connects over Arrow Flight
    SQL instead of HTTP — the reference's remote mode
    (``python/src/backend/remote.rs``): GetFlightInfo plans the
    statement, DoGet streams record batches, and results land as
    zero-copy ``pyarrow.Table``s.
    """
    if mode == "embedded" or (url is None and mode != "flight"):
        return EmbeddedConnection(config=config, data_dir=data_dir,
                                  timeout=timeout, trace_dir=trace_dir,
                                  boot_timeout=boot_timeout)
    if mode == "flight" or (url or "").startswith(
            ("grpc://", "grpc+tcp://", "grpc+tls://")):
        return FlightConnection(url, api_key=api_key, timeout=timeout,
                                trace_dir=trace_dir)
    return GraftConnection(url, api_key=api_key, timeout=timeout,
                           trace_dir=trace_dir)


class GraftConnection:
    """A connection to a graft serving endpoint.

    Context-manager capable, like the reference's StrakeConnection.
    ``last_warnings`` holds the warning channel of the most recent query
    (schema drift, cache hits, injection dry-run findings, ...).
    """

    def __init__(self, url, api_key=None, timeout=60.0, trace_dir=None):
        self._base = url.rstrip("/")
        self._key = api_key
        self._timeout = timeout
        self.last_warnings = []
        self._closed = False
        self._session = None
        if trace_dir is not None:
            from . import tracing
            self._session = tracing.AgentSession(
                tracing.get_emitter(trace_dir),
                metadata={"kind": "client", "endpoint": self._base})
            self._session.__enter__()

    def _trace_query(self, path, sql, start, status, rows):
        if self._session is not None:
            import hashlib
            self._session.record_event("query", {
                "path": path,
                "sql_sha256": hashlib.sha256(sql.encode("utf-8")).hexdigest(),
                "status": status,
                "rows": rows,
                "duration_ms": round((__import__("time").monotonic() - start) * 1000, 2),
            })

    # ------------------------------------------------------------ queries

    def sql(self, query, params=None):
        """Execute SQL, return a ``pyarrow.Table`` (Arrow IPC delivery).

        :param params: optional dict for named ``:param`` placeholders,
            bound server-side as typed literals (never string-spliced).
        """
        import time as _t
        import pyarrow.ipc as _ipc

        body = {"sql": query}
        if params:
            body["params"] = params
        start = _t.monotonic()
        try:
            raw, headers = self._post_raw("/api/v1/query_arrow", body)
        except Exception:
            self._trace_query("query_arrow", query, start, "error", None)
            raise
        self.last_warnings = [v for k, v in headers if k.lower() == "x-graft-warning"]
        table = _ipc.open_stream(raw).read_all()
        self._trace_query("query_arrow", query, start, "ok", table.num_rows)
        return table

    def sql_rows(self, query, params=None):
        """Execute SQL over the JSON control endpoint.

        Returns ``(columns, rows, warnings)`` with rows as plain lists —
        no pyarrow needed. Numeric/boolean scalars keep their JSON types;
        everything else arrives stringified.
        """
        import time as _t
        body = {"sql": query}
        if params:
            body["params"] = params
        start = _t.monotonic()
        try:
            out = self._post_json("/api/v1/query", body)
        except Exception:
            self._trace_query("query", query, start, "error", None)
            raise
        self.last_warnings = out.get("warnings", [])
        self._trace_query("query", query, start, "ok", len(out["rows"]))
        return out["columns"], out["rows"], self.last_warnings

    def trace(self, query):
        """Return the formatted execution plan (with pushdown indicators)
        without executing — reference ``StrakeConnection.trace`` /
        ``explain_tree``."""
        return self._post_json("/api/v1/explain", {"sql": query})["plan"]

    def schema(self, query):
        """Plan a statement and return its result schema as a list of
        ``{name, type, nullable}`` dicts (prepared-statement planning,
        reference ``flight_sql.rs:533-566``)."""
        return self._post_json("/api/v1/explain", {"sql": query})["columns"]

    def trace_run(self, query, params=None):
        """EXECUTE the query with tracing (reference
        ``execute_query_with_trace``): returns a dict with ``report``
        (the GRAFT QUERY REPORT text), ``duration_ms``, ``rows``,
        ``pushed_filters``, per-operator ``node_metrics``, and
        ``warnings``. Heavier than :meth:`sql` — it runs the plan to
        populate runtime metrics. Like every executing call, it emits a
        session trace record and refreshes ``last_warnings``."""
        import time as _t
        body = {"sql": query}
        if params:
            body["params"] = params
        start = _t.monotonic()
        try:
            out = self._post_json("/api/v1/trace", body)
        except Exception:
            self._trace_query("trace", query, start, "error", None)
            raise
        self.last_warnings = out.get("warnings", [])
        self._trace_query("trace", query, start, "ok", out.get("rows"))
        return out

    # ------------------------------------------------------------ catalog

    def describe(self, table_name=None):
        """List tables, or describe one table's columns, as pretty text
        (reference ``StrakeConnection.describe``)."""
        if table_name is None:
            out = self._get_json("/api/v1/sources")
            names = [t["name"] for t in out.get("tables", [])]
            width = max([len("table")] + [len(n) for n in names])
            lines = ["table".ljust(width), "-" * width]
            lines += [n.ljust(width) for n in sorted(names)]
            return "\n".join(lines)
        quoted = _urlparse.quote(table_name, safe="")
        out = self._get_json("/api/v1/introspect/" + quoted)
        cols = out.get("columns", [])
        nw = max([len("column")] + [len(c["name"]) for c in cols])
        tw = max([len("type")] + [len(c["type"]) for c in cols])
        lines = ["%s  %s  %s" % ("column".ljust(nw), "type".ljust(tw), "nullable"),
                 "-" * (nw + tw + 12)]
        for c in cols:
            lines.append("%s  %s  %s" % (
                c["name"].ljust(nw), c["type"].ljust(tw),
                "true" if c.get("nullable", True) else "false"))
        return "\n".join(lines)

    def tables(self, catalog=None, db_schema_filter_pattern=None,
               table_name_filter_pattern=None, table_types=None,
               include_schema=True):
        """Catalog discovery in the Flight SQL GetTables shape.

        Returns a ``pyarrow.Table`` with columns (catalog_name,
        db_schema_name, table_name, table_type, table_schema); when
        ``include_schema`` the last column holds each table's
        encapsulated Arrow IPC schema — decode with
        ``pyarrow.ipc.read_schema(pyarrow.BufferReader(b))``.
        """
        import pyarrow.ipc as _ipc

        q = {}
        if catalog is not None:
            q["catalog"] = catalog
        if db_schema_filter_pattern is not None:
            q["db_schema_filter_pattern"] = db_schema_filter_pattern
        if table_name_filter_pattern is not None:
            q["table_name_filter_pattern"] = table_name_filter_pattern
        if table_types is not None:
            q["table_types"] = ",".join(table_types)
        if not include_schema:
            q["include_schema"] = "false"
        path = "/api/v1/tables"
        if q:
            path += "?" + _urlparse.urlencode(q)
        raw, _ = self._request_raw("GET", path, None)
        return _ipc.open_stream(raw).read_all()

    # ------------------------------------------------------------- agent

    def run_python(self, script, timeout_secs=None):
        """Execute a script in the server-side sandbox; returns the dict
        ``{stdout, stderr, timed_out, duration_ms}``. The script reaches
        the engine only through its injected ``graft.sql()`` callback,
        which re-enters the server under this connection's own key."""
        body = {"script": script}
        if timeout_secs is not None:
            body["timeout_secs"] = timeout_secs
        return self._post_json("/api/v1/run_python", body)

    # ---------------------------------------------------------- lifecycle

    def close(self):
        """Close the trace session (HTTP itself is stateless)."""
        if self._session is not None and not self._closed:
            self._session.__exit__(None, None, None)
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()

    # ----------------------------------------------------------- plumbing

    def _headers(self):
        h = {"Content-Type": "application/json"}
        if self._key:
            h["Authorization"] = "Bearer " + self._key
        return h

    def _request_raw(self, method, path, body):
        if self._closed:
            raise ConnectionError("connection is closed")
        data = None
        if body is not None:
            data = _json.dumps(body).encode("utf-8")
        req = _urlrequest.Request(
            self._base + path, data=data, headers=self._headers(), method=method)
        try:
            with _urlrequest.urlopen(req, timeout=self._timeout) as resp:
                return resp.read(), resp.getheaders()
        except _urlerror.HTTPError as e:
            detail = ""
            try:
                detail = _json.loads(e.read().decode("utf-8")).get("error", "")
            except Exception:
                pass
            if e.code in (401, 403):
                raise AuthError(detail or ("HTTP %d" % e.code)) from None
            raise QueryError(detail or ("HTTP %d" % e.code)) from None
        except _urlerror.URLError as e:
            raise ConnectionError(str(e.reason)) from None

    def _post_raw(self, path, body):
        return self._request_raw("POST", path, body)

    def _post_json(self, path, body):
        raw, _ = self._request_raw("POST", path, body)
        return _json.loads(raw.decode("utf-8"))

    def _get_json(self, path):
        raw, _ = self._request_raw("GET", path, None)
        return _json.loads(raw.decode("utf-8"))


# ---------------------------------------------------------------- flight mode

def _pb_varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _pb_field(field, payload):
    """A length-delimited protobuf field (wire type 2)."""
    return _pb_varint((field << 3) | 2) + _pb_varint(len(payload)) + payload


def _flight_sql_any(type_suffix, message_bytes):
    """``google.protobuf.Any``-wrap a Flight SQL command message — the
    envelope every FlightDescriptor.cmd carries (Any{type_url=1,
    value=2})."""
    url = "type.googleapis.com/arrow.flight.sql." + type_suffix
    return (_pb_field(1, url.encode("utf-8"))
            + _pb_field(2, message_bytes))


def _pb_scan(buf):
    """Parse a flat protobuf message into {field_number: value} —
    length-delimited fields as ``bytes``, varints as ``int`` (the only
    wire types the Flight SQL replies used here carry)."""
    out = {}
    i = 0

    def varint():
        nonlocal i
        v = shift = 0
        while True:
            b = buf[i]
            i += 1
            v |= (b & 0x7F) << shift
            shift += 7
            if not (b & 0x80):
                return v

    while i < len(buf):
        tag = varint()
        field, wt = tag >> 3, tag & 7
        if wt == 2:
            ln = varint()
            out[field] = bytes(buf[i:i + ln])
            i += ln
        elif wt == 0:
            out[field] = varint()
        else:
            raise QueryError("unsupported protobuf wire type %d" % wt)
    return out


class FlightConnection:
    """A connection over Arrow Flight SQL — the zero-copy remote path.

    The analog of the reference's remote backend
    (``python/src/backend/remote.rs``): statements resolve to a ticket
    with GetFlightInfo (plan only — schema without execution) and
    execute with DoGet, whose record batches arrive as one
    ``pyarrow.Table`` without any row-level re-encoding. Catalog
    discovery (``tables()``) speaks ``CommandGetTables``. The command
    protos are hand-encoded (two length-delimited fields); only
    ``pyarrow`` is required.
    """

    def __init__(self, url, api_key=None, timeout=60.0, trace_dir=None):
        import pyarrow.flight as _fl
        self._fl = _fl
        loc = (url or "").rstrip("/")
        for scheme in ("http://", "grpc://"):
            if loc.startswith(scheme):
                loc = "grpc+tcp://" + loc[len(scheme):]
        if not loc.startswith(("grpc+tcp://", "grpc+tls://")):
            # graft's ConnectionError, not a bare ValueError: callers are
            # told to catch the GraftError hierarchy for every mode
            raise ConnectionError(
                "flight mode needs a grpc:// or http:// url "
                "(got %r)" % (url,))
        self._base = loc
        self._timeout = timeout
        headers = []
        if api_key:
            headers.append((b"authorization",
                            ("Bearer " + api_key).encode("utf-8")))
        self._opts = _fl.FlightCallOptions(timeout=timeout, headers=headers)
        try:
            self._client = _fl.connect(loc)
        except Exception as e:  # pragma: no cover - pyarrow raises lazily
            raise ConnectionError(str(e)) from None
        self.last_warnings = []
        self._closed = False
        self._session = None
        if trace_dir is not None:
            from . import tracing
            self._session = tracing.AgentSession(
                tracing.get_emitter(trace_dir),
                metadata={"kind": "client-flight", "endpoint": self._base})
            self._session.__enter__()

    # mirrors GraftConnection._trace_query for the flight path
    def _trace_query(self, path, sql, start, status, rows):
        if self._session is not None:
            import hashlib
            self._session.record_event("query", {
                "path": path,
                "sql_sha256": hashlib.sha256(sql.encode("utf-8")).hexdigest(),
                "status": status,
                "rows": rows,
                "duration_ms": round(
                    (__import__("time").monotonic() - start) * 1000, 2),
            })

    def _translate(self, e, query=None):
        fl = self._fl
        if isinstance(e, fl.FlightUnauthenticatedError):
            return AuthError(str(e))
        if isinstance(e, (fl.FlightUnavailableError, fl.FlightTimedOutError)):
            return ConnectionError(str(e))
        if isinstance(e, fl.FlightError):
            return QueryError(str(e))
        import pyarrow as pa
        # DoPut surfaces server-side INVALID_ARGUMENT through the batch
        # writer as ArrowInvalid, not as a FlightError subclass
        if isinstance(e, pa.lib.ArrowInvalid):
            return QueryError(str(e))
        return e

    def _statement_info(self, query):
        """GetFlightInfo for a statement — plans without executing."""
        fl = self._fl
        cmd = _flight_sql_any(
            "CommandStatementQuery", _pb_field(1, query.encode("utf-8")))
        desc = fl.FlightDescriptor.for_command(cmd)
        try:
            return self._client.get_flight_info(desc, self._opts)
        except Exception as e:
            raise self._translate(e) from None

    def _bind_params(self, query, params):
        """Prepared-statement parameter binding over Flight SQL's
        stateless-server contract: CreatePreparedStatement mints a
        handle, DoPut streams ONE single-row record batch whose column
        names are the parameter names, and the server answers with a
        REPLACEMENT handle (DoPutPreparedStatementResult) carrying the
        bound values — the shape the reference's prepared path binds
        through (flight_sql.rs:533-566). Returns the bound handle."""
        fl = self._fl
        import pyarrow as pa
        req = _flight_sql_any("ActionCreatePreparedStatementRequest",
                              _pb_field(1, query.encode("utf-8")))
        try:
            results = list(self._client.do_action(
                fl.Action("CreatePreparedStatement", req), self._opts))
            any_msg = _pb_scan(results[0].body.to_pybytes())
            handle = _pb_scan(any_msg[2])[1]
            rb = pa.record_batch([pa.array([v]) for v in params.values()],
                                 names=list(params.keys()))
            cmd = _flight_sql_any("CommandPreparedStatementQuery",
                                  _pb_field(1, handle))
            writer, reader = self._client.do_put(
                fl.FlightDescriptor.for_command(cmd), rb.schema, self._opts)
            writer.write_batch(rb)
            writer.done_writing()
            msg = reader.read()
            if msg is None:
                # the server refused the bind: close() surfaces the
                # underlying Flight error (e.g. INVALID_ARGUMENT for an
                # unsupported parameter class) instead of a bare
                # AttributeError off the empty result stream
                writer.close()
                raise QueryError("prepared-statement bind returned no result")
            bound = _pb_scan(msg.to_pybytes())[1]
            writer.close()
            return bound
        except GraftError:
            raise
        except Exception as e:
            raise self._translate(e) from None

    def sql(self, query, params=None):
        """Execute SQL, return a zero-copy ``pyarrow.Table``. Named
        ``:param`` placeholders bind through the prepared-statement
        DoPut path (see ``_bind_params``)."""
        import time as _t
        start = _t.monotonic()
        try:
            if params:
                cmd = _flight_sql_any(
                    "CommandPreparedStatementQuery",
                    _pb_field(1, self._bind_params(query, params)))
                info = self._client.get_flight_info(
                    self._fl.FlightDescriptor.for_command(cmd), self._opts)
            else:
                info = self._statement_info(query)
            reader = self._client.do_get(
                info.endpoints[0].ticket, self._opts)
            table = reader.read_all()
        except GraftError:
            self._trace_query("flight", query, start, "error", None)
            raise
        except Exception as e:
            self._trace_query("flight", query, start, "error", None)
            raise self._translate(e) from None
        self._trace_query("flight", query, start, "ok", table.num_rows)
        return table

    def sql_rows(self, query, params=None):
        """``(columns, rows, warnings)`` twin over the Flight path."""
        t = self.sql(query, params=params)
        cols = [c.to_pylist() for c in t.columns]
        return t.column_names, [list(r) for r in zip(*cols)], []

    def schema(self, query):
        """Result schema without executing (GetFlightInfo only)."""
        info = self._statement_info(query)
        return [{"name": f.name, "type": str(f.type),
                 "nullable": f.nullable} for f in info.schema]

    def tables(self, catalog=None, db_schema_filter_pattern=None,
               table_name_filter_pattern=None, table_types=(),
               include_schema=True):
        """Flight SQL ``CommandGetTables`` discovery as a
        ``pyarrow.Table`` (``table_schema`` carries IPC schema bytes when
        ``include_schema``)."""
        body = bytearray()
        if catalog:
            body += _pb_field(1, catalog.encode("utf-8"))
        if db_schema_filter_pattern:
            body += _pb_field(2, db_schema_filter_pattern.encode("utf-8"))
        if table_name_filter_pattern:
            body += _pb_field(3, table_name_filter_pattern.encode("utf-8"))
        for t in table_types:
            body += _pb_field(4, t.encode("utf-8"))
        if include_schema:
            body += _pb_varint((5 << 3) | 0) + _pb_varint(1)
        cmd = _flight_sql_any("CommandGetTables", bytes(body))
        try:
            # catalog tickets ARE the command — no GetFlightInfo needed
            reader = self._client.do_get(
                self._fl.Ticket(cmd), self._opts)
            return reader.read_all()
        except Exception as e:
            raise self._translate(e) from None

    def close(self):
        if not self._closed:
            self._closed = True
            try:
                self._client.close()
            finally:
                if self._session is not None:
                    self._session.__exit__(None, None, None)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()


# -------------------------------------------------------------- embedded mode

# Spark on JDK 17 needs these opens when the JVM is launched directly
# (spark-submit normally injects them; mirrors
# org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions()).
_JDK17_ADD_OPENS = [
    "--add-opens=java.base/" + p + "=ALL-UNNAMED" for p in (
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar")
]


class EmbeddedConnection(GraftConnection):
    """A connection that OWNS its engine: boots ``graft.server.ServerMain``
    as a child JVM, waits for its ephemeral port, and terminates it on
    ``close()`` — the child-process realization of the reference's
    embedded backend. The child serves with a private random API key
    passed via environment, never argv."""

    def __init__(self, config=None, data_dir=None, timeout=60.0,
                 trace_dir=None, boot_timeout=180.0):
        import os
        import secrets
        import subprocess
        import tempfile
        import time

        repo = os.environ.get("GRAFT_HOME") or os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        classes = os.path.join(repo, "target", "scala-2.13", "classes")
        if not os.path.isdir(classes):
            raise ConnectionError(
                "embedded mode needs compiled engine classes at %s "
                "(run `sbt compile`, or set GRAFT_HOME)" % classes)
        spark_jars = os.environ.get("GRAFT_SPARK_JARS", "/opt/spark/jars")
        key = secrets.token_hex(16)
        fd, port_file = tempfile.mkstemp(prefix="graft-embedded-", suffix=".port")
        os.close(fd)
        os.unlink(port_file)  # ServerMain writes it atomically when ready
        self._log = tempfile.NamedTemporaryFile(  # noqa: SIM115 - outlives ctor
            mode="wb", prefix="graft-embedded-", suffix=".log", delete=False)
        cmd = (["java"] + _JDK17_ADD_OPENS +
               ["-cp", classes + os.pathsep + os.path.join(spark_jars, "*"),
                "graft.server.ServerMain", "--port-file", port_file])
        if config:
            cmd += ["--config", config]
        if data_dir:
            cmd += ["--data", data_dir]
        env = dict(os.environ, GRAFT_API_KEY=key)
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=self._log, stderr=self._log,
            env=env)
        deadline = time.monotonic() + boot_timeout
        port = None
        while time.monotonic() < deadline:
            if self._proc.poll() is not None:
                self._log.close()  # keep the file — named in the error
                raise ConnectionError(
                    "embedded engine exited with code %d; log: %s"
                    % (self._proc.returncode, self._log.name))
            try:
                with open(port_file) as f:
                    port = int(f.read().strip())
                break
            except (FileNotFoundError, ValueError):
                time.sleep(0.2)
        if port is None:
            # reap, don't just signal: an unkilled-unwaited child is a
            # zombie until interpreter GC happens to run Popen.__del__
            self._proc.kill()
            try:
                self._proc.wait(timeout=10)
            except Exception:
                pass
            self._log.close()  # keep the file — named in the error
            raise ConnectionError(
                "embedded engine did not serve within %.0fs; log: %s"
                % (boot_timeout, self._log.name))
        try:
            os.unlink(port_file)
        except OSError:
            pass
        super().__init__("http://localhost:%d" % port, api_key=key,
                         timeout=timeout, trace_dir=trace_dir)

    def close(self):
        """Shut the child engine down (stdin EOF, then terminate)."""
        super().close()
        proc = getattr(self, "_proc", None)
        if proc is not None and proc.poll() is None:
            try:
                proc.stdin.close()  # ServerMain exits on stdin EOF
                proc.wait(timeout=30)
            except Exception:
                proc.terminate()
                try:
                    proc.wait(timeout=10)
                except Exception:
                    proc.kill()
        if getattr(self, "_log", None) is not None:
            # clean shutdown: the boot log served its purpose — close AND
            # remove it (failure paths keep it and name it in the error)
            try:
                self._log.close()
                import os
                os.unlink(self._log.name)
            except Exception:
                pass


__all__.append("EmbeddedConnection")
