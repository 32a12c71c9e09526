"""End-to-end exercise of the graft Python client against a live server.

Run by PythonClientSpec: a GraftSession + ApiServer is booted in the JVM,
then this script drives every client surface over real HTTP. Exits
non-zero (with a traceback) on any failure; prints ALL OK on success.

Usage: python3 e2e_client.py <base_url> <api_key>
"""

import sys

import graft


def main():
    url, key = sys.argv[1], sys.argv[2]

    with graft.connect(url, api_key=key) as conn:
        # Arrow bulk path: pyarrow.Table with typed columns
        t = conn.sql(
            "SELECT n_name, n_regionkey FROM nation ORDER BY n_name LIMIT 3")
        assert t.num_rows == 3, t
        assert t.column_names == ["n_name", "n_regionkey"], t.column_names
        import pyarrow.types as _pt
        assert _pt.is_integer(t.column("n_regionkey").type), \
            t.column("n_regionkey").type

        # named parameters bind as typed literals on the Arrow path too
        total = conn.sql("SELECT count(*) AS n FROM nation")
        assert total.column("n")[0].as_py() == 25, total
        bound = conn.sql(
            "SELECT count(*) AS n FROM nation WHERE n_regionkey = :rk",
            params={"rk": 0})
        n0 = bound.column("n")[0].as_py()
        assert 0 < n0 < 25, n0
        # an injection-shaped STRING value must bind as data, not SQL
        smuggle = conn.sql(
            "SELECT count(*) AS n FROM nation WHERE n_name = :name",
            params={"name": "x' OR '1'='1"})
        assert smuggle.column("n")[0].as_py() == 0, smuggle

        # JSON control-plane twin agrees with the Arrow path
        cols, rows, _warn = conn.sql_rows("SELECT count(*) AS n FROM nation")
        assert cols == ["n"] and rows[0][0] == 25, (cols, rows)

        # plan + schema without executing
        plan = conn.trace("SELECT n_name FROM nation WHERE n_nationkey = 3")
        assert "nation" in plan, plan
        sch = conn.schema("SELECT n_name FROM nation")
        assert sch[0]["name"] == "n_name", sch

        # executed trace: report text + runtime metrics
        tr = conn.trace_run(
            "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
        assert tr["rows"] == 5, tr
        assert "GRAFT QUERY REPORT" in tr["report"], tr["report"][:200]
        nodes = [m["node"].lower() for m in tr["node_metrics"]]
        assert any("scan" in n for n in nodes), nodes

        # catalog describe: listing and one table
        listing = conn.describe()
        assert "nation" in listing and "orders" in listing, listing
        desc = conn.describe("nation")
        assert "n_name" in desc, desc

        # Flight-SQL-shaped discovery with embedded IPC schemas
        import pyarrow as pa
        import pyarrow.ipc as ipc
        tt = conn.tables(table_name_filter_pattern="nat%")
        assert tt.num_rows == 1, tt
        assert tt.column("table_name")[0].as_py() == "nation", tt
        embedded = ipc.read_schema(
            pa.BufferReader(tt.column("table_schema")[0].as_py()))
        assert "n_name" in embedded.names, embedded

        # sandboxed Code Mode round-trip: the script queries back through
        # the server under this connection's own key
        out = conn.run_python(
            "print(graft.sql('SELECT 1 AS one')['rows'])\n")
        assert "[[1]]" in out["stdout"], out

    # session tracing: connect(trace_dir=...) emits JSON-lines records
    import glob
    import json
    import os
    import tempfile
    tdir = tempfile.mkdtemp(prefix="graft-trace-")
    with graft.connect(url, api_key=key, trace_dir=tdir) as traced:
        traced.sql_rows("SELECT count(*) AS n FROM nation")
        traced.sql("SELECT n_name FROM nation LIMIT 2")
    files = glob.glob(os.path.join(tdir, "*.jsonl"))
    assert len(files) == 1, files
    events = [json.loads(l) for l in open(files[0])]
    kinds = [e["event"] for e in events]
    assert kinds[0] == "session_start" and kinds[-1] == "session_end", kinds
    queries = [e for e in events if e["event"] == "query"]
    assert len(queries) == 2, events
    assert queries[0]["rows"] == 1 and queries[1]["rows"] == 2, queries
    assert all(len(q["sql_sha256"]) == 64 for q in queries), queries
    assert all("SELECT" not in json.dumps(e) for e in events), \
        "sql text must never reach the trace"
    assert events[-1]["termination_reason"] == "natural", events[-1]

    # the span decorator emits timed records through a custom emitter
    from graft import tracing

    class Collect(tracing.TraceEmitter):
        def __init__(self):
            self.records = []

        def emit(self, record):
            self.records.append(record)

    sink = Collect()
    tracing.set_emitter(sink)

    @tracing.span(span_type="tool_call", name="probe")
    def probe(x):
        return x * 2

    assert probe(21) == 42
    try:
        @tracing.span()
        def boom():
            raise ValueError("nope")
        boom()
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    spans = [r for r in sink.records if r["event"] == "span"]
    assert spans[0]["name"] == "probe" and spans[0]["status"] == "ok", spans
    assert spans[1]["status"] == "error" and "nope" in spans[1]["error"], spans

    # error mapping
    try:
        graft.connect(url, api_key="wrong-key").sql_rows("SELECT 1 AS x")
        raise AssertionError("expected AuthError")
    except graft.AuthError:
        pass
    try:
        graft.connect(url, api_key=key).sql_rows("SELECT * FROM no_such_table")
        raise AssertionError("expected QueryError")
    except graft.QueryError:
        pass
    try:
        graft.connect("http://localhost:1", api_key=key).sql_rows("SELECT 1")
        raise AssertionError("expected ConnectionError")
    except graft.ConnectionError:
        pass

    print("ALL OK")


if __name__ == "__main__":
    main()
