"""End-to-end exercise of the Python client's FLIGHT mode against a live
FlightSqlEdge — the reference's remote backend contract
(python/src/backend/remote.rs: statement -> FlightInfo -> DoGet ->
zero-copy pyarrow.Table), driven over graft's hand-built h2c gRPC edge.

Run by PythonClientSpec. Exits non-zero on failure; prints FLIGHT OK.

Usage: python3 e2e_flight.py <host:port> <api_key>
"""

import sys

import graft


def main():
    hostport, key = sys.argv[1], sys.argv[2]

    with graft.connect("grpc://" + hostport, api_key=key,
                       mode="flight") as conn:
        assert isinstance(conn, graft.FlightConnection), type(conn)

        # zero-copy Arrow delivery: typed pyarrow.Table straight off DoGet
        t = conn.sql(
            "SELECT n_name, n_regionkey FROM nation ORDER BY n_name LIMIT 3")
        import pyarrow as pa
        import pyarrow.types as _pt
        assert isinstance(t, pa.Table), type(t)
        assert t.num_rows == 3, t
        assert t.column_names == ["n_name", "n_regionkey"], t.column_names
        assert _pt.is_integer(t.column("n_regionkey").type), \
            t.column("n_regionkey").type
        assert t.column("n_name")[0].as_py() == "NATION_0", t

        total = conn.sql("SELECT count(*) AS n FROM nation")
        assert total.column("n")[0].as_py() == 25, total

        # rows twin agrees
        cols, rows, _ = conn.sql_rows("SELECT count(*) AS n FROM nation")
        assert cols == ["n"] and rows[0][0] == 25, (cols, rows)

        # GetFlightInfo plans WITHOUT executing: schema for a statement
        sch = conn.schema("SELECT n_name, n_nationkey FROM nation")
        assert [c["name"] for c in sch] == ["n_name", "n_nationkey"], sch

        # CommandGetTables discovery with embedded IPC schemas
        import pyarrow.ipc as ipc
        tt = conn.tables(table_name_filter_pattern="nat%")
        assert tt.num_rows == 1, tt.to_pydict()
        assert tt.column("table_name")[0].as_py() == "nation", tt
        embedded = ipc.read_schema(
            pa.BufferReader(tt.column("table_schema")[0].as_py()))
        assert "n_name" in embedded.names, embedded

        # named parameters bind over the prepared-statement DoPut path:
        # CreatePreparedStatement -> DoPut(single-row batch) -> bound
        # handle -> GetFlightInfo/DoGet (reference flight_sql.rs
        # prepared path). Mixed types: int, string.
        p = conn.sql(
            "SELECT n_name, n_regionkey FROM nation "
            "WHERE n_regionkey = :rk AND n_name <> :skip "
            "ORDER BY n_name",
            params={"rk": 2, "skip": "NATION_2"})
        assert p.num_rows > 0, p
        assert all(v == 2 for v in p.column("n_regionkey").to_pylist()), p
        assert "NATION_2" not in p.column("n_name").to_pylist(), p
        # sql_rows twin binds too
        _, prows, _ = conn.sql_rows(
            "SELECT count(*) AS n FROM nation WHERE n_regionkey = :rk",
            params={"rk": 2})
        assert prows[0][0] == len(p) + 1, (prows, len(p))
        # float and bool parameter classes round-trip through the
        # single-row Arrow batch and Spark's parameterized SQL
        fb = conn.sql(
            "SELECT :f * 2 AS d, NOT :b AS nb, :f > 1.0 AS gt",
            params={"f": 1.25, "b": True})
        assert fb.column("d")[0].as_py() == 2.5, fb
        assert fb.column("nb")[0].as_py() is False, fb
        assert fb.column("gt")[0].as_py() is True, fb

        # float32 binds by decimal value, not by widened binary32 bits:
        # 0.1f widened bitwise is 0.10000000149…, which would miss the
        # equality below
        import numpy as np
        f32 = conn.sql("SELECT :f = 0.1 AS eq, :f AS v",
                       params={"f": np.float32(0.1)})
        assert f32.column("eq")[0].as_py() is True, f32.to_pydict()
        assert f32.column("v")[0].as_py() == 0.1, f32.to_pydict()

        # DECIMAL: scale survives the bind (decimal128(4,3) -> DECIMAL(4,3))
        from decimal import Decimal
        dec = conn.sql(
            "SELECT :d AS v, :d = CAST(1.250 AS DECIMAL(4,3)) AS eq, "
            ":d + 1 AS plus",
            params={"d": Decimal("1.250")})
        assert dec.column("v")[0].as_py() == Decimal("1.250"), dec.to_pydict()
        assert dec.column("eq")[0].as_py() is True, dec.to_pydict()
        assert dec.column("plus")[0].as_py() == Decimal("2.250"), dec.to_pydict()

        # DATE: date32 days — decoded as anything but days this is
        # 1970-01-20 (days-as-millis) or garbage; leap day pins it
        import datetime as dt
        day = conn.sql(
            "SELECT :dt AS d, year(:dt) AS y, datediff(:dt, DATE'2024-02-28') AS dd",
            params={"dt": dt.date(2024, 2, 29)})
        assert day.column("d")[0].as_py() == dt.date(2024, 2, 29), day.to_pydict()
        assert day.column("y")[0].as_py() == 2024, day.to_pydict()
        assert day.column("dd")[0].as_py() == 1, day.to_pydict()

        # TIMESTAMP (naive -> TIMESTAMP_NTZ): microsecond precision —
        # a micros-vs-millis unit slip shifts this by 1000x and drops
        # the 789123 tail
        naive = dt.datetime(2024, 3, 1, 12, 34, 56, 789123)
        ts = conn.sql(
            "SELECT :ts AS t, date_part('SECOND', :ts) AS sec",
            params={"ts": naive})
        assert ts.column("t")[0].as_py() == naive, ts.to_pydict()
        assert float(ts.column("sec")[0].as_py()) == 56.789123, ts.to_pydict()

        # TIMESTAMP (tz-aware -> TIMESTAMP WITH TZ): instant preserved
        aware = dt.datetime(2024, 3, 1, 12, 34, 56, 789123,
                            tzinfo=dt.timezone.utc)
        tz = conn.sql("SELECT :ts AS t", params={"ts": aware})
        got = tz.column("t")[0].as_py()
        assert got == aware, (got, aware)

        # an unsupported parameter class fails LOUDLY at bind time
        # (INVALID_ARGUMENT naming the parameter), never a silent coercion
        try:
            conn.sql("SELECT :v AS v", params={"v": [1, 2]})
            raise AssertionError("expected QueryError for list param")
        except graft.QueryError as e:
            assert "unsupported parameter type" in str(e), e

        # server-side failures map to QueryError
        try:
            conn.sql("SELECT * FROM no_such_table")
            raise AssertionError("expected QueryError")
        except graft.QueryError:
            pass

        # a parameterized statement against a missing table still fails
        # loudly at CreatePreparedStatement time
        try:
            conn.sql("SELECT * FROM no_such_table WHERE x = :v",
                     params={"v": 1})
            raise AssertionError("expected QueryError")
        except graft.QueryError:
            pass

    # bad credentials -> AuthError (gRPC UNAUTHENTICATED)
    try:
        graft.connect("grpc://" + hostport, api_key="wrong-key",
                      mode="flight").sql("SELECT 1 AS x")
        raise AssertionError("expected AuthError")
    except graft.AuthError:
        pass

    # a missing/invalid flight url raises graft's ConnectionError, not a
    # bare ValueError — one catchable hierarchy across modes
    for bad in (None, "ftp://nope"):
        try:
            graft.connect(bad, mode="flight")
            raise AssertionError("expected ConnectionError for %r" % bad)
        except graft.ConnectionError:
            pass

    print("FLIGHT OK")


if __name__ == "__main__":
    main()
