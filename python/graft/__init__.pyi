"""Typed surface of the graft Python client — the analog of the
reference's PyO3 stub (python/strake/__init__.pyi), describing this
package's own connection classes: HTTP (Arrow IPC bulk endpoint),
Flight SQL (zero-copy remote), and embedded (lifecycle-managed child
JVM)."""

from types import TracebackType
from typing import Any, Dict, List, Optional, Sequence, Tuple, Type

import pyarrow

class GraftError(Exception): ...
class ConnectionError(GraftError): ...
class QueryError(GraftError): ...
class AuthError(GraftError): ...

def connect(
    url: Optional[str] = None,
    api_key: Optional[str] = None,
    timeout: float = 60.0,
    trace_dir: Optional[str] = None,
    mode: Optional[str] = None,
    config: Optional[str] = None,
    data_dir: Optional[str] = None,
    boot_timeout: float = 180.0,
) -> "GraftConnection | FlightConnection":
    """Connect to a graft server.

    - ``url=None`` or ``mode="embedded"``: boot a child-JVM engine.
    - ``mode="flight"`` or a ``grpc://`` url: Arrow Flight SQL remote.
    - otherwise: HTTP serving endpoint.
    """
    ...

class GraftConnection:
    last_warnings: List[str]
    def __init__(self, url: str, api_key: Optional[str] = None,
                 timeout: float = 60.0,
                 trace_dir: Optional[str] = None) -> None: ...
    def sql(self, query: str,
            params: Optional[Dict[str, Any]] = None) -> pyarrow.Table: ...
    def sql_rows(self, query: str, params: Optional[Dict[str, Any]] = None
                 ) -> Tuple[List[str], List[List[Any]], List[str]]: ...
    def trace(self, query: str) -> str: ...
    def schema(self, query: str) -> List[Dict[str, Any]]: ...
    def trace_run(self, query: str,
                  params: Optional[Dict[str, Any]] = None) -> Dict[str, Any]: ...
    def describe(self, table_name: Optional[str] = None) -> str: ...
    def tables(self, catalog: Optional[str] = None,
               db_schema_filter_pattern: Optional[str] = None,
               table_name_filter_pattern: Optional[str] = None,
               table_types: Sequence[str] = (),
               include_schema: bool = True) -> pyarrow.Table: ...
    def run_python(self, script: str,
                   timeout_secs: Optional[float] = None) -> Dict[str, Any]: ...
    def close(self) -> None: ...
    def __enter__(self) -> "GraftConnection": ...
    def __exit__(self, exc_type: Optional[Type[BaseException]],
                 exc_value: Optional[BaseException],
                 traceback: Optional[TracebackType]) -> None: ...

class FlightConnection:
    """Arrow Flight SQL remote: GetFlightInfo plans, DoGet streams
    record batches as zero-copy ``pyarrow.Table``s."""
    last_warnings: List[str]
    def __init__(self, url: str, api_key: Optional[str] = None,
                 timeout: float = 60.0,
                 trace_dir: Optional[str] = None) -> None: ...
    def sql(self, query: str,
            params: Optional[Dict[str, Any]] = None) -> pyarrow.Table: ...
    def sql_rows(self, query: str, params: Optional[Dict[str, Any]] = None
                 ) -> Tuple[List[str], List[List[Any]], List[str]]: ...
    def schema(self, query: str) -> List[Dict[str, Any]]: ...
    def tables(self, catalog: Optional[str] = None,
               db_schema_filter_pattern: Optional[str] = None,
               table_name_filter_pattern: Optional[str] = None,
               table_types: Sequence[str] = (),
               include_schema: bool = True) -> pyarrow.Table: ...
    def close(self) -> None: ...
    def __enter__(self) -> "FlightConnection": ...
    def __exit__(self, exc_type: Optional[Type[BaseException]],
                 exc_value: Optional[BaseException],
                 traceback: Optional[TracebackType]) -> None: ...

class EmbeddedConnection(GraftConnection):
    def __init__(self, config: Optional[str] = None,
                 data_dir: Optional[str] = None, timeout: float = 60.0,
                 trace_dir: Optional[str] = None,
                 boot_timeout: float = 180.0) -> None: ...
