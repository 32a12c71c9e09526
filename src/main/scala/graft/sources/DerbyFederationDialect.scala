package graft.sources

/** Derby JDBC dialect with federation features enabled.
  *
  * Spark's stock DerbyDialect leaves `supportsJoin`/`supportsLimit`/
  * `supportsOffset` off, so co-located multi-table joins never collapse
  * into one remote statement. The replacement dialect
  * (org.apache.spark.sql.jdbc.GraftDerbyDialect — package-located there
  * because DerbyDialect is package-private) turns the capabilities on
  * while inheriting every Derby type/syntax quirk — the Spark-native
  * analog of the reference's per-dialect SQL generation for federated
  * pushdown (/root/reference/crates/sql/src/sql_generator/dialect.rs and
  * the same-compute-context subplan grouping in
  * crates/runtime/src/federation.rs:232).
  *
  * Registration also unregisters the builtin: when multiple dialects
  * match a URL, JdbcDialects falls back to an AggregatedDialect that
  * reports no join support — the capability only takes effect when
  * exactly one dialect claims the URL.
  */
object DerbyFederationDialect {
  @volatile private var registered = false
  def register(): Unit = synchronized {
    if (!registered) {
      org.apache.spark.sql.jdbc.GraftDerbyDialect.install()
      registered = true
    }
  }
}
