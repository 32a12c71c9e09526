package org.apache.spark.sql.jdbc

/** Derby dialect with federation capabilities switched on.
  *
  * Lives in the spark.jdbc package because DerbyDialect is package-private
  * at the Scala level; this shim only overrides capability flags and the
  * fetch-clause syntax, inheriting every Derby type quirk. See
  * graft.sources.DerbyFederationDialect for the rationale and entry point.
  */
private[jdbc] class GraftDerbyDialect extends DerbyDialect {
  override def supportsJoin(): Boolean = true
  override def supportsLimit(): Boolean = true
  override def supportsOffset(): Boolean = true
  // Derby has no LIMIT keyword; fetch-clause syntax
  override def getLimitClause(limit: Integer): String =
    if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""
  override def getOffsetClause(offset: Integer): String =
    if (offset > 0) s"OFFSET $offset ROWS" else ""
}

object GraftDerbyDialect {
  def install(): Unit = {
    JdbcDialects.unregisterDialect(DerbyDialect())
    JdbcDialects.registerDialect(new GraftDerbyDialect)
  }
}
