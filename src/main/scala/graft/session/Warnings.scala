package graft.session

import scala.collection.mutable

/** Non-fatal query warnings channel returned alongside results — cache
  * hit/miss markers, schema drift notes, defensive-limit notices.
  * Mirrors /root/reference/crates/common/src/warnings.rs:12-75 (collector
  * carried through the session, surfaced in the response envelope).
  */
final class WarningCollector {
  private val buf = mutable.ArrayBuffer.empty[QueryWarning]
  def add(code: String, message: String): Unit =
    synchronized { buf += QueryWarning(code, message) }
  def all: Seq[QueryWarning] = synchronized(buf.toSeq)
  def isEmpty: Boolean = synchronized(buf.isEmpty)
}

final case class QueryWarning(code: String, message: String)

object WarningCodes {
  val CacheHit = "x-graft-cache-hit"
  val CacheMiss = "x-graft-cache-miss"
  val DefensiveLimit = "x-graft-defensive-limit"
  val SchemaDrift = "x-graft-schema-drift"
}
