package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization for a relation consumed more than once in one query
  * (guide §5 caching / §3.3 plan truncation).
  *
  * In `local[N]`, a LAZY `localCheckpoint` is the cheapest lineage cut:
  * executor-local blocks, no replication, and "executor loss" cannot
  * happen separately from JVM death, so the non-recoverability of
  * truncated lineage costs nothing.
  *
  * On a real cluster that trade reverses: a localCheckpointed block
  * lives ONLY on the executor that computed it, so one executor loss
  * makes every consumer fail with "lineage truncated and cannot be
  * recomputed" — at 100 TB a multi-hour query dies for one lost
  * container. There the reused relation is persisted MEMORY_AND_DISK
  * instead: same single-computation sharing (the first consumer fills
  * the cache), full lineage kept, so a lost block recomputes from the
  * parquet inputs instead of killing the query.
  */
object Reuse {

  /** Cut-or-cache `df` for multi-consumer reuse; mode picked from the
    * session's master (see class doc). */
  def materialize(df: DataFrame): DataFrame =
    materialize(df, df.sparkSession.sparkContext.isLocal)

  /** Mode-explicit variant (unit-testable both ways on one session). */
  private[graft] def materialize(df: DataFrame, local: Boolean): DataFrame =
    if (local) df.localCheckpoint(eager = false)
    else df.persist(StorageLevel.MEMORY_AND_DISK)
}
