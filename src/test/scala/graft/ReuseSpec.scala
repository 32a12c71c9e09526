package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.util.Reuse — the shared materializer for relations consumed
  * more than once: local mode cuts lineage with a lazy localCheckpoint;
  * cluster mode keeps lineage and persists MEMORY_AND_DISK so an
  * executor loss recomputes instead of killing the query. */
class ReuseSpec extends AnyFunSuite {
  import SparkTestSession._

  private def base = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .filter(org.apache.spark.sql.functions.col("k") > 1)
  }

  test("local mode: lazy localCheckpoint (LogicalRDD leaf, same rows)") {
    val m = graft.util.Reuse.materialize(base, local = true)
    try {
      // lineage is cut: the analyzed plan bottoms out in an RDD scan
      assert(m.queryExecution.analyzed.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
        m.queryExecution.analyzed.toString)
      assert(m.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    } finally m.unpersist(blocking = true)
  }

  test("cluster mode: persist keeps lineage (recomputable) + same rows") {
    val m = graft.util.Reuse.materialize(base, local = false)
    try {
      assert(m.storageLevel.useDisk, "expected MEMORY_AND_DISK persist")
      assert(m.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
      // lineage survives: the plan still reaches the original leaves,
      // so a lost cached block recomputes from the source
      assert(m.queryExecution.analyzed.collectLeaves().forall(
        !_.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
        m.queryExecution.analyzed.toString)
    } finally m.unpersist(blocking = true)
  }

  test("default mode on a local session is the checkpoint path") {
    val m = graft.util.Reuse.materialize(base)
    try assert(m.queryExecution.analyzed.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]))
    finally m.unpersist(blocking = true)
  }
}
