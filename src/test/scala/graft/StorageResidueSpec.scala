package graft

import org.scalatest.funsuite.AnyFunSuite

/** The no-residue storage gate: a registry row may persist/checkpoint
  * whatever it needs WHILE computing, but after its action completes
  * the only storage left in the session must be backing the RESULT it
  * returned (localCheckpoint leaves inside the returned plan — those
  * are released by the ContextCleaner when the caller drops the
  * DataFrame). Anything else is a leak the r17 ADVICE class caught by
  * hand in dupClusterLabels: a cached pair relation nobody unpersists
  * taxes every later query's memory until the session dies, and
  * `Bench.dropResidue` hides the bug from the benchmark loop. This
  * spec mechanizes the check over the rows that exercise every
  * persist/checkpoint site family: driver-gated union-find + pagerank
  * (persist + RDD cache), gram-relation reuse (lazy localCheckpoint),
  * tokenizer training (memoized checkpoint with eviction detection),
  * and the eager-checkpoint iteration shapes in Extended. */
class StorageResidueSpec extends AnyFunSuite {
  import SparkTestSession._

  /** RDD ids the returned plan legitimately pins: every LogicalRDD
    * leaf (a localCheckpoint surfaces as one). */
  private def plannedRddIds(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet

  private val rows = Seq(
    "d_dup_clusters",      // measured gate: persist + driver union-find / RDD pointer-doubling
    "d_dup_pagerank",      // persist + count probe + driver/distributed split
    "d_repeated_ngrams",   // lazy localCheckpoint feeding two consumers
    "d_minhash_lsh_pairs", // banded LSH candidate generation
    "t_bpe_train",         // sample-bounded training with memoized checkpoints
    "q_join_asof",         // Extended's eager localCheckpoint shape
    "s_knn_join")          // bucketed self-join + bounded training collect

  rows.foreach { name =>
    test(s"$name leaves no storage residue beyond its returned result") {
      // clean slate: another suite's (or row's) legitimate result
      // checkpoints must not fail this row
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.count() > 0, s"$name returned no rows at smoke scale")
      val allowed = plannedRddIds(df)
      val residue = spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => allowed.contains(id) }
      assert(residue.isEmpty,
        s"$name leaked ${residue.size} persisted RDD(s) not referenced " +
          s"by its result: ${residue.map { case (id, r) =>
            s"#$id ${r.name} [${r.getStorageLevel.description}]" }
            .mkString("; ")}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
  }
}
