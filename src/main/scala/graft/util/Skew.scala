package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join splitting (on by default in the engine sessions)
  * handles most skew at runtime; explicit salting remains the tool when
  * one build-side key dominates so heavily that even split partitions
  * overwhelm a task, or when AQE is unavailable (streaming joins).
  *
  * `saltedJoin` replicates the (small) right side `saltBuckets` times and
  * scatters the left side's hot keys across the replicas:
  *
  *   left.salt  = pmod(hash(monotonic row marker), buckets)
  *   right      = right × explode(0..buckets-1)
  *   join key   = (key, salt)
  *
  * Row-identical to the plain join (verified by spec), with the shuffle's
  * max partition size reduced by ~buckets for the hot keys. At 100 TB
  * this is the difference between one straggler task holding the stage
  * and uniform task runtimes.
  */
object Skew {

  /** Join types for which salting preserves row-identical results. Outer
    * joins on the right/full side are excluded: the exploded right side
    * would emit each unmatched right row once per salt bucket. */
  private val saltableJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "semi", "anti")

  def saltedJoin(left: DataFrame, right: DataFrame,
      joinKey: String, saltBuckets: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(saltableJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin does not preserve '$joinType' semantics: unmatched right " +
        "rows would be replicated once per salt bucket; use inner/left/semi/anti")
    val saltCol = "__graft_salt"
    // per-row scatter by position, NOT by content: a true hot key often
    // repeats identical rows, and hashing row content would send them all
    // to one bucket (defeating the salt entirely)
    val leftSalted = left.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val rightExploded = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    // pin a shuffled join: salting only exists because the right side is
    // too big to broadcast — letting stats pick a broadcast here (as they
    // would at test scale) would silently discard the salt's effect
    leftSalted.join(rightExploded.hint("shuffle_hash"),
        Seq(joinKey, saltCol), joinType)
      .drop(saltCol)
  }

  /** Top-k heavy-hitter keys with counts — the diagnosis step before
    * deciding to salt. Single aggregation pass. */
  def heavyHitters(df: DataFrame, key: String, k: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(k)
}
