package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextPipeline

/** Streaming twin of the MinHash-LSH near-duplicate pipeline: ONLINE
  * near-dup detection over a continuous document feed. Each arriving
  * document is shingled, minhashed, and banded with the SAME codegen'd
  * expressions and the same shared banding definition as the batch
  * operator ([[TextPipeline.minhashBandedFromRaw]] — one contract, two
  * execution modes), then checked against per-(band, bucket) state: a
  * collision emits the candidate pair the moment its second member
  * arrives. This is the "dedup the next crawl increment against
  * everything already ingested" stage run as a stream instead of a
  * nightly batch.
  *
  * Scale shape: the signature pipeline is map-only (stateless);
  * detection state is keyed by (band, bucket) — the same key the batch
  * self-join shuffles on — and holds ONLY doc ids (8 bytes each, at
  * most `cap` per bucket), never text, shingles, or signatures. State
  * is naturally partitioned across executors by the bucket key, so a
  * hot boilerplate bucket is one bounded state entry, not a driver
  * structure.
  *
  * Cap semantics vs batch, stated honestly: the batch operator drops a
  * bucket that ends up OVER the cap entirely (its size is known after
  * aggregation); an online detector cannot know a bucket's final size,
  * so it stops admitting members past the cap instead — the first `cap`
  * members still pair. On corpora whose buckets stay under the cap
  * (every corpus in this repo's fixtures — the cap is a degenerate-skew
  * guard, not a tuning knob) the two definitions coincide, which is
  * what the spec pins.
  */
object NearDupStream {

  /** Candidate near-dup pairs (id_a < id_b, distinct across bands) from
    * a streaming documents DataFrame (doc_id, text). Emitted in the
    * micro-batch where the later member of a pair arrives. */
  def candidatePairs(docs: DataFrame, cap: Int = 200): Dataset[(Long, Long)] = {
    val spark = docs.sparkSession
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    TextPipeline.minhashBandedFromRaw(docs)
      .select("doc_id", "band", "bucket").as[(Long, Int, Long)]
      .groupByKey { case (_, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows: Iterator[(Long, Int, Long)],
            state: GroupState[Seq[Long]]) =>
          var members = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[(Long, Long)]
          // ascending id order within the batch: replays of a batch see
          // the same rows, so emission is deterministic per micro-batch
          rows.map(_._1).toSeq.distinct.sorted.foreach { id =>
            if (members.size < cap && !members.contains(id)) {
              members.foreach(o =>
                out += ((math.min(o, id), math.max(o, id))))
              members = members :+ id
            }
          }
          state.update(members)
          out.result().iterator
      }
      .dropDuplicates("_1", "_2") // a pair can collide in several bands
      .withColumnRenamed("_1", "id_a").withColumnRenamed("_2", "id_b")
      .as[(Long, Long)]
  }
}
