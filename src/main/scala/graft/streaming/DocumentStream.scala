package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming twin of the corpus-curation pipeline: continuous document
  * intake with the same quality gate, exact dedup, and token accounting
  * as the batch operators (`d_corpus_clean` / `d_dedup_exact` /
  * `t_token_count`) — the "ingest the next crawl increment" shape. The
  * reference engine is bounded-only, so this is an extension; the batch
  * twins are the verified semantics and the spec pins stream == batch.
  *
  * Scale notes: the quality gate and hashing are map-only (stateless);
  * exact dedup keeps one 16-byte key per distinct document in state. On
  * an unbounded feed, bound the state with the watermarked variant
  * ([[EventStream.dedupedEvents]] proves
  * `dropDuplicatesWithinWatermark`); the bounded-corpus twin here uses
  * global dedup so the result is exactly comparable to the batch
  * operator.
  */
object DocumentStream {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    // streaming file sources list directories; select just the documents file
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Quality gate → content hash → first-writer-wins exact dedup →
    * token count. Deterministic per document, so stream and batch agree
    * on the surviving SET (which duplicate instance survives is
    * arrival-order-dependent — documents carry identical text when
    * duplicated, so every downstream column here is instance-independent). */
  def cleaned(docs: DataFrame, minChars: Long = 100): DataFrame =
    docs.filter(col("n_chars") >= minChars)
      .withColumn("content_hash", sha2(col("text"), 256))
      .dropDuplicates("content_hash")
      .select(col("content_hash"), col("lang"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"))
}
