package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming twin of the corpus-curation pipeline SHAPE: continuous
  * document intake with a quality gate, content-hash exact dedup, and
  * token accounting — the "ingest the next crawl increment" stages. The
  * stage DEFINITIONS here are deliberately simple (length gate, sha-256
  * hash, whitespace tokens); the registered batch operators carry the
  * richer, oracle-verified semantics (`d_corpus_clean`'s quality score,
  * `d_dedup_exact`'s normalized md5 keys), and what the spec pins is
  * that THIS pipeline produces identical results run as a stream or as
  * a batch over the same corpus. The reference engine is bounded-only,
  * so streaming is an extension either way.
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

  /** Streaming count-min sketch over the document feed — the SAME
    * 4×1024 row-hash definition as the batch `t_heavy_hitters_cms`
    * (fmix63(porthash63(w) XOR r) % 1024), maintained as a streaming
    * aggregation keyed by (r, slot). The state IS the sketch: at most
    * 4096 counters no matter how much text flows past, which is the
    * whole point of a sketch on an unbounded feed — frequency tracking
    * with constant state where exact counting needs vocabulary-sized
    * state. Counters merge by addition, so micro-batches (and, on a
    * cluster, partial aggregates) fold in associatively; run with
    * outputMode("complete") to read the live sketch. Word extraction
    * uses the registered operators' normalization contract. The spec
    * pins stream == batch counter-for-counter and that heavy hitters
    * derived from the streamed sketch equal the batch query's. */
  def cmsCounters(docs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    graft.operators.TextPipeline.withNorm(docs)
      .select(explode(col("words")).as("w"))
      .filter(col("w") =!= "")
      .select(col("w"), explode(lit(Array(0, 1, 2, 3))).as("r"))
      .withColumn("slot",
        expr("graft_fmix63(graft_porthash63(w) ^ CAST(r AS BIGINT)) % 1024"))
      .groupBy(col("r"), col("slot"))
      .agg(count(lit(1)).cast("bigint").as("sc"))
  }
}
