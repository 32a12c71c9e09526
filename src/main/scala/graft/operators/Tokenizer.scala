package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer training over the corpus — byte-pair encoding (Sennrich,
  * Haddow, Birch 2016), the stage that turns a cleaned corpus into the
  * vocabulary a training run tokenizes with.
  *
  * Distributed shape (100 TB of documents): BPE trains on the WORD
  * FREQUENCY table, not the raw corpus — one map-side-combined
  * aggregate reduces the corpus to a vocabulary-sized relation, and
  * every merge iteration touches only that relation (pair counts are a
  * map-side-combinable aggregate over it; the argmax pair is a 1-row
  * TakeOrdered). The merge choice itself is inherently sequential —
  * each step conditions on the last — so the step loop runs on the
  * driver over vocabulary-sized intermediates, the same structure as
  * the reference era's distributed BPE trainers.
  *
  * Cross-engine exactness: the greedy left-to-right re-segmentation is
  * ONE string-fold algorithm expressed identically in Spark
  * (`aggregate` over the symbol array) and DuckDB (`list_reduce`), so
  * the oracle re-derives the full merge table — argmax, tie order
  * (count desc, pair asc), and all — through chained CTE stages (the
  * d_dup_pagerank pattern for iterative algorithms). Words segment as
  * characters plus the `_` end-of-word symbol (the normalized alphabet
  * is a-z0-9 + space, so `_` cannot collide).
  */
object Tokenizer {

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  private[graft] val BpeSteps = 6

  /** The greedy merge fold, as a SQL expression over a `seg` column with
    * the pair (w1, w2) available as columns — IDENTICAL text semantics
    * in Spark and DuckDB modulo the fold builtin's name. */
  private def mergeFoldSpark: String =
    """CASE WHEN size(split(seg, ' ')) < 2 THEN seg ELSE
      |  aggregate(slice(split(seg, ' '), 2, size(split(seg, ' ')) - 1),
      |    element_at(split(seg, ' '), 1), (acc, x) ->
      |    CASE WHEN x = w2 AND (acc = w1 OR right(acc, length(w1) + 1) = concat(' ', w1))
      |         THEN concat(left(acc, length(acc) - length(w1)), w1, w2)
      |         ELSE concat(acc, ' ', x) END) END""".stripMargin

  /** The shared CTE chain `w, wf0, (sym/px/pc/best/wf)×steps` ending in
    * `wf$BpeSteps(word, freq, seg)` — reused by both the train and the
    * encode oracles. */
  private def bpeCtes: String = {
    val norm = TextPipeline.normSqlDuck
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"""w AS (SELECT unnest(string_split($norm, ' ')) AS word FROM documents),
         |wf0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
         |  array_to_string(string_split(word, ''), ' ') || ' _' AS seg
         |  FROM w WHERE word <> '' GROUP BY word)""".stripMargin)
    for (i <- 1 to BpeSteps) {
      val p = i - 1
      ctes += s"""sym$i AS (SELECT freq, string_split(seg, ' ') AS sym FROM wf$p),
         |px$i AS (SELECT freq, sym, unnest(range(1, len(sym))) AS j
         |         FROM sym$i WHERE len(sym) >= 2),
         |pc$i AS (SELECT sym[j] AS w1, sym[j + 1] AS w2,
         |           CAST(sum(freq) AS BIGINT) AS c
         |         FROM px$i GROUP BY 1, 2),
         |best$i AS (SELECT w1, w2, c FROM pc$i ORDER BY c DESC, w1, w2 LIMIT 1),
         |wf$i AS (SELECT word, freq,
         |  CASE WHEN b.w1 IS NULL OR len(string_split(seg, ' ')) < 2 THEN seg ELSE
         |    list_reduce(string_split(seg, ' '), (acc, x) ->
         |      CASE WHEN x = b.w2 AND (acc = b.w1 OR
         |             right(acc, length(b.w1) + 1) = ' ' || b.w1)
         |           THEN left(acc, length(acc) - length(b.w1)) || b.w1 || b.w2
         |           ELSE acc || ' ' || x END) END AS seg
         |  FROM wf$p LEFT JOIN best$i b ON TRUE)""".stripMargin
    }
    ctes.mkString(",\n")
  }

  private def bpeTrainOracle: String = {
    val arms = (1 to BpeSteps).map(i =>
      s"SELECT $i AS step, w1, w2, w1 || w2 AS merged, c AS pair_count FROM best$i")
      .mkString("\nUNION ALL ")
    "WITH " + bpeCtes + "\n" + arms
  }

  private def bpeEncodeOracle: String =
    s"""WITH $bpeCtes,
       |docw AS (SELECT doc_id, unnest(string_split(${TextPipeline.normSqlDuck}, ' ')) AS word
       |         FROM documents),
       |dw AS (SELECT doc_id, word FROM docw WHERE word <> '')
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(string_split(f.seg, ' '))) AS BIGINT) AS n_bpe_tokens
       |FROM dw JOIN wf$BpeSteps f USING (word)
       |GROUP BY doc_id""".stripMargin

  /** Merge tables already trained this session, per (session, corpus
    * dir) — t_bpe_train and t_bpe_encode share one training run instead
    * of each paying the corpus pass and the 6 argmax jobs. Corpus dirs
    * are immutable for a session's lifetime (testdata and spec temp
    * dirs are write-once), which is what makes the memo sound. Weak on
    * the session so a stopped session doesn't pin its tables. */
  private val trained = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Seq[(Int, String, String, Long)]]]())

  private def trainBpe(s: SparkSession,
      dir: String): Seq[(Int, String, String, Long)] = {
    val per = trained.computeIfAbsent(s,
      _ => scala.collection.concurrent.TrieMap.empty)
    per.getOrElseUpdate(dir, trainBpeUncached(s, dir))
  }

  /** Run the driver-side training loop: word-frequency table (the one
    * corpus pass), then `BpeSteps` argmax-pair + greedy-re-segment
    * iterations over the vocabulary-sized relation. Returns the ordered
    * merge table. */
  private def trainBpeUncached(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    var wf = TextPipeline.withNorm(t(s, dir).documents)
      .select(explode(col("words")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).cast("bigint").as("freq"))
      .withColumn("seg",
        expr("concat(concat_ws(' ', split(word, '')), ' _')"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    for (step <- 1 to BpeSteps) {
      val pairs = wf
        .select(col("freq"), split(col("seg"), " ").as("sym"))
        .filter(size(col("sym")) >= 2)
        .select(col("freq"),
          col("sym"), explode(expr("sequence(1, size(sym) - 1)")).as("j"))
        .select(col("freq"), expr("sym[j - 1]").as("w1"),
          expr("sym[j]").as("w2"))
        .groupBy(col("w1"), col("w2"))
        .agg(sum(col("freq")).cast("bigint").as("c"))
      // the argmax pair: a 1-row TakeOrdered — the single sequential
      // decision each BPE step makes
      val best = pairs.orderBy(col("c").desc, col("w1"), col("w2"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (w1, w2, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, w1, w2, c))
        // re-segment every word with the greedy fold; the pair rides as
        // columns so the fold text stays identical to the oracle's
        wf = wf
          .withColumn("w1", lit(w1)).withColumn("w2", lit(w2))
          .withColumn("seg2", expr(mergeFoldSpark))
          .select(col("word"), col("freq"), col("seg2").as("seg"))
          .localCheckpoint(false) // vocab-sized; truncates the fold lineage
      }
    }
    merges.toSeq
  }

  val defs: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------ BPE training
    GraftQuery("t_bpe_train", bpeTrainOracle) { (s, dir) =>
      import s.implicits._
      trainBpe(s, dir).map { case (st, w1, w2, c) =>
        (st, w1, w2, w1 + w2, c)
      }.toDF("step", "w1", "w2", "merged", "pair_count")
    },

    // ------------------------------------------------------ BPE encoding
    // Tokenize the corpus under the learned merges and report per-doc
    // token counts — the number a token-budget sampler or packing stage
    // actually consumes. Training happens once on the vocabulary
    // (trainBpe); the corpus pass is MAP-ONLY through the codegen'd
    // graft.functions.BpeTokenCount kernel (merge table as one reference
    // object, O(word-length x merges) per row, no shuffle at all until
    // the driver-visible result). The oracle re-derives the same counts
    // by joining each document's words to the training chain's final
    // per-word segmentation — one algorithm, two independent routes to
    // the token count.
    GraftQuery("t_bpe_encode", bpeEncodeOracle) { (s, dir) =>
      val merges = trainBpe(s, dir)
        .map { case (_, w1, w2, _) => Array(w1, w2) }.toArray
      TextPipeline.withNorm(t(s, dir).documents)
        .select(col("doc_id"),
          when(col("norm") === "", lit(0))
            .otherwise(size(col("words"))).cast("bigint").as("n_words"),
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.functions.BpeTokenCount(
              org.apache.spark.sql.GraftColumnBridge.expression(col("words")),
              merges)).as("n_bpe_tokens"))
        .filter(col("n_words") > 0)
    }
  )
}
