package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training pipeline runs
  * after cleaning: context-window chunking, PII redaction, and
  * repetition-based quality filters (the Gopher/C4 rule family).
  *
  * All three are DuckDB-oracled. Scale shapes: chunking and redaction
  * are map-only (no shuffle — they scale with scan bandwidth);
  * repetition aggregates per-document n-grams with map-side combine,
  * shuffling only (doc_id, gram-hash, count) partials.
  */
object CorpusOps {

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  private val normSqlDuck =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm", org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.NormalizeText(
          org.apache.spark.sql.GraftColumnBridge.expression(col("text")))))
      .withColumn("words", split(col("norm"), " "))

  /** Chunk geometry: 64-token windows, stride 48 (16-token overlap) —
    * the sliding-context shape every LM data pipeline cuts. */
  private val ChunkLen = 64
  private val Stride = 48

  // PII patterns shared verbatim by both engines (RE2 and java.util.regex
  // agree on this subset: char classes, bounded repetition, no
  // backreferences). Spark's SQL string literals process backslash
  // escapes (DuckDB's and the Scala function API don't), so patterns
  // embedded in expr() text double theirs — '\.' would otherwise
  // silently become '.' and match every character.
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+[0-9][0-9() -]{7,}[0-9]"
  private def sqlPat(p: String): String = p.replace("\\", "\\\\")

  val defs: Seq[GraftQuery] = Seq(

    // ------------------------------------------------ context-window chunking
    // Sliding 64-token windows with 16-token overlap per document: the
    // map-only explode every training-data pipeline runs to cut documents
    // into model-context-sized pieces. Output carries the chunk hash (not
    // the text) so downstream chunk-level dedup joins ship 16-byte keys.
    GraftQuery("d_chunk_windows",
      s"""WITH w AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS ws FROM documents),
         |starts AS (SELECT doc_id, ws, unnest(range(0, len(ws), $Stride)) AS s FROM w)
         |SELECT doc_id,
         |  CAST(s / $Stride AS BIGINT) AS chunk_idx,
         |  CAST(s AS BIGINT) AS chunk_start,
         |  CAST(least(len(ws) - s, $ChunkLen) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(ws[s + 1 : s + $ChunkLen], ' ')) AS chunk_hash
         |FROM starts""".stripMargin) { (s, dir) =>
      withNorm(t(s, dir).documents)
        .withColumn("n_tokens", size(col("words")))
        .select(col("doc_id"), col("words"), col("n_tokens"),
          explode(expr(s"sequence(0, n_tokens - 1, $Stride)")).as("s"))
        .select(col("doc_id"),
          (col("s") / Stride).cast("bigint").as("chunk_idx"),
          col("s").cast("bigint").as("chunk_start"),
          least(col("n_tokens") - col("s"), lit(ChunkLen)).cast("bigint")
            .as("n_chunk_tokens"),
          md5(expr(s"concat_ws(' ', slice(words, s + 1, $ChunkLen))"))
            .as("chunk_hash"))
    },

    // ---------------------------------------------------------- PII redaction
    // Email/phone scrubbing over the corpus: match counts plus the hash
    // of the redacted text (both engines compute the identical
    // replacement, so the hash proves the rewritten BYTES agree, not just
    // the counts). Map-only; patterns restricted to the regex subset
    // RE2 and java.util.regex interpret identically.
    GraftQuery("t_pii_redact",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailPat')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$PhonePat')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(text, '$EmailPat', '<EMAIL>', 'g'),
         |      '$PhonePat', '<PHONE>', 'g')) AS redacted_hash
         |FROM documents""".stripMargin) { (s, dir) =>
      t(s, dir).documents.select(
        col("doc_id"),
        size(expr(s"regexp_extract_all(text, '${sqlPat(EmailPat)}', 0)"))
          .cast("bigint").as("n_emails"),
        size(expr(s"regexp_extract_all(text, '${sqlPat(PhonePat)}', 0)"))
          .cast("bigint").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("text"), EmailPat, "<EMAIL>"),
          PhonePat, "<PHONE>")).as("redacted_hash"))
    },

    // ------------------------------------------------- repetition filters
    // The Gopher-style repetition signals: type-token ratio (distinct
    // words / words) and top-bigram fraction (occurrences of the most
    // frequent word 2-gram / total 2-grams). Boilerplate and degenerate
    // generations score high on the bigram fraction and low on TTR.
    // Shape: entirely MAP-ONLY — each document's statistics depend only
    // on its own words, so the fused graft_gram_stats pass replaces the
    // explode → two-shuffle bigram aggregation (which shipped every gram
    // string in the corpus through an exchange, twice).
    GraftQuery("t_repetition",
      s"""WITH w AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS ws FROM documents),
         |base AS (SELECT doc_id, len(ws) AS n_words,
         |           len(list_distinct(ws)) AS n_distinct, ws FROM w),
         |grams AS (SELECT doc_id,
         |            unnest(list_transform(range(1, len(ws)),
         |              i -> ws[i] || ' ' || ws[i + 1])) AS gram
         |          FROM w WHERE len(ws) >= 2),
         |counts AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
         |top AS (SELECT doc_id, max(c) AS top_c, sum(c) AS total_c
         |        FROM counts GROUP BY doc_id)
         |SELECT b.doc_id,
         |  CAST(b.n_words AS BIGINT) AS n_words,
         |  round(CAST(b.n_distinct AS DOUBLE) / b.n_words, 6) AS ttr,
         |  CAST(coalesce(top.top_c, 0) AS BIGINT) AS top_bigram_count,
         |  round(CASE WHEN top.total_c IS NULL THEN 0.0
         |        ELSE CAST(top.top_c AS DOUBLE) / top.total_c END, 6) AS top_bigram_frac
         |FROM base b LEFT JOIN top ON b.doc_id = top.doc_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      withNorm(t(s, dir).documents)
        .withColumn("st", expr("graft_gram_stats(words)"))
        .select(col("doc_id"),
          size(col("words")).cast("bigint").as("n_words"),
          round(expr("st[0]").cast("double") / size(col("words")), 6).as("ttr"),
          expr("st[1]").as("top_bigram_count"),
          round(when(expr("st[2]") === 0, 0.0)
            .otherwise(expr("st[1]").cast("double") / expr("st[2]")), 6)
            .as("top_bigram_frac"))
    }
  )
}
