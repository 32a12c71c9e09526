package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level semantics of the corpus-preparation operators: the corpus
  * itself is synthetic (no PII, bounded repetition), so these specs pin
  * behavior on constructed inputs while the DuckDB oracle pins
  * cross-engine parity on the corpus. */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("chunk windows tile every document with stride 48 and 64-token caps") {
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"),
        size(split(expr(
          "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' +', ' '))"),
          " ")).as("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = run("d_chunk_windows").collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (docId, cs) =>
      val n = docs(docId)
      val sorted = cs.sortBy(_.getLong(2))
      // starts are 0, 48, 96, ... strictly below n
      assert(sorted.map(_.getLong(2)).toSeq ==
        (0L until n.toLong by 48L).toSeq, s"doc $docId starts")
      // every chunk is capped at 64 tokens and the tail is exact
      sorted.foreach { c =>
        val start = c.getLong(2); val len = c.getLong(3)
        assert(len == math.min(64L, n - start), s"doc $docId start $start")
      }
      // consecutive chunks overlap by 16 tokens (64 - 48) when full
      assert(sorted.map(_.getLong(1)).toSeq == sorted.indices.map(_.toLong))
    }
  }

  test("gram hashes equal distinct porthash63 of space-joined 5-grams") {
    functions.VectorFunctions.register(spark)
    val rows = Tables(spark, sf).documents.limit(50)
      .select(split(expr("graft_norm(text)"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(
        expr("graft_gram_hashes(ws, 5)").as("fused"),
        array_distinct(expr(
          "transform(sequence(1, size(ws) - 4), " +
            "i -> graft_porthash63(concat_ws(' ', slice(ws, i, 5))))"))
          .as("spelled"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    // short input: fewer words than the gram size → empty, not a crash
    val empty = spark.sql(
      "SELECT graft_gram_hashes(array('a', 'b'), 5) AS g").collect()
    assert(empty.head.getSeq[Long](0).isEmpty)
    // a non-literal gram size is a clear analysis error, not an NPE
    Tables(spark, sf).documents.limit(1).createOrReplaceTempView("gram_docs")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_gram_hashes(array('a'), cast(doc_id AS int))" +
        " FROM gram_docs").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(err).contains("integer literal"), msgs(err))
    val errNull = intercept[Exception] {
      spark.sql("SELECT graft_gram_hashes(array('a'), CAST(NULL AS INT))")
        .collect()
    }
    assert(msgs(errNull).contains("integer literal"), msgs(errNull))
  }

  test("positional gram hashes align index-to-offset and match graft_gram_hashes values") {
    functions.VectorFunctions.register(spark)
    val rows = Tables(spark, sf).documents.limit(50)
      .select(split(expr("graft_norm(text)"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(
        expr("graft_gram_pos_hashes(ws, 5)").as("positional"),
        expr("transform(sequence(1, size(ws) - 4), " +
          "i -> graft_porthash63(concat_ws(' ', slice(ws, i, 5))))")
          .as("spelled"))
      .collect()
    assert(rows.nonEmpty)
    // index i = the gram at offset i, NOT deduplicated
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // fewer words than the gram size → empty, not a crash
    val empty = spark.sql(
      "SELECT graft_gram_pos_hashes(array('a', 'b'), 5) AS g").collect()
    assert(empty.head.getSeq[Long](0).isEmpty)
  }

  test("repeated spans localize cross-doc runs; within-doc repeats don't count") {
    import spark.implicits._
    functions.VectorFunctions.register(spark)
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    val docs = Seq(
      // docs 1 and 2 share a 10-word run at different offsets
      (1L, s"alpha beta gamma $boiler delta epsilon zeta eta theta"),
      (2L, s"one two three four five six $boiler seven"),
      // doc 3 repeats a 6-word phrase INTERNALLY only — cross-doc df
      // stays 1, so no span may be reported for it
      (3L, "p q r s t u x1 x2 x3 p q r s t u y1 y2 y3"),
      (4L, "unrelated words entirely here nothing shared at all today"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = SparkEntry.queries("d_repeated_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the shared 10-word run = 6 consecutive shared positions → len 10
    assert(spans.toSet == Set((1L, 3L, 10L), (2L, 6L, 10L)), spans.toSeq)
    val cov = SparkEntry.queries("d_span_coverage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // coverage reports the same two docs (one region each, 10 words) and
    // nothing for the internally-repeating or unrelated docs
    assert(cov == Set((1L, 1L, 10L), (2L, 1L, 10L)), cov)
  }

  test("span coverage merges overlapping word ranges into one region") {
    import spark.implicits._
    functions.VectorFunctions.register(spark)
    // doc 1 holds "c d e f g h i": grams A = "c d e f g" (pos 1) and
    // B = "e f g h i" (pos 3) both recur in doc 2 — but the BRIDGING
    // gram "d e f g h" (pos 2) does not. Positions 1 and 3 are distinct
    // islands, yet their word ranges [1,5] and [3,7] overlap → coverage
    // must merge them into ONE region of 7 words, not count 10.
    val docs = Seq(
      (1L, "x c d e f g h i y"),
      // doc 2 carries A and B far apart with different context
      (2L, "c d e f g m1 m2 m3 e f g h i"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("spancov").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cov = SparkEntry.queries("d_span_coverage")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: shared positions 1 and 3 (gap ≤ 4) → one merged region of
    // (3+4) − 1 + 1 = 7 words
    assert(cov(1L) == (1L, 7L), cov)
    // doc 2: shared positions 0 and 8 (gap > 4) → two regions, 10 words
    assert(cov(2L) == (2L, 10L), cov)
    // and the spans view drops both docs' sub-threshold 5-word islands
    val spans = SparkEntry.queries("d_repeated_spans")(spark, dir).collect()
    assert(spans.isEmpty, spans.toSeq)
  }

  test("strip spans cuts exactly the covered words and keeps the rest in order") {
    import spark.implicits._
    functions.VectorFunctions.register(spark)
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon zeta eta theta"),
      (2L, s"one two three four five six $boiler seven"),
      (3L, "nothing shared here at all today ok fine"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("strip").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("d_strip_spans")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // doc 1: the 10 boiler words go, the 8 frame words stay in order
    assert(got(1L) == (8L, 10L,
      md5("alpha beta gamma delta epsilon zeta eta theta")), got(1L))
    // doc 2: 7 words remain
    assert(got(2L) == (7L, 10L, md5("one two three four five six seven")))
    // doc 3: untouched — cleaned text IS the normalized text
    assert(got(3L) == (8L, 0L, md5("nothing shared here at all today ok fine")))
  }

  test("pii redaction masks emails and phones, counts match, hash changes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact alice.smith+spam@corp-mail.example.org today"),
      (2L, "call +1 (415) 555-0199 or +44 20 7946 0958 now"),
      (3L, "no pii here, just 12345 and text@ nothing"),
      (4L, "a@b.co and +12345678901 both")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("corpusops_pii_docs")
    // run the same expressions the query uses, over the constructed docs
    val out = graft.operators.CorpusOps.defs.find(_.name == "t_pii_redact").get
    val redacted = docs.select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\+[0-9][0-9() -]{7,}[0-9]", "<PHONE>").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(redacted(1L) == "contact <EMAIL> today")
    assert(redacted(2L) == "call <PHONE> or <PHONE> now")
    assert(redacted(3L) == "no pii here, just 12345 and text@ nothing")
    assert(redacted(4L) == "<EMAIL> and <PHONE> both")
    // the registered query runs over the corpus and counts are consistent
    val rows = run("t_pii_redact").collect()
    assert(rows.length == Tables(spark, sf).documents.count())
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(2) >= 0))
  }

  test("sequence packing tiles each shard without gaps and flags straddles") {
    // the shard count is a parameter (plan + oracle derive from the same
    // value) — pin the invariants at the registry default AND a second
    // count, so the parameterization is exercised, not just plumbed
    val registryRows = run("d_pack_sequences").collect()
    val shardCounts = Seq(
      graft.operators.CorpusOps.DefaultPackShards -> Some(registryRows),
      7 -> None)
    for ((nShards, preRun) <- shardCounts) {
      val rows = preRun
        .getOrElse(graft.operators.CorpusOps
          .packSequencesDf(spark, sf, nShards).collect())
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
      assert(rows.nonEmpty)
      val budget = 2048L
      rows.foreach { case (id, _, shard, _, _, _, _) =>
        assert(shard == id % nShards, s"doc $id shard at $nShards shards")
      }
      rows.groupBy(_._3).foreach { case (shard, docs) =>
        val ordered = docs.sortBy(_._1)
        // offsets tile: each doc starts exactly where the previous ended
        ordered.foldLeft(0L) { case (expected, (id, n, _, start, first, last, nseq)) =>
          assert(start == expected, s"shard $shard doc $id: gap at $start != $expected")
          assert(first == start / budget, s"doc $id seq_first")
          assert(last == (start + n - 1) / budget, s"doc $id seq_last")
          assert(nseq == last - first + 1 && nseq >= 1, s"doc $id n_seqs")
          start + n
        }
        // every straddling doc really crosses a budget boundary
        ordered.filter(d => d._7 > 1).foreach { case (id, n, _, start, _, _, _) =>
          assert(start / budget != (start + n - 1) / budget, s"doc $id straddle")
        }
      }
    }
    // the scaling rule sizes shards from corpus volume
    import graft.operators.CorpusOps.packShardsFor
    assert(packShardsFor(1L) == 1)
    assert(packShardsFor(25L * 1000 * 1000 * 1000 * 1000) == 11642)
  }

  test("repetition: degenerate text maxes the bigram fraction, varied text doesn't") {
    import spark.implicits._
    // mirror the query arithmetic over constructed docs
    def stats(text: String): (Double, Double) = {
      val words = text.toLowerCase.split(" ").toSeq
      val grams = words.sliding(2).map(_.mkString(" ")).toSeq
      val top = if (grams.isEmpty) 0.0
        else grams.groupBy(identity).values.map(_.size).max.toDouble
      (words.distinct.size.toDouble / words.size,
        if (grams.isEmpty) 0.0 else top / grams.size)
    }
    val (ttrRep, fracRep) = stats("buy now buy now buy now buy now")
    val (ttrVar, fracVar) = stats("the quick brown fox jumps over lazy dogs")
    assert(fracRep > 0.4 && fracVar <= 0.2)
    assert(ttrRep < 0.5 && ttrVar == 1.0)
    // the registered query: ttr in (0, 1], fractions in [0, 1], all docs
    val rows = run("t_repetition").collect()
    assert(rows.length == Tables(spark, sf).documents.count())
    rows.foreach { r =>
      val ttr = r.getDouble(2); val frac = r.getDouble(4)
      assert(ttr > 0 && ttr <= 1.0, r.toString)
      assert(frac >= 0 && frac <= 1.0, r.toString)
    }
  }

  test("dup cluster labels: driver union-find and distributed pointer " +
      "doubling produce identical labels and sizes") {
    // dupClusterLabels picks its path on the MEASURED pair count — the
    // bounded verification window takes the driver path; forcing
    // maxDriverPairs = -1 exercises the co-partitioned-RDD pointer
    // doubling on the same corpus. Both must yield the min-doc_id
    // component labels the DuckDB oracle derives.
    def labelSet(maxPairs: Long) =
      operators.CorpusOps.dupClusterLabels(spark, sf,
          maxDriverPairs = maxPairs, withSizes = true)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val driver = labelSet(operators.CorpusOps.DriverCcMaxPairs)
    val dist = labelSet(-1L)
    assert(driver == dist,
      s"paths diverge: only-driver=${(driver -- dist).take(5)} " +
        s"only-dist=${(dist -- driver).take(5)}")
    // non-vacuity: the corpus plants real duplicate clusters — at least
    // one multi-member component and at least one singleton
    assert(driver.exists(_._3 > 1), "no multi-member cluster in fixture")
    assert(driver.exists(_._3 == 1), "no singleton cluster in fixture")
    // every label is the component minimum: the canonical member labels
    // itself, and no member is smaller than its label
    assert(driver.forall { case (d, c, _) => c <= d })
    val canon = driver.filter { case (d, c, _) => d == c }.map(_._1)
    assert(driver.map(_._2).subsetOf(canon), "a cluster_id is not canonical")
  }

  test("pagerank micro-units: driver arithmetic and distributed " +
      "join-iteration produce identical BIGINT ranks") {
    // pageRankMicro picks its path on the MEASURED pair count (the
    // dupClusterLabels gate); forcing maxDriverPairs = -1 runs the
    // five join+agg iterations distributed on the same pair graph.
    // Integer micro-unit arithmetic is summation-order-free, so the
    // two paths must agree bit-for-bit.
    val pairs = spark.createDataFrame(Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // a triangle
      (3L, 4L),                     // a tail off the triangle
      (10L, 11L)                    // a disconnected pair
    )).toDF("u", "v")
    def ranks(maxPairs: Long) =
      operators.CorpusOps.pageRankMicro(spark, pairs, maxPairs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val driver = ranks(operators.CorpusOps.DriverCcMaxPairs)
    val dist = ranks(-1L)
    assert(driver == dist,
      s"paths diverge: only-driver=${(driver -- dist).take(5)} " +
        s"only-dist=${(dist -- driver).take(5)}")
    // non-vacuity + hand-checked structure: every node appears once,
    // the symmetric pair (10, 11) keeps the symmetric rank, and the
    // triangle's well-connected node 3 (deg 3) outranks the tail (4)
    assert(driver.map(_._1) == Set(1L, 2L, 3L, 4L, 10L, 11L))
    val byId = driver.map(t => t._1 -> t._3).toMap
    assert(byId(10L) == byId(11L))
    assert(byId(3L) > byId(4L))
  }

  test("graft_ordered_pairs honors strict u < v on NON-deduped input " +
      "(repeated values compact — no self-loops, no duplicate pairs)") {
    functions.VectorFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_ordered_pairs(array(3L, 1L, 3L, 2L, 1L)) AS ps")
      .selectExpr("explode(ps) AS p").selectExpr("p.u", "p.v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 3L)), out)
    // all-equal input → zero pairs, not a self-loop
    assert(spark.sql(
      "SELECT size(graft_ordered_pairs(array(7L, 7L, 7L))) AS n")
      .head().getInt(0) == 0)
  }

  test("graft_collect_capped saturates at the cap per group (partial " +
      "buffers bounded) and is exact below it") {
    functions.VectorFunctions.register(spark)
    import spark.implicits._
    // group 1: 200 elements over many partitions (merge path exercised);
    // group 2: 3 elements — must come back complete and uncapped
    val rows = (1 to 200).map(i => (1L, i.toLong)) ++
      Seq((2L, 10L), (2L, 20L), (2L, 30L))
    val got = rows.toDF("g", "v").repartition(16)
      .groupBy("g").agg(expr("graft_collect_capped(v, 65)").as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L).length == 65, s"cap not enforced: ${got(1L).length}")
    assert(got(1L).toSet.subsetOf((1L to 200L).toSet))
    assert(got(2L).sorted == Seq(10L, 20L, 30L))
    // the d_dup_pagerank filter shape: a >64-hot group saturates at 65
    // and fails BETWEEN 2 AND 64 exactly like its uncapped count would
    val kept = rows.toDF("g", "v").repartition(16)
      .groupBy("g").agg(expr("graft_collect_capped(v, 65)").as("vs"))
      .filter(org.apache.spark.sql.functions.size(col("vs")).between(2, 64))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), kept)
  }
}
