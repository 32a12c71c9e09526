package graft

import java.io.{ByteArrayOutputStream, IOException}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.HtmlText
import graft.sources.warc.Warc

/** WARC 1.0 container: corpus round-trip, gzip member splitting,
  * structural refusals (record cap, truncated payload), and the
  * crawl-noise tolerances of the HTTP envelope split (obs-fold,
  * colon-less lines, duplicate headers, UTF-8 values, per-record
  * quarantine of malformed envelopes). */
class WarcSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmpDir(tag: String): Path = {
    val p = Files.createTempDirectory(s"warc_spec_$tag")
    p.toFile.deleteOnExit()
    p
  }

  /** One serialized response record, optionally its own gzip member. */
  private def renderRecord(id: Long, uri: String, body: String,
      gzip: Boolean): Array[Byte] = {
    val raw = new ByteArrayOutputStream()
    val out = if (gzip) new GZIPOutputStream(raw) else raw
    Warc.writeRecord(out, f"$id%08d-0000-0000-0000-000000000000", uri,
      body.getBytes(UTF_8), Seq("Content-Type" -> "text/plain"))
    out.close()
    raw.toByteArray
  }

  test("a failed write attempt deletes its task-attempt tmp file") {
    import spark.implicits._
    // a null body makes the record writer throw mid-partition; the
    // attempt must clean its own tmp file up (no abort-path litter)
    val docs = Seq((1L, null: String, "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = tmpDir("abort")
    intercept[org.apache.spark.SparkException] {
      Warc.writeCorpus(docs, dir.toString)
    }
    val leftovers = Files.list(dir).map[String](_.getFileName.toString)
      .toArray.map(_.toString).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"tmp litter after failed attempt: $leftovers")
  }

  test("writeCorpus/readCorpus round-trips documents through .warc.gz") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello warc world", "en", "srcA"),
      (2L, "zweites dokument mit text", "de", "srcB"),
      (3L, "third one, with: punctuation & ampersands <tags>", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source").repartition(2)
    val dir = tmpDir("roundtrip")
    Warc.writeCorpus(docs, dir.toString)
    val back = Warc.readCorpus(spark, dir.toString)
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    assert(back.toSeq == Seq(
      (1L, "hello warc world", "en", "srcA"),
      (2L, "zweites dokument mit text", "de", "srcB"),
      (3L, "third one, with: punctuation & ampersands <tags>", "en", "srcA")))
    // commit-by-rename leaves no temp litter: only committed parts (plus
    // the local ChecksumFileSystem's hidden .crc sidecars, which every
    // Hadoop reader skips) — in particular no *.tmp attempt files
    val names = Files.list(dir).map[String](_.getFileName.toString)
      .toArray.map(_.toString).filterNot(_.startsWith("."))
    assert(names.nonEmpty && names.forall(_.matches("part-\\d{5}\\.warc\\.gz")),
      names.mkString(", "))
  }

  test("concatenated gzip members parse transparently (Common Crawl layout)") {
    // two INDEPENDENTLY gzipped records byte-concatenated into one file —
    // exactly what member-per-record writers produce and what lets a
    // reader resync at member boundaries
    val dir = tmpDir("members")
    val bytes = renderRecord(1, "https://a.example/1", "first body", gzip = true) ++
      renderRecord(2, "https://a.example/2", "second body", gzip = true)
    Files.write(dir.resolve("two.warc.gz"), bytes)
    val rows = Warc.records(spark, dir.toString).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("target_uri")).sorted.toSeq ==
      Seq("https://a.example/1", "https://a.example/2"))
  }

  test("a lying Content-Length above the 64 MiB cap refuses loudly") {
    val dir = tmpDir("cap")
    val head = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${Warc.MaxRecordBytes + 1L}\r\n\r\n").getBytes(UTF_8)
    Files.write(dir.resolve("cap.warc"), head)
    val e = intercept[org.apache.spark.SparkException] {
      Warc.records(spark, dir.toString).count()
    }
    assert(e.getMessage.contains("exceeds cap") ||
      Option(e.getCause).exists(_.getMessage.contains("exceeds cap")))
  }

  test("a truncated payload refuses loudly (file damage, not crawl noise)") {
    val dir = tmpDir("trunc")
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 100\r\n\r\nonly ten b").getBytes(UTF_8)
    Files.write(dir.resolve("trunc.warc"), rec)
    val e = intercept[org.apache.spark.SparkException] {
      Warc.records(spark, dir.toString).count()
    }
    assert(e.getMessage.contains("truncated") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated")))
  }

  test("HTTP split: obs-fold unfolds, colon-less noise skips, duplicates comma-join") {
    val payload = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain\r\n" +
      "X-Folded: first part\r\n   and the continuation\r\n" + // RFC 7230 obs-fold
      "this line has no colon and is crawl noise\r\n" +
      "Set-Cookie: a=1\r\n" +
      "Set-Cookie: b=2\r\n" +
      "\r\n" +
      "the body").getBytes(UTF_8)
    val (status, headers, body) = Warc.splitHttp(payload)
    assert(status == 200)
    assert(headers("x-folded") == "first part and the continuation")
    assert(headers("set-cookie") == "a=1, b=2")
    assert(!headers.keys.exists(_.contains("noise")))
    assert(new String(body, UTF_8) == "the body")
  }

  test("non-ASCII WARC header values survive as UTF-8 (no mojibake)") {
    val dir = tmpDir("utf8")
    val uri = "https://example.org/café/日本語"
    Files.write(dir.resolve("u.warc.gz"),
      renderRecord(7, uri, "body", gzip = true))
    val rows = Warc.records(spark, dir.toString).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("target_uri") == uri)
  }

  test("a malformed HTTP envelope quarantines that record, not the file") {
    val dir = tmpDir("quarantine")
    // record 1: fine; record 2: payload with no CRLFCRLF boundary
    val good = renderRecord(1, "https://ok.example/", "good body", gzip = false)
    val badPayload = "HTTP/1.1 200 OK\r\nbroken without boundary"
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:bad>\r\n" +
      "WARC-Target-URI: https://bad.example/\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${badPayload.getBytes(UTF_8).length}\r\n\r\n" +
      badPayload + "\r\n\r\n").getBytes(UTF_8)
    Files.write(dir.resolve("mix.warc"), good ++ bad)
    assert(Warc.records(spark, dir.toString).count() == 2) // both parse as WARC
    val resp = Warc.responses(spark, dir.toString).collect() // one survives HTTP split
    assert(resp.length == 1)
    assert(resp(0).getAs[String]("target_uri") == "https://ok.example/")
  }

  test("mainText(renderPage(t)) is exact for single-spaced text") {
    import spark.implicits._
    val texts = Seq(
      "plain words only",
      "with <angle> brackets & ampersands \"quotes\" 'apostrophes'",
      "entities that must survive: &lt; literally typed",
      "unicode café 日本語")
    val df = texts.toDF("text")
      .withColumn("page", HtmlText.renderPage(col("text"), lit("T"), lit("en")))
      .withColumn("back", HtmlText.mainText(col("page")))
    assert(df.filter(col("back") =!= col("text")).count() == 0)
  }

  test("the full ingest plan is map-only: no shuffle from WARC to extracted text") {
    import spark.implicits._
    val dir = tmpDir("planshape")
    val docs = Seq((1L, "plan shape text", "en", "srcP"))
      .toDF("doc_id", "text", "lang", "source")
    Warc.writeCorpus(docs, dir.toString)
    val extracted = Warc.readCorpus(spark, dir.toString)
      .select(col("doc_id"), HtmlText.mainText(col("text")).as("t"))
    val exec = extracted.queryExecution.executedPlan.toString
    assert(!exec.contains("Exchange"),
      s"WARC ingest should be map-only, found a shuffle:\n$exec")
  }

  test("corruption fuzz: 60 seeded mutations either parse or refuse cleanly") {
    // flip/truncate/insert bytes in a valid 3-record WARC; every mutant
    // must either parse (some records survive) or throw a clean
    // IOException-family error — never hang, never OOM, never return
    // records with corrupted payload SIZES (the Content-Length contract)
    val base = (1 to 3).flatMap(i => renderRecord(i.toLong,
      s"https://fuzz.example/$i", s"body number $i " * 10, gzip = false)).toArray
    val rng = new scala.util.Random(4242)
    (1 to 60).foreach { i =>
      val mutant: Array[Byte] = rng.nextInt(3) match {
        case 0 => // flip a byte
          val m = base.clone()
          val p = rng.nextInt(m.length)
          m(p) = (m(p) ^ (1 << rng.nextInt(8))).toByte
          m
        case 1 => // truncate
          base.take(rng.nextInt(base.length))
        case 2 => // overwrite a run with noise
          val m = base.clone()
          val p = rng.nextInt(m.length)
          val len = math.min(16, m.length - p)
          (0 until len).foreach(j => m(p + j) = rng.nextInt(256).toByte)
          m
      }
      val dir = tmpDir(s"fuzz$i")
      Files.write(dir.resolve("m.warc"), mutant)
      checkMutant(dir, i)
    }

    def checkMutant(dir: Path, seed: Int): Unit =
      try {
        val rows = Warc.records(spark, dir.toString).collect()
        // parsed: payload sizes must still match each record's declared
        // Content-Length (readFully guarantees it; this pins it)
        rows.foreach(r =>
          assert(r.getAs[Array[Byte]]("payload") != null, s"mutant $seed"))
      } catch {
        case e: org.apache.spark.SparkException =>
          def rootOk(t: Throwable): Boolean =
            t != null && (t.isInstanceOf[IOException] ||
              t.isInstanceOf[IllegalArgumentException] || rootOk(t.getCause))
          assert(rootOk(e), s"mutant $seed surfaced ${e.getCause}")
      }
  }

  test("the registry serves warc as a source type (corpus and records modes)") {
    import graft.sources._
    import spark.implicits._
    val dir = tmpDir("registry")
    val docs = Seq((10L, "registry corpus text", "en", "srcR"))
      .toDF("doc_id", "text", "lang", "source")
    Warc.writeCorpus(docs, dir.toString)
    new SourceRegistry(spark).registerSource(
      SourceDef("crawl", "warc",
        tables = Seq(TableDef("shard", path = Some(dir.toString)))),
      new graft.session.WarningCollector)
    assert(spark.sql("SELECT text FROM crawl_shard WHERE doc_id = 10")
      .collect()(0).getString(0) == "registry corpus text")
    new SourceRegistry(spark).registerSource(
      SourceDef("crawlraw", "warc", options = Map("mode" -> "records"),
        tables = Seq(TableDef("shard", path = Some(dir.toString)))),
      new graft.session.WarningCollector)
    assert(spark.sql(
      "SELECT count(*) FROM crawlraw_shard WHERE warc_type = 'response'")
      .collect()(0).getLong(0) == 1)
  }
}
