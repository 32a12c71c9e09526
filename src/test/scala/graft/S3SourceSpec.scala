package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.s3.SigV4

/** Live loop for the in-repo `s3://` client: parquet written locally,
  * served by [[S3TestServer]] (which RE-VERIFIES every SigV4 signature
  * with the known secret, exactly as AWS does), read back through
  * `spark.read.parquet("s3://bucket/...")` with credentials as plain
  * reader options. Pins the access pattern (listing + ranged footer
  * reads, never a full-object download) alongside the bytes. */
class S3SourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private val AK = "GRAFTACCESSKEY"
  private val SK = "graft/secret+key"
  private var server: S3TestServer = _
  private var tmp: java.io.File = _

  private def s3Options: Map[String, String] = Map(
    "fs.s3.impl" -> classOf[graft.sources.s3.S3FileSystem].getName,
    "fs.s3.impl.disable.cache" -> "true",
    "fs.s3.endpoint" -> server.endpoint,
    "fs.s3.region" -> "eu-test-1",
    "fs.s3.access.key" -> AK,
    "fs.s3.secret.key" -> SK)

  override def beforeAll(): Unit = {
    server = new S3TestServer("graft-bucket", AK, SK, pageSize = 2)
    tmp = java.nio.file.Files.createTempDirectory("s3spec").toFile
    // two part-files so the directory listing genuinely matters, and the
    // page size of 2 forces continuation-token pagination (parts + _SUCCESS)
    spark.range(0, 1000).select(col("id"),
        (col("id") * 3).as("v"), concat(lit("row"), col("id")).as("s"))
      .repartition(2)
      .write.mode("overwrite").parquet(s"${tmp.getAbsolutePath}/data")
    server.putDir(new java.io.File(tmp, "data"), "warehouse/data")
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    if (tmp != null) org.apache.commons.io.FileUtils.deleteQuietly(tmp)
  }

  test("sigv4 canonical request and signature match the AWS worked example") {
    // The published SigV4 test vector (AWS General Reference, GET
    // iam.amazonaws.com ?Action=ListUsers&Version=2010-05-08) — pins the
    // signer to the specification, not to our own server's re-derivation.
    val headers = Seq(
      "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "host" -> "iam.amazonaws.com",
      "x-amz-date" -> "20150830T123600Z")
    val payloadHash = SigV4.sha256Hex("")
    val auth = SigV4.authorization("GET", "/",
      Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers, payloadHash,
      "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
      "us-east-1", "20150830T123600Z", service = "iam")
    assert(auth.endsWith("Signature=5d672d79c15b13162d9279b0855cfba" +
      "6789a8edb4c82c400e06b5924a6f2b5d7"), auth)
    assert(auth.contains(
      "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request"), auth)
  }

  test("uri encoding is the strict AWS variant") {
    assert(SigV4.uriEncode("a b+c/d~e", keepSlash = true) == "a%20b%2Bc/d~e")
    assert(SigV4.uriEncode("a/b", keepSlash = false) == "a%2Fb")
    assert(SigV4.uriEncode("élan", keepSlash = false) == "%C3%A9lan")
  }

  test("parquet reads over s3:// verify signatures and use ranged access") {
    val df = spark.read.options(s3Options)
      .parquet("s3://graft-bucket/warehouse/data")
    assert(df.count() == 1000)
    assert(df.agg(sum("v")).head.getLong(0) == (0L until 1000).map(_ * 3).sum)
    assert(server.signatureFailures.get == 0)
    assert(!server.sawUnsigned, "a request went out unsigned")
    // columnar access: footers and column chunks come via Range requests;
    // nothing downloads whole objects
    assert(server.rangedGets.get > 0, "no ranged reads")
    assert(server.fullGets.get == 0,
      s"full-object downloads: ${server.fullGets.get}")
    // the directory resolve paginated (page size 2, >= 3 keys)
    assert(server.listPages.get >= 2,
      s"listing did not paginate: ${server.listPages.get} pages")
  }

  test("an endpoint path prefix (reverse-proxied store) rides the URL and " +
      "the canonical path") {
    val pfx = new S3TestServer("graft-bucket", AK, SK, pathPrefix = "/minio")
    try {
      pfx.putDir(new java.io.File(tmp, "data"), "warehouse/data")
      val df = spark.read.options(s3Options +
          ("fs.s3.endpoint" -> s"${pfx.endpoint}/minio"))
        .parquet("s3://graft-bucket/warehouse/data")
      assert(df.count() == 1000)
      assert(pfx.signatureFailures.get == 0,
        "prefixed requests failed signature verification")
    } finally pfx.stop()
  }

  test("column pruning keeps s3 bytes proportional to the read schema") {
    val before = server.rangedGets.get
    val one = spark.read.options(s3Options)
      .parquet("s3://graft-bucket/warehouse/data")
      .select("id").agg(count(lit(1))).head.getLong(0)
    assert(one == 1000)
    assert(server.rangedGets.get > before)
  }

  test("a wrong secret is rejected by the store and surfaces as an error") {
    val bad = spark.read.options(s3Options + ("fs.s3.secret.key" -> "nope"))
      .parquet _
    val e = intercept[Exception] { bad("s3://graft-bucket/warehouse/data").count() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("403") || msgs.contains("Signature"), msgs)
    assert(server.signatureFailures.get > 0)
  }

  test("a missing key is a clean FileNotFound, not a signature error") {
    val e = intercept[Exception] {
      spark.read.options(s3Options)
        .parquet("s3://graft-bucket/warehouse/absent").count()
    }
    val all = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).toSeq
    assert(all.exists(t => t.isInstanceOf[java.io.FileNotFoundException] ||
      Option(t.getMessage).exists(m =>
        m.contains("absent") || m.contains("PATH_NOT_FOUND"))), all.map(_.toString))
  }

  test("gs:// resolves through the same client in GCS HMAC-interop mode") {
    val opts = Map(
      "fs.gs.impl" -> classOf[graft.sources.s3.GsFileSystem].getName,
      "fs.gs.impl.disable.cache" -> "true",
      "fs.gs.endpoint" -> server.endpoint,
      "fs.gs.region" -> "auto",
      "fs.gs.access.key" -> AK,
      "fs.gs.secret.key" -> SK)
    val df = spark.read.options(opts)
      .parquet("gs://graft-bucket/warehouse/data")
    assert(df.count() == 1000)
    // gs must NOT read s3 spellings: an fs.s3.secret.key in the same conf
    // never leaks into the gs signature
    val e = intercept[Exception] {
      spark.read.options(opts - "fs.gs.secret.key" +
        ("fs.s3.secret.key" -> SK))
        .parquet("gs://graft-bucket/warehouse/data").count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
    assert(msgs.contains("403") || msgs.contains("Signature"), msgs)
  }

  test("s3a:// resolves through the same in-repo client") {
    val opts = s3Options.map { case (k, v) =>
      (k.replace("fs.s3.", "fs.s3a."), v) } +
      ("fs.s3a.impl" -> classOf[graft.sources.s3.S3aFileSystem].getName)
    val df = spark.read.options(opts)
      .parquet("s3a://graft-bucket/warehouse/data")
    assert(df.count() == 1000)
  }
}
