package graft

import java.nio.file.{Files, Path => JPath}
import scala.jdk.CollectionConverters._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotLog.{ByTimestamp, ByVersion}
import graft.sources.iceberg._

/** End-to-end Iceberg REST coverage: a warehouse written by
  * [[IcebergLocal.append]] (spec-shaped metadata JSON + Avro manifests
  * over real parquet), served by [[IcebergLocal.CatalogServer]], read
  * back through [[IcebergRestCatalog]]/[[IcebergRest]] — discovery,
  * current reads, every time-travel spec form, auth, and the explicit
  * merge-on-read refusal. */
class IcebergRestSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private var warehouse: JPath = _
  private var server: IcebergLocal.CatalogServer = _
  private var port: Int = _
  private var snap1: Long = _
  private var snap2: Long = _

  private def catalog = new IcebergRestCatalog(s"http://127.0.0.1:$port")

  /** Write `df` as parquet part files and return their DataFileInfo. */
  private def partFiles(df: org.apache.spark.sql.DataFrame)
      : Seq[IcebergLocal.DataFileInfo] = {
    val out = Files.createTempDirectory("ice-data")
    val n = df.count()
    df.coalesce(1).write.mode("overwrite").parquet(out.toString)
    Files.list(out).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
      .map(p => IcebergLocal.DataFileInfo(p.toUri.toString, n, Files.size(p)))
  }

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("ice-wh")
    val nationDir = warehouse.resolve("nation")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    snap1 = IcebergLocal.append(nationDir,
      partFiles(nation.filter("n_regionkey < 2")),
      timestampMs = 1000L, tag = Some("initial"))
    snap2 = IcebergLocal.append(nationDir,
      partFiles(nation.filter("n_regionkey >= 2")),
      timestampMs = 2000L)
    server = new IcebergLocal.CatalogServer(warehouse, "analytics")
    port = server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  test("catalog discovery: config, namespaces, tables") {
    assert(catalog.config() == Map.empty)
    assert(catalog.listNamespaces() == Seq("analytics"))
    assert(catalog.listTables("analytics") == Seq("nation"))
  }

  test("current read = union of both appended snapshots") {
    val df = IcebergRest.read(spark, catalog, "analytics", "nation")
    assert(df.count() == 25)
    assert(df.columns.toSet.contains("n_nationkey"))
  }

  test("snapshot-id and tag time travel resolve the first append") {
    val byId = IcebergRest.read(spark, catalog, "analytics", "nation",
      Some(ByVersion(snap1.toString)))
    val byTag = IcebergRest.read(spark, catalog, "analytics", "nation",
      Some(ByVersion("initial")))
    val want = spark.read.parquet(s"$sf/nation.parquet")
      .filter("n_regionkey < 2").count()
    assert(byId.count() == want && byTag.count() == want)
    assert(byId.filter("n_regionkey >= 2").count() == 0)
  }

  test("branch ref resolves the branch head") {
    val df = IcebergRest.read(spark, catalog, "analytics", "nation",
      Some(ByVersion("main")))
    assert(df.count() == 25)
  }

  test("timestamp time travel picks the latest snapshot at-or-before") {
    val df = IcebergRest.read(spark, catalog, "analytics", "nation",
      Some(ByTimestamp(1500L)))
    assert(df.filter("n_regionkey >= 2").count() == 0)
    val e = intercept[IllegalArgumentException] {
      IcebergRest.read(spark, catalog, "analytics", "nation",
        Some(ByTimestamp(500L)))
    }
    assert(e.getMessage.contains("no snapshot at or before"))
  }

  test("unknown tag and unknown snapshot id are clean errors") {
    val e1 = intercept[IllegalArgumentException] {
      IcebergRest.read(spark, catalog, "analytics", "nation",
        Some(ByVersion("nope")))
    }
    assert(e1.getMessage.contains("tagged or branched"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergRest.read(spark, catalog, "analytics", "nation",
        Some(ByVersion("99")))
    }
    assert(e2.getMessage.contains("no snapshot with id"))
  }

  test("auth: required header is sent by the client, 401 without it") {
    val gated = new IcebergLocal.CatalogServer(warehouse, "analytics",
      requiredHeader = Some("Authorization" -> "Bearer tok"))
    val gport = gated.start()
    try {
      val anon = new IcebergRestCatalog(s"http://127.0.0.1:$gport")
      val e = intercept[java.io.IOException] { anon.listNamespaces() }
      assert(e.getMessage.contains("401"))
      val authed = new IcebergRestCatalog(s"http://127.0.0.1:$gport",
        () => Map("Authorization" -> "Bearer tok"))
      assert(authed.listNamespaces() == Seq("analytics"))
    } finally gated.stop()
  }

  test("auth: SigV4-signed catalog requests verify server-side, wrong key 403") {
    // the server RE-VERIFIES the signature (canonical request rebuilt
    // from the received headers, payload hash checked against the
    // actual body) — the same stance as the S3 test store, with the
    // catalog's execute-api service name in the credential scope
    val gated = new IcebergLocal.CatalogServer(warehouse, "analytics",
      sigv4 = Some(("AKIDCATALOG", "catalog-secret", "eu-west-1",
        "execute-api")))
    val gport = gated.start()
    try {
      val host = s"127.0.0.1:$gport"
      def cat(secret: String) = new IcebergRestCatalog(
        s"http://$host",
        signer = Some(new IcebergRestCatalog.SigV4Signer(
          host, "AKIDCATALOG", secret, "eu-west-1")))
      // unsigned → 403
      val anon = new IcebergRestCatalog(s"http://$host")
      val e0 = intercept[java.io.IOException] { anon.listNamespaces() }
      assert(e0.getMessage.contains("403"))
      // wrong secret → 403 (signature recomputation catches it)
      val bad = cat("wrong-secret")
      val e1 = intercept[java.io.IOException] { bad.listNamespaces() }
      assert(e1.getMessage.contains("403"))
      // right key: GETs (list, load) and a signed POST body both pass
      val good = cat("catalog-secret")
      assert(good.listNamespaces() == Seq("analytics"))
      assert(good.listTables("analytics").contains("nation"))
      val meta = good.loadTable("analytics", "nation")
      assert(meta.snapshots.nonEmpty)
      // POST with a tampered-at-rest payload hash refuses: sign a body
      // then send a different one via a raw connection
      val signer = new IcebergRestCatalog.SigV4Signer(
        host, "AKIDCATALOG", "catalog-secret", "eu-west-1")
      val hdrs = signer.sign("POST",
        "/v1/namespaces/analytics/tables/nation", "{}".getBytes("UTF-8"))
      val c = new java.net.URI(
        s"http://$host/v1/namespaces/analytics/tables/nation").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      c.setRequestMethod("POST"); c.setDoOutput(true)
      hdrs.foreach { case (k, v) => c.setRequestProperty(k, v) }
      c.getOutputStream.write("""{"tampered":true}""".getBytes("UTF-8"))
      assert(c.getResponseCode == 403)
      c.disconnect()
    } finally gated.stop()
  }

  test("positional merge-on-read deletes apply; time travel sees pre-delete rows") {
    // snapshot 1: 25 nation rows as data; snapshot 2: a v2 positional
    // delete file (parquet of (file_path, pos)) in a content=1 delete
    // manifest removing positions 0, 3, 7 — the shape Flink/Trino
    // row-level deletes produce. Current read must drop exactly those
    // positions; snapshot-1 time travel must still see all 25.
    val dir = warehouse.resolve("mor")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .orderBy("n_nationkey")
    val dataInfos = partFiles(nation)
    assert(dataInfos.size == 1) // coalesce(1): positions are file-global
    IcebergLocal.append(dir, dataInfos, timestampMs = 1000L,
      tag = Some("pre-delete"))
    val delDir = Files.createTempDirectory("ice-del")
    import spark.implicits._
    Seq((dataInfos.head.path, 0L), (dataInfos.head.path, 3L),
      (dataInfos.head.path, 7L))
      .toDF("file_path", "pos").coalesce(1)
      .write.mode("overwrite").parquet(delDir.toString)
    val delFile = Files.list(delDir).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    IcebergLocal.append(dir, Seq(IcebergLocal.DataFileInfo(
      delFile.toUri.toString, 3, Files.size(delFile), content = 1)),
      timestampMs = 2000L)
    try {
      val current = IcebergRest.read(spark, catalog, "analytics", "mor")
      assert(current.count() == 22)
      // positions are the file's row order = n_nationkey order here
      val gone = Set(0L, 3L, 7L)
      val keys = current.select("n_nationkey").collect()
        .map(_.getAs[Number](0).longValue()).toSet
      assert(gone.forall(k => !keys.contains(k)), s"deleted keys leaked: $keys")
      assert(keys.size == 22)
      val before = IcebergRest.read(spark, catalog, "analytics", "mor",
        Some(ByVersion("pre-delete")))
      assert(before.count() == 25)
      // schema is unchanged by the MoR anti-join: no helper columns leak
      assert(current.columns.toSeq == before.columns.toSeq)
      // plan shape: the delete application is broadcast joins over the
      // data scan — a map-only pass; any hash-partitioned exchange or
      // sort-merge join here would shuffle the whole table at 100 TB
      val exec = current.queryExecution.executedPlan.toString
      assert(exec.contains("BroadcastHashJoin") && exec.contains("LeftAnti"),
        exec)
      assert(!exec.contains("SortMergeJoin"), exec)
      assert(!exec.contains("Exchange hashpartitioning"), exec)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("a delete whose sequence number precedes the data does not apply") {
    // v2 ordering: a positional delete applies only to data files whose
    // data sequence number is <= the delete's. Commit the DELETE first
    // (seq 1), then the data (seq 2): the delete must be a no-op.
    val dir = warehouse.resolve("morseq")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val dataInfos = partFiles(nation)
    val delDir = Files.createTempDirectory("ice-del-seq")
    import spark.implicits._
    Seq((dataInfos.head.path, 0L)).toDF("file_path", "pos").coalesce(1)
      .write.mode("overwrite").parquet(delDir.toString)
    val delFile = Files.list(delDir).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    IcebergLocal.append(dir, Seq(IcebergLocal.DataFileInfo(
      delFile.toUri.toString, 1, Files.size(delFile), content = 1)),
      timestampMs = 1000L)
    IcebergLocal.append(dir, dataInfos, timestampMs = 2000L)
    try {
      assert(IcebergRest.read(spark, catalog, "analytics", "morseq")
        .count() == 25)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("equality deletes apply via schema-resolved equality_ids") {
    // v2 equality delete: a parquet file of equality-column values, the
    // columns named by spec field ids resolved through the table schema
    // (n_nationkey is field id 1 of the committed schema). Rows with
    // n_nationkey in {1, 5} must disappear; strict sequence semantics:
    // the delete (seq 2) applies to data at seq 1 only.
    val dir = warehouse.resolve("eqdel")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    IcebergLocal.append(dir, partFiles(nation), timestampMs = 1000L,
      tag = Some("pre-delete"), schema = Some(nation.schema))
    val delDir = Files.createTempDirectory("ice-del-eq")
    import spark.implicits._
    Seq(1, 5).toDF("n_nationkey").coalesce(1)
      .write.mode("overwrite").parquet(delDir.toString)
    val delFile = Files.list(delDir).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    IcebergLocal.append(dir, Seq(IcebergLocal.DataFileInfo(
      delFile.toUri.toString, 2, Files.size(delFile), content = 2,
      equalityIds = Seq(1))),
      timestampMs = 2000L)
    try {
      val current = IcebergRest.read(spark, catalog, "analytics", "eqdel")
      val keys = current.select("n_nationkey").collect()
        .map(_.getAs[Number](0).longValue()).toSet
      assert(current.count() == 23, keys)
      assert(!keys.contains(1L) && !keys.contains(5L), keys)
      assert(IcebergRest.read(spark, catalog, "analytics", "eqdel",
        Some(ByVersion("pre-delete"))).count() == 25)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("equality deletes without ids use the delete file's own columns; strict seq gate") {
    // absent equality_ids, every column of the delete parquet is an
    // equality column (the common writer shape). Also pin the STRICT
    // ordering: an equality delete at seq 1 does NOT touch data
    // committed at seq 2 (positional would, at <=; equality is <).
    val dir = warehouse.resolve("eqdel2")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val delDir = Files.createTempDirectory("ice-del-eq2")
    import spark.implicits._
    Seq(("NATION_0", 0)).toDF("n_name", "n_regionkey").coalesce(1)
      .write.mode("overwrite").parquet(delDir.toString)
    val delFile = Files.list(delDir).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    // delete first (seq 1), data second (seq 2): strict < -> no-op
    IcebergLocal.append(dir, Seq(IcebergLocal.DataFileInfo(
      delFile.toUri.toString, 1, Files.size(delFile), content = 2)),
      timestampMs = 1000L)
    IcebergLocal.append(dir, partFiles(nation), timestampMs = 2000L)
    try {
      assert(IcebergRest.read(spark, catalog, "analytics", "eqdel2")
        .count() == 25)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
    // now the applying order: data (seq 1), delete (seq 2)
    val dir2 = warehouse.resolve("eqdel3")
    IcebergLocal.append(dir2, partFiles(nation), timestampMs = 1000L)
    IcebergLocal.append(dir2, Seq(IcebergLocal.DataFileInfo(
      delFile.toUri.toString, 1, Files.size(delFile), content = 2)),
      timestampMs = 2000L)
    try {
      val rows = IcebergRest.read(spark, catalog, "analytics", "eqdel3")
      assert(rows.count() == 24)
      assert(rows.filter("n_name = 'NATION_0'").count() == 0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir2.toFile).deleteRecursively()
    }
  }

  test("schema evolution: a renamed column resolves by field id") {
    // files written under the OLD name (stamped with parquet field ids,
    // as every real Iceberg writer does) must resolve against the
    // CURRENT schema's new name via field-id matching — the spec's
    // rename semantics, not a name-based guess
    val dir = warehouse.resolve("evolve")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name")
    val stamped = IcebergLocal.withFieldIds(nation)
    // stamped ids must match the committed schema's numbering
    assert(stamped.schema.fields.map(
      _.metadata.getLong("parquet.field.id")).toSeq == Seq(1L, 2L))
    IcebergLocal.append(dir, partFiles(stamped), timestampMs = 1000L,
      schema = Some(stamped.schema))
    IcebergLocal.renameColumn(dir, "n_name", "nation_label")
    try {
      val df = IcebergRest.readLocal(spark, dir,
        options = Map("fieldIdReads" -> "true"))
      assert(df.columns.toSeq == Seq("n_nationkey", "nation_label"))
      val got = df.collect().map(r =>
        r.getAs[Number]("n_nationkey").longValue() ->
          r.getAs[String]("nation_label")).toMap
      val want = nation.collect().map(r =>
        r.getAs[Number]("n_nationkey").longValue() ->
          r.getAs[String]("n_name")).toMap
      assert(got == want, "renamed column lost or scrambled values")
      // equality deletes resolve through the RENAMED schema: field id 2
      // now names nation_label, and deleting by it must hit rows
      // written under the old name
      val delDir = Files.createTempDirectory("ice-del-ev")
      import spark.implicits._
      Seq(want(0L)).toDF("nation_label").coalesce(1)
        .write.mode("overwrite").parquet(delDir.toString)
      val delFile = Files.list(delDir).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      IcebergLocal.append(dir, Seq(IcebergLocal.DataFileInfo(
        delFile.toUri.toString, 1, Files.size(delFile), content = 2,
        equalityIds = Seq(2))), timestampMs = 2000L)
      val after = IcebergRest.readLocal(spark, dir,
        options = Map("fieldIdReads" -> "true"))
      assert(after.count() == 24)
      assert(after.filter(s"nation_label = '${want(0L)}'").count() == 0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("schema evolution: add and drop columns are metadata-only commits") {
    val dir = warehouse.resolve("addcol")
    val base = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    val stamped = IcebergLocal.withFieldIds(base)
    IcebergLocal.append(dir, partFiles(stamped), timestampMs = 1000L,
      schema = Some(stamped.schema))
    try {
      // ADD: pre-add files surface NULL for the new column — no rewrite
      IcebergLocal.addColumn(dir, "n_tier", "string")
      val added = IcebergRest.readLocal(spark, dir,
        options = Map("fieldIdReads" -> "true"))
      assert(added.columns.toSeq ==
        Seq("n_nationkey", "n_name", "n_regionkey", "n_tier"))
      assert(added.count() == 25)
      assert(added.filter("n_tier IS NOT NULL").count() == 0)
      // DROP: the column leaves the current schema; other values still
      // resolve by field id
      IcebergLocal.dropColumn(dir, "n_regionkey")
      val dropped = IcebergRest.readLocal(spark, dir,
        options = Map("fieldIdReads" -> "true"))
      assert(dropped.columns.toSeq == Seq("n_nationkey", "n_name", "n_tier"))
      assert(dropped.filter("n_name IS NULL").count() == 0)
      // a later ADD must NOT reuse the dropped column's field id —
      // reuse would resurrect n_regionkey's bytes under the new name
      IcebergLocal.addColumn(dir, "n_note", "string")
      val raw = mapperFor(dir)
      val curId = raw.path("current-schema-id").asInt(0)
      val fields = (0 until raw.get("schemas").size())
        .map(raw.get("schemas").get)
        .find(_.path("schema-id").asInt(0) == curId).get.get("fields")
      val byName = (0 until fields.size()).map(fields.get)
        .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
      assert(byName("n_tier") == 4 && byName("n_note") == 5,
        s"field ids not monotone: $byName")
      val note = IcebergRest.readLocal(spark, dir,
        options = Map("fieldIdReads" -> "true"))
      assert(note.filter("n_note IS NOT NULL").count() == 0,
        "a fresh column resurrected old bytes — field id was reused")
      // misuse fails loudly
      intercept[IllegalArgumentException](
        IcebergLocal.addColumn(dir, "n_name", "string"))
      intercept[IllegalArgumentException](
        IcebergLocal.dropColumn(dir, "nope"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  private def mapperFor(dir: java.nio.file.Path)
      : com.fasterxml.jackson.databind.JsonNode = {
    val metaFiles = {
      val s = Files.list(dir.resolve("metadata"))
      try s.iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".metadata.json"))
      finally s.close()
    }
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(metaFiles.maxBy(p => p.getFileName.toString
        .stripPrefix("v").stripSuffix(".metadata.json")
        .toIntOption.getOrElse(0))))
  }

  test("field-id reads refuse an id-less data file instead of nulling it") {
    // honesty pin: a file written WITHOUT parquet field ids cannot be
    // resolved by id — the read must fail loudly (Spark's
    // ignoreMissingIds=false), never silently return null columns
    val dir = warehouse.resolve("evolve2")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name") // NOT stamped
    IcebergLocal.append(dir, partFiles(nation), timestampMs = 1000L,
      schema = Some(nation.schema))
    try {
      val e = intercept[Exception] {
        IcebergRest.readLocal(spark, dir,
          options = Map("fieldIdReads" -> "true")).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(m => m.toLowerCase.contains("field id")),
        messages(e).toString)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("deleteWhere commits positional deletes; composes, no-ops on no match") {
    val dir = warehouse.resolve("delwhere")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val b0 = dir.resolve("data").resolve("b0")
    Files.createDirectories(b0)
    nation.coalesce(1).write.mode("overwrite").parquet(b0.toString)
    IcebergLocal.append(dir, IcebergMaintenance.parquetFileInfos(b0),
      timestampMs = 1000L, tag = Some("all"), schema = Some(nation.schema))
    try {
      assert(IcebergMaintenance.deleteWhere(spark, dir,
        "n_regionkey = 2", () => 2000L) > 0)
      val after1 = IcebergRest.readLocal(spark, dir)
      assert(after1.filter("n_regionkey = 2").count() == 0)
      assert(after1.count() == 20)
      // second delete composes with the first
      assert(IcebergMaintenance.deleteWhere(spark, dir,
        "n_nationkey = 0", () => 3000L) > 0)
      assert(IcebergRest.readLocal(spark, dir).count() == 19)
      // no match: nothing committed, snapshot count unchanged
      val snaps = IcebergLocal.currentMetadata(dir).get.snapshots.size
      assert(IcebergMaintenance.deleteWhere(spark, dir,
        "n_nationkey = 999", () => 4000L) == -1L)
      assert(IcebergLocal.currentMetadata(dir).get.snapshots.size == snaps)
      // pre-delete history intact
      assert(IcebergRest.readLocal(spark, dir,
        Some(ByVersion("all"))).count() == 25)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("vacuum reclaims files no retained snapshot references") {
    // expiry (retainLast) drops snapshots, compaction rewrites the live
    // set, vacuum reclaims the disk: after compact(retainLast=1) only
    // the compacted snapshot survives, so the original batch parquet
    // and its delete file — all table-owned — must be deletable, while
    // the compacted files and the current read stay intact
    val dir = warehouse.resolve("vac")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name")
    val b0 = dir.resolve("data").resolve("b0")
    Files.createDirectories(b0)
    nation.coalesce(1).write.mode("overwrite").parquet(b0.toString)
    IcebergLocal.append(dir, IcebergMaintenance.parquetFileInfos(b0),
      timestampMs = 1000L, schema = Some(nation.schema))
    // an equality delete landing inside the table dir too
    val d0 = dir.resolve("data").resolve("d0")
    Files.createDirectories(d0)
    import spark.implicits._
    Seq(0L).toDF("n_nationkey").coalesce(1)
      .write.mode("overwrite").parquet(d0.toString)
    IcebergLocal.append(dir,
      IcebergMaintenance.parquetFileInfos(d0, content = 2,
        equalityIds = Seq(1)), timestampMs = 2000L)
    try {
      assert(IcebergRest.readLocal(spark, dir).count() == 24)
      IcebergMaintenance.compact(spark, dir,
        clock = () => 3000L, retainLast = Some(1))
      val deleted = IcebergMaintenance.vacuum(dir)
      assert(deleted > 0, "vacuum found nothing to reclaim")
      // the pre-compaction artifacts are gone...
      assert(IcebergMaintenance.listParquet(b0).isEmpty)
      assert(IcebergMaintenance.listParquet(d0).isEmpty)
      // ...and the table still reads its compacted state
      assert(IcebergRest.readLocal(spark, dir).count() == 24)
      // a second vacuum is a no-op (idempotent)
      assert(IcebergMaintenance.vacuum(dir) == 0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("catalog server refuses path traversal in table names") {
    // plant a metadata dir OUTSIDE the warehouse that traversal would hit
    val outside = warehouse.getParent.resolve("ice-outside")
    Files.createDirectories(outside.resolve("metadata"))
    Files.writeString(outside.resolve("metadata").resolve(
      "v00001.metadata.json"), "{}")
    try {
      val c = new java.net.URI(
        s"http://127.0.0.1:$port/v1/namespaces/analytics/tables/..%2F..%2Fice-outside")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(c.getResponseCode == 404, "traversal must 404, not serve")
      c.disconnect()
    } finally {
      import scala.reflect.io.Directory
      new Directory(outside.toFile).deleteRecursively()
    }
  }

  test("latest metadata is picked by numeric version, not filename order") {
    // v%05d padding overflows at snapshot 100000; lexicographically
    // "v100000..." < "v99999...", so a filename sort pins the table to
    // 99999 forever — the bug regime a per-micro-batch stream reaches
    val dir = Files.createTempDirectory("ice-vsort")
    val meta = dir.resolve("metadata")
    Files.createDirectories(meta)
    Files.writeString(meta.resolve("v99999.metadata.json"), "{}")
    Files.writeString(meta.resolve("v100000.metadata.json"), "{}")
    val latest = IcebergLocal.currentMetadataFile(dir)
    assert(latest.map(_.getFileName.toString)
      .contains("v100000.metadata.json"), latest)
  }

  test("retainLast expires snapshots, their tags, and their meta files") {
    val dir = Files.createTempDirectory("ice-retain").resolve("t")
    val one = partFiles(spark.range(1).toDF("v"))
    (1 to 5).foreach { i =>
      IcebergLocal.append(dir, one, timestampMs = i * 1000L,
        tag = Some(s"batch-$i"), retainLast = Some(2))
    }
    val m = IcebergLocal.currentMetadata(dir).get
    assert(m.snapshots.map(_.snapshotId) == Seq(4L, 5L))
    // tags follow their snapshots: expired ones are gone, kept remain
    assert(m.refs.keySet == Set("main", "batch-4", "batch-5"), m.refs)
    // expired snapshots' manifest lists and metadata JSONs are deleted;
    // the dir holds O(retainLast) files, not one pair per commit ever
    val names = Files.list(dir.resolve("metadata")).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.count(_.endsWith(".metadata.json")) == 2, names)
    assert(names.count(_.startsWith("snap-")) == 2, names)
    // data files survive expiration: the current snapshot reads all 5
    assert(countVia(dir) == 5)
  }

  test("age-based expire: pinned tags and branch heads survive the sweep") {
    val dir = Files.createTempDirectory("ice-expire-age").resolve("t")
    def commit(i: Int, tag: Option[String] = None): Long =
      IcebergLocal.append(dir, partFiles(spark.range(1).toDF("v")),
        timestampMs = i * 1000L, tag = tag)
    commit(1)                      // s1 @1000 — unreferenced, old
    commit(2, Some("pinned"))      // s2 @2000 — tag-protected
    commit(3)                      // s3 @3000 — old, not a ref head
    commit(4)                      // s4 @4000 — main head
    val before = countVia(dir)
    // cutoff 3500: s1..s3 are candidates; the tag shields s2
    val expired = IcebergLocal.expireSnapshots(dir, olderThanMs = 3500L,
      minSnapshotsToKeep = 1, timestampMs = 9000L)
    assert(expired == Seq(1L, 3L), s"expired $expired")
    val m = IcebergLocal.currentMetadata(dir).get
    assert(m.snapshots.map(_.snapshotId).sorted == Seq(2L, 4L))
    // refs untouched: the pinned tag still resolves, main still reads
    assert(m.refs("pinned")._2 == 2L && m.refs("main")._2 == 4L)
    assert(countVia(dir) == before, "expire changed the table's rows")
    // travel to the tag-protected snapshot still works
    assert(IcebergRest.readLocal(spark, dir,
      Some(graft.sources.SnapshotLog.ByVersion("pinned"))).count() == 2)
    // the snapshot-log dropped the expired ids, kept the survivors
    assert(m.snapshotLog.map(_._2) == Seq(2L, 4L), m.snapshotLog)
    // expired manifest lists are reclaimed from disk
    val names = Files.list(dir.resolve("metadata")).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.count(_.startsWith("snap-")) == 2, names)
    // min-snapshots-to-keep overrides age: asking to keep the newest 3
    // of main's lineage retains s2 (ancestor) even past the cutoff
    val dir2 = Files.createTempDirectory("ice-expire-min").resolve("t")
    def commit2(i: Int): Long =
      IcebergLocal.append(dir2, partFiles(spark.range(1).toDF("v")),
        timestampMs = i * 1000L)
    (1 to 4).foreach(commit2)
    val expired2 = IcebergLocal.expireSnapshots(dir2, olderThanMs = 9999L,
      minSnapshotsToKeep = 3, timestampMs = 9000L)
    assert(expired2 == Seq(1L), s"expired $expired2")
    assert(IcebergLocal.currentMetadata(dir2).get.snapshots
      .map(_.snapshotId).sorted == Seq(2L, 3L, 4L))
    // nothing left to expire → no-op, no new metadata version
    assert(IcebergLocal.expireSnapshots(dir2, 9999L, 3, 9001L).isEmpty)
  }

  test("changelog read: inserts and deletes as first-class rows, rewrite refused") {
    val dir = Files.createTempDirectory("ice-changes").resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    def commit(pred: String, ts: Long): Long =
      IcebergLocal.append(dir, partFiles(nation.filter(pred)), ts,
        schema = Some(nation.schema))
    val s1 = commit("n_regionkey <= 1", 1000L)
    val s2 = commit("n_regionkey = 2", 2000L)
    IcebergMaintenance.deleteWhere(spark, dir,
      "n_nationkey % 2 = 1", () => 3000L)
    def changes(from: Long) =
      IcebergRest.readChanges(spark, dir, from)
        .groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val live = nation.filter("n_regionkey <= 2")
    val odd = live.filter("n_nationkey % 2 = 1").count()
    // full-history window: every committed row as insert, plus the
    // delete commit's rows as deletes (non-net — both sides appear)
    assert(changes(0L) ==
      Map("insert" -> live.count(), "delete" -> odd), changes(0L))
    // (s1, head]: only the second append's inserts; deletes unchanged
    // (the position-delete files land in the window)
    assert(changes(s1) == Map(
      "insert" -> nation.filter("n_regionkey = 2").count(),
      "delete" -> odd), changes(s1))
    // (s2, head]: a delete-only window — no inserts fabricated
    assert(changes(s2) == Map("delete" -> odd), changes(s2))
    // every change row is attributed to its exact commit: the second
    // append is ordinal 0 / snapshot 2 in the (s1, head] window, the
    // delete commit ordinal 1 / snapshot 3 — the spec changelog columns
    val attrib = IcebergRest.readChanges(spark, dir, s1)
      .select("_change_type", "_change_ordinal", "_commit_snapshot_id")
      .distinct().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(attrib == Set(("insert", 0, 2L), ("delete", 1, 3L)), attrib)
    // the deleted rows carry their ORIGINAL column values
    val deleted = IcebergRest.readChanges(spark, dir, s2)
      .filter("_change_type = 'delete'")
    assert(deleted.select("n_nationkey").collect()
        .map(_.getAs[Number](0).longValue()).toSet
      == live.filter("n_nationkey % 2 = 1").select("n_nationkey")
        .collect().map(_.getAs[Number](0).longValue()).toSet)
    // an EQUALITY delete in a window emits the keyed rows as deletes
    val eqOut = Files.createTempDirectory("ice-changes-eq")
    nation.filter("n_nationkey = 0").select("n_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(eqOut.toString)
    val eqFile = Files.list(eqOut).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val s3 = IcebergLocal.currentMetadata(dir).get
      .snapshots.map(_.snapshotId).max
    IcebergLocal.append(dir, Seq(IcebergLocal.DataFileInfo(
      eqFile.toUri.toString, 1, Files.size(eqFile), content = 2,
      equalityIds = Seq(1))), 4000L)
    val eqChanges = IcebergRest.readChanges(spark, dir, s3)
      .filter("_change_type = 'delete'")
      .select("n_nationkey").collect()
      .map(_.getAs[Number](0).longValue()).toSeq
    assert(eqChanges == Seq(0L), s"equality changelog rows: $eqChanges")
    // a compaction in the window: loud refusal (a rewrite is no change)
    IcebergMaintenance.compact(spark, dir, () => 5000L)
    val e = intercept[IllegalArgumentException](
      IcebergRest.readChanges(spark, dir, s1))
    assert(e.getMessage.contains("rewrite"))
    // the incremental read's delete refusal points here now
    val e2 = intercept[IllegalArgumentException](
      IcebergRest.readIncremental(spark, dir, s2, Some(s3)))
    assert(e2.getMessage.contains("readChanges"))
  }

  test("net changelog: intra-window churn cancels, pre-window deletes survive") {
    val dir = Files.createTempDirectory("ice-netch").resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    def commit(pred: String, ts: Long): Long =
      IcebergLocal.append(dir, partFiles(nation.filter(pred)), ts,
        schema = Some(nation.schema))
    val s1 = commit("n_regionkey = 0", 1000L) // A: pre-window
    commit("n_regionkey = 1", 2000L)          // B: inserted in window
    IcebergMaintenance.deleteWhere(spark, dir,
      "n_nationkey % 2 = 1", () => 3000L)     // odds of A AND B deleted
    val net = IcebergRest.readChanges(spark, dir, s1,
      toSnapshotId = None, options = Map("net" -> "true"))
    val counts = net.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bEven = nation
      .filter("n_regionkey = 1 AND n_nationkey % 2 = 0").count()
    val aOdd = nation
      .filter("n_regionkey = 0 AND n_nationkey % 2 = 1").count()
    // B's odd rows were inserted AND deleted inside the window — they
    // cancel; B's evens net-insert; A's odds (pre-window) net-delete
    assert(counts == Map("insert" -> bEven, "delete" -> aOdd), counts)
    // net rows keep the LAST contributing change's attribution
    val attrib = net.select("_change_type", "_change_ordinal",
      "_commit_snapshot_id").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(attrib == Set(("insert", 0, 2L), ("delete", 1, 3L)), attrib)
    // non-net on the same window shows both sides of the churn
    val raw = IcebergRest.readChanges(spark, dir, s1)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bAll = nation.filter("n_regionkey = 1").count()
    val oddAll = nation
      .filter("n_regionkey <= 1 AND n_nationkey % 2 = 1").count()
    assert(raw == Map("insert" -> bAll, "delete" -> oddAll), raw)
  }

  test("per-ref retention overrides: min-keep beats age, max-ref-age expires the ref") {
    val dir = Files.createTempDirectory("ice-refret").resolve("t")
    def commit(i: Int, tag: Option[String] = None): Long =
      IcebergLocal.append(dir, partFiles(spark.range(1).toDF("v")),
        timestampMs = i * 1000L, tag = tag)
    commit(1, Some("old-tag"))
    (2 to 5).foreach(i => commit(i))
    // declare: the old tag itself expires after 1 s of age; main keeps
    // its newest 3 regardless of the sweep's age cutoff
    IcebergLocal.setRefRetention(dir, "old-tag", maxRefAgeMs = Some(1000L))
    IcebergLocal.setRefRetention(dir, "main",
      minSnapshotsToKeep = Some(3))
    // retention fields survive ordinary commits (refs are re-stamped)
    commit(6)
    val ret = IcebergLocal.currentMetadata(dir).get.refRetention
    assert(ret("main").minSnapshotsToKeep.contains(3) &&
      ret("old-tag").maxRefAgeMs.contains(1000L), ret)
    // sweep at t=9000 with an expire-everything cutoff: the tag is
    // 8 s old → the REF drops and s1 loses its pin; main's override
    // keeps the newest 3 (s4,s5,s6) past the age cutoff
    val before = countVia(dir)
    val expired = IcebergLocal.expireSnapshots(dir, olderThanMs = 99999L,
      minSnapshotsToKeep = 1, timestampMs = 9000L)
    assert(expired == Seq(1L, 2L, 3L), s"expired $expired")
    val m = IcebergLocal.currentMetadata(dir).get
    assert(m.snapshots.map(_.snapshotId).sorted == Seq(4L, 5L, 6L))
    assert(m.refs.keySet == Set("main"), m.refs)
    assert(countVia(dir) == before, "ref-aware expire changed the rows")
  }

  test("compaction through the REST commit protocol; stale rewrite 409s") {
    val root = Files.createTempDirectory("ice-restcompact")
    val dir = root.resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    IcebergLocal.append(dir, partFiles(nation.filter("n_regionkey <= 1")),
      timestampMs = 1000L, schema = Some(nation.schema))
    val server = new IcebergLocal.CatalogServer(root, "lake")
    val port = server.start()
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$port")
      // MoR debt to compact away: two row-level deletes → two
      // position-delete files
      IcebergMaintenance.deleteWhere(spark, dir,
        "n_nationkey % 2 = 1", () => 2000L)
      IcebergMaintenance.deleteWhere(spark, dir,
        "n_nationkey = 0", () => 2200L)
      val live = nation.filter(
        "n_regionkey <= 1 AND n_nationkey % 2 = 0 AND n_nationkey <> 0")
        .count()
      // POSITION-DELETE rewrite through the catalog first: the two
      // delete files merge into one, data files untouched, reads same
      val rewritten = IcebergRestCommit.rewritePositionDeletes(
        spark, cat, "lake", "t", dir, targetFiles = 1,
        timestampMs = 2500L)
      val mRw = cat.loadTable("lake", "t")
      assert(mRw.refs("main")._2 == rewritten)
      val rwScan = IcebergManifests.scanFiles(spark,
        mRw.snapshots.find(_.snapshotId == rewritten).get.manifestList)
      assert(rwScan.positionDeletes.size == 1,
        s"${rwScan.positionDeletes.size} delete files after rewrite")
      assert(IcebergRest.read(spark, cat, "lake", "t").count() == live,
        "REST posdel rewrite changed the read")
      // a second rewrite is a no-op (already one merged file... still
      // one file qualifies, but rewriting one file into one is legal —
      // assert instead that a DEBT-FREE table no-ops after compaction,
      // below)
      val compacted = IcebergRestCommit.compact(spark, cat, "lake", "t",
        dir, timestampMs = 3000L)
      val m = cat.loadTable("lake", "t")
      assert(m.refs("main")._2 == compacted)
      assert(m.refs.exists(r => r._2 == ("tag", compacted)), m.refs)
      // reads unchanged, and the new head carries ZERO delete files
      assert(IcebergRest.read(spark, cat, "lake", "t").count() == live)
      val headScan = IcebergManifests.scanFiles(spark,
        m.snapshots.find(_.snapshotId == compacted).get.manifestList)
      assert(headScan.positionDeletes.isEmpty &&
        headScan.equalityDeletes.isEmpty,
        "REPLACE head still carries delete files")
      // pre-compaction history stays travelable (deletes applied)
      assert(IcebergRest.read(spark, cat, "lake", "t",
        Some(graft.sources.SnapshotLog.ByVersion(rewritten.toString)))
        .count() == live)
      // debt-free after compaction: the posdel rewrite no-ops
      assert(IcebergRestCommit.rewritePositionDeletes(
        spark, cat, "lake", "t", dir, 1, 3200L) == -1L)
      // Z-ORDER compaction rides the same route: clustered rewrite,
      // REPLACE commit, reads unchanged, bounded file count
      val zed = IcebergRestCommit.compactZOrder(spark, cat, "lake", "t",
        dir, cols = Seq("n_nationkey", "n_regionkey"), files = 2,
        timestampMs = 3500L)
      assert(cat.loadTable("lake", "t").refs("main")._2 == zed)
      assert(IcebergRest.read(spark, cat, "lake", "t").count() == live)
      val zScan = IcebergManifests.scanFiles(spark,
        cat.loadTable("lake", "t").snapshots
          .find(_.snapshotId == zed).get.manifestList)
      assert(zScan.dataFiles.size <= 2, s"${zScan.dataFiles.size} files")
      // a STALE compaction (computed against head H, another commit
      // landed) must 409, never silently drop the racer's rows: replay
      // the same replace body against the moved table
      IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 2")), 4000L)
      val staleReplace =
        s"""{"requirements":[
           |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$compacted}],
           | "updates":[
           |  {"action":"add-snapshot","snapshot":{"snapshot-id":99,
           |   "sequence-number":99,"timestamp-ms":5000,
           |   "manifest-list":"file:///stale","schema-id":0,
           |   "summary":{"operation":"replace"}}},
           |  {"action":"set-snapshot-ref","ref-name":"main","type":"branch",
           |   "snapshot-id":99}]}""".stripMargin
      intercept[IcebergCommitConflict](
        cat.commitTable("lake", "t", staleReplace))
    } finally {
      server.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("snapshot expiry through the REST commit protocol") {
    val root = Files.createTempDirectory("ice-restexpire")
    val dir = root.resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    IcebergLocal.append(dir, partFiles(nation.filter("n_regionkey = 0")),
      timestampMs = 1000L, schema = Some(nation.schema))
    val server = new IcebergLocal.CatalogServer(root, "lake")
    val port = server.start()
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$port")
      IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 1")), 2000L)
      IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 2")), 3000L)
      // tag snapshot 2 for retention through a ref-only commit
      cat.commitTable("lake", "t",
        """{"requirements":[],"updates":[{"action":"set-snapshot-ref",
          |"ref-name":"keep","type":"tag","snapshot-id":2}]}""".stripMargin)
      // a remove-snapshots naming a still-referenced snapshot: 400
      val e = intercept[Exception](cat.commitTable("lake", "t",
        """{"requirements":[],"updates":[
          |{"action":"remove-snapshots","snapshot-ids":[2]}]}""".stripMargin))
      assert(e.getMessage.contains("still referenced"), e.getMessage)
      // the planned sweep: cutoff expires s1 (s2 is tag-pinned, s3 is
      // the main head) — one CAS-gated commit, server GCs the list
      val expired = IcebergRestCommit.expireSnapshots(cat, "lake", "t",
        olderThanMs = 2500L, minSnapshotsToKeep = 1, timestampMs = 9000L)
      assert(expired == Seq(1L), s"expired $expired")
      val m = cat.loadTable("lake", "t")
      assert(m.snapshots.map(_.snapshotId).sorted == Seq(2L, 3L))
      assert(m.refs("keep")._2 == 2L && m.refs("main")._2 == 3L)
      assert(IcebergRest.read(spark, cat, "lake", "t").count() ==
        nation.filter("n_regionkey <= 2").count(),
        "REST expire changed the published read")
      // nothing left to expire → no commit, empty result
      assert(IcebergRestCommit.expireSnapshots(cat, "lake", "t",
        2500L, 1, 9001L).isEmpty)
      // main can never be removed through the protocol
      val e2 = intercept[Exception](cat.commitTable("lake", "t",
        """{"requirements":[],"updates":[
          |{"action":"remove-snapshot-ref","ref-name":"main"}]}""".stripMargin))
      assert(e2.getMessage.contains("cannot remove ref 'main'"))
    } finally {
      server.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("snapshot-log is carried across appends, not rebuilt: WAP + rollback lineage") {
    val dir = Files.createTempDirectory("ice-logcarry").resolve("t")
    def commit(i: Int, branch: Option[String] = None): Long =
      IcebergLocal.append(dir, partFiles(spark.range(1).toDF("v")),
        timestampMs = i * 1000L, branch = branch)
    commit(1)                          // s1 published @1000
    commit(2, Some("audit"))           // s2 staged — never logged
    commit(3, Some("audit"))           // s3 staged — never logged
    IcebergLocal.fastForward(dir, "audit", timestampMs = 4000L) // s3 @4000
    commit(5)                          // s4 @5000 (id 4)
    IcebergLocal.rollbackTo(dir, 3L, timestampMs = 6000L)
    commit(7)                          // s5 @7000 (id 5) — the append
                                       // that used to REBUILD the log
    val hist = IcebergRest.metaTable(spark, dir, "history")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(hist.toSeq == Seq(
      (1000L, 1L, false),   // initial publish
      (4000L, 3L, false),   // fast-forward, stamped at publish time
      (5000L, 4L, false),   // post-publish append
      (6000L, 3L, false),   // rollback re-publication — s3 twice
      (7000L, 5L, true)),   // head
      s"history $hist")
    assert(!hist.exists(_._2 == 2L), "branch commit leaked into history")
  }

  test("rollback refuses an unpublished branch head; cherry-pick refuses a re-pick") {
    val dir = Files.createTempDirectory("ice-guards").resolve("t")
    def commit(i: Int, branch: Option[String] = None): Long =
      IcebergLocal.append(dir, partFiles(spark.range(1).toDF("v")),
        timestampMs = i * 1000L, branch = branch)
    commit(1)
    val staged = commit(2, Some("audit"))
    // "rolling back" to the unaudited branch head would publish it
    val e = intercept[IllegalArgumentException](
      IcebergLocal.rollbackTo(dir, staged, timestampMs = 3000L))
    assert(e.getMessage.contains("not an ancestor"))
    // main diverges, the branch is cherry-picked once — fine
    commit(3)
    IcebergLocal.cherryPick(dir, "audit", timestampMs = 4000L)
    val rows = countVia(dir)
    // a second pick of the same branch must refuse, not duplicate rows
    val e2 = intercept[IllegalArgumentException](
      IcebergLocal.cherryPick(dir, "audit", timestampMs = 5000L))
    assert(e2.getMessage.contains("duplicate"))
    assert(countVia(dir) == rows)
  }

  test("manifest tail compacts into one EXISTING-entry manifest") {
    val dir = Files.createTempDirectory("ice-merge").resolve("t")
    val one = partFiles(spark.range(1).toDF("v"))
    val n = IcebergLocal.MergeManifestsAbove + 2
    (1 to n).foreach(i => IcebergLocal.append(dir, one, i * 1000L))
    val m = IcebergLocal.currentMetadata(dir).get
    // the carried tail reset at the merge: the latest manifest list holds
    // the merged record + the post-merge appends, not one per commit
    val listPath = java.nio.file.Paths.get(java.net.URI.create(
      m.snapshots.maxBy(_.snapshotId).manifestList))
    val reader = org.apache.avro.file.DataFileReader.openReader(
      listPath.toFile,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val records = try {
      val b = Seq.newBuilder[org.apache.avro.generic.GenericRecord]
      while (reader.hasNext) b += reader.next()
      b.result()
    } finally reader.close()
    assert(records.size < IcebergLocal.MergeManifestsAbove / 2,
      s"tail did not compact: ${records.size} records")
    // no rows lost across the compaction
    assert(countVia(dir) == n.toLong)
  }

  /** Row count of `tableDir`'s current snapshot through a throwaway
    * catalog over its PARENT (each ad-hoc table gets its own warehouse
    * so these tests stay independent of the shared one). */
  private def countVia(tableDir: JPath): Long = {
    val s = new IcebergLocal.CatalogServer(tableDir.getParent, "tmp")
    val p = s.start()
    try IcebergRest.read(spark,
      new IcebergRestCatalog(s"http://127.0.0.1:$p"), "tmp",
      tableDir.getFileName.toString).count()
    finally s.stop()
  }

  test("committed metadata carries the DataFrame's typed schema struct") {
    import org.apache.spark.sql.types._
    val dir = warehouse.resolve("typed")
    val df = spark.sql(
      """SELECT 1 AS i, CAST(2 AS BIGINT) AS l, CAST(2.5 AS DOUBLE) AS d,
        |CAST('9.99' AS DECIMAL(10,2)) AS dec, 's' AS s, true AS b,
        |DATE '2024-01-02' AS dt, TIMESTAMP '2024-01-02 03:04:05' AS ts,
        |named_struct('x', 1, 'y', 'v') AS st, array(1, 2) AS arr,
        |map('k', 1) AS m""".stripMargin)
    IcebergLocal.append(dir, partFiles(df), timestampMs = 1000L,
      schema = Some(df.schema))
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(IcebergLocal.currentMetadataFile(dir).get))
    val sc = meta.get("schemas").get(0)
    assert(sc.get("schema-id").asInt == 0)
    assert(meta.get("current-schema-id").asInt == 0)
    val fields = sc.get("fields")
    val byName = (0 until fields.size)
      .map(fields.get).map(f => f.get("name").asText -> f).toMap
    assert(byName("i").get("type").asText == "int")
    assert(byName("l").get("type").asText == "long")
    assert(byName("d").get("type").asText == "double")
    assert(byName("dec").get("type").asText == "decimal(10, 2)")
    assert(byName("s").get("type").asText == "string")
    assert(byName("b").get("type").asText == "boolean")
    assert(byName("dt").get("type").asText == "date")
    assert(byName("ts").get("type").asText == "timestamptz")
    assert(byName("st").get("type").get("type").asText == "struct")
    assert(byName("arr").get("type").get("type").asText == "list")
    assert(byName("arr").get("type").get("element").asText == "int")
    assert(byName("m").get("type").get("type").asText == "map")
    // ids are unique, dense from 1; last-column-id is the max assigned
    val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
    def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
      if (n.has("id")) ids += n.get("id").asInt
      Seq("element-id", "key-id", "value-id").foreach(k =>
        if (n.has(k)) ids += n.get(k).asInt)
      n.elements().asScala.foreach(walk)
    }
    walk(sc)
    assert(ids.distinct.length == ids.length, s"duplicate field ids: $ids")
    assert(ids.min == 1 && ids.max == meta.get("last-column-id").asInt)
    // a schema-less follow-up commit carries the schema forward
    IcebergLocal.append(dir, partFiles(df), timestampMs = 2000L)
    val meta2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(IcebergLocal.currentMetadataFile(dir).get))
    assert(meta2.get("schemas").get(0).get("fields").size == fields.size)
    assert(meta2.get("last-column-id").asInt == meta.get("last-column-id").asInt)
  }

  test("manifest merge keeps per-entry sequence numbers: upserts survive old equality deletes") {
    // the upsert workload: v1 of key 0 (seq 1), equality-delete key 0
    // (seq 2), v2 of key 0 (seq 3) — then enough filler commits to
    // cross MergeManifestsAbove. A merge that flattens sequence numbers
    // to the manifest minimum re-exposes v2 to the seq-2 delete and
    // silently loses the NEWEST version of the key; per-entry
    // sequence_number stamping must keep it alive.
    val root = Files.createTempDirectory("ice-seqmerge")
    val dir = root.resolve("t")
    import spark.implicits._
    val vDir = root.resolve("files")
    Seq((0L, "v1")).toDF("k", "v").coalesce(1).write
      .parquet(vDir.resolve("v1").toString)
    Seq((0L, "v2")).toDF("k", "v").coalesce(1).write
      .parquet(vDir.resolve("v2").toString)
    Seq(0L).toDF("k").coalesce(1).write
      .parquet(vDir.resolve("del").toString)
    def infos(sub: String, content: Int = 0, ids: Seq[Int] = Nil) =
      IcebergMaintenance.parquetFileInfos(vDir.resolve(sub), content, ids)
    IcebergLocal.append(dir, infos("v1"), 1000L,
      schema = Some(Seq((0L, "x")).toDF("k", "v").schema))
    IcebergLocal.append(dir, infos("del", content = 2, ids = Seq(1)), 2000L)
    IcebergLocal.append(dir, infos("v2"), 3000L)
    // filler: DISTINCT one-row data files (duplicate paths would break
    // the MoR file-tagging join), one commit each, crossing the merge
    val n = IcebergLocal.MergeManifestsAbove + 3
    spark.range(1, n + 1L).toDF("k")
      .withColumn("v", org.apache.spark.sql.functions.lit("f"))
      .repartitionByRange(n, $"k") // one row per partition: n real files
      .write.parquet(vDir.resolve("fill").toString)
    val fillFiles = infos("fill").filter(_.recordCount > 0)
    assert(fillFiles.size > IcebergLocal.MergeManifestsAbove,
      s"filler too small to cross the merge threshold: ${fillFiles.size}")
    fillFiles.zipWithIndex.foreach { case (f, i) =>
      IcebergLocal.append(dir, Seq(f), 4000L + i)
    }
    try {
      // the merge must have actually happened — otherwise this test is
      // vacuously green: the head manifest list carries far fewer
      // records than one per commit
      val m = IcebergLocal.currentMetadata(dir).get
      val listPath = java.nio.file.Paths.get(java.net.URI.create(
        m.snapshots.maxBy(_.snapshotId).manifestList))
      val reader = org.apache.avro.file.DataFileReader.openReader(
        listPath.toFile,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      val listRecords = try {
        var c = 0
        while (reader.hasNext) { reader.next(); c += 1 }
        c
      } finally reader.close()
      assert(listRecords < fillFiles.size / 2,
        s"data-manifest tail did not compact: $listRecords")
      val df = IcebergRest.readLocal(spark, dir)
      val k0 = df.filter("k = 0").select("v").collect()
        .map(_.getString(0)).toSeq
      assert(k0 == Seq("v2"), s"key 0 rows after manifest merge: $k0")
      assert(df.count() == fillFiles.map(_.recordCount).sum + 1)
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("upsert equality ids survive nested columns preceding the key") {
    // depth-first spec ids for [s:struct{x,y}, a, k] are s=1 (x=2, y=3),
    // a=4, k=5 — "fieldIndex + 1" would stamp 3 (the NESTED y) as the
    // key id and the read would anti-join on the wrong column or refuse
    val root = Files.createTempDirectory("ice-upsert-nested")
    val dir = root.resolve("t")
    var t = 0L
    val commit = graft.streaming.IcebergSink.upsertCommitter(
      dir, Seq("k"), clock = () => { t += 1000; t })
    def batch(aVal: String, k: Int) = spark.sql(
      s"SELECT named_struct('x', 1, 'y', 2) AS s, '$aVal' AS a, $k AS k")
    try {
      commit(batch("v1", 10), 0L)
      commit(batch("v2", 10).union(batch("w1", 20)), 1L)
      val df = IcebergRest.readLocal(spark, dir)
      val rows = df.select("k", "a").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(rows == Map(10 -> "v2", 20 -> "w1"),
        s"upsert resolved the wrong equality column: $rows")
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("fieldIdReads does not leak the field-id conf into the caller's session") {
    val root = Files.createTempDirectory("ice-conf")
    val dir = root.resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name")
    val stamped = IcebergLocal.withFieldIds(nation)
    IcebergLocal.append(dir, partFiles(stamped), timestampMs = 1000L,
      schema = Some(stamped.schema))
    IcebergLocal.renameColumn(dir, "n_name", "label")
    try {
      val df = IcebergRest.readLocal(spark, dir,
        options = Map("fieldIdReads" -> "true"))
      assert(df.columns.toSeq == Seq("n_nationkey", "label"))
      assert(df.count() == 25) // the evolved read itself works...
      // ...and the CALLER's session conf is untouched: a later plain
      // parquet read of id-stamped files must keep resolving by name
      assert(spark.conf.get(
        "spark.sql.parquet.fieldId.read.enabled") == "false")
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("one commit can mix positional and equality delete files") {
    // a MERGE-style committer legally produces both delete kinds in one
    // commit; they share a content=1 delete manifest
    val root = Files.createTempDirectory("ice-mixdel")
    val dir = root.resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .orderBy("n_nationkey")
    val dataInfos = partFiles(nation)
    IcebergLocal.append(dir, dataInfos, timestampMs = 1000L,
      schema = Some(nation.schema))
    import spark.implicits._
    val posDir = root.resolve("pos")
    Seq((dataInfos.head.path, 0L)).toDF("file_path", "pos").coalesce(1)
      .write.parquet(posDir.toString)
    val eqDir = root.resolve("eq")
    Seq(5).toDF("n_nationkey").coalesce(1).write.parquet(eqDir.toString)
    val mixed =
      IcebergMaintenance.parquetFileInfos(posDir, content = 1) ++
      IcebergMaintenance.parquetFileInfos(eqDir, content = 2,
        equalityIds = Seq(1))
    IcebergLocal.append(dir, mixed, timestampMs = 2000L)
    try {
      val df = IcebergRest.readLocal(spark, dir)
      assert(df.count() == 23)
      assert(df.filter("n_nationkey IN (0, 5)").count() == 0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("REST commit: append-through-catalog with CAS; stale writers get 409") {
    val root = Files.createTempDirectory("ice-restcommit")
    val dir = root.resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    // base state: a local first commit (schema lives catalog-side)
    IcebergLocal.append(dir, partFiles(nation.filter("n_regionkey = 0")),
      timestampMs = 1000L, schema = Some(nation.schema))
    val server = new IcebergLocal.CatalogServer(root, "lake")
    val port = server.start()
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$port")
      // append THROUGH the commit endpoint
      val snap2 = IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 1")), 2000L,
        tag = Some("rest-1"))
      assert(snap2 == 2L)
      val after = IcebergRest.read(spark, cat, "lake", "t")
      assert(after.count() == nation.filter("n_regionkey <= 1").count())
      // the tag update landed; time travel through it works
      assert(IcebergRest.read(spark, cat, "lake", "t",
        Some(graft.sources.SnapshotLog.ByVersion("rest-1"))).count() ==
        after.count())
      // a STALE commit (built on snapshot 1 after the head moved to 2)
      // must 409 and leave the metadata untouched
      val stale =
        """{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":1}],
          |"updates":[{"action":"add-snapshot","snapshot":{"snapshot-id":9,
          |"sequence-number":9,"timestamp-ms":9000,"manifest-list":"file:///nope",
          |"schema-id":0,"summary":{"operation":"append"}}},
          |{"action":"set-snapshot-ref","ref-name":"main","type":"branch","snapshot-id":9}]}"""
          .stripMargin
      val e = intercept[IcebergCommitConflict] {
        cat.commitTable("lake", "t", stale)
      }
      assert(e.getMessage.contains("requirement failed"), e.getMessage)
      assert(cat.loadTable("lake", "t").currentSnapshotId.contains(2L))
      // an unsupported requirement is a 400, not a silent apply
      val bad = intercept[java.io.IOException] {
        cat.commitTable("lake", "t",
          """{"requirements":[{"type":"assert-nonsense"}],"updates":[]}""")
      }
      assert(bad.getMessage.contains("400"), bad.getMessage)
    } finally {
      server.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("REST create: an empty table commits its first snapshot under the CAS") {
    val root = Files.createTempDirectory("ice-create")
    val server = new IcebergLocal.CatalogServer(root, "lake")
    val port = server.start()
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$port")
      cat.createTable("lake", "fresh", nation.schema)
      assert(cat.listTables("lake").contains("fresh"))
      val meta = cat.loadTable("lake", "fresh")
      assert(meta.snapshots.isEmpty && meta.currentSnapshotId.isEmpty)
      // the created schema is live catalog state: field ids resolve
      assert(meta.fieldNames(1) == "n_nationkey")
      // a racing (duplicate) create resolves like a lost CAS
      intercept[IcebergCommitConflict] {
        cat.createTable("lake", "fresh", nation.schema)
      }
      // first data commit rides the SAME CAS, main asserted absent
      val s1 = IcebergRestCommit.append(cat, "lake", "fresh",
        root.resolve("fresh"), partFiles(nation), 1000L)
      assert(s1 == 1L)
      assert(IcebergRest.read(spark, cat, "lake", "fresh").count() == 25)
    } finally {
      server.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("REST commit: racing writers both land via CAS retry, no lost update") {
    val root = Files.createTempDirectory("ice-race")
    val dir = root.resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    IcebergLocal.append(dir, partFiles(nation.filter("n_nationkey = 0")),
      timestampMs = 1000L, schema = Some(nation.schema))
    val server = new IcebergLocal.CatalogServer(root, "lake")
    val port = server.start()
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$port")
      // pre-write both writers' data files, then race the COMMITS
      val aFiles = partFiles(nation.filter("n_nationkey = 1"))
      val bFiles = partFiles(nation.filter("n_nationkey = 2"))
      import java.util.concurrent.{CountDownLatch, Executors}
      val pool = Executors.newFixedThreadPool(2)
      val gate = new CountDownLatch(1)
      def racer(files: Seq[IcebergLocal.DataFileInfo]) =
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            gate.await()
            IcebergRestCommit.append(cat, "lake", "t", dir, files, 2000L)
          }
        })
      val fa = racer(aFiles)
      val fb = racer(bFiles)
      gate.countDown()
      val (sa, sb) = (fa.get(), fb.get())
      pool.shutdown()
      // both landed, on DIFFERENT snapshots (one retried past the 409)
      assert(Set(sa, sb) == Set(2L, 3L), s"snapshots: $sa, $sb")
      val after = IcebergRest.read(spark, cat, "lake", "t")
      assert(after.count() == 3, "a racing writer's rows were lost")
      assert(after.select("n_nationkey").collect()
        .map(_.getAs[Number](0).longValue()).toSet == Set(0L, 1L, 2L))
      // linear history: 3 snapshots, main at the last
      val meta = cat.loadTable("lake", "t")
      assert(meta.snapshots.map(_.snapshotId).sorted == Seq(1L, 2L, 3L))
      assert(meta.currentSnapshotId.contains(3L))
    } finally {
      server.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("REST commit stress: 8 writers × 4 commits, no lost snapshot, linear history") {
    // the two-thread race scaled up: 8 concurrent writers each land 4
    // tagged commits with jittered pacing, every one riding the CAS
    // retry loop. Linearizability contract: snapshot ids are exactly
    // the contiguous range (no gap, no duplicate, no overwrite), every
    // writer's own commits land in its session order, all 32 tags
    // resolve to 32 DISTINCT snapshots, and the final read is the
    // union of every commit's rows.
    import spark.implicits._
    val root = Files.createTempDirectory("ice-stress")
    val dir = root.resolve("t")
    IcebergLocal.append(dir, partFiles(Seq((-1, -1)).toDF("w", "c")),
      timestampMs = 1000L, schema = Some(Seq((-1, -1)).toDF("w", "c").schema))
    val server = new IcebergLocal.CatalogServer(root, "lake")
    val port = server.start()
    val writers = 8
    val commitsEach = 4
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$port")
      // pre-write every commit's data file (Spark jobs stay out of the
      // racing threads; manifest prep still re-runs per CAS attempt
      // inside append, which is the contended path under test)
      val files = (0 until writers).map(i => (0 until commitsEach).map(j =>
        partFiles(Seq((i, j)).toDF("w", "c"))))
      import java.util.concurrent.{CountDownLatch, Executors}
      val pool = Executors.newFixedThreadPool(writers)
      val gate = new CountDownLatch(1)
      val landed =
        new java.util.concurrent.ConcurrentHashMap[(Int, Int), Long]()
      val tasks = (0 until writers).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            gate.await()
            val jitter = new scala.util.Random(i * 7919)
            (0 until commitsEach).foreach { j =>
              Thread.sleep(jitter.nextInt(7).toLong)
              val s = IcebergRestCommit.append(cat, "lake", "t", dir,
                files(i)(j), 2000L + i * 10 + j, tag = Some(s"w$i-c$j"),
                maxRetries = 200)
              landed.put((i, j), s)
            }
          }
        })
      }
      gate.countDown()
      tasks.foreach(_.get())
      pool.shutdown()
      val total = writers * commitsEach
      assert(landed.size == total, "a writer died mid-stress")
      import scala.jdk.CollectionConverters._
      val snaps = landed.asScala.toMap
      // no lost snapshot, no duplicate, contiguous range = linear history
      assert(snaps.values.toSet == (2L to (total + 1).toLong).toSet,
        s"snapshot ids not the contiguous range: ${snaps.values.toSeq.sorted}")
      // each writer's commits land in ITS order
      for (i <- 0 until writers; j <- 0 until commitsEach - 1)
        assert(snaps((i, j)) < snaps((i, j + 1)),
          s"writer $i commit $j landed after commit ${j + 1}")
      val meta = cat.loadTable("lake", "t")
      assert(meta.snapshots.map(_.snapshotId).sorted ==
        (1L to (total + 1).toLong))
      assert(meta.currentSnapshotId.contains((total + 1).toLong))
      // all 32 tags present, on the snapshots their writers reported
      for (i <- 0 until writers; j <- 0 until commitsEach)
        assert(meta.refs.get(s"w$i-c$j").map(_._2).contains(snaps((i, j))),
          s"tag w$i-c$j lost or moved")
      // the union read: one row per commit plus the base row
      val after = IcebergRest.read(spark, cat, "lake", "t")
      assert(after.count() == total + 1, "a racing writer's rows were lost")
      assert(after.as[(Int, Int)].collect().toSet ==
        ((-1, -1) +: (for (i <- 0 until writers; j <- 0 until commitsEach)
          yield (i, j))).toSet)
    } finally {
      server.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("partition spec evolution rides the REST commit protocol") {
    val root = Files.createTempDirectory("ice-specrest")
    val dir = root.resolve("t")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val specA = Seq(PartitionField("om", "o_orderdate", "month"))
    val specB = specA :+ PartitionField("ckb", "o_custkey", "bucket[4]")
    val server = new IcebergLocal.CatalogServer(root, "lake")
    val port = server.start()
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$port")
      cat.createTable("lake", "t", orders.schema, Some(specA))
      IcebergRestCommit.append(cat, "lake", "t", dir,
        IcebergPartitioned.writeFiles(orders.where("o_orderkey % 2 = 0"),
          dir.resolve("data").resolve("b0"), specA),
        1000L, partitionSpec = Some(specA), schema = Some(orders.schema))
      // the evolved commit: add-spec + set-default-spec ride the same
      // CommitTableRequest as the snapshot
      IcebergRestCommit.append(cat, "lake", "t", dir,
        IcebergPartitioned.writeFiles(orders.where("o_orderkey % 2 = 1"),
          dir.resolve("data").resolve("b1"), specB),
        2000L, partitionSpec = Some(specB), schema = Some(orders.schema))
      val meta = cat.loadTable("lake", "t")
      assert(meta.partitionSpecs(0) == specA, "spec A lost")
      assert(meta.partitionSpecs(1) == specB, "add-spec not applied")
      assert(meta.defaultSpecId == 1, "set-default-spec not applied")
      // mixed-spec pruned read THROUGH the catalog stays exact
      val f = "o_orderdate >= date '1995-03-01' AND " +
        "o_orderdate < date '1995-06-01'"
      val pruned = IcebergRest.read(spark, cat, "lake", "t",
        options = Map("filter" -> f))
      val full = IcebergRest.read(spark, cat, "lake", "t").where(f)
      assert(pruned.count() == full.count() && full.count() > 0)
      assert(pruned.inputFiles.length <
        IcebergRest.read(spark, cat, "lake", "t").inputFiles.length,
        "catalog-side spec evolution did not prune")
      // a RE-USED spec id is a 409 (the racing-evolution shape), and
      // the metadata stays untouched
      val head = meta.currentSnapshotId.get
      val stale =
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$head}],
           |"updates":[{"action":"add-spec","spec":{"spec-id":1,"fields":[]}},
           |{"action":"add-snapshot","snapshot":{"snapshot-id":99,
           |"sequence-number":99,"timestamp-ms":9000,
           |"manifest-list":"file:///nope","schema-id":0,
           |"summary":{"operation":"append"}}},
           |{"action":"set-snapshot-ref","ref-name":"main","type":"branch",
           |"snapshot-id":99}]}""".stripMargin
      intercept[IcebergCommitConflict] {
        cat.commitTable("lake", "t", stale)
      }
      assert(cat.loadTable("lake", "t").currentSnapshotId.contains(head))
      // an identical-spec re-commit reuses the id: no spec 2 minted
      IcebergRestCommit.append(cat, "lake", "t", dir,
        IcebergPartitioned.writeFiles(orders.where("o_orderkey % 100 = 50"),
          dir.resolve("data").resolve("b2"), specB),
        3000L, partitionSpec = Some(specB), schema = Some(orders.schema))
      assert(cat.loadTable("lake", "t").partitionSpecs.keySet == Set(0, 1))
    } finally {
      server.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("the catalog server works from a relative warehouse path") {
    val rel = java.nio.file.Paths.get("").toAbsolutePath
      .relativize(warehouse)
    assert(!rel.isAbsolute)
    val s2 = new IcebergLocal.CatalogServer(rel, "relns")
    val p2 = s2.start()
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$p2")
      assert(cat.listTables("relns").contains("nation"))
      // the table-metadata endpoint (the one the containment check
      // guarded) must serve, not 404
      val df = IcebergRest.read(spark, cat, "relns", "nation", None)
      assert(df.count() == 25)
    } finally s2.stop()
  }

  test("iceberg_rest registers through SourceRegistry like any source") {
    import graft.sources.{SourceDef, SourceRegistry, SourcesConfig, TableDef}
    new SourceRegistry(spark).registerAll(SourcesConfig(Seq(
      SourceDef(name = "lake", sourceType = "iceberg_rest",
        url = Some(s"http://127.0.0.1:$port"),
        options = Map("namespace" -> "analytics", "version" -> "initial"),
        tables = Seq(TableDef(name = "nation"))))))
    val df = spark.table("lake_nation")
    assert(df.count() ==
      spark.read.parquet(s"$sf/nation.parquet")
        .filter("n_regionkey < 2").count())
    // `$`-suffixed inspection tables register like data tables: the
    // clean view name serves the metadata table (`path` carries the
    // Iceberg `table$kind` spelling), zero data I/O behind it
    new SourceRegistry(spark).registerAll(SourcesConfig(Seq(
      SourceDef(name = "lake", sourceType = "iceberg_rest",
        url = Some(s"http://127.0.0.1:$port"),
        options = Map("namespace" -> "analytics"),
        tables = Seq(
          TableDef(name = "nation_history", path = Some("nation$history")),
          TableDef(name = "nation_refs", path = Some("nation$refs")))))))
    val hist = spark.sql(
      "SELECT snapshot_id FROM lake_nation_history WHERE is_current")
      .collect().map(_.getLong(0)).toSeq
    assert(hist.size == 1, s"history is_current rows: $hist")
    assert(spark.table("lake_nation_refs")
      .filter("name = 'main'").count() == 1)
    // unknown inspection suffix: loud at registration
    val e = intercept[IllegalArgumentException](
      new SourceRegistry(spark).registerAll(SourcesConfig(Seq(
        SourceDef(name = "lake", sourceType = "iceberg_rest",
          url = Some(s"http://127.0.0.1:$port"),
          options = Map("namespace" -> "analytics"),
          tables = Seq(TableDef(name = "bad", path = Some("nation$nope"))))))))
    assert(e.getMessage.contains("unknown Iceberg inspection table"))
    // the session is SHARED across suites: drop this test's views so
    // later catalog-discovery assertions (Flight/HTTP edges listing
    // `nation%`) see only the tpch tables
    Seq("nation_history", "nation_refs", "lake_nation_history",
      "lake_nation_refs").foreach(v =>
      spark.catalog.dropTempView(v))
  }

  private def metadataVersions(dir: JPath): Seq[Long] = {
    val s = Files.list(dir.resolve("metadata"))
    try s.iterator().asScala.toSeq
      .flatMap(p => "v(\\d+)\\.metadata\\.json".r
        .findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
      .sorted
    finally s.close()
  }

  test("schema evolution commits a NEW immutable metadata version") {
    // the format treats metadata files as immutable: a rename/add/drop
    // must land as v(N+1).metadata.json (atomic move), never an
    // in-place rewrite — a crash mid-write must not tear the newest
    // metadata, and the prior version stays as the rollback point
    val dir = warehouse.resolve("evver")
    val base = IcebergLocal.withFieldIds(
      spark.read.parquet(s"$sf/nation.parquet")
        .select("n_nationkey", "n_name"))
    IcebergLocal.append(dir, partFiles(base), timestampMs = 1000L,
      schema = Some(base.schema))
    try {
      val before = metadataVersions(dir)
      val priorFile = IcebergLocal.currentMetadataFile(dir).get
      val priorBytes = Files.readAllBytes(priorFile)
      IcebergLocal.addColumn(dir, "note", "string")
      val after = metadataVersions(dir)
      assert(after.size == before.size + 1 && after.max == before.max + 1,
        s"evolution did not add exactly one version: $before -> $after")
      assert(java.util.Arrays.equals(priorBytes,
        Files.readAllBytes(priorFile)),
        "evolution rewrote the prior metadata version in place")
      // no torn temp leftovers visible to the version scan
      assert(IcebergLocal.currentMetadataFile(dir).get !=
        priorFile)
      // a SNAPSHOT commit after the evolution must not collide with
      // (and silently supersede) the evolution's version file — and
      // must carry the evolved schema forward
      IcebergLocal.append(dir, partFiles(base), timestampMs = 2000L)
      val end = metadataVersions(dir)
      assert(end.size == after.size + 1 && end.max == after.max + 1,
        s"snapshot commit collided with an evolution version: $end")
      val df = IcebergRest.readLocal(spark, dir,
        options = Map("fieldIdReads" -> "true"))
      assert(df.columns.toSeq == Seq("n_nationkey", "n_name", "note"))
      assert(df.count() == 50)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("schema evolution through the REST commit protocol is CAS-gated") {
    val dir = warehouse.resolve("restev")
    val base = IcebergLocal.withFieldIds(
      spark.read.parquet(s"$sf/nation.parquet")
        .select("n_nationkey", "n_name"))
    IcebergLocal.append(dir, partFiles(base), timestampMs = 1000L,
      schema = Some(base.schema))
    try {
      // add + rename through the catalog's commit endpoint
      val sid1 = IcebergRestCommit.addColumn(catalog, "analytics",
        "restev", "tier", "string")
      assert(sid1 == 1)
      val sid2 = IcebergRestCommit.renameColumn(catalog, "analytics",
        "restev", "n_name", "label")
      assert(sid2 == 2)
      val df = IcebergRest.read(spark, catalog, "analytics", "restev",
        options = Map("fieldIdReads" -> "true"))
      assert(df.columns.toSeq == Seq("n_nationkey", "label", "tier"))
      assert(df.filter("label IS NULL").count() == 0)
      // each evolution is its own metadata version, priors intact
      assert(metadataVersions(dir).size == 3)
      // the CAS: a commit asserting a STALE current-schema-id must 409
      // (racing schema writers can't silently drop each other's change)
      val stale =
        """{"requirements":[
          |  {"type":"assert-current-schema-id","current-schema-id":0}],
          | "updates":[
          |  {"action":"add-schema","schema":{"type":"struct","schema-id":3,
          |    "fields":[{"id":1,"name":"n_nationkey","required":false,
          |      "type":"long"}]}},
          |  {"action":"set-current-schema","schema-id":-1}]}""".stripMargin
      intercept[IcebergCommitConflict](
        catalog.commitTable("analytics", "restev", stale))
      // a non-next schema-id is refused even with a fresh CAS
      val skipId =
        """{"requirements":[
          |  {"type":"assert-current-schema-id","current-schema-id":2}],
          | "updates":[
          |  {"action":"add-schema","schema":{"type":"struct","schema-id":9,
          |    "fields":[{"id":1,"name":"n_nationkey","required":false,
          |      "type":"long"}]}},
          |  {"action":"set-current-schema","schema-id":-1}]}""".stripMargin
      intercept[IcebergCommitConflict](
        catalog.commitTable("analytics", "restev", skipId))
      // drop through the protocol; reads reflect it
      IcebergRestCommit.dropColumn(catalog, "analytics", "restev", "tier")
      val dropped = IcebergRest.read(spark, catalog, "analytics", "restev",
        options = Map("fieldIdReads" -> "true"))
      assert(dropped.columns.toSeq == Seq("n_nationkey", "label"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("incremental read: appended rows only, loud refusals elsewhere") {
    val dir = warehouse.resolve("incr")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    def commit(pred: String, ts: Long): Long =
      IcebergLocal.append(dir, partFiles(nation.filter(pred)), ts,
        schema = Some(nation.schema))
    val s1 = commit("n_regionkey = 0", 1000L)
    val s2 = commit("n_regionkey = 1", 2000L)
    val s3 = commit("n_regionkey = 2", 3000L)
    try {
      // (s1, head]: regions 1 and 2 only
      val inc = IcebergRest.readIncremental(spark, dir, s1)
      assert(inc.count() == nation.filter("n_regionkey IN (1,2)").count())
      assert(inc.filter("n_regionkey = 0").count() == 0)
      // bounded window (s1, s2]
      val win = IcebergRest.readIncremental(spark, dir, s1, Some(s2))
      assert(win.count() == nation.filter("n_regionkey = 1").count())
      // from 0 = everything; empty window = empty frame WITH schema
      assert(IcebergRest.readIncremental(spark, dir, 0L).count() ==
        nation.filter("n_regionkey <= 2").count())
      val empty = IcebergRest.readIncremental(spark, dir, s3)
      assert(empty.count() == 0 &&
        empty.columns.toSeq == nation.columns.toSeq)
      // unknown snapshot: loud
      intercept[IllegalArgumentException](
        IcebergRest.readIncremental(spark, dir, 99L))
      // a delete in the window: loud refusal
      IcebergMaintenance.deleteWhere(spark, dir, "n_regionkey = 1",
        () => 4000L)
      val e1 = intercept[IllegalArgumentException](
        IcebergRest.readIncremental(spark, dir, s3))
      assert(e1.getMessage.contains("delete"))
      // ...but a window strictly BEFORE the delete still reads
      assert(IcebergRest.readIncremental(spark, dir, s1, Some(s3))
        .count() == nation.filter("n_regionkey IN (1,2)").count())
      // a rewrite in the window: loud refusal
      IcebergMaintenance.compact(spark, dir, () => 5000L)
      val e2 = intercept[IllegalArgumentException](
        IcebergRest.readIncremental(spark, dir, s3))
      assert(e2.getMessage.contains("rewrite"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("metadata tables serve through the REST catalog, refs included") {
    // the shared `nation` table (beforeAll): snapshots/history/refs via
    // the catalog client, no tableDir in sight
    val snaps = IcebergRest.metaTable(spark, catalog, "analytics",
      "nation", "snapshots").collect()
    assert(snaps.map(_.getLong(1)).toSeq == Seq(snap1, snap2))
    val refs = IcebergRest.metaTable(spark, catalog, "analytics",
      "nation", "refs").collect()
    val byName = refs.map(r =>
      r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byName("main") == ("branch", snap2))
    assert(byName("initial") == ("tag", snap1))
    // files honors time travel through the catalog too
    val files1 = IcebergRest.metaTable(spark, catalog, "analytics",
      "nation", "files", Some(ByVersion("initial")))
    assert(files1.count() == 1)
    intercept[IllegalArgumentException](
      IcebergRest.metaTable(spark, catalog, "analytics", "nation", "nope"))
  }

  test("write-audit-publish: branch commits stay invisible until fast-forward") {
    val dir = warehouse.resolve("wap")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    def commit(pred: String, ts: Long, branch: Option[String] = None): Long =
      IcebergLocal.append(dir, partFiles(nation.filter(pred)), ts,
        schema = Some(nation.schema), branch = branch)
    try {
      val s1 = commit("n_regionkey = 0", 1000L)
      // two AUDIT commits on a branch: main must not see them
      val s2 = commit("n_regionkey = 1", 2000L, Some("audit"))
      val s3 = commit("n_regionkey = 2", 3000L, Some("audit"))
      val r0 = nation.filter("n_regionkey = 0").count()
      val r01 = nation.filter("n_regionkey <= 1").count()
      val r012 = nation.filter("n_regionkey <= 2").count()
      assert(IcebergRest.readLocal(spark, dir).count() == r0,
        "branch commit leaked into the published head")
      // the branch reads its own lineage (fork + both commits)
      assert(IcebergRest.readLocal(spark, dir,
        Some(ByVersion("audit"))).count() == r012)
      // second branch commit carried the BRANCH head, not max-snapshot
      assert(IcebergRest.readLocal(spark, dir,
        Some(ByVersion(s2.toString))).count() == r01)
      // refs metadata table shows the unpublished branch
      val refs = IcebergRest.metaTable(spark, dir, "refs").collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(refs("main") == s1 && refs("audit") == s3)
      // PUBLISH: fast-forward main to the audited branch
      val published = IcebergLocal.fastForward(dir, "audit")
      assert(published == s3)
      assert(IcebergRest.readLocal(spark, dir).count() == r012)
      // time travel to the pre-publish main still answers
      assert(IcebergRest.readLocal(spark, dir,
        Some(ByVersion(s1.toString))).count() == r0)
      // a MAIN commit after publish carries the published lineage
      val s5 = commit("n_regionkey = 3", 5000L)
      assert(IcebergRest.readLocal(spark, dir).count() ==
        nation.filter("n_regionkey <= 3").count())
      // DIVERGENCE refusal: branch forks, then main moves — the branch
      // head no longer descends from main, fast-forward must refuse
      commit("n_regionkey = 4", 6000L, Some("audit2"))
      commit("n_regionkey = 0", 7000L) // main moves past the fork
      val e = intercept[IllegalArgumentException](
        IcebergLocal.fastForward(dir, "audit2"))
      assert(e.getMessage.contains("not a fast-forward"))
      // unknown ref: loud
      intercept[IllegalArgumentException](
        IcebergLocal.fastForward(dir, "nope"))
      // and the diverged MAIN commit did not absorb the branch rows
      assert(IcebergRest.readLocal(spark, dir).count() ==
        nation.filter("n_regionkey <= 3").count() + r0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("REST rollback: ref-only commit moves main back under CAS") {
    val root = Files.createTempDirectory("ice-restrollback")
    val dir = root.resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    IcebergLocal.append(dir, partFiles(nation.filter("n_regionkey = 0")),
      timestampMs = 1000L, schema = Some(nation.schema))
    val server = new IcebergLocal.CatalogServer(root, "lake")
    val port = server.start()
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$port")
      val s2 = IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 1")), 2000L)
      // un-publish snapshot 2 through the catalog, with the operation
      // time carried on the update (keeps this table's synthetic clock
      // monotonic; omitting it uses server wall clock)
      assert(IcebergRestCommit.rollbackTo(cat, "lake", "t", 1L,
        timestampMs = Some(2500L)) == 1L)
      assert(IcebergRest.read(spark, cat, "lake", "t").count() ==
        nation.filter("n_regionkey = 0").count(),
        "REST rollback did not move the published view")
      // history survives: forward travel to the rolled-past snapshot
      assert(IcebergRest.read(spark, cat, "lake", "t",
        Some(graft.sources.SnapshotLog.ByVersion(s2.toString))).count() ==
        nation.filter("n_regionkey <= 1").count())
      // a STALE rollback decision (built against head=2, but main is
      // now at 1) must 409 loudly, never auto-retry
      val staleBody =
        s"""{"requirements":[
           |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$s2}],
           | "updates":[
           |  {"action":"set-snapshot-ref","ref-name":"main","type":"branch",
           |   "snapshot-id":1}]}""".stripMargin
      intercept[IcebergCommitConflict](
        cat.commitTable("lake", "t", staleBody))
      // a ref to a snapshot the table doesn't have: 400, not a dangling
      // pointer
      val dangling =
        """{"requirements":[],
          |"updates":[{"action":"set-snapshot-ref","ref-name":"main",
          |"type":"branch","snapshot-id":77}]}""".stripMargin
      val e = intercept[Exception](cat.commitTable("lake", "t", dangling))
      assert(e.getMessage.contains("no snapshot 77"))
      // unknown snapshot refused client-side too
      intercept[IllegalArgumentException](
        IcebergRestCommit.rollbackTo(cat, "lake", "t", 99L))
      // and a post-rollback append through the catalog builds on the
      // rollback target: the undone rows stay unpublished
      IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 2")), 3000L)
      assert(IcebergRest.read(spark, cat, "lake", "t").count() ==
        nation.filter("n_regionkey IN (0, 2)").count(),
        "post-rollback REST append resurrected the rolled-back rows")
      // REF-ONLY commit on a NON-main ref is legal under the REST spec:
      // tagging an old snapshot for retention carries no add-snapshot,
      // no schema change, and never moves main — it must land, not 400
      val tagBody =
        s"""{"requirements":[],
           |"updates":[{"action":"set-snapshot-ref","ref-name":"keep",
           |"type":"tag","snapshot-id":$s2}]}""".stripMargin
      cat.commitTable("lake", "t", tagBody)
      val refs = cat.loadTable("lake", "t").refs
      assert(refs("keep") == ("tag", s2), refs)
      // the tag-only commit moved neither main nor the published view
      assert(refs("main")._2 == 3L)
      // the published history logs main moves only, each at its
      // OPERATION time: both appends' publishes, then the rollback
      // @2500 (the explicit op timestamp — NOT snapshot 1's creation
      // time, which would regress the log), then the post-rollback
      // append @3000; the tag-only commit added no entry
      val log = cat.loadTable("lake", "t").snapshotLog
      assert(log ==
        Seq((1000L, 1L), (2000L, 2L), (2500L, 1L), (3000L, 3L)), log)
      assert(log.zip(log.tail).forall { case ((a, _), (b, _)) => a <= b },
        s"snapshot-log regressed: $log")
    } finally {
      server.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("write-audit-publish through the REST commit protocol") {
    val root = Files.createTempDirectory("ice-restwap")
    val dir = root.resolve("t")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    IcebergLocal.append(dir, partFiles(nation.filter("n_regionkey = 0")),
      timestampMs = 1000L, schema = Some(nation.schema))
    val server = new IcebergLocal.CatalogServer(root, "lake")
    val port = server.start()
    try {
      val cat = new IcebergRestCatalog(s"http://127.0.0.1:$port")
      def readMain() = IcebergRest.read(spark, cat, "lake", "t")
      // two AUDIT commits through the catalog: main must see nothing
      val s2 = IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 1")), 2000L,
        branch = Some("audit"))
      val s3 = IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 2")), 3000L,
        branch = Some("audit"))
      val r0 = nation.filter("n_regionkey = 0").count()
      assert(readMain().count() == r0,
        "REST branch commit leaked into the published head")
      // the branch carries its own lineage (second commit parented on
      // the FIRST branch commit, not max-snapshot or main)
      assert(IcebergRest.read(spark, cat, "lake", "t",
        Some(graft.sources.SnapshotLog.ByVersion("audit"))).count() ==
        nation.filter("n_regionkey <= 2").count())
      val meta = cat.loadTable("lake", "t")
      assert(meta.snapshots.find(_.snapshotId == s3)
        .flatMap(_.parentId).contains(s2))
      assert(meta.refs("main")._2 == 1L && meta.refs("audit")._2 == s3)
      // PUBLISH through the protocol
      assert(IcebergRestCommit.fastForward(cat, "lake", "t", "audit") == s3)
      assert(readMain().count() == nation.filter("n_regionkey <= 2").count())
      // divergence refusal: a second branch forks, then main moves
      IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 3")), 4000L,
        branch = Some("audit2"))
      IcebergRestCommit.append(cat, "lake", "t", dir,
        partFiles(nation.filter("n_regionkey = 4")), 5000L)
      val e = intercept[IllegalArgumentException](
        IcebergRestCommit.fastForward(cat, "lake", "t", "audit2"))
      assert(e.getMessage.contains("not a fast-forward"))
      // a FRESH-branch commit whose fork point went stale must 409:
      // the requirement pins main at the observed fork
      val staleFork =
        """{"requirements":[
          |  {"type":"assert-ref-snapshot-id","ref":"fresh","snapshot-id":null},
          |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":1}],
          | "updates":[
          |  {"action":"add-snapshot","snapshot":{"snapshot-id":99,
          |   "sequence-number":99,"timestamp-ms":9000,
          |   "manifest-list":"file:///nope","schema-id":0,
          |   "summary":{"operation":"append"}}},
          |  {"action":"set-snapshot-ref","ref-name":"fresh","type":"branch",
          |   "snapshot-id":99}]}""".stripMargin
      intercept[IcebergCommitConflict](
        cat.commitTable("lake", "t", staleFork))
      // the published history logs only MAIN moves: initial commit,
      // fast-forward, the post-publish main append — branch commits
      // never enter the snapshot-log
      val hist = IcebergRest.metaTable(spark, dir, "history")
        .collect().map(_.getLong(1)).toSeq
      assert(!hist.contains(s2) && hist.contains(s3) &&
        hist.count(_ == s3) == 1,
        s"snapshot-log carries branch commits: $hist")
    } finally {
      server.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("rollback_to_snapshot: un-publish, keep history, re-commit lineage") {
    val dir = warehouse.resolve("rollback-spec")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    def commit(pred: String, ts: Long): Long =
      IcebergLocal.append(dir, partFiles(nation.filter(pred)), ts,
        schema = Some(nation.schema))
    try {
      val s1 = commit("n_regionkey = 0", 1000L)
      val s2 = commit("n_regionkey = 1", 2000L)
      val r0 = nation.filter("n_regionkey = 0").count()
      val r01 = nation.filter("n_regionkey <= 1").count()
      assert(IcebergRest.readLocal(spark, dir).count() == r01)
      // un-publish the second commit
      assert(IcebergLocal.rollbackTo(dir, s1) == s1)
      assert(IcebergRest.readLocal(spark, dir).count() == r0,
        "rollback did not move the published view")
      // the rolled-past snapshot stays retained: travel forward works
      assert(IcebergRest.readLocal(spark, dir,
        Some(ByVersion(s2.toString))).count() == r01)
      // unknown snapshot: loud
      val e = intercept[IllegalArgumentException](
        IcebergLocal.rollbackTo(dir, 99L))
      assert(e.getMessage.contains("no snapshot 99"))
      // a commit AFTER rollback builds on the rollback target — the
      // undone rows must NOT resurface through the carried manifests
      commit("n_regionkey = 2", 3000L)
      assert(IcebergRest.readLocal(spark, dir).count() ==
        r0 + nation.filter("n_regionkey = 2").count(),
        "post-rollback commit resurrected the rolled-back rows")
      // metadata files are immutable: rollback wrote a NEW version
      val metas = Files.list(dir.resolve("metadata")).iterator().asScala
        .count(_.getFileName.toString.endsWith(".metadata.json"))
      assert(metas >= 4, s"expected rollback to add a metadata version, $metas")
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("cherry-pick replays a diverged branch's append onto main") {
    val dir = warehouse.resolve("cherry-spec")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    def commit(pred: String, ts: Long, branch: Option[String] = None): Long =
      IcebergLocal.append(dir, partFiles(nation.filter(pred)), ts,
        schema = Some(nation.schema), branch = branch)
    try {
      commit("n_regionkey = 0", 1000L)
      val s2 = commit("n_regionkey = 1", 2000L, Some("audit"))
      val s3 = commit("n_regionkey = 2", 3000L) // main diverges
      // fast-forward refuses the diverged table; cherry-pick is the out
      intercept[IllegalArgumentException](IcebergLocal.fastForward(dir, "audit"))
      val picked = IcebergLocal.cherryPick(dir, "audit", timestampMs = 4000L)
      assert(IcebergRest.readLocal(spark, dir).count() ==
        nation.filter("n_regionkey <= 2").count(),
        "cherry-pick did not surface the branch rows on main")
      val meta = IcebergLocal.currentMetadata(dir).get
      // lineage: the new snapshot's parent is the OLD main head, the
      // branch ref is untouched, and main moved to the pick
      assert(meta.snapshots.find(_.snapshotId == picked)
        .flatMap(_.parentId).contains(s3))
      assert(meta.refs("audit")._2 == s2)
      assert(meta.refs("main")._2 == picked)
      // pre-pick main still answers by travel
      assert(IcebergRest.readLocal(spark, dir,
        Some(ByVersion(s3.toString))).count() ==
        nation.filter("n_regionkey IN (0, 2)").count())
      // non-append refusal: a compaction REPLACE snapshot (tagged by
      // the maintenance op) cannot be replayed onto a different base
      val compacted = IcebergMaintenance.compact(spark, dir)
      val tagName = IcebergLocal.currentMetadata(dir).get.refs
        .collectFirst { case (n, ("tag", id)) if id == compacted => n }.get
      val e = intercept[IllegalArgumentException](
        IcebergLocal.cherryPick(dir, tagName, timestampMs = 5000L))
      assert(e.getMessage.contains("not a pure fast-append"))
      // unknown ref: loud
      intercept[IllegalArgumentException](
        IcebergLocal.cherryPick(dir, "nope", timestampMs = 6000L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("spec-less commits on a partitioned table declare a real empty spec") {
    // a data append without a partition spec must not stamp its
    // manifest `spec 0 + empty tuple` when spec 0 HAS fields — the
    // unpartitioned shape gets its own registered spec id, so external
    // readers resolving each manifest's declared spec see a matching
    // partition struct
    val dir = warehouse.resolve("specless")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .where("o_orderdate >= timestamp '1995-01-01' AND " +
        "o_orderdate < timestamp '1995-04-01'")
    IcebergPartitioned.append(orders, dir, "data/b0",
      Seq(PartitionField("o_month", "o_orderdate", "month")),
      timestampMs = 1000L)
    try {
      IcebergLocal.append(dir, partFiles(orders.limit(5)),
        timestampMs = 2000L)
      val raw = mapperFor(dir)
      val specs = (0 until raw.get("partition-specs").size())
        .map(raw.get("partition-specs").get)
      val byId = specs.map(s =>
        s.path("spec-id").asInt() -> s.get("fields").size()).toMap
      assert(byId(0) == 1, "spec 0 lost its month field")
      assert(byId.exists { case (id, n) => id > 0 && n == 0 },
        s"no registered empty spec for the spec-less commit: $byId")
      assert(raw.path("default-spec-id").asInt() == 0,
        "a data append moved default-spec-id")
      val emptyId = byId.collectFirst {
        case (id, 0) => id }.get
      // the NEW manifest is stamped with the empty spec's id; carried
      // manifests keep spec 0
      val meta = IcebergLocal.currentMetadata(dir).get
      val head = meta.snapshots.maxBy(_.snapshotId)
      val listFile = java.nio.file.Paths.get(
        java.net.URI.create(head.manifestList))
      val reader = org.apache.avro.file.DataFileReader.openReader(
        listFile.toFile,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      val specIds =
        try Iterator.continually(reader).takeWhile(_.hasNext)
          .map(_.next().get("partition_spec_id").asInstanceOf[Int])
          .toSet
        finally reader.close()
      assert(specIds == Set(0, emptyId),
        s"manifest spec ids $specIds != Set(0, $emptyId)")
      // and the read still returns everything, pruning intact
      val all = IcebergRest.readLocal(spark, dir,
        options = Map("filter" ->
          "o_orderdate >= timestamp '1995-01-01'"))
      assert(all.count() == orders.count() + 5)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }
}
