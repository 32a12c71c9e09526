package graft.sources.iceberg

import java.nio.file.{Path => JPath}

/** Optimistic-concurrency appends THROUGH the REST catalog — the
  * multi-writer coordination every real lake deployment needs: 1000
  * executors' committers can't all rewrite `vN.metadata.json`; they
  * race a compare-and-swap at the catalog and the losers retry. The
  * spec's shape (REST OpenAPI CommitTableRequest):
  *
  *   1. `loadTable` — the base state this commit builds on;
  *   2. prepare the snapshot FILES (manifest + manifest list, shared
  *      storage) via [[IcebergLocal.writeSnapshotFiles]] — file names
  *      carry a per-attempt uniquifier so racing writers preparing the
  *      same snapshot id never clobber each other;
  *   3. `POST` add-snapshot + set-snapshot-ref gated by
  *      `assert-ref-snapshot-id(main == base)`; the server validates
  *      and swaps atomically;
  *   4. on 409 ([[IcebergCommitConflict]]): another writer won — reload,
  *      re-prepare (the carried-manifest list depends on the new head),
  *      retry. The loser's orphaned prepare files are reclaimed by
  *      [[IcebergMaintenance.vacuum]].
  *
  * The reference's catalog usage is read-only (iceberg.rs delegates
  * writes to engines); this is the write-side extension the streaming
  * sinks get their multi-writer story from.
  */
object IcebergRestCommit {

  /** Append `files` as one snapshot of `namespace.table`, committed
    * through `catalog`'s commit endpoint with the CAS-retry loop. The
    * table must exist — created by a local commit or the catalog's
    * create endpoint ([[IcebergRestCatalog.createTable]]); an empty
    * table's first snapshot commits under the same CAS with `main`
    * asserted absent. Returns the committed snapshot id. */
  def append(catalog: IcebergRestCatalog, namespace: String, table: String,
      tableDir: JPath, files: Seq[IcebergLocal.DataFileInfo],
      timestampMs: Long, tag: Option[String] = None,
      partitionSpec: Option[Seq[PartitionField]] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      maxRetries: Int = 10,
      /** write-audit-publish THROUGH the catalog: commit to this
        * BRANCH ref — the snapshot carries the branch head's manifests
        * (forking from main for a new branch), only the branch ref
        * moves, main and the snapshot-log stay untouched, so catalog
        * readers see nothing until [[fastForward]] publishes it. The
        * CAS asserts the BRANCH ref (or, for a fresh branch, that main
        * is still at the observed fork point — a stale fork would
        * silently miss rows). */
      branch: Option[String] = None,
      /** REPLACE commit (compaction): the new manifest list carries
        * ONLY `files` — prior manifests are not carried forward and
        * the summary operation is `replace`. Callers that rewrite live
        * state MUST pass maxRetries = 0: a CAS loss means the table
        * moved under the rewrite, and re-preparing the same stale
        * files would silently drop the racer's rows. */
      replace: Boolean = false,
      /** When set, the CAS asserts main at THIS id instead of the head
        * loaded at commit time — for commits whose FILES were computed
        * against an earlier observation (compaction: the rewrite read
        * head H; a commit landing between the rewrite and this call
        * must 409, not be silently overwritten by stale files). */
      assertMainAt: Option[Long] = None,
      /** rewrite-position-deletes commit shape (see
        * [[IcebergLocal.writeSnapshotFiles]]): data + equality-delete
        * lineage carried, carried position-delete files dropped,
        * `files` are their merged replacement. A delete-side rewrite —
        * same no-retry rule as `replace`. */
      dropPositionDeletes: Boolean = false): Long = {
    require(!(replace && branch.isDefined),
      "replace commits target main; audit a compaction by running it " +
        "after publish, not on a branch")
    require(!((replace || dropPositionDeletes) && maxRetries != 0),
      "a rewrite commit (replace / position-delete rewrite) must not " +
        "CAS-retry: the rewritten files are stale once the table moves " +
        "— pass maxRetries = 0")
    require(!(dropPositionDeletes && branch.isDefined),
      "position-delete rewrites target main")
    var attempt = 0
    while (true) {
      val prior = catalog.loadTable(namespace, table)
      // the commit builds on its TARGET REF's head — the branch when
      // committing to one (falling back to main for a fresh branch),
      // else MAIN — never the newest snapshot, which may be an
      // unpublished branch head or (after a rollback) a rolled-past
      // snapshot whose manifests must not be carried; an empty
      // (REST-created) table commits its FIRST snapshot under the same
      // CAS — the ref asserted ABSENT instead of at a parent id
      val mainHead = prior.refs.get("main").map(_._2)
        .orElse(prior.snapshots.map(_.snapshotId).maxOption)
      val branchHead = branch.flatMap(b => prior.refs.get(b).map(_._2))
      val parentOpt =
        if (branch.isDefined) branchHead.orElse(mainHead) else mainHead
      // snapshot ids still number past EVERY snapshot (ids are global)
      val snapId =
        prior.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
      val uniq = "-" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(8)
      // the catalog's current metadata decides the manifest's spec id
      // (same evolution rule as the local path: identical spec reuses
      // its id; the catalog-side metadata carries the spec from create)
      val specId = partitionSpec
        .map(IcebergLocal.resolveSpecId(Some(prior), _)).getOrElse(0)
      val listPath = IcebergLocal.writeSnapshotFiles(tableDir, Some(prior),
        files, snapId, replace = replace, partitionSpec, schema, uniq,
        specId = specId, dropPositionDeletes = dropPositionDeletes,
        parentId = parentOpt)
      val tagUpd = tag.map(t =>
        s""",{"action":"set-snapshot-ref","ref-name":"$t","type":"tag",""" +
          s""""snapshot-id":$snapId}""").getOrElse("")
      // spec EVOLUTION through the protocol: when this commit's spec is
      // new to the table, the manifests above were stamped with the
      // next spec id — tell the catalog via add-spec/set-default-spec.
      // A racing writer who evolved first turns add-spec into a 409,
      // and the retry re-resolves against the new head.
      val specUpd = partitionSpec match {
        case Some(spec) if !prior.partitionSpecs.values.exists(_ == spec) =>
          val nameToId = prior.fieldNames.map(_.swap)
          val fields = spec.map { f =>
            val srcId = nameToId.getOrElse(f.sourceColumn,
              throw new IllegalArgumentException(
                s"partition source column '${f.sourceColumn}' absent " +
                  "from the catalog schema"))
            s"""{"name":"${f.name}","transform":"${f.transform}",""" +
              s""""source-id":$srcId}"""
          }.mkString(",")
          s"""{"action":"add-spec","spec":{"spec-id":$specId,
             |  "fields":[$fields]}},
             | {"action":"set-default-spec","spec-id":-1},""".stripMargin
        case _ => ""
      }
      // parent-snapshot-id records the lineage edge WAP's ancestry
      // checks (fastForward/cherryPick) walk — v2 spec field
      val parentField = parentOpt
        .map(p => s""""parent-snapshot-id":$p,""").getOrElse("")
      // the CAS: a main commit asserts main; a branch commit asserts
      // its branch (absent for a fresh branch, PLUS main still at the
      // observed fork point — forking off a head that moved would
      // silently drop the rows the move published)
      val requirement = branch match {
        case None =>
          val j = assertMainAt.orElse(mainHead)
            .map(_.toString).getOrElse("null")
          s"""{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$j}"""
        case Some(b) if branchHead.isDefined =>
          s"""{"type":"assert-ref-snapshot-id","ref":"$b","snapshot-id":${branchHead.get}}"""
        case Some(b) =>
          val j = mainHead.map(_.toString).getOrElse("null")
          s"""{"type":"assert-ref-snapshot-id","ref":"$b","snapshot-id":null},
             |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$j}""".stripMargin
      }
      val targetRef = branch.getOrElse("main")
      val body =
        s"""{"requirements":[
           |  $requirement],
           | "updates":[$specUpd
           |  {"action":"add-snapshot","snapshot":{
           |    "snapshot-id":$snapId,"sequence-number":$snapId,
           |    $parentField"timestamp-ms":$timestampMs,
           |    "manifest-list":"${listPath.toUri}",
           |    "schema-id":0,"summary":{"operation":"${if (replace || dropPositionDeletes) "replace" else "append"}"}}},
           |  {"action":"set-snapshot-ref","ref-name":"$targetRef","type":"branch",
           |   "snapshot-id":$snapId}$tagUpd]}""".stripMargin
      try {
        catalog.commitTable(namespace, table, body)
        return snapId
      } catch {
        case e: IcebergCommitConflict =>
          // maxRetries = 0 marks a DELIBERATE no-retry commit (replace/
          // compaction — the prepared files are stale once the table
          // moved): surface the conflict itself for the caller to
          // re-decide, never a "raise maxRetries" hint
          if (maxRetries == 0) throw e
          attempt += 1
          if (attempt > maxRetries) throw new IllegalStateException(
            s"commit of $namespace.$table lost the CAS race $maxRetries " +
              "times; raise maxRetries or reduce writer contention")
        // the orphaned attempt files stay until vacuum — never partially
        // visible, because only a WON commit references them
      }
    }
    -1L // unreachable
  }

  /** Metadata-only schema evolution THROUGH the catalog's commit
    * protocol — the multi-writer-safe route for schema changes when a
    * catalog serves the table (the local `renameColumn`/`addColumn`/
    * `dropColumn` writers assume a single writer): copy the current
    * schema, let `mutate` edit the copy (and read the root for fresh
    * field ids), POST `add-schema` + `set-current-schema` gated by
    * `assert-current-schema-id`; a racing schema change 409s and the
    * loop re-resolves against the new head — the same CAS shape as the
    * snapshot path above. Returns the committed schema id. */
  def evolveSchema(catalog: IcebergRestCatalog, namespace: String,
      table: String, maxRetries: Int = 10)(
      mutate: (com.fasterxml.jackson.databind.node.ObjectNode,
        com.fasterxml.jackson.databind.JsonNode) => Unit): Int = {
    var attempt = 0
    while (true) {
      val meta = catalog.loadTableJson(namespace, table)
      val curId = meta.path("current-schema-id").asInt(0)
      val schemas = IcebergJson.arr(meta.get("schemas"))
      val cur = schemas.find(_.path("schema-id").asInt(0) == curId)
        .getOrElse(throw new IllegalArgumentException(
          s"no current schema for $namespace.$table"))
      val next = cur.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val newId = schemas.map(_.path("schema-id").asInt(0)).max + 1
      next.put("schema-id", newId)
      mutate(next, meta)
      val body =
        s"""{"requirements":[
           |  {"type":"assert-current-schema-id","current-schema-id":$curId}],
           | "updates":[
           |  {"action":"add-schema","schema":${next.toString}},
           |  {"action":"set-current-schema","schema-id":-1}]}""".stripMargin
      try {
        catalog.commitTable(namespace, table, body)
        return newId
      } catch {
        case _: IcebergCommitConflict =>
          attempt += 1
          if (attempt > maxRetries) throw new IllegalStateException(
            s"schema commit of $namespace.$table lost the CAS race " +
              s"$maxRetries times; raise maxRetries or serialize " +
              "schema changes")
      }
    }
    -1 // unreachable
  }

  /** ADD COLUMN through the catalog — the REST twin of
    * [[IcebergLocal.addColumn]] (nullable only; fresh field id past
    * `last-column-id`, re-resolved on every CAS retry). */
  def addColumn(catalog: IcebergRestCatalog, namespace: String,
      table: String, name: String, icebergType: String): Int =
    evolveSchema(catalog, namespace, table) { (next, root) =>
      val fields = next.withArray[
        com.fasterxml.jackson.databind.node.ArrayNode]("fields")
      require(!IcebergJson.arr(fields)
        .exists(_.path("name").asText() == name),
        s"add: column '$name' already exists")
      val f = fields.addObject()
      f.put("id", root.path("last-column-id").asInt(0) + 1)
      f.put("name", name)
      f.put("required", false)
      f.put("type", icebergType)
      ()
    }

  /** DROP COLUMN through the catalog — the REST twin of
    * [[IcebergLocal.dropColumn]]. */
  def dropColumn(catalog: IcebergRestCatalog, namespace: String,
      table: String, name: String): Int =
    evolveSchema(catalog, namespace, table) { (next, _) =>
      val fields = next.withArray[
        com.fasterxml.jackson.databind.node.ArrayNode]("fields")
      val keep = IcebergJson.arr(fields)
        .filter(_.path("name").asText() != name)
      require(keep.size < fields.size(),
        s"drop: table has no top-level column '$name'")
      require(keep.nonEmpty, "drop: cannot remove the last column")
      fields.removeAll()
      keep.foreach(fields.add)
      ()
    }

  /** RENAME COLUMN through the catalog — the REST twin of
    * [[IcebergLocal.renameColumn]] (field id preserved, so files
    * written under the old name keep resolving). */
  def renameColumn(catalog: IcebergRestCatalog, namespace: String,
      table: String, from: String, to: String): Int =
    evolveSchema(catalog, namespace, table) { (next, _) =>
      var hit = false
      next.withArray[com.fasterxml.jackson.databind.node.ArrayNode](
        "fields").forEach { f =>
        if (f.path("name").asText() == from) {
          f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .put("name", to); hit = true
        }
      }
      require(hit, s"rename: table has no top-level column '$from'")
    }

  /** ROLLBACK through the catalog — `rollback_to_snapshot` as a
    * ref-only CommitTableRequest: `set-snapshot-ref(main → snapshotId)`
    * gated by `assert-ref-snapshot-id(main == the head this decision
    * was made against)`. Deliberately NOT retried on conflict: losing
    * the CAS means the table moved under the rollback decision, and
    * auto-retrying would silently unpublish a commit the operator never
    * saw — reload, re-decide, call again. The local twin is
    * [[IcebergLocal.rollbackTo]]; when a catalog serves the table this
    * is the multi-writer-safe route. */
  def rollbackTo(catalog: IcebergRestCatalog, namespace: String,
      table: String, snapshotId: Long,
      timestampMs: Option[Long] = None): Long = {
    val prior = catalog.loadTable(namespace, table)
    require(prior.snapshots.exists(_.snapshotId == snapshotId),
      s"no snapshot $snapshotId on $namespace.$table (have ${
        prior.snapshots.map(_.snapshotId).sorted.mkString(", ")})")
    val headJson = prior.refs.get("main").map(_._2.toString)
      .getOrElse("null")
    // the optional operation timestamp rides the update (the server
    // stamps the snapshot-log pointer move with it; absent → server
    // wall clock) — unknown fields are ignored by other catalogs
    val tsField = timestampMs.map(t => s""","timestamp-ms":$t""").getOrElse("")
    val body =
      s"""{"requirements":[
         |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$headJson}],
         | "updates":[
         |  {"action":"set-snapshot-ref","ref-name":"main","type":"branch",
         |   "snapshot-id":$snapshotId$tsField}]}""".stripMargin
    catalog.commitTable(namespace, table, body)
    snapshotId
  }

  /** PUBLISH a branch through the catalog — write-audit-publish's
    * fast-forward as a ref-only CommitTableRequest: the same ancestry
    * check as [[IcebergLocal.fastForward]] (main's head must sit on the
    * branch head's parent chain — a diverged main is refused loudly,
    * publishing it would silently unpublish its commits), then
    * `set-snapshot-ref(main → branch head)` gated by
    * `assert-ref-snapshot-id(main == the head the ancestry was checked
    * against)` — a commit racing between check and publish turns the
    * stale publish into a 409 instead of unpublishing it. Not retried,
    * same reasoning as [[rollbackTo]]. Returns the published id. */
  def fastForward(catalog: IcebergRestCatalog, namespace: String,
      table: String, fromRef: String,
      timestampMs: Option[Long] = None): Long = {
    val prior = catalog.loadTable(namespace, table)
    val target = prior.refs.get(fromRef).map(_._2).getOrElse(
      throw new IllegalArgumentException(
        s"no ref '$fromRef' on $namespace.$table (have ${
          prior.refs.keys.toSeq.sorted.mkString(", ")})"))
    val mainHead = prior.refs.get("main").map(_._2)
    val byId = prior.snapshots.map(s => s.snapshotId -> s).toMap
    val isFf = mainHead.forall { mh =>
      var cur: Option[Long] = Some(target)
      var found = false
      while (cur.isDefined && !found) {
        if (cur.contains(mh)) found = true
        else cur = cur.flatMap(byId.get).flatMap(_.parentId)
      }
      found
    }
    if (!isFf) throw new IllegalArgumentException(
      s"not a fast-forward: main (${mainHead.getOrElse(-1L)}) is not an " +
        s"ancestor of '$fromRef' ($target) — main has diverged; " +
        "cherry-pick or rebase the branch instead")
    val headJson = mainHead.map(_.toString).getOrElse("null")
    val tsField = timestampMs.map(t => s""","timestamp-ms":$t""").getOrElse("")
    val body =
      s"""{"requirements":[
         |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$headJson}],
         | "updates":[
         |  {"action":"set-snapshot-ref","ref-name":"main","type":"branch",
         |   "snapshot-id":$target$tsField}]}""".stripMargin
    catalog.commitTable(namespace, table, body)
    target
  }

  /** COMPACTION through the catalog — rewrite_data_files on a
    * catalog-served table: read the current state through the catalog
    * (merge-on-read deletes applied), rewrite it as fresh parquet under
    * the table's shared storage, and commit a REPLACE snapshot through
    * the commit protocol, gated by `assert-ref-snapshot-id(main == the
    * head that was rewritten)`. Deliberately NOT CAS-retried: a racing
    * commit means the rewrite is stale — re-publishing it would
    * silently drop the racer's rows; the conflict propagates for the
    * operator to re-run. History stays travelable; the new head reads
    * with zero delete joins. Returns the REPLACE snapshot id. */
  def compact(spark: org.apache.spark.sql.SparkSession,
      catalog: IcebergRestCatalog, namespace: String, table: String,
      tableDir: JPath,
      timestampMs: Long = System.currentTimeMillis()): Long = {
    val prior = catalog.loadTable(namespace, table)
    val head = prior.refs.get("main").map(_._2)
      .orElse(prior.currentSnapshotId).getOrElse(
        throw new IllegalArgumentException(
          s"$namespace.$table has no published snapshot to compact"))
    // the rewrite reads AT the observed head (pinned snapshot), and the
    // commit below CAS-asserts main is still there — one consistent cut
    val df = IcebergRest.read(spark, catalog, namespace, table,
      Some(graft.sources.SnapshotLog.ByVersion(head.toString)))
    val next = prior.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val outDir = tableDir.resolve("data").resolve(f"rest-compact-$next%05d")
    df.write.mode("overwrite").parquet(outDir.toString)
    val files = IcebergMaintenance.parquetFileInfos(outDir)
    // the CAS pins main at the head the REWRITE read (not the head at
    // commit time): a commit landing during the rewrite 409s instead
    // of being silently overwritten by the stale files
    append(catalog, namespace, table, tableDir, files, timestampMs,
      tag = Some(s"compacted-$next"), schema = Some(df.schema),
      maxRetries = 0, replace = true, assertMainAt = Some(head))
  }

  /** POSITION-DELETE rewrite through the catalog —
    * rewrite_position_deletes on a catalog-served table: merge/dedupe
    * every live position-delete row (dropping rows whose target file is
    * gone) into few files and commit the delete-side-only REPLACE
    * shape (data + equality-delete lineage carried verbatim — zero
    * data movement), gated by the same pinned-head CAS as [[compact]]
    * and never retried. Returns the snapshot id, or -1 when the head
    * carries no position deletes (no-op, no commit). */
  def rewritePositionDeletes(spark: org.apache.spark.sql.SparkSession,
      catalog: IcebergRestCatalog, namespace: String, table: String,
      tableDir: JPath, targetFiles: Int = 1,
      timestampMs: Long = System.currentTimeMillis()): Long = {
    val prior = catalog.loadTable(namespace, table)
    val head = prior.refs.get("main").map(_._2)
      .orElse(prior.currentSnapshotId).getOrElse(
        throw new IllegalArgumentException(
          s"$namespace.$table has no published snapshot"))
    val next = prior.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val outDir = tableDir.resolve("data").resolve(f"rest-posdel-$next%05d")
    val files = IcebergMaintenance.posDelRewriteFiles(
      spark, prior, outDir, targetFiles)
    if (files.isEmpty) return -1L
    append(catalog, namespace, table, tableDir, files, timestampMs,
      tag = Some(s"posdel-rewritten-$next"), maxRetries = 0,
      assertMainAt = Some(head), dropPositionDeletes = true)
  }

  /** Z-ORDER compaction through the catalog — rewrite_data_files
    * (strategy => 'sort', sort_order => 'zorder(...)') on a
    * catalog-served table: the same pinned-head read, Morton-curve
    * rewrite ([[IcebergMaintenance.zOrderRewrite]]), and no-retry
    * REPLACE commit as [[compact]]. Returns the snapshot id. */
  def compactZOrder(spark: org.apache.spark.sql.SparkSession,
      catalog: IcebergRestCatalog, namespace: String, table: String,
      tableDir: JPath, cols: Seq[String], files: Int,
      timestampMs: Long = System.currentTimeMillis()): Long = {
    val prior = catalog.loadTable(namespace, table)
    val head = prior.refs.get("main").map(_._2)
      .orElse(prior.currentSnapshotId).getOrElse(
        throw new IllegalArgumentException(
          s"$namespace.$table has no published snapshot to compact"))
    val df = IcebergRest.read(spark, catalog, namespace, table,
      Some(graft.sources.SnapshotLog.ByVersion(head.toString)))
    val next = prior.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val outDir = tableDir.resolve("data").resolve(f"rest-zorder-$next%05d")
    val infos = IcebergMaintenance.zOrderRewrite(df, cols, files, outDir)
    append(catalog, namespace, table, tableDir, infos, timestampMs,
      tag = Some(s"zordered-$next"), schema = Some(df.schema),
      maxRetries = 0, replace = true, assertMainAt = Some(head))
  }

  /** Snapshot EXPIRY through the catalog — age/ref-aware retention as
    * one CommitTableRequest: the client plans the sweep from the
    * loaded metadata ([[IcebergLocal.expirePlan]] — per-ref
    * `max-ref-age-ms`/`min-snapshots-to-keep`/`max-snapshot-age-ms`
    * overrides honored), then POSTs `remove-snapshot-ref` updates for
    * expired refs and ONE `remove-snapshots` update for the expired
    * ids, gated by `assert-ref-snapshot-id(main == the head the plan
    * was made against)`. The server refuses removal of any
    * still-referenced snapshot and reclaims the dropped manifest
    * lists. NOT retried on conflict — a moved main means the plan is
    * stale (a new commit may chain on a snapshot the plan would drop);
    * reload, re-plan, call again. Returns the expired ids. */
  def expireSnapshots(catalog: IcebergRestCatalog, namespace: String,
      table: String, olderThanMs: Long, minSnapshotsToKeep: Int = 1,
      timestampMs: Long = System.currentTimeMillis()): Seq[Long] = {
    val prior = catalog.loadTable(namespace, table)
    val (droppedRefs, expiredIds) = IcebergLocal.expirePlan(
      prior, olderThanMs, minSnapshotsToKeep, timestampMs)
    if (droppedRefs.isEmpty && expiredIds.isEmpty) return Nil
    val headJson = prior.refs.get("main").map(_._2.toString)
      .getOrElse("null")
    val refUpdates = droppedRefs.toSeq.sorted.map(n =>
      s"""{"action":"remove-snapshot-ref","ref-name":${
        new com.fasterxml.jackson.databind.ObjectMapper()
          .writeValueAsString(n)}}""")
    val snapUpdate =
      if (expiredIds.isEmpty) Nil
      else Seq(s"""{"action":"remove-snapshots","snapshot-ids":[${
        expiredIds.mkString(",")}]}""")
    val body =
      s"""{"requirements":[
         |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$headJson}],
         | "updates":[${(refUpdates ++ snapUpdate).mkString(",\n  ")}]}"""
        .stripMargin
    catalog.commitTable(namespace, table, body)
    expiredIds
  }
}
