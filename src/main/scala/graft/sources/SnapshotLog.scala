package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Local snapshot log giving file-backed tables Iceberg-style time travel
  * — the reference's `TableVersionSpec` semantics
  * (/root/reference/crates/connectors/src/sources/iceberg.rs:43-100:
  * SnapshotId / Timestamp / Tag / Branch, each validated) re-expressed
  * over versioned directories instead of a REST catalog (the Iceberg
  * runtime jars are unavailable offline; the SEMANTICS are what a
  * reference user relies on).
  *
  * Layout: a table path that is a DIRECTORY containing
  * `_graft_snapshots.json`:
  * {{{
  * [ {"snapshot_id": 1, "timestamp_ms": 1700000000000, "path": "v1",
  *    "tags": ["initial"], "branch": "main"},
  *   {"snapshot_id": 2, "timestamp_ms": 1700000600000, "path": "v2",
  *    "branch": "main"} ]
  * }}}
  * `path` is relative to the table directory. A table without a snapshot
  * log is unversioned: reads resolve to the path itself and time travel
  * is an error — same failure mode as querying a non-Iceberg source with
  * a version spec in the reference.
  */
object SnapshotLog {

  sealed trait VersionSpec
  /** Snapshot id (numeric), or tag/branch name (string). */
  final case class ByVersion(version: String) extends VersionSpec
  final case class ByTimestamp(timestampMs: Long) extends VersionSpec

  final case class Snapshot(snapshotId: Long, timestampMs: Long, path: String,
      tags: Seq[String], branch: Option[String])

  val LogFile = "_graft_snapshots.json"

  def read(tablePath: String): Option[Seq[Snapshot]] = {
    val log = Paths.get(tablePath, LogFile)
    if (!Files.isRegularFile(log)) return None
    val root = new ObjectMapper().readTree(Files.readString(log))
    require(root.isArray, s"$LogFile must be a JSON array")
    val snaps = root.elements().asScala.map { n =>
      Snapshot(
        snapshotId = n.get("snapshot_id").asLong(),
        timestampMs = n.get("timestamp_ms").asLong(),
        path = n.get("path").asText(),
        tags = Option(n.get("tags")).toSeq
          .flatMap(_.elements().asScala.map(_.asText()).toSeq),
        branch = Option(n.get("branch")).map(_.asText()))
    }.toSeq
    snaps.foreach { s =>
      require(s.snapshotId > 0, s"Snapshot ID must be positive, got ${s.snapshotId}")
    }
    Some(snaps)
  }

  /** Resolve a table path + optional version spec to the concrete data
    * path to scan. */
  def resolve(tablePath: String, spec: Option[VersionSpec]): String =
    read(tablePath) match {
      case None =>
        spec.foreach { _ =>
          throw new IllegalArgumentException(
            s"table at $tablePath is not versioned (no $LogFile); " +
              "time travel is not available")
        }
        tablePath
      case Some(snaps) =>
        val chosen = spec match {
          case None =>
            // current = head of main (or the latest snapshot overall)
            val main = snaps.filter(_.branch.forall(_ == "main"))
            (if (main.nonEmpty) main else snaps).maxBy(_.snapshotId)
          case Some(ByVersion(v)) =>
            require(v.nonEmpty, "version cannot be empty")
            v.toLongOption match {
              case Some(id) =>
                require(id > 0, s"Snapshot ID must be positive, got $id")
                snaps.find(_.snapshotId == id).getOrElse(
                  throw new IllegalArgumentException(
                    s"no snapshot with id $id (have ${snaps.map(_.snapshotId).sorted.mkString(", ")})"))
              case None =>
                // tag first, then branch head — reference Tag/Branch specs
                snaps.find(_.tags.contains(v)).getOrElse {
                  val branch = snaps.filter(_.branch.contains(v))
                  if (branch.nonEmpty) branch.maxBy(_.snapshotId)
                  else throw new IllegalArgumentException(
                    s"no snapshot tagged or branched '$v'")
                }
            }
          case Some(ByTimestamp(ms)) =>
            require(ms <= System.currentTimeMillis(),
              s"Timestamp cannot be in the future: $ms")
            val atOrBefore = snaps.filter(_.timestampMs <= ms)
            if (atOrBefore.isEmpty)
              throw new IllegalArgumentException(
                s"no snapshot at or before timestamp $ms " +
                  s"(earliest is ${snaps.map(_.timestampMs).min})")
            atOrBefore.maxBy(s => (s.timestampMs, s.snapshotId))
        }
        Paths.get(tablePath, chosen.path).toString
    }
}
