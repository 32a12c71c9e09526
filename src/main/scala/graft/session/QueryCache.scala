package graft.session

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-keyed, user-isolated result cache backed by Parquet.
  *
  * Mirrors the reference cache semantics
  * (/root/reference/crates/runtime/src/query/cache.rs:33-441 and
  * CacheKey::from_plan in federation.rs:385-413):
  *  - key = SHA-256(canonicalized optimized plan) + user id + sorted
  *    permissions — two users never share entries;
  *  - values persist as Parquet (columnar, splittable — a cache hit at
  *    scale is itself a distributed scan, not a driver materialization);
  *  - TTL expiry + size-bounded LRU eviction;
  *  - empty results are not cached (cache.rs skip-empty);
  *  - per-query opt-out.
  *
  * Spark's `plan.canonicalized.semanticHash` would also work, but the
  * digest of the canonicalized plan string matches the reference's
  * "hash of debug-formatted plan" approach and is stable across JVMs.
  */
final class QueryCache(
    root: Path,
    ttlMillis: Long = 3600L * 1000,
    maxEntries: Int = 256,
    /** Byte budget for all cached parquet together — the reference's moka
      * weigher (cache.rs:33-441 weighs entries by batch bytes, not count),
      * so one huge result can't pin 255 small ones out while the
      * entry-count bound never fires. */
    maxBytes: Long = 1L << 30) {

  private final case class Entry(dir: Path, createdAt: Long,
      var lastUsed: Long, bytes: Long)
  private val index = new ConcurrentHashMap[String, Entry]()
  Files.createDirectories(root)

  def key(df: DataFrame, user: AuthenticatedUser): String = {
    val planText = df.queryExecution.optimizedPlan.canonicalized.toString
    val md = MessageDigest.getInstance("SHA-256")
    md.update(planText.getBytes("UTF-8"))
    md.update(0.toByte)
    md.update(user.cacheKey.getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Returns the cached result as a DataFrame, or None. */
  def lookup(spark: SparkSession, k: String): Option[DataFrame] = {
    val e = index.get(k)
    if (e == null) None
    else if (System.currentTimeMillis() - e.createdAt > ttlMillis) {
      invalidate(k); None
    } else {
      e.lastUsed = System.currentTimeMillis()
      Some(spark.read.parquet(e.dir.toString))
    }
  }

  /** Stores a result; skips empty results (mirrors cache.rs skip-empty).
    * Write is atomic: tmp dir + rename, so readers never see partials. */
  def store(df: DataFrame, k: String): Boolean = {
    val target = root.resolve(k)
    if (Files.exists(target)) {
      // Data already on disk (persistent root across restarts, or a
      // concurrent store won the race) — adopt it into the index so the
      // key can actually hit from now on.
      index.computeIfAbsent(k, _ => {
        val now = System.currentTimeMillis()
        Entry(target, now, now, dirBytes(target))
      })
      return true
    }
    val tmp = root.resolve(k + ".tmp" + System.nanoTime())
    df.write.mode("overwrite").parquet(tmp.toString)
    val rows = df.sparkSession.read.parquet(tmp.toString)
    // skip-empty check on the materialized copy (no recomputation)
    val empty = rows.isEmpty
    if (empty) { deleteRec(tmp); false }
    else {
      try Files.move(tmp, target)
      catch {
        // concurrent store of the same key won the move — its contents are
        // identical (same plan + user), so losing the race is success
        case _: java.nio.file.FileAlreadyExistsException => deleteRec(tmp)
      }
      val now = System.currentTimeMillis()
      index.put(k, Entry(target, now, now, dirBytes(target)))
      evictIfNeeded()
      true
    }
  }

  def invalidate(k: String): Unit = {
    val e = index.remove(k)
    if (e != null) deleteRec(e.dir)
  }

  def size: Int = index.size()

  /** Total parquet bytes currently indexed. */
  def totalBytes: Long = {
    import scala.jdk.CollectionConverters._
    index.values().asScala.map(_.bytes).sum
  }

  // Serializes evictions: two concurrent store()s racing the same LRU
  // victim (or a TTL invalidate shrinking the index mid-minBy) must not
  // throw out of a user's query.
  private val evictLock = new Object

  private def evictIfNeeded(): Unit = evictLock.synchronized {
    import scala.jdk.CollectionConverters._
    while (index.size() > maxEntries ||
        (index.size() > 1 && totalBytes > maxBytes)) {
      // size>1 guard: a single over-budget entry stays until its TTL —
      // evicting the result we just stored would turn the store into a no-op
      index.entrySet().asScala.minByOption(_.getValue.lastUsed) match {
        case Some(lru) => invalidate(lru.getKey)
        case None => return
      }
    }
  }

  private def dirBytes(p: Path): Long = {
    import scala.jdk.CollectionConverters._
    val stream = Files.walk(p)
    try stream.iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum
    finally stream.close()
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val stream = Files.walk(p)
      val all = try stream.iterator().asScala.toSeq finally stream.close()
      all.reverse.foreach(f => Files.deleteIfExists(f))
    }
}

object QueryCache {
  def temp(): QueryCache =
    new QueryCache(Paths.get(Files.createTempDirectory("graft-cache").toString))
}
