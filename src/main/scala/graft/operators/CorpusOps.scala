package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training pipeline runs
  * after cleaning: context-window chunking, PII redaction,
  * repetition-based quality filters (the Gopher/C4 rule family),
  * duplicate-cluster resolution (connected components over the
  * near-dup pair graph), benchmark decontamination (eval-vs-train
  * n-gram overlap), and chunk-level dedup.
  *
  * All are DuckDB-oracled. Scale shapes: chunking, redaction, and
  * repetition are map-only (no shuffle — they scale with scan
  * bandwidth); decontamination and chunk dedup shuffle only 16-byte
  * gram/chunk hashes; clustering iterates O(log diameter) rounds of
  * (node, label) long pairs.
  */
object CorpusOps {

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  // ONE normalization contract across engines and modules: both the
  // DuckDB form and the Spark fused pass come from TextPipeline — a
  // drifted private copy here would silently break oracle parity for
  // every CorpusOps query
  private def normSqlDuck = TextPipeline.normSqlDuck
  private def withNorm(df: DataFrame): DataFrame = TextPipeline.withNorm(df)

  /** Pair count at or below which duplicate-cluster labels are resolved
    * by union-find on the driver instead of the distributed iteration —
    * the same bar Spark applies to a broadcast-join build side
    * (~16 bytes/pair → 64 MB). The gate is measured, not assumed: the
    * pair RDD is counted before anything is collected. */
  private[graft] val DriverCcMaxPairs: Long = 4L << 20

  /** Probe bound for [[pageRankMicro]]'s driver gate: smaller than the
    * union-find bar because above it the probe's partial collect is
    * pure waste — 1M 16-byte pairs keeps the waste under ~16 MB while
    * every bench/interactive-scale graph still takes the driver path. */
  private[graft] val DriverPrProbeMax: Long = 1L << 20

  /** Connected-component labels (doc_id, cluster_id) over the
    * ≥0.9-Jaccard duplicate graph of documents with doc_id < 150 (the
    * bounded pair-verification window d_dup_clusters documents; at scale
    * the edge list comes from LSH). Shared by d_dup_clusters and
    * d_dup_keep_best.
    *
    * Adaptive resolution on the MEASURED pair count (the broadcast-join
    * decision applied to a graph): at or below [[DriverCcMaxPairs]] the
    * pair list is union-found on the driver and rejoined as a broadcast
    * (node → min-of-component) map — zero iteration jobs; above it,
    * pointer-doubling label propagation over co-partitioned RDDs
    * (the Pregel/GraphX shape: the edge relation is hash-partitioned
    * once and cached, each of the O(log diameter) rounds is ONE job of
    * (node, label) longs with no query re-planning — Catalyst cannot
    * carry a partitioning across checkpointed rounds, which made the
    * DataFrame formulation pay two 32-partition exchanges plus a full
    * plan cycle per round; round-16 verdict). Both paths produce
    * identical labels (min doc_id per component) — CorpusOpsSpec pins
    * them against each other by forcing the distributed path. */
  private[graft] def dupClusterLabels(s: SparkSession, dir: String,
      maxDriverPairs: Long = DriverCcMaxPairs,
      withSizes: Boolean = false): DataFrame = {
    // the corpus derivation runs ONCE per row: d feeds both cross-join
    // sides and the final node set
    val d = withNorm(t(s, dir).documents.filter(col("doc_id") < 150))
      .select(col("doc_id"), array_distinct(col("words")).as("ws"))
      .localCheckpoint()
    val a = d.select(col("doc_id").as("id_a"), col("ws").as("ws_a"))
    val b = d.select(col("doc_id").as("id_b"), col("ws").as("ws_b"))
    val inter = size(array_intersect(col("ws_a"), col("ws_b")))
    val pairsDf = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(inter.cast("double") /
        (size(col("ws_a")) + size(col("ws_b")) - inter) >= 0.9)
      .select(col("id_a"), col("id_b"))
    val pairs = pairsDf.rdd.map(r => (r.getLong(0), r.getLong(1))).cache()
    val nPairs = pairs.count()
    val nodes = d.select(col("doc_id"))
    if (nPairs <= maxDriverPairs) {
      // ---- driver path: union-find with path compression + min-root.
      // Only nodes that APPEAR IN A PAIR reach the driver (singletons
      // label themselves through the coalesce below), so driver memory
      // is bounded by the measured gate, never by corpus size.
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
        }
        r
      }
      // union by MIN root: the representative of a component is always
      // its smallest doc_id — exactly the min(label) the oracle computes
      val collected = pairs.collect()
      // the RDD's only consumers (count + collect) have run — release
      // the executor storage now; GraftSession callers have no
      // Bench-style dropResidue to do it for them
      pairs.unpersist(blocking = false)
      collected.foreach { case (x, y) =>
        val rx = find(x); val ry = find(y)
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      // pair-members = non-root entries plus their roots; singletons
      // (never in a pair) fall through the left join's coalesce to
      // label themselves with size 1
      val members = {
        val ks = parent.keys.toArray
        (ks ++ ks.map(find).distinct).distinct
      }
      val longT = org.apache.spark.sql.types.LongType
      val (rows, schemaFields) =
        if (withSizes) {
          // sizes are free here: one counting pass over the member set
          val bySize = scala.collection.mutable.LongMap.empty[Long]
          members.foreach { n =>
            val r = find(n); bySize(r) = bySize.getOrElse(r, 0L) + 1
          }
          (members.toSeq.map(n =>
             org.apache.spark.sql.Row(n, find(n), bySize(find(n)))),
           Seq("doc_id", "root", "csize"))
        } else
          (parent.keys.toArray.toSeq.map(n =>
             org.apache.spark.sql.Row(n, find(n))),
           Seq("doc_id", "root"))
      val roots = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        org.apache.spark.sql.types.StructType(schemaFields.map(f =>
          org.apache.spark.sql.types.StructField(f, longT, nullable = false))))
      val joined = nodes.join(broadcast(roots), Seq("doc_id"), "left")
      val base = joined.select(col("doc_id"),
        coalesce(col("root"), col("doc_id")).as("cluster_id"))
      if (withSizes)
        joined.select(col("doc_id"),
          coalesce(col("root"), col("doc_id")).as("cluster_id"),
          coalesce(col("csize"), lit(1L)).as("cluster_size"))
      else base
    } else {
      // ---- distributed path: pointer doubling over co-partitioned RDDs.
      // Partition width follows the pair graph (16-byte pairs, ~64 MB a
      // partition), NOT the corpus-wide shuffle width.
      val iterParts = math.max(1, math.min(
        s.sparkContext.defaultParallelism, (2 * nPairs / (4L << 20)).toInt))
      val part = new org.apache.spark.HashPartitioner(iterParts)
      // self-loops make the neighbor-min include the node's own label,
      // removing the per-round union with the label relation
      val nodeRdd = nodes.rdd.map(_.getLong(0))
      val e = pairs
        .flatMap { case (x, y) => Iterator((x, y), (y, x)) }
        .union(nodeRdd.map(n => (n, n)))
        .partitionBy(part).cache()
      var labels = nodeRdd.map(n => (n, n)).partitionBy(part)
      // Labels are monotone non-increasing under both steps (the
      // neighbor-min set contains the own label via the self-loop;
      // label(u) <= u), so sum(label) strictly decreases iff any node
      // changed — one fold action per round is the whole convergence
      // check AND the round's only job.
      var prevSum = Long.MaxValue
      var converged = false
      var rounds = 0
      while (!converged && rounds < 40) {
        // neighbor-min: label(v) <- min over in-neighbors (incl. self)
        val nbrMin = e.join(labels, part)
          .map { case (_, (dst, lbl)) => (dst, lbl) }
          .reduceByKey(part, (x: Long, y: Long) => math.min(x, y))
        // pointer doubling: label(v) <- label(label(v))
        val next = nbrMin.map { case (n, l) => (l, n) }
          .join(nbrMin, part)
          .map { case (_, (n, pl)) => (n, pl) }
        next.cache()
        val roundSum = next.map(_._2).fold(0L)(_ + _)
        // `next` is materialized by the fold — the previous round's
        // cached labels are dead weight from here; release them so a
        // long-lived session doesn't accumulate O(rounds) storage
        if (rounds > 0) labels.unpersist(blocking = false)
        converged = roundSum == prevSum
        prevSum = roundSum
        labels = next
        rounds += 1
      }
      // pairs and e have no consumer past this point (the final labels
      // stay cached — they back the returned DataFrame; the
      // ContextCleaner reclaims them once the result is unreachable)
      pairs.unpersist(blocking = false)
      e.unpersist(blocking = false)
      val cc = s.createDataFrame(
        labels.map { case (n, l) => org.apache.spark.sql.Row(n, l) },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("cluster_id",
            org.apache.spark.sql.types.LongType, nullable = false))))
      if (withSizes) {
        // map-side-combined groupBy + join-back, NOT a window over
        // cluster_id: duplicate clusters are exactly the skewed entity
        // in a dedup graph (one boilerplate page duplicated 10^8 times
        // puts the whole cluster into a single window task, and AQE
        // cannot split window partitions)
        val sizes = cc.groupBy("cluster_id")
          .agg(count(lit(1)).as("cluster_size"))
        cc.join(sizes, "cluster_id")
          .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      } else cc
    }
  }

  /** Five damped (0.85) PageRank power iterations in exact integer
    * micro-units over the undirected pair graph — pr0 = 1000000 per
    * node, update = 150000 + (85·Σ pr(src) div deg(src)) div 100, all
    * BIGINT so every engine derives identical values.
    *
    * Adaptive on a MEASURED bound: the pair relation is persisted (ONE
    * fixed plan, so every later job shares its map stages and cached
    * partitions — nothing is ever re-derived) and probed with a
    * `count()`, bar = min(maxDriverPairs, [[DriverPrProbeMax]]). The
    * count is one distributed job over the now-cached partitions that
    * moves a single long to the driver — no Row materialization, and
    * on the distributed path nothing is wasted. At or below the bar a
    * second `collect()` on the cache fetches the exact pair list and
    * the five iterations run as array arithmetic on the driver — two
    * bounded actions total, zero iteration jobs, zero extra plan
    * cycles (the r17 profile showed the five chained join+agg stages
    * paying ~1 s of per-stage AQE replanning on a KB-sized edge
    * list). Above the bar, the distributed formulation: one lazy plan
    * of five equi-join + map-side-combinable sum stages over an edge
    * relation eagerly checkpointed from the SAME cache — the
    * canonical distributed PageRank step. (The round-18 50× sweep
    * caught the naive un-cached head(4M+1) variant paying a
    * single-threaded 4M-row CollectLimit plus a full pair
    * re-derivation — 56–267 s at sf5.0; round 19 replaced the
    * remaining bar-sized head probe with the count.)
    * Both paths produce identical BIGINTs (integer division is
    * order-free) — CorpusOpsSpec pins them against each other by
    * forcing the distributed path. */
  private[graft] def pageRankMicro(s: SparkSession, pairsDf: DataFrame,
      maxDriverPairs: Long = DriverCcMaxPairs): DataFrame = {
    val cached = pairsDf.toDF("u", "v").persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bar = math.min(maxDriverPairs, DriverPrProbeMax)
    // probe by COUNT on the cached relation — one distributed job that
    // materializes the cache and moves a single long to the driver. The
    // earlier head(bar+1) probe collected up to ~1M Row objects
    // single-threaded (an order of magnitude more transient driver heap
    // than the payload bytes suggest) and was pure discarded work on the
    // distributed path; the count is cheap on both.
    val nPairs = if (bar < 0) Long.MaxValue else cached.count()
    val longT = org.apache.spark.sql.types.LongType
    if (bar >= 0 && nPairs <= bar) {
      // ---- driver path: only the count-bounded pair list reaches
      // the driver; 5 iterations of long arithmetic over flat maps
      val take = cached.collect()
      cached.unpersist(blocking = false)
      val edges = take.map(r => (r.getLong(0), r.getLong(1)))
      val deg = scala.collection.mutable.LongMap.empty[Long]
      edges.foreach { case (u, v) =>
        deg(u) = deg.getOrElse(u, 0L) + 1
        deg(v) = deg.getOrElse(v, 0L) + 1
      }
      var pr = scala.collection.mutable.LongMap.empty[Long]
      deg.foreachKey(n => pr(n) = 1000000L)
      for (_ <- 1 to 5) {
        val sums = scala.collection.mutable.LongMap.empty[Long]
        // contribution flows BOTH ways across an undirected pair —
        // exactly the oracle's symmetric `edges` relation
        edges.foreach { case (u, v) =>
          sums(v) = sums.getOrElse(v, 0L) + pr(u) / deg(u)
          sums(u) = sums.getOrElse(u, 0L) + pr(v) / deg(v)
        }
        val next = scala.collection.mutable.LongMap.empty[Long]
        sums.foreach { case (n, sm) => next(n) = 150000L + 85L * sm / 100L }
        pr = next
      }
      val rows = pr.toSeq.map { case (n, p) =>
        org.apache.spark.sql.Row(n, deg(n), p) }
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        org.apache.spark.sql.types.StructType(Seq("doc_id", "deg", "pr")
          .map(f => org.apache.spark.sql.types.StructField(f, longT,
            nullable = false))))
        // the final division + round runs IN Spark so float semantics
        // stay identical to the distributed path
        .select(col("doc_id"), col("deg"),
          round(col("pr").cast("double") / 1000000, 6).as("pagerank"))
    } else {
      // ---- distributed path: deg and edges derive from the SAME
      // cached relation the probe touched (shared map stages + cached
      // partitions — the pair join runs once), the five iterations
      // nest into one lazy plan — no per-round action, no re-planning
      // EAGER checkpoints: deg and edges materialize while the pair
      // relation is still cached, so it can be released before returning
      val deg = cached.select(col("u").as("node"))
        .union(cached.select(col("v")))
        .groupBy(col("node")).agg(count(lit(1)).cast("bigint").as("deg"))
        .localCheckpoint()
      val edges = cached.join(deg, cached("u") === deg("node"))
        .select(col("u").as("src"), col("v").as("dst"), col("deg"))
        .union(cached.join(deg, cached("v") === deg("node"))
          .select(col("v"), col("u"), col("deg")))
        .localCheckpoint() // 5 iterations reuse the edge relation
      // deg/edges are materialized — the cached pair relation is dead weight
      cached.unpersist(blocking = false)
      var pr = deg.select(col("node"), lit(1000000L).as("pr"))
      for (_ <- 1 to 5) {
        pr = edges.join(pr, edges("src") === pr("node"))
          .select(col("dst"), expr("pr div deg").as("contrib"))
          .groupBy(col("dst")).agg(
            (lit(150000L) + expr("85 * sum(contrib) div 100"))
              .cast("bigint").as("pr"))
          .select(col("dst").as("node"), col("pr"))
      }
      pr.join(deg, "node")
        .select(col("node").as("doc_id"), col("deg"),
          round(col("pr").cast("double") / 1000000, 6).as("pagerank"))
    }
  }

  /** Chunk geometry: 64-token windows, stride 48 (16-token overlap) —
    * the sliding-context shape every LM data pipeline cuts. */
  private val ChunkLen = 64
  private val Stride = 48

  /** Minimum repeated-span width in words for d_repeated_spans. The Lee
    * et al. pipeline uses 50 BPE tokens over web-scale text; the
    * synthetic corpus' documents average ~54 words, so 8 keeps the same
    * "longer than chance" intent at this scale. Every shared 5-gram is
    * trivially a 5-word span — the threshold is what separates signal
    * from the gram width itself. */
  private[operators] val MinSpanWords = 8

  /** Packing budget: tokens per training sequence. */
  private val PackBudget = 2048

  /** Sequence-packing shard count. Packing is a per-shard running sum
    * (inherently sequential), so each shard's window is one
    * partition-local cumsum owning ~corpus_tokens/shards tokens. The
    * count must therefore SCALE WITH INPUT so a shard stays
    * task-sized: at cluster scale pick
    * `ceil(corpus_tokens / targetTokensPerShard)` (e.g. 100 TB of
    * ~25e12 tokens at 2^31 tokens/shard → ~12k shards). The registry
    * query and its oracle are both derived from the same value via
    * [[packSequencesDf]]/[[packOracleSql]]; CorpusOpsSpec pins the
    * tiling invariants at two different shard counts. */
  private[graft] val DefaultPackShards = 32

  /** Shard count for a given corpus size — the rule the scaladoc above
    * states, exposed so callers size shards from data volume. */
  private[graft] def packShardsFor(corpusTokens: Long,
      targetTokensPerShard: Long = 1L << 31): Int =
    math.max(1L, (corpusTokens + targetTokensPerShard - 1) / targetTokensPerShard).toInt

  /** The d_pack_sequences plan at an explicit shard count (the registry
    * uses [[DefaultPackShards]]; specs exercise other values). */
  private[graft] def packSequencesDf(s: SparkSession, dir: String,
      shards: Int): DataFrame = {
    val toks = withNorm(t(s, dir).documents)
      .select(col("doc_id"), size(col("words")).cast("bigint").as("n_tokens"),
        (col("doc_id") % shards).as("shard"))
      .filter(col("n_tokens") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    toks.withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("n_tokens"),
        col("shard").cast("bigint").as("shard"),
        (col("end_off") - col("n_tokens")).cast("bigint").as("start_off"),
        floor((col("end_off") - col("n_tokens")) / PackBudget)
          .cast("bigint").as("seq_first"),
        floor((col("end_off") - 1) / PackBudget).cast("bigint").as("seq_last"),
        (floor((col("end_off") - 1) / PackBudget) -
          floor((col("end_off") - col("n_tokens")) / PackBudget) + 1)
          .cast("bigint").as("n_seqs"))
  }

  /** DuckDB oracle for d_pack_sequences, derived from the SAME shard
    * count as the Spark plan. */
  private[graft] def packOracleSql(shards: Int): String =
    s"""WITH w AS (SELECT doc_id, len(string_split($normSqlDuck, ' ')) AS n_tokens,
       |            doc_id % $shards AS shard FROM documents),
       |c AS (SELECT doc_id, n_tokens, shard,
       |        sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS end_off
       |      FROM w WHERE n_tokens > 0)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(shard AS BIGINT) AS shard,
       |  CAST(end_off - n_tokens AS BIGINT) AS start_off,
       |  CAST((end_off - n_tokens) // $PackBudget AS BIGINT) AS seq_first,
       |  CAST((end_off - 1) // $PackBudget AS BIGINT) AS seq_last,
       |  CAST((end_off - 1) // $PackBudget - (end_off - n_tokens) // $PackBudget + 1
       |       AS BIGINT) AS n_seqs
       |FROM c""".stripMargin

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
    // The pre-training scrub every production pipeline runs (CCNet/
    // Dolma shape): emails, IPv4s, phone numbers, and SSN-shaped ids
    // counted and replaced with typed placeholder tokens. The synthetic
    // corpus carries no PII, so each document PLANTS a deterministic
    // set from its id (identical arithmetic in both engines — known
    // positives the non-vacuity spec checks) while the real text rides
    // along as the negative corpus. Patterns live in the RE2 ∩
    // java.util.regex common dialect (no lookaround, no
    // overlapping-prefix alternations whose leftmost-first vs
    // leftmost-longest semantics diverge), so both engines match and
    // replace identical spans — the FULL redacted text is
    // hash-compared, not just the counts. Map-only, codegen'd
    // regexp_replace chain: embarrassingly parallel at 100 TB.
    GraftQuery("t_pii_redact", {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val phone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
      val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    text || ' contact user' || doc_id || '@mail' || (doc_id % 7)
         |      || '.example.com ip 10.0.' || (doc_id % 256) || '.'
         |      || ((doc_id * 7) % 256)
         |      || ' call +1-555-' || (1000 + doc_id % 9000)
         |      || ' ssn ' || (100 + doc_id % 900) || '-'
         |      || (10 + doc_id % 90) || '-' || (1000 + doc_id % 9000) AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(raw, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(raw, '$ip')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(raw, '$phone')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(raw, '$ssn')) AS BIGINT) AS n_ssns,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |    raw, '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
         |    '$phone', '<PHONE>', 'g'), '$ssn', '<SSN>', 'g') AS redacted
         |FROM planted""".stripMargin
    }) { (s, dir) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val phone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
      val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
      val d = col("doc_id")
      val planted = t(s, dir).documents.select(d, concat(
        col("text"),
        lit(" contact user"), d, lit("@mail"), d % 7,
        lit(".example.com ip 10.0."), d % 256, lit("."), (d * 7) % 256,
        lit(" call +1-555-"), (d % 9000) + 1000,
        lit(" ssn "), (d % 900) + 100, lit("-"), (d % 90) + 10,
        lit("-"), (d % 9000) + 1000).as("raw"))
      planted.select(d,
        size(regexp_extract_all(col("raw"), lit(email), lit(0)))
          .cast("bigint").as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(ip), lit(0)))
          .cast("bigint").as("n_ips"),
        size(regexp_extract_all(col("raw"), lit(phone), lit(0)))
          .cast("bigint").as("n_phones"),
        size(regexp_extract_all(col("raw"), lit(ssn), lit(0)))
          .cast("bigint").as("n_ssns"),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          col("raw"), email, "<EMAIL>"), ip, "<IP>"),
          phone, "<PHONE>"), ssn, "<SSN>").as("redacted"))
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
    },

    // -------------------------------------------- duplicate clustering
    // Near-dup detection emits PAIRS; dedup needs CLUSTERS (keep one
    // representative per connected component of the pair graph — pairs
    // alone can't decide which of {a,b}, {b,c} to drop). Edges here are
    // word-set jaccard >= 0.9 over a bounded candidate set (doc_id <
    // 150, the oracle baseline — at scale the edge list comes from the
    // LSH candidate pipeline, never a cross join). Components are
    // resolved adaptively on the measured pair count (see
    // dupClusterLabels): driver union-find below the broadcast bar,
    // neighbor-min label propagation with pointer doubling
    // (label(v) <- label(label(v))) over co-partitioned RDDs above it —
    // the standard distributed-CC shape: O(log diameter) rounds, each
    // one job of (node, label) longs. Plain propagation would need
    // O(diameter) rounds — this corpus's largest component is a 53-doc
    // transitivity chain, exactly the case pointer doubling exists for.
    GraftQuery("d_dup_clusters",
      s"""WITH RECURSIVE d AS (SELECT doc_id, list_distinct(string_split($normSqlDuck, ' ')) AS ws
         |  FROM documents WHERE doc_id < 150),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM d a, d b WHERE a.doc_id < b.doc_id
         |    AND CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
         |      / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.9),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(node, label) AS (
         |  SELECT doc_id, doc_id FROM d
         |  UNION
         |  SELECT e.dst, r.label FROM reach r JOIN edges e ON r.node = e.src
         |  WHERE r.label < e.dst),
         |cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node)
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |  CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
         |FROM cc""".stripMargin) { (s, dir) =>
      // cluster_size comes fused from dupClusterLabels(withSizes = true):
      // the driver path derives it from the union-find map (zero extra
      // jobs, one broadcast join in the plan); the distributed path uses
      // a map-side-combined groupBy + join-back — NEVER a window over
      // cluster_id (one boilerplate page duplicated 10^8 times puts the
      // whole cluster into a single window task, and AQE cannot split
      // window partitions).
      dupClusterLabels(s, dir, withSizes = true)
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L)
            .as("is_canonical"))
    },

    // ------------------------------------- duplicate-cluster resolution
    // The step after clustering that a curation pipeline actually ships:
    // keep ONE representative per duplicate cluster — the highest-quality
    // member (ties broken by lowest doc_id, deterministic) — and drop the
    // rest. Representative selection is an argmax-by-key AGGREGATE
    // (max(struct(quality, -doc_id)) with map-side combine), never a
    // window over cluster_id: the mega-cluster skew argument of
    // d_dup_clusters applies verbatim. Output: the kept docs with their
    // cluster, its size, and the winning quality.
    GraftQuery("d_dup_keep_best",
      s"""WITH RECURSIVE d AS (SELECT doc_id, list_distinct(string_split($normSqlDuck, ' ')) AS ws
         |  FROM documents WHERE doc_id < 150),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM d a, d b WHERE a.doc_id < b.doc_id
         |    AND CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
         |      / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.9),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(node, label) AS (
         |  SELECT doc_id, doc_id FROM d
         |  UNION
         |  SELECT e.dst, r.label FROM reach r JOIN edges e ON r.node = e.src
         |  WHERE r.label < e.dst),
         |cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
         |q AS (SELECT doc_id,
         |  least(1.0, CAST(len(string_split($normSqlDuck, ' ')) AS DOUBLE) / 64.0)
         |    * (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |             / length(text)) AS quality
         |  FROM documents WHERE doc_id < 150),
         |ranked AS (
         |  SELECT cc.doc_id, cc.cluster_id, q.quality,
         |    count(*) OVER (PARTITION BY cc.cluster_id) AS cluster_size,
         |    row_number() OVER (PARTITION BY cc.cluster_id
         |      ORDER BY q.quality DESC, cc.doc_id) AS rn
         |  FROM cc JOIN q ON cc.doc_id = q.doc_id)
         |SELECT doc_id, cluster_id, cluster_size, quality
         |FROM ranked WHERE rn = 1""".stripMargin) { (s, dir) =>
      val punct = (length(col("text")) -
        length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))).cast("double") /
        length(col("text"))
      val q = withNorm(t(s, dir).documents.filter(col("doc_id") < 150))
        .select(col("doc_id"),
          (least(lit(1.0), size(col("words")).cast("double") / 64.0) *
            (lit(1.0) - punct)).as("quality"))
      val scored = dupClusterLabels(s, dir).join(q, "doc_id")
      scored.groupBy("cluster_id")
        .agg(
          max(struct(col("quality"), (-col("doc_id")).as("neg_id"))).as("best"),
          count(lit(1)).as("cluster_size"))
        .select((-col("best.neg_id")).as("doc_id"), col("cluster_id"),
          col("cluster_size"), col("best.quality").as("quality"))
    },

    // ------------------------------------------------- decontamination
    // Benchmark-leak detection: for each eval document (held-out split =
    // doc_id % 10 == 0), the fraction of its distinct 5-word shingles
    // that appear anywhere in the train split. Spark joins on the 63-bit
    // portable gram hash (fused codegen'd graft_gram_hashes — no gram
    // string or md5 hex is ever materialized, the exchange ships 8-byte
    // longs); DuckDB joins on md5 of the same gram text. The hashes never
    // meet across engines — the OUTPUT is counts/fractions, so each
    // engine only needs its own collision-free gram key. The eval side is
    // computed once and LEFT-joined against the dedup'd train set (count
    // rows = n_grams, count matches = n_overlap), not re-derived per
    // output column. At 100 TB the train gram set is far too large to
    // broadcast — a shuffle equi-join by design, with a bloom-filter
    // prefilter as the optional fast path.
    GraftQuery("d_decontaminate",
      s"""WITH w AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS ws FROM documents),
         |grams AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 3),
         |            i -> md5(array_to_string(ws[i : i + 4], ' ')))) AS gs
         |          FROM w WHERE len(ws) >= 5),
         |ev AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 10 = 0),
         |tr AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 10 <> 0),
         |hits AS (SELECT ev.doc_id, count(*) AS n_hit FROM ev JOIN tr ON ev.g = tr.g GROUP BY 1)
         |SELECT b.doc_id, CAST(b.n_grams AS BIGINT) AS n_grams,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_overlap,
         |  round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / b.n_grams, 6) AS overlap_frac,
         |  CAST(CASE WHEN CAST(coalesce(h.n_hit, 0) AS DOUBLE) / b.n_grams >= 0.5
         |       THEN 1 ELSE 0 END AS BIGINT) AS contaminated
         |FROM (SELECT doc_id, len(gs) AS n_grams FROM grams WHERE doc_id % 10 = 0) b
         |LEFT JOIN hits h ON b.doc_id = h.doc_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val grams = withNorm(t(s, dir).documents)
        .filter(size(col("words")) >= 5)
        .select(col("doc_id"), expr("graft_gram_hashes(words, 5)").as("gs"))
      val tr = grams.filter(col("doc_id") % 10 =!= 0)
        .select(explode(col("gs")).as("g")).distinct()
        .withColumn("hit", lit(1L))
      val ev = grams.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), explode(col("gs")).as("g"))
      // every len>=5 eval doc has >=1 gram, so no group is lost to the
      // explode; tr is distinct, so the left join preserves one row per
      // eval gram (matched or null)
      val agg = ev.join(tr, Seq("g"), "left")
        .groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      val frac = col("n_hit").cast("double") / col("n_grams")
      agg.select(col("doc_id"),
        col("n_grams").cast("bigint").as("n_grams"),
        col("n_hit").cast("bigint").as("n_overlap"),
        round(frac, 6).as("overlap_frac"),
        when(frac >= 0.5, 1L).otherwise(0L).as("contaminated"))
    },

    // ------------------------------- bloom-prefiltered decontamination
    // The "bloom-filter prefilter as the optional fast path" the
    // d_decontaminate scale note promises, made real AND exactly
    // oracle-able: a Bloom filter over the train grams' 63-bit portable
    // hashes (m = 2^16 bits, k = 2 — the two 16-bit slices of the
    // already-avalanched hash, the Kirsch-Mitzenhauer composition), and
    // an eval side that pays the gram equi-join ONLY for grams passing
    // the filter. No false negatives by construction, so n_true is
    // exact — identical to d_decontaminate's n_overlap (spec-pinned) —
    // while the exact join's shuffle shrinks by the filter's rejection
    // rate. Scale shape: the filter is a ≤ 2^16-row positions relation —
    // a CONSTANT-size broadcast however big the corpus (m is a plan
    // constant sized for this fixture; production sizes m to the train
    // gram count, the SHAPE is what's pinned) — and the prefilter pass
    // is map-only. Both engines derive the same hash (GramHashes == the
    // portable hash63 of the space-joined gram string), so bloom-hit
    // counts and false-positive counts cross engines exactly.
    GraftQuery("d_decontaminate_bloom", {
      val (hashCtes, hashLast) = SketchOracleSql.hashScalarCtes(
        "bf", "g", "doc_id", "gram")
      s"""WITH w AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS ws FROM documents),
         |gs AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 3),
         |         i -> array_to_string(ws[i : i + 4], ' '))) AS grams
         |       FROM w WHERE len(ws) >= 5),
         |g AS (SELECT doc_id, unnest(grams) AS gram FROM gs),
         |$hashCtes,
         |gh AS (SELECT doc_id, fh AS g FROM $hashLast),
         |train AS (SELECT DISTINCT g FROM gh WHERE doc_id % 10 <> 0),
         |pos AS (SELECT DISTINCT p FROM (
         |    SELECT g % 65536 AS p FROM train
         |    UNION ALL SELECT (g // 65536) % 65536 FROM train)),
         |ev AS (SELECT doc_id, g, g % 65536 AS p1, (g // 65536) % 65536 AS p2
         |       FROM gh WHERE doc_id % 10 = 0),
         |flt AS (SELECT ev.doc_id, ev.g,
         |    (pa.p IS NOT NULL AND pb.p IS NOT NULL) AS bh
         |  FROM ev
         |  LEFT JOIN pos pa ON ev.p1 = pa.p
         |  LEFT JOIN pos pb ON ev.p2 = pb.p),
         |counts AS (SELECT doc_id, count(*) AS n_grams,
         |    count(*) FILTER (WHERE bh) AS n_bloom
         |  FROM flt GROUP BY doc_id),
         |tr AS (SELECT f.doc_id, count(t.g) AS n_true
         |  FROM flt f JOIN train t ON f.g = t.g WHERE f.bh
         |  GROUP BY f.doc_id)
         |SELECT c.doc_id, CAST(c.n_grams AS BIGINT) AS n_grams,
         |  CAST(c.n_bloom AS BIGINT) AS n_bloom,
         |  CAST(coalesce(tr.n_true, 0) AS BIGINT) AS n_true,
         |  CAST(c.n_bloom - coalesce(tr.n_true, 0) AS BIGINT) AS n_fp
         |FROM counts c LEFT JOIN tr USING (doc_id)""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val grams = withNorm(t(s, dir).documents)
        .filter(size(col("words")) >= 5)
        .select(col("doc_id"), explode(expr("graft_gram_hashes(words, 5)")).as("g"))
      val train = graft.util.Reuse.materialize( // feeds positions AND the exact join
        grams.filter(col("doc_id") % 10 =!= 0).select(col("g")).distinct())
      // the Bloom filter as data: the distinct set positions of both
      // 16-bit hash slices — bounded by m, broadcast to the eval side
      val pos = train.select((col("g") % 65536).as("p"))
        .union(train.select(expr("(g div 65536) % 65536").as("p")))
        .distinct()
      val ev = grams.filter(col("doc_id") % 10 === 0)
        .withColumn("p1", col("g") % 65536)
        .withColumn("p2", expr("(g div 65536) % 65536"))
      val flt = ev
        .join(broadcast(pos.withColumnRenamed("p", "p1")
          .withColumn("h1", lit(true))), Seq("p1"), "left")
        .join(broadcast(pos.withColumnRenamed("p", "p2")
          .withColumn("h2", lit(true))), Seq("p2"), "left")
        .withColumn("bh", coalesce(col("h1"), lit(false))
          && coalesce(col("h2"), lit(false)))
        .select(col("doc_id"), col("g"), col("bh"))
      // the fast path being demonstrated: only bloom-passing grams reach
      // the exact equi-join (no false negatives ⇒ n_true stays exact)
      val counts = flt.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("bh"), 1L).otherwise(0L)).as("n_bloom"))
      val truth = flt.filter(col("bh"))
        .join(train.withColumn("hit", lit(1L)), Seq("g"), "left")
        .groupBy(col("doc_id")).agg(
          sum(coalesce(col("hit"), lit(0L))).as("n_true"))
      counts.join(truth, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams").cast("bigint").as("n_grams"),
          col("n_bloom").cast("bigint").as("n_bloom"),
          coalesce(col("n_true"), lit(0L)).cast("bigint").as("n_true"),
          (col("n_bloom") - coalesce(col("n_true"), lit(0L)))
            .cast("bigint").as("n_fp"))
    },

    // ------------------------------ centrality over the near-dup graph
    // PageRank on the shared-gram similarity graph — the centrality signal
    // for picking a CANONICAL document inside a boilerplate neighborhood
    // (keep-best uses a quality scalar; centrality prefers the doc most
    // representative of its template family). Graph: u—v iff the docs
    // share ≥ 3 distinct non-hub 5-grams (hub grams, df > 64, carry no
    // discriminative similarity and would blow the pair join quadratic —
    // the MinHash bucket-cap argument; at production scale the cap is a
    // constant, so per-gram pair fan-out is bounded). Five fixed-point
    // power iterations with damping 0.85 in EXACT INTEGER micro-units:
    // contribution = pr div deg, update = 150000 + (85·Σ) div 100 — every
    // engine derives the identical BIGINTs, no float summation-order
    // hazard anywhere (the micro-unit discipline applied to an iterative
    // graph algorithm). Scale shape: each iteration is one equi-join of
    // the (src, dst, deg) edge relation with the (node, pr) vector plus a
    // map-side-combinable sum — the canonical distributed PageRank step;
    // edges checkpoint once, iterations reuse them.
    GraftQuery("d_dup_pagerank", {
      val prStages = (1 to 5).map(i =>
        s"""pr$i AS (SELECT e.dst AS node,
           |    CAST(150000 + (85 * sum(p.pr // e.deg)) // 100 AS BIGINT) AS pr
           |  FROM edges e JOIN pr${i - 1} p ON e.src = p.node
           |  GROUP BY e.dst)""".stripMargin).mkString(",\n")
      s"""WITH w AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS ws FROM documents),
         |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 3),
         |            i -> md5(array_to_string(ws[i : i + 4], ' '))))) AS g
         |          FROM w WHERE len(ws) >= 5),
         |df AS (SELECT g, count(*) AS df FROM grams GROUP BY g
         |       HAVING count(*) >= 2 AND count(*) <= 64),
         |gf AS (SELECT grams.doc_id, grams.g FROM grams JOIN df USING (g)),
         |pairs AS (SELECT a.doc_id AS u, b.doc_id AS v
         |          FROM gf a JOIN gf b ON a.g = b.g AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3),
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |          SELECT u AS node FROM pairs
         |          UNION ALL SELECT v FROM pairs) GROUP BY node),
         |edges AS (SELECT u AS src, v AS dst, d.deg FROM pairs
         |            JOIN deg d ON d.node = pairs.u
         |          UNION ALL
         |          SELECT v, u, d.deg FROM pairs
         |            JOIN deg d ON d.node = pairs.v),
         |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |$prStages
         |SELECT p.node AS doc_id, d.deg,
         |  round(CAST(p.pr AS DOUBLE) / 1000000, 6) AS pagerank
         |FROM pr5 p JOIN deg d USING (node)""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      // Spark ships 8-byte fused gram hashes where the oracle uses
      // md5-string grams — only the equality structure crosses engines
      // (the d_repeated_ngrams contract). The pair graph is derived in
      // ONE linear pipeline (the LSH bucket-cap shape): group docs per
      // gram, keep grams with 2–64 docs, and explode each gram's ≤2016
      // ordered doc pairs in place — no join-back of the df filter, no
      // gram self-join, no checkpoint (single consumer chain), and only
      // two bounded shuffles (by gram hash, then by pair). The doc list
      // is collected through graft_collect_capped(·, 65), which caps the
      // aggregation BUFFER at 65 longs — a boilerplate gram shared by
      // millions of documents saturates at 65 elements (then fails the
      // ≤64 filter exactly like its uncapped count would) instead of
      // materializing one multi-GB collect_list value in a single task.
      val pairs = withNorm(t(s, dir).documents)
        .filter(size(col("words")) >= 5)
        .select(col("doc_id"),
          explode(expr("graft_gram_hashes(words, 5)")).as("g"))
        .groupBy(col("g"))
        .agg(expr("graft_collect_capped(doc_id, 65)").as("ds"))
        .filter(size(col("ds")).between(2, 64))
        // ordered pairs (u < v) of the per-gram doc list — identical
        // multiset to the oracle's gf-self-join; the fused native
        // expression (codegen-embedded) replaced a nested higher-order
        // formulation that paid ~2× at the 50× probe scale
        .select(explode(expr("graft_ordered_pairs(ds)")).as("p"))
        .select(col("p.u"), col("p.v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3).select(col("u"), col("v"))
      pageRankMicro(s, pairs)
    },

    // -------------------------------------- cross-document repetition mass
    // The measurement behind "Deduplicating Training Data Makes Language
    // Models Better" (Lee et al. 2021): per document, what fraction of its
    // distinct 5-grams also occur in at least one OTHER document. High
    // shared_frac flags boilerplate/templated text that exact and near-dup
    // passes (whole-doc granularity) miss — the signal their suffix-array
    // substring dedup acts on, here as a per-doc score over fixed-width
    // grams. Scale shape: grams are 8-byte fused hashes (graft_gram_hashes,
    // distinct per doc, so count(*) per gram IS document frequency); the df
    // aggregate is map-side combinable and the join back moves only
    // (hash, count) pairs — text never enters an exchange, and there is no
    // all-pairs or suffix-sort stage. The gram relation feeds both the df
    // build and the probe; it is checkpointed so the explode runs once.
    // DuckDB re-derives with md5-string grams: only the equality structure
    // crosses engines, never the hash values (the d_decontaminate pattern).
    GraftQuery("d_repeated_ngrams",
      s"""WITH w AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS ws FROM documents),
         |grams AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 3),
         |            i -> md5(array_to_string(ws[i : i + 4], ' ')))) AS gs
         |          FROM w WHERE len(ws) >= 5),
         |g AS (SELECT doc_id, unnest(gs) AS g FROM grams),
         |df AS (SELECT g, count(*) AS df FROM g GROUP BY g),
         |per AS (SELECT g.doc_id, count(*) AS n_grams,
         |         sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS n_shared
         |       FROM g JOIN df USING (g) GROUP BY g.doc_id)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |  CAST(n_shared AS BIGINT) AS n_shared,
         |  round(CAST(n_shared AS DOUBLE) / n_grams, 6) AS shared_frac
         |FROM per""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val grams = graft.util.Reuse.materialize(withNorm(t(s, dir).documents)
        .filter(size(col("words")) >= 5)
        .select(col("doc_id"), explode(expr("graft_gram_hashes(words, 5)")).as("g")))
      val df = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
      grams.join(df, "g")
        .groupBy(col("doc_id")).agg(
          count(lit(1)).cast("bigint").as("n_grams"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).cast("bigint")
            .as("n_shared"))
        .select(col("doc_id"), col("n_grams"), col("n_shared"),
          round(col("n_shared").cast("double") / col("n_grams"), 6)
            .as("shared_frac"))
    },

    // ------------------------------------------------ sequence packing
    // Concat-and-chunk packing — the step that turns cleaned documents
    // into fixed-budget training sequences: documents are laid end to
    // end in deterministic order and cut every `PackBudget` tokens, so
    // each doc gets a start offset and the window range it spans
    // (straddling a boundary = the doc is split across sequences).
    // Sharding is the scale shape: packing is a running sum, inherently
    // sequential, so it runs per-shard (doc_id mod [[DefaultPackShards]])
    // — each shard's window is an independent partition-local cumsum; no
    // global ordering bottleneck. The shard count is a parameter (plan
    // and oracle derive from the same value; see the scaling rule on
    // DefaultPackShards / packShardsFor). Both engines derive identical
    // offsets from the same ordering.
    GraftQuery("d_pack_sequences", packOracleSql(DefaultPackShards)) {
      (s, dir) => packSequencesDf(s, dir, DefaultPackShards)
    },

    // ---------------------------------------------- chunk-level dedup
    // Dedup at context-window granularity (the unit that actually enters
    // training): rank every chunk occurrence by (doc_id, chunk_idx)
    // within its hash, count per document how many of its chunks are
    // repeats of an earlier occurrence. Shuffles only (hash, doc_id,
    // idx) — chunk text never leaves the map side.
    GraftQuery("d_chunk_dedup",
      s"""WITH w AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS ws FROM documents),
         |chunks AS (SELECT doc_id, CAST(s / $Stride AS BIGINT) AS chunk_idx,
         |    md5(array_to_string(ws[s + 1 : s + $ChunkLen], ' ')) AS h
         |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws), $Stride)) AS s FROM w)),
         |ranked AS (SELECT doc_id, h,
         |    row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
         |  FROM chunks)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         |  round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         |    AS dup_frac
         |FROM ranked GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val chunks = withNorm(t(s, dir).documents)
        .withColumn("n_tokens", size(col("words")))
        .select(col("doc_id"), col("words"),
          explode(expr(s"sequence(0, n_tokens - 1, $Stride)")).as("st"))
        .select(col("doc_id"), (col("st") / Stride).cast("bigint").as("chunk_idx"),
          md5(expr(s"concat_ws(' ', slice(words, st + 1, $ChunkLen))")).as("h"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h")).orderBy(col("doc_id"), col("chunk_idx"))
      chunks.withColumn("rn", row_number().over(win))
        .groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).cast("bigint").as("n_dup_chunks"),
          round(sum(when(col("rn") > 1, 1.0).otherwise(0.0)) / count(lit(1)), 6)
            .as("dup_frac"))
    },

    // ---------------------------------------- exact repeated-substring spans
    // The actual PRODUCT of Lee et al. 2021's suffix-array dedup: per
    // document, the maximal cross-document repeated substrings as
    // (start, length) word spans — the byte ranges their pipeline cuts
    // out of the corpus. d_repeated_ngrams scores repetition mass; this
    // localizes it. Distributed shape replacing the suffix sort: every
    // position's 5-gram hash (graft_gram_pos_hashes, one fused codegen
    // pass), document frequency over DISTINCT (doc, gram) pairs
    // (map-side combinable), then a run of consecutive shared positions
    // = one maximal span via gaps-and-islands (pos − row_number). The
    // only window partitions by doc_id — each partition is one
    // document's positions, bounded by document length, never corpus
    // cardinality. Exchanges carry (doc_id, pos, 8-byte hash); text
    // never shuffles, and there is no all-pairs or global sort. Spans
    // shorter than MinSpanWords words are noise (every shared gram is a
    // 5-word span) and are dropped, mirroring the reference pipeline's
    // minimum match length.
    GraftQuery("d_repeated_spans",
      s"""WITH ${sharedGramCtesDuck(withWordCount = false)},
         |isl AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |      FROM shared)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(count(*) + 4 AS BIGINT) AS span_len
         |FROM isl GROUP BY doc_id, grp
         |HAVING count(*) + 4 >= $MinSpanWords""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val shared = sharedGramPositions(s, dir)
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      shared.withColumn("grp", col("pos") - row_number().over(win))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("pos")).cast("bigint").as("span_start"),
          (count(lit(1)) + 4).cast("bigint").as("span_len"))
        .filter(col("span_len") >= MinSpanWords)
        .select(col("doc_id"), col("span_start"), col("span_len"))
    },

    // ---------------------------------------------- repeated-span coverage
    // The removal accounting on top of d_repeated_spans: how much of
    // each document the repeated material actually covers. Two spans
    // whose WORD ranges overlap (islands separated by ≤ gram-width
    // positions) merge into one region — positions p and p+4 share
    // words even though the position runs are distinct — so
    // covered_words is a true union, never double-counted. Shape: the
    // same (doc, pos) relation, a lag + running-sum region id (both
    // windows partition by doc_id — one document per partition), then
    // two map-side-combinable aggregates. This is the number a curation
    // pipeline thresholds on to drop template-dominated documents.
    GraftQuery("d_span_coverage",
      s"""WITH ${sharedGramCtesDuck(withWordCount = true)},
         |${spanRegionCtesDuck(withWordCount = true)}
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_regions,
         |  CAST(sum(p1 - p0 + 1) AS BIGINT) AS covered_words,
         |  round(CAST(sum(p1 - p0 + 1) AS DOUBLE) / n_words, 6) AS frac_covered
         |FROM regions GROUP BY doc_id, n_words""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      spanRegions(sharedGramPositions(s, dir, withWordCount = true),
          carry = Seq("n_words"))
        .groupBy(col("doc_id"), col("n_words"))
        .agg(count(lit(1)).cast("bigint").as("n_regions"),
          sum(col("p1") - col("p0") + 1).cast("bigint").as("covered_words"))
        .select(col("doc_id"), col("n_regions"), col("covered_words"),
          round(col("covered_words").cast("double") / col("n_words"), 6)
            .as("frac_covered"))
    },

    // ------------------------------------------------- strip repeated spans
    // The ACTION on top of d_repeated_spans/d_span_coverage: emit each
    // document with its cross-document repeated regions cut out — the
    // transform Lee et al.'s pipeline applies to the corpus before
    // training. Regions per doc ride as a tiny collected array
    // (documents are bounded; regions ≤ words/5) joined back to the
    // corpus, and the cut itself is one higher-order filter over the
    // word array — map-only after the region join, no per-word shuffle.
    // cleaned_hash (md5 of the re-joined text) crosses engines exactly,
    // so the oracle verifies the RECONSTRUCTED TEXT, not just counts.
    GraftQuery("d_strip_spans",
      s"""WITH ${sharedGramCtesDuck(withWordCount = false)},
         |${spanRegionCtesDuck(withWordCount = false)},
         |covered AS (SELECT doc_id, unnest(range(p0, p1 + 1)) AS cp FROM regions),
         |wordpos AS (SELECT doc_id, unnest(ws) AS wrd,
         |              generate_subscripts(ws, 1) - 1 AS i FROM w),
         |kept AS (SELECT wp.doc_id, wp.wrd, wp.i FROM wordpos wp
         |         LEFT JOIN covered c ON c.doc_id = wp.doc_id AND c.cp = wp.i
         |         WHERE c.cp IS NULL)
         |SELECT w.doc_id,
         |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(len(w.ws) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
         |  coalesce(k.h, md5('')) AS cleaned_hash
         |FROM w LEFT JOIN (
         |  SELECT doc_id, count(*) AS n_kept,
         |    md5(string_agg(wrd, ' ' ORDER BY i)) AS h
         |  FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val regions = spanRegions(sharedGramPositions(s, dir), carry = Nil)
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("p0"), col("p1"))).as("regions"))
      withNorm(t(s, dir).documents)
        .join(regions, Seq("doc_id"), "left")
        .withColumn("kept", expr(
          """CASE WHEN regions IS NULL THEN words
            |ELSE filter(words, (w, i) ->
            |  NOT exists(regions, r -> i >= r.p0 AND i <= r.p1)) END"""
            .stripMargin))
        .select(col("doc_id"),
          size(col("kept")).cast("bigint").as("n_kept"),
          (size(col("words")) - size(col("kept"))).cast("bigint")
            .as("n_removed"),
          md5(concat_ws(" ", col("kept"))).as("cleaned_hash"))
    },

    // --------------------------------------------------- WARC ingestion
    // The Common Crawl path end-to-end, driver-verified: render every
    // document into a full HTML page (chrome in all boilerplate
    // positions), pack the pages as a .warc.gz corpus (one gzip member
    // per record, the Common Crawl layout), read the WARC back through
    // the streaming record parser + HTTP envelope split, extract main
    // text with the codegen'd HtmlText chain, and gate on extracted
    // length. The result must hash-match DuckDB's whitespace-normalized
    // view of the source text — any loss in the WARC framing, gzip
    // member splitting, HTTP header recovery, or HTML extraction breaks
    // the hash. Scale shape: write is one task per partition committed
    // by rename; read is one task per WARC file streaming the gzip;
    // extraction is map-only regexp chains inside whole-stage codegen.
    GraftQuery("d_warc_extract",
      """SELECT doc_id,
        |  trim(regexp_replace(text, '\s+', ' ', 'g')) AS extracted_text,
        |  lang, source
        |FROM documents
        |WHERE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) >= 50"""
        .stripMargin) { (s, dir) =>
      import graft.functions.HtmlText
      import graft.sources.warc.Warc
      val tmp = java.nio.file.Files.createTempDirectory("graft_warc")
      tmp.toFile.deleteOnExit()
      // Spread BEFORE rendering (guide §2.5 input skew / §6 file sizing):
      // writeCorpus emits one .warc.gz per partition and gzip members are
      // only file-splittable at member boundaries the reader discovers
      // sequentially, so the corpus inherits the INPUT's parallelism for
      // both the write and the read-back. A one-row-group parquet fixture
      // put the whole render+gzip (one task) AND the gunzip+parse+extract
      // (one task over one file) on 1 of 32 cores — measured 0.9 s + 2.4 s
      // single-task stages at sf0.1. Hash-partitioning the 8-byte ids +
      // raw text to the session's volume-derived shuffle width spreads
      // render/deflate/parse across the session's cores and sizes output
      // files by corpus volume (the ShuffleWidth rule), which is exactly
      // what a production crawler write does. Row set is unchanged —
      // only the record→file assignment moves.
      val width = s.sessionState.conf.numShufflePartitions
      val pages = t(s, dir).documents
        .filter(col("text").isNotNull)
        .repartition(width, col("doc_id"))
        .select(col("doc_id"),
          HtmlText.renderPage(col("text"),
            concat(lit("Document "), col("doc_id")), col("lang")).as("page"),
          col("lang"), col("source"))
      Warc.writeCorpus(pages, tmp.toString, bodyCol = "page",
        contentType = "text/html; charset=utf-8")
      Warc.readCorpus(s, tmp.toString)
        .select(col("doc_id"),
          HtmlText.mainText(col("text")).as("extracted_text"),
          col("lang"), col("source"))
        .filter(length(col("extracted_text")) >= 50)
    }
  )

  /** The (doc_id, pos[, n_words]) relation of positions whose 5-gram
    * also occurs in at least one OTHER document — the shared substrate
    * of d_repeated_spans and d_span_coverage. df counts DISTINCT
    * documents per gram (a gram repeated only within one document is
    * not cross-document repetition). Checkpointed so the positional
    * explode feeds both the df build and the probe side once. */
  /** DuckDB twin of [[sharedGramPositions]]: CTEs `w/g/df/shared`, the
    * final one `shared(doc_id[, n_words], pos)`. ONE definition for the
    * three span queries — the gram width, the df ≥ 2 rule, and the
    * ≥ 5-word guard must stay identical across them or their oracles
    * silently diverge from each other. */
  private def sharedGramCtesDuck(withWordCount: Boolean): String = {
    val nw = if (withWordCount) " len(ws) AS n_words," else ""
    val nwCol = if (withWordCount) " g.n_words," else ""
    s"""w AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS ws FROM documents),
       |g AS (SELECT doc_id,$nw
       |        unnest(range(0, len(ws) - 4)) AS pos,
       |        unnest(list_transform(range(1, len(ws) - 3),
       |          i -> md5(array_to_string(ws[i : i + 4], ' ')))) AS g
       |      FROM w WHERE len(ws) >= 5),
       |df AS (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g),
       |shared AS (SELECT g.doc_id,$nwCol g.pos
       |           FROM g JOIN df USING (g) WHERE df.df >= 2)""".stripMargin
  }

  /** Gaps-and-islands region merge over `shared` (DuckDB): islands of
    * positions ≤ gram-width apart fuse into one region; ends in
    * `regions(doc_id[, n_words], rid, p0, p1)`. Shared by
    * d_span_coverage and d_strip_spans. */
  private def spanRegionCtesDuck(withWordCount: Boolean): String = {
    val nw = if (withWordCount) " n_words," else ""
    s"""step AS (SELECT doc_id,$nw pos,
       |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 4
       |             THEN 0 ELSE 1 END AS brk
       |      FROM shared),
       |reg AS (SELECT doc_id,$nw pos,
       |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS UNBOUNDED PRECEDING) AS rid
       |      FROM step),
       |regions AS (SELECT doc_id,$nw rid, min(pos) AS p0, max(pos) + 4 AS p1
       |            FROM reg GROUP BY doc_id,$nw rid)""".stripMargin
  }

  /** Spark twin of [[spanRegionCtesDuck]]: merged regions
    * (doc_id[, carry...], rid, p0, p1). Both windows partition by
    * doc_id only — one document per partition, bounded by document
    * length, never corpus cardinality. */
  private def spanRegions(shared: DataFrame, carry: Seq[String]): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val runW = win.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    shared
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(win) <= 4, 0L)
          .otherwise(1L))
      .withColumn("rid", sum(col("brk")).over(runW))
      .groupBy(("doc_id" +: carry :+ "rid").map(col): _*)
      .agg(min(col("pos")).as("p0"), (max(col("pos")) + 4).as("p1"))
  }

  /** Spread a NARROW scan before a heavy per-row derivation (guide §2.5
    * "input skew: one huge unsplittable file"): the test fixtures are
    * one-row-group parquet files, so Spark gives the whole documents
    * scan — and everything pipelined into it (normalize, gram-position
    * explode, the positional checkpoint write) — a single task. Gated on
    * the scan's REAL split count so it is a no-op at scale: a corpus
    * laid out as many files (the 100 TB shape) already scans at ≥ cores
    * parallelism and must NOT pay an exchange of the text payload just
    * to chase cores. Measured at sf0.1 (min-of-3, solo): the span family
    * 1.61/1.19/1.24 s → 1.13/1.07/1.11 s. Map-only rows with ~µs/doc
    * work (plain withNorm) measured FLAT under the same spread — this is
    * only worth it above the ~100 µs/doc derivation weight of the
    * positional gram explode, so it is applied per call site, not
    * globally. */
  private def spreadIfNarrow(s: SparkSession, df: DataFrame): DataFrame = {
    val width = s.sessionState.conf.numShufflePartitions
    val cores = s.sparkContext.defaultParallelism
    // gate on the scan's INPUT FILE COUNT, not rdd.getNumPartitions:
    // parquet partition counts are byte-range splits, but a one-row-group
    // file yields rows from only its first split no matter how many byte
    // ranges it reports (the fixture shape), so file count is the real
    // unit of parallelism; it also avoids instantiating a physical plan
    // just to read a partition count. RDD-backed frames (no files) keep
    // the partition-count gate.
    val files = df.inputFiles.length
    val splits = if (files > 0) files else df.rdd.getNumPartitions
    if (splits * 2 < math.min(cores, width))
      df.repartition(width, col("doc_id"))
    else df
  }

  private def sharedGramPositions(s: SparkSession, dir: String,
      withWordCount: Boolean = false): DataFrame = {
    val base = withNorm(spreadIfNarrow(s, t(s, dir).documents))
      .filter(size(col("words")) >= 5)
    val keep =
      if (withWordCount)
        base.withColumn("n_words", size(col("words")).cast("bigint"))
          .select(col("doc_id"), col("n_words"), col("words"))
      else base.select(col("doc_id"), col("words"))
    val grams = graft.util.Reuse.materialize(keep
      .select(keep.columns.filterNot(_ == "words").map(col) :+
        posexplode(expr("graft_gram_pos_hashes(words, 5)")).as(Seq("pos", "g")): _*))
    // "occurs in ≥2 DISTINCT docs" ⇔ min(doc) ≠ max(doc): one map-side-
    // combinable aggregate per gram instead of a distinct pre-shuffle
    // followed by a count — saves a whole exchange of the gram relation
    val dfg = grams.groupBy(col("g"))
      .agg(min(col("doc_id")).as("dmin"), max(col("doc_id")).as("dmax"))
      .filter(col("dmin") < col("dmax")).select(col("g"))
    grams.join(dfg, "g").drop("g")
  }
}
