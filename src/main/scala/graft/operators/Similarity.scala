package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  * Three paths:
  *  - brute-force cosine top-k (the correctness baseline, oracled against
  *    DuckDB with identical double arithmetic and rank-stable rounding);
  *  - random-hyperplane LSH bucketing (scale path 1: candidates come from
  *    a bucket equi-join — shuffle on the 16-bit signature — then exact
  *    rerank of the small candidate set);
  *  - IVF inverted lists (scale path 2: sample-trained k-means, map-only
  *    assignment, nprobe probing).
  *
  * All vector math goes through the native codegen'd expressions in
  * [[graft.functions]] — fused loops over the RAW float arrays, widening
  * each element to double in-register (bit-identical to a per-element
  * `CAST(x AS DOUBLE)`, which is what the DuckDB oracle computes). Keeping
  * vectors as float end-to-end halves their bytes through scan, shuffle,
  * and broadcast versus the doubled-copy form, and the constant centroid /
  * hyperplane matrices ride as reference objects instead of 64-literal
  * array expressions — the expression tree (and generated code) stays
  * small no matter how many centroids are configured.
  */
object Similarity {

  /** ANSI-safe cosine with the zero-norm convention cos = 0: Spark 4's
    * default ANSI mode throws DIVIDE_BY_ZERO on an all-zero embedding
    * (denominator 0) where DuckDB yields NULL — both engines agree on 0
    * via nullif + coalesce, applied identically in every oracle. */
  private[operators] def cosine(dotE: org.apache.spark.sql.Column,
      denom: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(coalesce(dotE / when(denom =!= 0, denom), lit(0.0)), 6)

  /** ONE L2-normalize (zero-guard included) for every driver-side
    * trainer: PQ/IVF correctness depends on the sample-side and the
    * corpus-side ([[graft.functions.PqEncode]]) agreeing on this exact
    * convention, so there is a single definition to agree with. */
  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }


  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** Sequential-fold dot product via the native codegen'd expression
    * (graft.functions.DotProduct) — same index-order summation as the
    * aggregate(zip_with(...)) form it replaces, minus the per-row
    * intermediate array. */
  private def dot(a: String, b: String): String = s"graft_dot($a, $b)"

  /** Driver-side double cast for the (tiny) k-means training sample. */
  private val toDouble = "transform(embedding, x -> CAST(x AS DOUBLE))"

  val defs: Seq[GraftQuery] = Seq(

    // Brute-force cosine top-k: queries = vec_id < 5, corpus = the rest.
    // Rank on round(cos, 6) with vec_id tiebreak → rank-stable across
    // engines even when raw doubles differ in the last ULP.
    GraftQuery("s_ann_bruteforce", {
      val dotQE = "list_sum(list_transform(list_zip(q.v, e.v), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
      s"""WITH vecs AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |              FROM embeddings),
         |     norms AS (SELECT vec_id, v,
         |                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM vecs),
         |     q AS (SELECT vec_id AS qid, v, nrm FROM norms WHERE vec_id < 5),
         |     scored AS (
         |       SELECT q.qid, e.vec_id,
         |         round(coalesce($dotQE / nullif(q.nrm * e.nrm, 0), 0), 6) AS cos
         |       FROM q CROSS JOIN norms e WHERE e.vec_id >= 5),
         |     ranked AS (
         |       SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
         |       FROM scored)
         |SELECT qid, vec_id, cos, rn FROM ranked WHERE rn <= 10""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val vecs = t(s, dir).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      val q = vecs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val corpus = vecs.filter(col("vec_id") >= 5)
      val scored = corpus.crossJoin(broadcast(q))
        .select(col("qid"), col("vec_id"),
          cosine(expr(dot("qv", "v")), col("qn") * col("nrm")).as("cos"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
    },

    // Distributed k-means (Lloyd) step over the embedding corpus — the
    // clustering half of SemDeDup-style curation (cluster, then dedup
    // within clusters) as a FULLY hash-oracled operator, which the
    // sample-trained s_ann_ivf deliberately is not. Everything is
    // derivable from the data alone: seeds = the k=8 vectors with the
    // smallest md5(vec_id) (TakeOrdered top-k — never a global window);
    // assignment = argmax of round(cos, 6) over the 8-row broadcast with
    // cid tiebreak (rank-stable across engines, the s_ann discipline);
    // update = per-(cluster, dim) means accumulated as EXACT integer
    // micro-units, so the shuffle carries (cid, dim, int) triples that
    // combine map-side — at 100 TB the iteration cost is one scan plus a
    // k·dim-sized aggregate, the canonical distributed-Lloyd shape.
    GraftQuery("s_kmeans_step",
      s"""WITH $kmeansCtes,
         |comp AS (SELECT a.cid, t.i - 1 AS dim, n.v[t.i] AS x
         |  FROM asg a JOIN norms n USING (vec_id)
         |  CROSS JOIN UNNEST(range(1, 65)) AS t(i))
         |SELECT cid, dim, CAST(count(*) AS BIGINT) AS n,
         |  round(CAST(sum(CAST(round(x * 1000000, 0) AS BIGINT)) AS DOUBLE)
         |        / 1000000.0 / count(*), 6) AS centroid
         |FROM comp GROUP BY cid, dim""".stripMargin) { (s, dir) =>
      val asg = kmeansAssign(s, dir)
      asg.select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim")).agg(
          count(lit(1)).as("n"),
          round(sum(round(col("x").cast("double") * 1000000, 0).cast("bigint")).cast("double")
            / 1000000.0 / count(lit(1)), 6).as("centroid"))
    },

    // SemDeDup proper (Abbas et al. 2023): cluster the embedding space,
    // then drop near-duplicates WITHIN each cluster — the cluster
    // partition turns the quadratic all-pairs problem into bounded
    // within-cluster comparisons (at scale, k grows with the corpus so
    // cluster size stays a constant target; the degenerate-cluster cap
    // mirrors that bound here). Keep-first semantics: a vector is dropped
    // iff ANY smaller-id cluster-mate is ≥ the threshold; the report
    // carries its smallest keeper and strongest similarity.
    GraftQuery("d_semdedup_kmeans", {
      val dotAB = "list_sum(list_transform(list_zip(na.v, nb.v), p -> p[1] * p[2]))"
      s"""WITH $kmeansCtes,
         |sized AS (SELECT cid FROM asg GROUP BY cid HAVING count(*) <= 500),
         |pairs AS (
         |  SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
         |    round(coalesce($dotAB / nullif(na.nrm * nb.nrm, 0), 0), 6) AS cos
         |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  JOIN norms na ON na.vec_id = a.vec_id
         |  JOIN norms nb ON nb.vec_id = b.vec_id
         |  WHERE a.cid IN (SELECT cid FROM sized))
         |SELECT id_b AS drop_id, CAST(min(id_a) AS BIGINT) AS kept_by,
         |  max(cos) AS max_cos
         |FROM pairs WHERE cos >= 0.3 GROUP BY id_b""".stripMargin
    }) { (s, dir) =>
      val asg = kmeansAssign(s, dir)
        .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
      // degenerate-cluster cap (never binds at target cluster sizes;
      // a pathological all-in-one-cluster corpus must not go quadratic)
      val capped = graft.util.Buckets.cap(asg, 500, col("cid"))
      val a = capped.select(col("cid"), col("vec_id").as("id_a"),
        col("v").as("va"), col("nrm").as("na"))
      val b = capped.select(col("cid"), col("vec_id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, Seq("cid")).filter(col("id_a") < col("id_b"))
        .select(col("id_b"),
          col("id_a"),
          cosine(expr(dot("va", "vb")), col("na") * col("nb")).as("cos"))
        .filter(col("cos") >= 0.3)
        .groupBy(col("id_b")).agg(
          min(col("id_a")).cast("bigint").as("kept_by"),
          max(col("cos")).as("max_cos"))
        .select(col("id_b").as("drop_id"), col("kept_by"), col("max_cos"))
    },

    // Scale path: random-hyperplane LSH with OR-amplification — 4 bands of
    // 4 planes each. A corpus vector is a candidate if it shares ANY band
    // bucket with the query (the standard recall/cost dial: more bands →
    // higher recall, bigger candidate sets). Candidates come from an
    // equi-join on (band, bucket) — at 100 TB this shuffles only
    // (id, 16-byte key) pairs, never the vectors; vectors are re-fetched
    // for the small rerank set. Plane components are deterministic ±1 from
    // a fixed seed, embedded as literals in the oracle SQL; the sign-bit
    // fold replicates Spark's index-order summation with a sequential
    // list_reduce, so the bucket partition — and therefore the candidate
    // set and the reranked top-10 — is derived exactly by DuckDB (full
    // hash oracle).
    GraftQuery("s_ann_lsh", lshOracleSql) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val vecs = t(s, dir).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      // candidate generation handles IDS ONLY — the (band, bucket) join and
      // the dedup shuffle never touch a vector, exactly as the scale note
      // above promises. Vectors are re-fetched map-side for the rerank.
      val banded = vecs.select(col("vec_id"),
        posexplode(bandSignatures(col("v"), bands = 4, planesPerBand = 4))
          .as(Seq("band", "bucket")))
      val qBands = banded.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("band"), col("bucket"))
      val candIds = banded.filter(col("vec_id") >= 5)
        .join(qBands, Seq("band", "bucket"))
        .select(col("qid"), col("vec_id")).distinct()
      // rerank: broadcast the cap-bounded candidate id pairs and the 5
      // query vectors; the corpus re-derives (v, nrm) map-only.
      val qVecs = vecs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      vecs.join(candIds, "vec_id")
        .join(broadcast(qVecs), "qid")
        .select(col("qid"), col("vec_id"),
          cosine(expr(dot("qv", "v")), col("qn") * col("nrm")).as("cos"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
    },

    // --------------------------------------------------- k-NN self-join
    // The kNN JOIN: every vector's top-3 nearest neighbors among all the
    // others — the named operator behind embedding-space dedup sweeps,
    // label propagation, and graph construction, where every row is both
    // query and corpus. Exact kNN join is inherently all-pairs; the
    // honest scale shape is the LSH-bucketed approximation: candidates
    // share any of the 4 hyperplane band buckets (OR-amplification),
    // degenerate buckets cap at 200 before the self-join (one
    // boilerplate bucket must not go quadratic), the (band, bucket)
    // self-join ships ids only, and the exact-cosine rerank + per-vector
    // top-3 window runs over the cap-bounded candidate sets — never the
    // corpus. SIZING RULE: planes-per-band is the corpus-size dial —
    // bucket count is 2^planes per band, so hold expected bucket size
    // near the cap by using ~log2(N / 64) planes (3 here ≈ 64-vector
    // buckets at this corpus; a fixed plane count at 1000× the vectors
    // would either go quadratic uncapped or lose recall to the cap).
    // FULL hash oracle: the plane literals + sequential sign
    // folds re-derive the buckets, cap, candidates, and ranks exactly
    // (the s_ann_lsh discipline, with every vector as a query).
    GraftQuery("s_knn_join", knnJoinOracleSql) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val vecs = t(s, dir).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      val banded = vecs.select(col("vec_id"),
        posexplode(bandSignatures(col("v"), bands = 4, planesPerBand = 3))
          .as(Seq("band", "bucket")))
      val capped = graft.util.Buckets.cap(banded, 200, col("band"), col("bucket"))
      val cands = capped.select(col("band"), col("bucket"), col("vec_id").as("qid"))
        .join(capped.select(col("band"), col("bucket"), col("vec_id")),
          Seq("band", "bucket"))
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id")).distinct()
      val qSide = vecs.select(col("vec_id").as("qid"),
        col("v").as("qv"), col("nrm").as("qn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      vecs.join(cands, "vec_id")
        .join(qSide, "qid")
        .select(col("qid"), col("vec_id"),
          cosine(expr(dot("qv", "v")), col("qn") * col("nrm")).as("cos"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    },

    // ------------------------------------ semantic decontamination
    // The THIRD decontamination modality beside the exact gram join
    // (d_decontaminate) and MinHash fuzzy matching (d_decontaminate_
    // fuzzy): train items whose EMBEDDING sits within cosine 0.3 of a
    // held-out eval item — paraphrased leakage neither lexical check
    // can see. Same machinery as the kNN join (shared banded candidates,
    // cap, ids-only exchanges) with eval vectors (vec_id % 10 = 0, the
    // d_decontaminate split contract) as queries against the train
    // side; exact-cosine rerank at the d_embed_neardup threshold.
    // Emits the (train, eval, cos) report a pipeline anti-joins on.
    // FULL hash oracle via the shared plane-literal folds.
    GraftQuery("d_decontaminate_semantic", semanticDecontOracleSql) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val vecs = t(s, dir).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      val banded = vecs.select(col("vec_id"),
        posexplode(bandSignatures(col("v"), bands = 4, planesPerBand = 3))
          .as(Seq("band", "bucket")))
      val capped = graft.util.Buckets.cap(banded, 200, col("band"), col("bucket"))
      val cands = capped.filter(col("vec_id") % 10 === 0)
          .select(col("band"), col("bucket"), col("vec_id").as("qid"))
        .join(capped.filter(col("vec_id") % 10 =!= 0)
          .select(col("band"), col("bucket"), col("vec_id")),
          Seq("band", "bucket"))
        .select(col("qid"), col("vec_id")).distinct()
      val qSide = vecs.select(col("vec_id").as("qid"),
        col("v").as("qv"), col("nrm").as("qn"))
      vecs.join(cands, "vec_id")
        .join(qSide, "qid")
        .select(col("vec_id").as("train_id"), col("qid").as("eval_id"),
          cosine(expr(dot("qv", "v")), col("qn") * col("nrm")).as("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy(col("train_id"), col("eval_id"))
        .limit(500)
    },

    // IVF (inverted-file) ANN — the second scale path beside LSH.
    // Train: k-means centroids on a small deterministic sample, computed
    // driver-side (IVF training is sample-based by design: O(k·sample)
    // work regardless of corpus size). Assign: map-only nearest-centroid
    // over the broadcast constant centroid matrix — each vector lands in
    // one inverted list. Search: probe the nprobe lists nearest the query;
    // candidates = corpus ∩ probed lists (equi-join on list_id, shuffles
    // ids + list keys, never vectors); exact cosine rerank of the small
    // candidate set. Deterministic end-to-end AND hash-verified: the
    // training sample is re-derivable (vec_id-filtered, ordered,
    // limited), and AnnOracleSql.ivfSql re-runs the 5 Lloyd iterations
    // in DuckDB with sequential-order float math + explicit tie-breaks,
    // re-deriving the centroids (hence lists, probes, and rerank)
    // bit-for-bit. OperatorSemanticsSpec additionally asserts recall@10
    // against the exact twin s_ann_bruteforce.
    GraftQuery("s_ann_ivf", AnnOracleSql.ivfSql) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val k = 8; val nprobe = 4
      val vecs = t(s, dir).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      val sample = t(s, dir).embeddings.filter(col("vec_id") % 7 === 0)
        .orderBy(col("vec_id")).limit(128)
        .select(expr(toDouble)).collect()
        .map(_.getSeq[Double](0).toArray)
      val centroids = kmeans(sample, k, iters = 5)
      val assigned = vecs.withColumn("list_id", nearestCentroid(col("v"), centroids))
      val corpus = assigned.filter(col("vec_id") >= 5)
      val probes = vecs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
          posexplode(topCentroids(col("v"), centroids, nprobe)).as(Seq("probe_rank", "list_id")))
      // probes = queries × nprobe rows — bounded at ANY corpus scale, so
      // pin the broadcast rather than letting AQE re-decide per run (the
      // strategy flap showed up as run-to-run bench variance)
      val cand = corpus.join(broadcast(probes), Seq("list_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      // no distinct: each corpus vector lives in exactly one inverted
      // list and the probe list_ids are distinct per query, so the join
      // already yields unique (qid, vec_id) — deduplicating again would
      // add a full extra exchange of the candidate set for nothing
      cand.select(col("qid"), col("vec_id"),
          cosine(expr(dot("qv", "v")), col("qn") * col("nrm")).as("cos"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
    },

    // IVF-PQ — the production composition (faiss IndexIVFPQ): the coarse
    // quantizer prunes the corpus to nprobe inverted lists (only ~nprobe/k
    // of the corpus is touched per query) and PQ codes stand in for the
    // vectors inside the probed lists, so the scan reads 16 bytes per
    // candidate instead of 256 and never fetches raw vectors at all.
    // This variant quantizes the normalized vector directly (IVF-Flat
    // pruning + PQ scoring); classic residual encoding is a refinement on
    // the same plan shape. Candidate generation is the s_ann_ivf
    // equi-join on list_id (ids + codes in the exchange, never vectors);
    // scoring is the s_ann_pq ADC kernel; the per-query ranking windows
    // over the BOUNDED probed-list candidate set. Hash-verified: the
    // coarse trainer AND the 16 sub-codebooks are re-derived in DuckDB
    // (AnnOracleSql.ivfPqSql); recall additionally spec-pinned against
    // the exact twin.
    GraftQuery("s_ann_ivfpq", AnnOracleSql.ivfPqSql) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val Kc = 8; val nprobe = 4
      val M = 16; val Ksub = 16; val SubDim = 4
      val sampleRaw = t(s, dir).embeddings.filter(col("vec_id") % 3 === 0)
        .orderBy(col("vec_id")).limit(256)
        .select(expr(toDouble)).collect()
        .map(_.getSeq[Double](0).toArray)
      val coarse = kmeans(sampleRaw, Kc, iters = 5)
      val normSample = sampleRaw.map(normalize)
      val books: Array[Array[Array[Double]]] = Array.tabulate(M) { j =>
        kmeansL2(normSample.map(_.slice(j * SubDim, (j + 1) * SubDim)), Ksub, 10)
      }
      val vecs = t(s, dir).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
      // the index: one (list_id, 16-int codes) row per corpus vector —
      // the ONLY per-vector state the search ever reads
      val corpus = vecs.filter(col("vec_id") >= 5)
        .select(col("vec_id"),
          nearestCentroid(col("v"), coarse).as("list_id"),
          GraftColumnBridge.column(graft.functions.PqEncode(
            GraftColumnBridge.expression(col("v")), books)).as("codes"))
      val probes = vecs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"),
          GraftColumnBridge.column(graft.functions.PqLut(
            GraftColumnBridge.expression(col("v")), books)).as("lut"),
          posexplode(topCentroids(col("v"), coarse, nprobe))
            .as(Seq("probe_rank", "list_id")))
      // queries × nprobe rows — bounded at any scale; pin the broadcast
      val cand = corpus.join(broadcast(probes), Seq("list_id"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("adist"), col("vec_id"))
      cand.select(col("qid"), col("vec_id"),
          round(GraftColumnBridge.column(graft.functions.PqAdc(
            GraftColumnBridge.expression(col("lut")),
            GraftColumnBridge.expression(col("codes")), Ksub)), 6).as("adist"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
    },

    // Product quantization (Jégou, Douze, Schmid 2011) — the third scale
    // path beside LSH and IVF, for the regime where even the VECTORS don't
    // fit: the corpus index is m small codes per vector (here 16 codes ≈
    // 16 bytes against 256 bytes of float32), so a 100 TB embedding corpus
    // compresses ~16× before any pruning. Train: per-subspace k-means
    // sub-codebooks on the same deterministic sample IVF uses (PQ training
    // is sample-based by design). Encode: map-only [[graft.functions
    // .PqEncode]] — normalize, split into 16 contiguous 4-dim subvectors,
    // nearest sub-centroid each. Search: each query builds its O(k·dim)
    // ADC lookup table ONCE ([[graft.functions.PqLut]]); scoring a corpus
    // vector is then 16 array reads ([[graft.functions.PqAdc]]), and on
    // normalized vectors ‖u−w‖² = 2 − 2·cos, so ascending ADC distance
    // approximates descending cosine — the exact twin s_ann_bruteforce
    // measures recall (spec-pinned). Top-k is a TWO-STAGE ranking: first
    // within (qid, shard) partitions, then over the ≤ shards·k survivors —
    // never a corpus-cardinality window partition (the DuckDB oracle's
    // single window is result-equivalent: any global top-10 row is
    // top-10 within its shard). Hash-verified: AnnOracleSql.pqSql
    // re-runs the 10 per-subspace L2 Lloyd iterations in DuckDB and
    // re-derives codes, LUTs, and ADC sums bit-for-bit.
    GraftQuery("s_ann_pq", AnnOracleSql.pqSql) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // 16 subspaces × 4 dims × 16 centroids: 4 bits of codebook per 4
      // dims is the accuracy/size point that keeps recall useful on
      // near-orthogonal random vectors (8×8-dim quantized too coarsely —
      // recall@10 dropped under 0.2); codes are still 16 ints ≈ 16 bytes
      // against 256 raw bytes
      val M = 16; val Ksub = 16; val SubDim = 4; val Shards = 64
      val sample = t(s, dir).embeddings.filter(col("vec_id") % 3 === 0)
        .orderBy(col("vec_id")).limit(256)
        .select(expr(toDouble)).collect()
        .map(_.getSeq[Double](0).toArray)
        .map(normalize)
      val books: Array[Array[Array[Double]]] = Array.tabulate(M) { j =>
        kmeansL2(sample.map(_.slice(j * SubDim, (j + 1) * SubDim)), Ksub, 10)
      }
      val vecs = t(s, dir).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
      val corpus = vecs.filter(col("vec_id") >= 5)
        .select(col("vec_id"), GraftColumnBridge.column(
          graft.functions.PqEncode(
            GraftColumnBridge.expression(col("v")), books)).as("codes"))
      val queries = vecs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), GraftColumnBridge.column(
          graft.functions.PqLut(
            GraftColumnBridge.expression(col("v")), books)).as("lut"))
      val scored = corpus.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"),
          round(GraftColumnBridge.column(graft.functions.PqAdc(
            GraftColumnBridge.expression(col("lut")),
            GraftColumnBridge.expression(col("codes")), Ksub)), 6).as("adist"))
      // distributed top-k: per-(qid, shard) heads first (bounded window
      // partitions at any corpus size), global rank only over the
      // ≤ Shards·10 survivors; ties → vec_id, rank-stable on the ROUNDED
      // distance (the s_ann discipline)
      val w1 = Window.partitionBy(col("qid"), pmod(col("vec_id"), lit(Shards)))
        .orderBy(col("adist"), col("vec_id"))
      val w2 = Window.partitionBy(col("qid"))
        .orderBy(col("adist"), col("vec_id"))
      scored.withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= 10)
        .withColumn("rn", row_number().over(w2)).filter(col("rn") <= 10)
        .select(col("qid"), col("vec_id"), col("adist"), col("rn"))
    },

    // Embedding near-duplicate pairs on a bounded window (vec_id < 150),
    // oracled: pairs above a cosine threshold chosen for this corpus
    // (random 64-dim vectors ⇒ cosines concentrate near 0).
    GraftQuery("d_embed_neardup", {
      val dotAB = "list_sum(list_transform(list_zip(a.v, b.v), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
      s"""WITH vecs AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |              FROM embeddings WHERE vec_id < 150),
         |     norms AS (SELECT vec_id, v,
         |                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM vecs)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       round(coalesce($dotAB / nullif(a.nrm * b.nrm, 0), 0), 6) AS cos
         |FROM norms a, norms b
         |WHERE a.vec_id < b.vec_id
         |  AND round(coalesce($dotAB / nullif(a.nrm * b.nrm, 0), 0), 6) >= 0.3""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val vecs = t(s, dir).embeddings.filter(col("vec_id") < 150)
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      val a = vecs.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
      val b = vecs.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          cosine(expr(dot("va", "vb")), col("na") * col("nb")).as("cos"))
        .filter(col("cos") >= 0.3)
    }
  )

  /** DuckDB CTE prefix shared by the k-means queries: full-corpus vectors
    * with norms, the 8 hash-smallest seed vectors as centroids, and the
    * argmax-cosine assignment (`asg(vec_id, cid)`) with round-6 + cid
    * tiebreak — the rank-stable discipline every ANN oracle here uses. */
  private def kmeansCtes: String = {
    val dotNS = "list_sum(list_transform(list_zip(n.v, s.cv), p -> p[1] * p[2]))"
    s"""vecs AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |    md5(CAST(vec_id AS VARCHAR)) AS h FROM embeddings),
       |norms AS (SELECT vec_id, v, h,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM vecs),
       |seeds AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cid,
       |    v AS cv, nrm AS cnrm FROM norms ORDER BY h LIMIT 8),
       |scored AS (SELECT n.vec_id, s.cid,
       |    round(coalesce($dotNS / nullif(n.nrm * s.cnrm, 0), 0), 6) AS cos
       |  FROM norms n CROSS JOIN seeds s),
       |asg AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
       |    FROM scored) WHERE rn = 1)""".stripMargin
  }

  /** Spark half of the shared assignment: (vec_id, v, nrm, cid). Seeds
    * via TakeOrdered top-k by hash (never a global window over the
    * corpus); the 8 seeds collapse into ONE array row, so assignment is
    * a genuinely map-only projection — argmax of round(cos, 6) with the
    * cid tiebreak computed per row, no exchange of the (replicated)
    * corpus and no vectors in any shuffle. */
  private def kmeansAssign(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    graft.functions.VectorFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    // v stays FLOAT end to end (the file's discipline): graft_dot widens
    // in-register bit-identically to a CAST, and the float arrays halve
    // the bytes through the assignment's downstream window exchange and
    // the d_semdedup_kmeans self-join shuffle
    val vecs = t(s, dir).embeddings
      .select(col("vec_id"), col("embedding").as("v"),
        md5(col("vec_id").cast("string")).as("h"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    // top-k by hash plans TakeOrderedAndProject; the 8-row window after
    // it only ranks the already-selected seeds
    val seeds = vecs.orderBy(col("h")).limit(8)
      .withColumn("cid", row_number().over(
        Window.orderBy(col("h"))).cast("int") - 1)
      .select(col("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    // one row holding all k centroids; broadcast-nested-loop of a 1-row
    // side = a map-side constant, k·dim doubles total
    val seedRow = seeds.agg(sort_array(
      collect_list(struct(col("cid"), col("cv"), col("cnrm")))).as("cents"))
    // ascending sort of (-cos, cid) structs ≡ ORDER BY cos DESC, cid —
    // the same rank-stable tiebreak the window version (and the DuckDB
    // oracle's row_number) used
    vecs.crossJoin(broadcast(seedRow))
      .withColumn("cid", expr(
        """element_at(array_sort(transform(cents,
          |  c -> struct(-round(coalesce(graft_dot(v, c.cv) / nullif(nrm * c.cnrm, 0.0D), 0.0D), 6) AS negcos,
          |              c.cid AS cid))), 1).cid""".stripMargin))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
  }

  /** Lloyd's k-means on a driver-side sample: deterministic init (first k
    * sample points), fixed iteration count, cosine-space assignment on
    * normalized vectors. The trained centroids become plan constants. */
  private[graft] def kmeans(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    val pts = sample.map(normalize)
    var cents = pts.take(k).map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](pts.head.length))
      val counts = new Array[Int](k)
      pts.foreach { p =>
        val best = cents.indices.maxBy(i =>
          cents(i).zip(p).map { case (a, b) => a * b }.sum)
        counts(best) += 1
        var d = 0
        while (d < p.length) { sums(best)(d) += p(d); d += 1 }
      }
      cents = cents.indices.map { i =>
        if (counts(i) == 0) cents(i) else normalize(sums(i))
      }.toArray
    }
    cents
  }

  /** Lloyd's k-means under squared-L2 on a driver-side sample — the PQ
    * sub-codebook trainer (PQ quantizes raw subvector geometry, so the
    * metric is L2, not the cosine the full-vector [[kmeans]] uses).
    * Deterministic: init = first k points, argmin ties → lower index,
    * empty clusters keep their previous centroid. */
  private[graft] def kmeansL2(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    val dim = sample.head.length
    var cents = sample.take(k).map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { p =>
        var best = 0; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          var d2 = 0.0; var i = 0
          while (i < dim) { val x = p(i) - cents(c)(i); d2 += x * x; i += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += p(d); d += 1 }
      }
      cents = cents.indices.map { i =>
        if (counts(i) == 0) cents(i) else sums(i).map(_ / counts(i))
      }.toArray
    }
    cents
  }

  /** argmax over centroids of dot(v, c_i), ties → higher index; the
    * centroid matrix rides as one reference object
    * ([[graft.functions.NearestCentroid]]). */
  private[graft] def nearestCentroid(v: Column,
      cents: Array[Array[Double]]): Column =
    GraftColumnBridge.column(graft.functions.NearestCentroid(
      GraftColumnBridge.expression(v), cents))

  /** Top-`nprobe` centroid ids by dot(v, c_i), best first, ties → lower
    * index ([[graft.functions.TopCentroids]]). */
  private[graft] def topCentroids(v: Column, cents: Array[Array[Double]],
      nprobe: Int): Column =
    GraftColumnBridge.column(graft.functions.TopCentroids(
      GraftColumnBridge.expression(v), cents, nprobe))

  /** Random hyperplanes as driver-side constants: bands × planesPerBand
    * vectors of ±1 components, fixed seed → stable buckets across runs.
    * The plane matrix rides as one reference object
    * ([[graft.functions.HyperplaneBands]]); per-row work is
    * `bands × planesPerBand` fused dot loops. */
  // lazy: referenced by lshOracleSql during `defs` initialization, which
  // runs before this val in declaration order
  private lazy val planes: IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rng = new scala.util.Random(2026)
    IndexedSeq.fill(4)(IndexedSeq.fill(4)(
      Array.fill(64)(if (rng.nextBoolean()) 1.0 else -1.0)))
  }

  /** DuckDB oracle for the full LSH pipeline. The ±1 plane rows embed as
    * list literals; each sign bit re-derives via a SEQUENTIAL fold
    * (list_reduce) over v[i]·s_i — the same index-order double summation
    * the fused HyperplaneBands loop performs, so the sign test agrees
    * bit-for-bit and the bucket partition matches Spark's exactly. */
  private def lshOracleSql: String = {
    def signLit(b: Int, j: Int): String =
      planes(b)(j).map(x => if (x > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
    def dotFold(b: Int, j: Int): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(list_zip(v, ${signLit(b, j)}), p -> p[1] * p[2])), " +
        "(a, x) -> a + x)"
    def bucket(b: Int): String =
      (0 until 4).map(j =>
        s"(CASE WHEN ${dotFold(b, j)} > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
    val bandArms = (0 until 4).map(b =>
      s"SELECT vec_id, $b AS band, ${bucket(b)} AS bucket FROM vecs")
      .mkString("\n UNION ALL ")
    s"""WITH vecs AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |norms AS (SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM vecs),
       |banded AS ($bandArms),
       |qbands AS (SELECT vec_id AS qid, band, bucket FROM banded WHERE vec_id < 5),
       |cands AS (SELECT DISTINCT q.qid, c.vec_id
       |  FROM banded c JOIN qbands q ON c.band = q.band AND c.bucket = q.bucket
       |  WHERE c.vec_id >= 5),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM norms WHERE vec_id < 5),
       |scored AS (SELECT cands.qid, cands.vec_id,
       |    round(coalesce(list_sum(list_transform(list_zip(q.qv, e.v), p -> p[1] * p[2]))
       |          / nullif(q.qn * e.nrm, 0), 0), 6) AS cos
       |  FROM cands JOIN norms e ON cands.vec_id = e.vec_id
       |  JOIN q ON cands.qid = q.qid),
       |ranked AS (SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT qid, vec_id, cos, rn FROM ranked WHERE rn <= 10""".stripMargin
  }

  /** Shared hyperplane-banded candidate CTEs (vecs/norms/banded/capped
    * + `cands(qid, vec_id)` under `pairCond`) — ONE definition for the
    * kNN join and semantic-decontamination oracles, so the plane
    * folds, bucket packing, and cap cannot drift between them. */
  private def bandedCandidateCtes(planesPerBand: Int,
      pairCond: String): String = {
    def signLit(b: Int, j: Int): String =
      planes(b)(j).map(x => if (x > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
    def dotFold(b: Int, j: Int): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(list_zip(v, ${signLit(b, j)}), p -> p[1] * p[2])), " +
        "(a, x) -> a + x)"
    def bucket(b: Int): String =
      (0 until planesPerBand).map(j =>
        s"(CASE WHEN ${dotFold(b, j)} > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
    val bandArms = (0 until 4).map(b =>
      s"SELECT vec_id, $b AS band, ${bucket(b)} AS bucket FROM vecs")
      .mkString("\n UNION ALL ")
    s"""vecs AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |norms AS (SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM vecs),
       |banded AS ($bandArms),
       |capped AS (SELECT band, bucket, vec_id FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsize FROM banded)
       |  WHERE bsize <= 200),
       |cands AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id
       |  FROM capped c JOIN capped q ON c.band = q.band AND c.bucket = q.bucket
       |  WHERE $pairCond),
       |scored AS (SELECT cands.qid, cands.vec_id,
       |    round(coalesce(list_sum(list_transform(list_zip(q.v, e.v), p -> p[1] * p[2]))
       |          / nullif(q.nrm * e.nrm, 0), 0), 6) AS cos
       |  FROM cands JOIN norms e ON cands.vec_id = e.vec_id
       |  JOIN norms q ON cands.qid = q.vec_id)""".stripMargin
  }

  /** DuckDB oracle for the kNN self-join: the lshOracleSql machinery
    * with EVERY vector as a query, the bucket cap re-derived via the
    * same count-over-window, and top-3 ranks. */
  private def knnJoinOracleSql: String =
    // 3 planes per band (vs the query-probe pipeline's 4): the kNN join
    // needs recall for EVERY vector, so its buckets are wider
    s"""WITH ${bandedCandidateCtes(3, "q.vec_id <> c.vec_id")},
       |ranked AS (SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT qid, vec_id, cos, rn FROM ranked WHERE rn <= 3""".stripMargin

  /** DuckDB oracle for semantic decontamination: the same banding with
    * eval vectors (vec_id % 10 = 0) as queries against train vectors,
    * thresholded. */
  private def semanticDecontOracleSql: String =
    s"""WITH ${bandedCandidateCtes(3,
          "q.vec_id % 10 = 0 AND c.vec_id % 10 <> 0")}
       |SELECT vec_id AS train_id, qid AS eval_id, cos
       |FROM scored WHERE cos >= 0.3
       |ORDER BY train_id, eval_id LIMIT 500""".stripMargin

  /** Array of per-band bucket keys. Band b's key packs `planesPerBand`
    * sign bits, bit j = sign of dot(v, plane_{b,j}). */
  private def bandSignatures(v: Column, bands: Int, planesPerBand: Int): Column = {
    val flat = (0 until bands).flatMap(b => (0 until planesPerBand).map(j =>
      planes(b)(j))).toArray
    GraftColumnBridge.column(graft.functions.HyperplaneBands(
      GraftColumnBridge.expression(v), flat, bands, planesPerBand))
  }
}
