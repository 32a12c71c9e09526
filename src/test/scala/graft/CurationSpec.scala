package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the corpus-curation operators (the DuckDB hash oracle
  * verifies cross-engine value equality; these pin the CONTRACTS). */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("semdedup equals the brute-force within-bucket keep-first") {
    val out = q("d_semdedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 500)
    // recompute: bucket -> vectors, all within-bucket pairs, keep-first
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val bucketOf = out.map(r => r._1 -> r._2).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expectDup = vecs.keys.map { id =>
      id -> vecs.keys.exists(o => o < id && bucketOf(o) == bucketOf(id) &&
        cos(vecs(o), vecs(id)) >= 0.3)
    }.toMap
    out.foreach { case (id, _, isDup) =>
      assert(isDup == expectDup(id), s"vec $id")
    }
    // non-degenerate on this corpus: some dups, not all
    val flagged = out.count(_._3)
    assert(flagged > 0 && flagged < 500, s"flagged=$flagged")
  }

  test("semdedup-kmeans equals brute-force cluster-then-keep-first") {
    val out = q("d_semdedup_kmeans")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      r6(dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)))
    }
    // seeds = the 8 md5-smallest vectors; cid = rank in hash order
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val seeds = vecs.keys.toSeq.sortBy(id => md5hex(id.toString)).take(8)
    // assignment: argmax cosine, ties to the smaller cid
    val cidOf = vecs.keys.map { id =>
      id -> seeds.zipWithIndex
        .map { case (s, cid) => (cid, cos(vecs(id), vecs(s))) }
        .minBy { case (cid, c) => (-c, cid) }._1
    }.toMap
    // keep-first within cluster at threshold 0.3
    val expected = vecs.keys.flatMap { id =>
      val mates = vecs.keys
        .filter(o => o < id && cidOf(o) == cidOf(id))
        .map(o => o -> cos(vecs(o), vecs(id)))
        .filter(_._2 >= 0.3).toSeq
      if (mates.isEmpty) None
      else Some(id -> (mates.map(_._1).min, mates.map(_._2).max))
    }.toMap
    assert(out == expected,
      s"missing=${(expected.keySet -- out.keySet).take(5)} " +
        s"extra=${(out.keySet -- expected.keySet).take(5)}")
    // non-degenerate on this corpus
    assert(out.nonEmpty && out.size < vecs.size)
  }

  test("lang balance keeps ALL of the smallest language, subsets of the rest") {
    val docs = Tables(spark, sf).documents
    val counts = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = counts.minBy(_._2)._1
    val kept = q("d_lang_balance")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keptBy = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // rate for the smallest language is exactly 1 — nothing is dropped
    assert(keptBy(minLang) == counts(minLang))
    // other languages are strict, roughly-target-sized subsets
    val target = counts.values.min
    counts.keys.filter(_ != minLang).foreach { l =>
      assert(keptBy(l) < counts(l), s"$l not downsampled")
      assert(math.abs(keptBy(l) - target) <= target / 2,
        s"$l kept ${keptBy(l)} vs target $target")
    }
    // deterministic: a second run returns the identical set
    val again = q("d_lang_balance")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet)
  }

  test("source filter keeps exactly the docs of passing sources") {
    val docs = Tables(spark, sf).documents
    val stats = docs.groupBy(col("source")).agg(
        count(lit(1)).as("n"), (sum(col("n_chars")) / count(lit(1))).as("avg"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val passing = stats.filter(s => s._3 >= 295 && s._2 >= 10).map(_._1).toSet
    assert(passing.nonEmpty && passing.size < stats.length) // discriminates
    val out = q("d_source_filter").collect()
    assert(out.map(_.getString(1)).toSet == passing)
    val wantDocs = docs.filter(col("source").isin(passing.toSeq: _*)).count()
    assert(out.length == wantDocs)
  }

  test("unigram surprisal matches an independent recomputation") {
    val rows = q("t_unigram_logprob")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 500 && rows.forall(_._3 > 0))
    // independent recomputation from raw text (driver-side, 500 docs)
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.replaceAll("[^a-z0-9 ]", "")
          .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty).toSeq)
      .toMap
    val cf = docs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val tot = cf.values.sum.toDouble
    rows.foreach { case (id, nTok, surprisal) =>
      val words = docs(id)
      assert(nTok == words.length, s"doc $id token count")
      val microSum = words.groupBy(identity).map { case (w, ws) =>
        math.round(ws.size * math.log(cf(w) / tot) * 1e6)
      }.sum
      val want = BigDecimal(-microSum.toDouble / 1e6 / nTok)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(surprisal - want) < 1e-9, s"doc $id: $surprisal vs $want")
    }
  }

  test("mixture weights equalize per-source token share") {
    val rows = q("d_mix_weights")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20) // 20 sources in the corpus
    val total = rows.map(_._3).sum.toDouble
    val share = total / rows.length
    rows.foreach { case (src, nDocs, nTokens, w) =>
      assert(nDocs > 0 && nTokens > 0)
      // weight × actual tokens = the uniform share, to rounding
      assert(math.abs(w * nTokens - share) < 1.0, s"$src: $w")
    }
    // weights straddle 1: some sources upsample, some downsample
    assert(rows.exists(_._4 > 1.0) && rows.exists(_._4 < 1.0))
  }

  test("phash: identical payloads collide, local edits stay near, the pair query finds only close hashes") {
    val ph = graft.functions.PHash63(null)
    val base = ("the quick brown fox jumps over the lazy dog " * 8).getBytes
    val same = ph.compute(base.clone())
    assert(same == ph.compute(base))
    // a handful of byte edits moves few sampled positions
    val edited = base.clone()
    edited(10) = 'X'; edited(100) = 'Y'; edited(200) = 'Z'
    val hd = java.lang.Long.bitCount(ph.compute(base) ^ ph.compute(edited))
    assert(hd <= 8, s"edited hamming $hd")
    assert(ph.compute(Array.emptyByteArray) == 0L)
    // hash is 63-bit: never negative (DuckDB BIGINT shift parity)
    val rng = new scala.util.Random(5)
    (1 to 50).foreach { _ =>
      val b = Array.fill(rng.nextInt(300) + 1)(rng.nextInt(256).toByte)
      assert(ph.compute(b) >= 0L)
    }
    // the pair query's output obeys its own contract on real data
    val pairs = q("m_phash_pairs").collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 8)
    }
  }
}
