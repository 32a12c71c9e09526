package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector expressions: interpreted vs codegen parity, equivalence
  * with the higher-order-function formulation they replace, null/edge
  * semantics. */
class VectorExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withVecs[T](f: org.apache.spark.sql.DataFrame => T): T = {
    VectorFunctions.register(spark)
    f(Tables(spark, sf).embeddings.limit(200)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")))
  }

  test("graft_dot matches the aggregate/zip_with fold bit-for-bit") {
    withVecs { vecs =>
      val both = vecs.select(
        expr("graft_dot(v, v)").as("native"),
        expr("aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() == 0)
    }
  }

  test("graft_cosine of a vector with itself is 1") {
    withVecs { vecs =>
      val cos = vecs.select(expr("graft_cosine(v, v)").as("c"))
      assert(cos.filter(abs(col("c") - 1.0) > 1e-12).count() == 0)
    }
  }

  test("graft_cosine null semantics: zero vector and null input") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS zero,
        |       graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nul""".stripMargin)
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("graft_hamming64 counts differing bits") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_hamming64(0L, -1L) AS a,
        |       graft_hamming64(5L, 6L) AS b,
        |       graft_hamming64(42L, 42L) AS c""".stripMargin).head()
    assert(r.getInt(0) == 64 && r.getInt(1) == 2 && r.getInt(2) == 0)
  }

  test("graft_simhash32 matches the aggregate/zip_with formulation on documents") {
    VectorFunctions.register(spark)
    val hashed = Tables(spark, sf).documents.limit(300)
      .withColumn("words",
        split(expr("trim(regexp_replace(lower(text), '[^a-z0-9 ]', ''))"), " "))
      .withColumn("hashes", expr("transform(array_distinct(words), w -> xxhash64(w))"))
    val both = hashed.select(
      expr("graft_simhash32(hashes)").as("native"),
      expr(
        """aggregate(zip_with(
          |  aggregate(hashes, array_repeat(0L, 32),
          |    (acc, h) -> zip_with(acc, sequence(0, 31),
          |       (c, i) -> c + CASE WHEN shiftright(h, i) % 2 != 0 THEN 1 ELSE -1 END)),
          |  sequence(0, 31),
          |  (c, i) -> CASE WHEN c > 0 THEN shiftleft(1L, i) ELSE 0L END),
          |  0L, (a, x) -> a + x)""".stripMargin).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("graft_minhash32 matches 32 array_min(transform(...)) expressions") {
    VectorFunctions.register(spark)
    val P = VectorFunctions.MinHashP
    val bh = Tables(spark, sf).documents.limit(300)
      .withColumn("words", split(lower(col("text")), " "))
      .withColumn("bh", expr(s"transform(array_distinct(words), w -> pmod(xxhash64(w), ${P}L))"))
    val hof = array(VectorFunctions.minhashPerms.map { case (a, b) =>
      expr(s"array_min(transform(bh, h -> pmod(h * ${a}L + ${b}L, ${P}L)))")
    }: _*)
    val both = bh.select(expr("graft_minhash32(bh)").as("native"), hof.as("hof"))
    assert(both.filter(expr("native != hof")).count() == 0)
  }

  test("graft_count_in matches size(filter(arr, w -> w IN set)) incl. duplicates") {
    VectorFunctions.register(spark)
    val both = Tables(spark, sf).documents.limit(300)
      .withColumn("words", split(lower(col("text")), " "))
      .select(
        expr("graft_count_in(words, array('the','and','of','to'))").as("native"),
        size(filter(col("words"), w =>
          w === "the" || w === "and" || w === "of" || w === "to")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    val edge = spark.sql(
      """SELECT graft_count_in(array('a','a','b'), array('a')) AS dups,
        |       graft_count_in(array(), array('a')) AS empty,
        |       graft_count_in(CAST(NULL AS ARRAY<STRING>), array('a')) AS nul""".stripMargin)
      .head()
    assert(edge.getInt(0) == 2 && edge.getInt(1) == 0 && edge.isNullAt(2))
  }

  test("graft_shingle3 matches the composed concat_ws+porthash63 pipeline") {
    VectorFunctions.register(spark)
    val P = VectorFunctions.MinHashP
    val both = Tables(spark, sf).documents.limit(300)
      .withColumn("words", split(lower(col("text")), " "))
      .select(
        expr("graft_shingle3(words)").as("native"),
        expr(
          s"""CASE WHEN size(words) < 3
             |  THEN array(graft_porthash63(concat_ws(' ', words)) % ${P}L)
             |  ELSE transform(sequence(1, size(words) - 2),
             |    i -> graft_porthash63(concat_ws(' ', element_at(words, i),
             |           element_at(words, i + 1), element_at(words, i + 2))) % ${P}L)
             |END""".stripMargin).as("hof"))
    assert(both.filter(expr("native != hof")).count() == 0)
    // edge cases: 1-word and 2-word inputs hash the space-joined whole
    val edge = spark.sql(
      s"""SELECT graft_shingle3(array('a')) = array(graft_porthash63('a') % ${P}L) AS one,
         |  graft_shingle3(array('a','b')) = array(graft_porthash63('a b') % ${P}L) AS two,
         |  graft_shingle3(CAST(NULL AS ARRAY<STRING>)) AS nul""".stripMargin).head()
    assert(edge.getBoolean(0) && edge.getBoolean(1) && edge.isNullAt(2))
  }

  test("graft_porthash63 matches an independent reference implementation") {
    VectorFunctions.register(spark)
    import spark.implicits._
    // reference: BigInt arithmetic, unsigned throughout (no Long wrapping)
    def ref(s: String): Long = {
      val M = BigInt(1) << 64
      var h = BigInt(0)
      s.getBytes("UTF-8").foreach(b => h = (h * 257 + (b & 0xff)) % M)
      def x33(v: BigInt) = v ^ (v >> 33)
      h = x33(h); h = (h * BigInt("ff51afd7ed558ccd", 16)) % M
      h = x33(h); h = (h * BigInt("c4ceb9fe1a85ec53", 16)) % M
      (x33(h) >> 1).longValue
    }
    val texts = Seq("", "a", "hello world", "the quick brown fox",
      "0123456789 abcdef", "zz top")
    val got = texts.toDF("t").select(expr("graft_porthash63(t)").as("h"))
      .collect().map(_.getLong(0))
    texts.zip(got).foreach { case (t, g) =>
      assert(g == ref(t), s"porthash mismatch for '$t'")
      assert(g >= 0L, s"porthash must be nonnegative, got $g for '$t'")
    }
    // graft_porthash_arr = element-wise graft_porthash63
    val arr = spark.sql(
      "SELECT graft_porthash_arr(array('a', 'b', '', 'c d')) AS hs").head()
      .getSeq[Long](0)
    assert(arr == Seq(ref("a"), ref("b"), ref(""), ref("c d")))
  }

  test("graft_minhash32 returns null for an empty hash array") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_minhash32(array_remove(array(1L), 1L)) AS empty,
        |       graft_minhash32(CAST(NULL AS ARRAY<BIGINT>)) AS nul""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("graft_dot on raw float arrays equals dot on per-element double casts") {
    VectorFunctions.register(spark)
    val both = Tables(spark, sf).embeddings.limit(200)
      .select(
        expr("graft_dot(embedding, embedding)").as("floats"),
        expr("graft_dot(transform(embedding, x -> CAST(x AS DOUBLE)), " +
          "transform(embedding, x -> CAST(x AS DOUBLE)))").as("doubles"))
    assert(both.filter(col("floats") =!= col("doubles")).count() == 0)
  }

  test("MinHashBandBuckets matches the portable fold+fmix per band") {
    import org.apache.spark.sql.GraftColumnBridge
    VectorFunctions.register(spark)
    // independent reference: unsigned BigInt fold + fmix, low 32 bits
    def refBuckets(sig: Seq[Long]): Seq[Int] = {
      val M = BigInt(1) << 64
      def x33(v: BigInt) = v ^ (v >> 33)
      (0 until 8).map { b =>
        var h = BigInt(0)
        (0 until 4).foreach { j =>
          val idx = b * 4 + j
          if (idx < sig.length) h = (h * 1099511628211L + sig(idx)) % M
        }
        h = x33(h); h = (h * BigInt("ff51afd7ed558ccd", 16)) % M
        h = x33(h); h = (h * BigInt("c4ceb9fe1a85ec53", 16)) % M
        (((x33(h) >> 1) % (BigInt(1) << 32))).toLong.toInt
      }
    }
    val rows = Tables(spark, sf).documents.limit(300)
      .withColumn("words", split(lower(col("text")), " "))
      .select(expr("graft_minhash32(graft_shingle3(words))").as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("sig"),
        GraftColumnBridge.column(graft.functions.MinHashBandBuckets(
          GraftColumnBridge.expression(col("sig")), bands = 8, rowsPerBand = 4))
          .as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sig = r.getSeq[Long](0)
      val native = r.getSeq[Int](1)
      assert(native == refBuckets(sig), s"bucket mismatch for sig $sig")
    }
  }

  test("NearestCentroid / TopCentroids match the composed argmax forms") {
    import org.apache.spark.sql.GraftColumnBridge
    VectorFunctions.register(spark)
    val cents = Array.tabulate(8)(c =>
      Array.tabulate(64)(i => math.sin(c * 64 + i)))
    def centLit(c: Array[Double]) = c.mkString("array(", "D, ", "D)")
    val nearComposed = expr("array_max(array(" + cents.zipWithIndex.map {
      case (c, i) => s"struct(graft_dot(v, ${centLit(c)}) AS d, $i AS i)"
    }.mkString(", ") + ")).i")
    val topComposed = expr("transform(slice(array_sort(array(" +
      cents.zipWithIndex.map { case (c, i) =>
        s"struct(-graft_dot(v, ${centLit(c)}) AS negd, $i AS i)"
      }.mkString(", ") + ")), 1, 4), e -> e.i)")
    val vecs = Tables(spark, sf).embeddings.limit(200)
      .select(col("embedding").as("v"))
    val both = vecs.select(
      GraftColumnBridge.column(graft.functions.NearestCentroid(
        GraftColumnBridge.expression(col("v")), cents)).as("n_native"),
      nearComposed.as("n_hof"),
      GraftColumnBridge.column(graft.functions.TopCentroids(
        GraftColumnBridge.expression(col("v")), cents, 4)).as("t_native"),
      topComposed.as("t_hof"))
    assert(both.filter(expr("n_native != n_hof OR t_native != t_hof")).count() == 0)
  }

  test("HyperplaneBands matches the sign-bit CASE chain") {
    import org.apache.spark.sql.GraftColumnBridge
    VectorFunctions.register(spark)
    val rng = new scala.util.Random(7)
    val planes = Array.fill(8)(
      Array.fill(64)(if (rng.nextBoolean()) 1.0 else -1.0))
    val composed = expr("array(" + (0 until 2).map { b =>
      (0 until 4).map { j =>
        val lit = planes(b * 4 + j).mkString("array(", "D, ", "D)")
        s"(CASE WHEN graft_dot(v, $lit) > 0 THEN ${1L << j}L ELSE 0L END)"
      }.mkString(" + ")
    }.mkString(", ") + ")")
    val vecs = Tables(spark, sf).embeddings.limit(200)
      .select(col("embedding").as("v"))
    val both = vecs.select(
      GraftColumnBridge.column(graft.functions.HyperplaneBands(
        GraftColumnBridge.expression(col("v")), planes, 2, 4)).as("native"),
      composed.as("hof"))
    assert(both.filter(expr("native != hof")).count() == 0)
  }

  test("graft_norm matches the composed regex normalization") {
    VectorFunctions.register(spark)
    val composed =
      "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' +', ' '))"
    // whole corpus, incl. non-ASCII (zh) documents
    val docs = Tables(spark, sf).documents
      .select(expr("graft_norm(text)").as("native"), expr(composed).as("regex"))
    assert(docs.filter(col("native") =!= col("regex")).count() == 0)
    // edge cases: punctuation-adjacent words must NOT merge into the
    // space-squash, leading/trailing/only-space inputs, tabs, unicode
    import spark.implicits._
    val edges = Seq("a.b", "a . b", "  leading", "trailing  ", "   ",
      "", "Tab\tsep", "MiXeD CaSe 42!", "naïve café", "中文 text 漢字")
    val e = edges.toDF("text")
      .select(expr("graft_norm(text)").as("native"), expr(composed).as("regex"))
    assert(e.filter(col("native") =!= col("regex")).count() == 0,
      e.collect().mkString("; "))
  }

  test("graft_winnow matches a brute-force reference implementation") {
    VectorFunctions.register(spark)
    val k = 8; val w = 16
    // brute-force reference: all k-gram hashes by direct polynomial
    // evaluation, then rightmost-minimal rescan per window
    def ref(text: String): Seq[Long] = {
      val b = text.getBytes("UTF-8")
      val B = 257L; val Mask = 0x7fffffffL
      if (b.length < k) {
        var h = 0L; b.foreach(c => h = (h * B + (c & 0xff)) & Mask)
        return Seq(h)
      }
      val hs = (0 to b.length - k).map { i =>
        var h = 0L
        (i until i + k).foreach(j => h = (h * B + (b(j) & 0xff)) & Mask)
        h
      }
      val sel = scala.collection.mutable.SortedSet[Long]()
      if (hs.length < w) {
        // single whole-text window, rightmost minimum
        sel += hs.zipWithIndex.minBy { case (h, i) => (h, -i) }._1
      } else {
        for (s <- 0 to hs.length - w) {
          val win = hs.slice(s, s + w)
          sel += win.zipWithIndex.minBy { case (h, i) => (h, -i) }._1
        }
      }
      sel.toSeq
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running far",
      "short", "exactly8", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    import spark.implicits._
    val got = texts.toDF("t")
      .select(expr("graft_winnow(t)").as("fps"))
      .collect().map(_.getSeq[Long](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == ref(t), s"winnow mismatch for '$t': $g vs ${ref(t)}")
    }
    // guarantee: sharing a >= w+k-1 byte substring ⇒ >= 1 shared fp
    val common = "this exact shared passage is certainly long enough to fingerprint"
    val d1 = s"prefix one $common suffix alpha"
    val d2 = s"completely different beginning $common other ending"
    val fps = Seq(d1, d2).toDF("t")
      .select(expr("graft_winnow(t)").as("fps"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert((fps(0) & fps(1)).nonEmpty, "winnowing guarantee violated")
  }

  test("codegen and interpreted paths agree") {
    withVecs { vecs =>
      // force interpreted path via codegen-off config on a copy
      val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
      try {
        val on = vecs.select(sum(expr("graft_dot(v, v)"))).head().getDouble(0)
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        val off = vecs.select(sum(expr("graft_dot(v, v)"))).head().getDouble(0)
        assert(on == off)
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prev)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
  }
}
