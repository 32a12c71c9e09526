package graft

import graft.security.PromptInjectionGuard
import graft.util.{Exact, Sanitize, Scrubber}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests, mirroring the reference's proptest suites
  * (flatten_joins_proptest.rs, arrow_proptest.rs) for the components we
  * authored by hand: the Aho–Corasick automaton, the exact-sum helper's
  * order-independence, identifier sanitation, and the scrubber.
  * (Plain ScalaCheck generators sampled deterministically — the
  * scalatest/scalacheck bridge isn't among the allowed dependencies.)
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      (20, Gen.alphaNumChar), (5, Gen.const(' ')),
      (1, Gen.oneOf('.', ',', '!', '-', ':')))).map(_.mkString)

  test("automaton agrees with naive contains on random haystacks") {
    val patterns = PromptInjectionGuard.DefaultPatterns
    val auto = new PromptInjectionGuard.Automaton(patterns)
    val cases = samples(for {
      hay <- asciiText
      pat <- Gen.oneOf(patterns)
      inject <- Gen.oneOf(true, false)
    } yield (hay, pat, inject), 200)
    assert(cases.size > 150)
    cases.foreach { case (hay, pat, inject) =>
      val text = if (inject) hay.take(500) + pat + hay.drop(500) else hay
      val naive = patterns.exists(p => text.toLowerCase.contains(p))
      val got = auto.firstMatch(text) >= 0
      assert(got == naive, s"auto=$got naive=$naive text=${text.take(80)}")
    }
  }

  test("dsum decimal cast is order-independent") {
    import SparkTestSession._
    import spark.implicits._
    val lists = samples(Gen.listOfN(40,
      Gen.chooseNum(-1e6, 1e6).map(v => math.round(v * 100) / 100.0)), 10)
    lists.filter(_.nonEmpty).foreach { xs =>
      val a = xs.toDF("v").agg(Exact.dsum(org.apache.spark.sql.functions.col("v")))
        .head().getDouble(0)
      val b = new scala.util.Random(7).shuffle(xs).toDF("v")
        .agg(Exact.dsum(org.apache.spark.sql.functions.col("v")))
        .head().getDouble(0)
      assert(a == b, s"order-dependent sum: $a vs $b")
    }
  }

  test("dsum matches BigDecimal reference arithmetic") {
    import SparkTestSession._
    import spark.implicits._
    val lists = samples(Gen.listOfN(30,
      Gen.chooseNum(-1e5, 1e5).map(v => math.round(v * 100) / 100.0)), 10)
    lists.filter(_.nonEmpty).foreach { xs =>
      val got = xs.toDF("v").agg(Exact.dsum(org.apache.spark.sql.functions.col("v")))
        .head().getDouble(0)
      val want = xs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(got == want, s"dsum=$got reference=$want")
    }
  }

  test("scaled-long conversion equals the string-based decimal cast on money values") {
    import SparkTestSession._
    import spark.implicits._
    // money-like: exact 2-decimal values (where every rounding flavor
    // agrees — the precondition Exact.scaled documents)
    val xs = samples(Gen.chooseNum(-1e9, 1e9)
      .map(v => math.round(v * 100) / 100.0), 300).distinct
    val rows = xs.toDF("v")
      .select(org.apache.spark.sql.functions.col("v"),
        Exact.scaled(org.apache.spark.sql.functions.col("v")).as("s"))
      .collect()
    assert(rows.length == xs.length)
    rows.foreach { r =>
      val v = r.getDouble(0); val s = r.getLong(1)
      val want = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .underlying.unscaledValue.longValueExact
      assert(s == want, s"scaled($v) = $s, decimal cast gives $want")
    }
  }

  test("lsum (primitive-long path) equals dsum (decimal-buffer path)") {
    import SparkTestSession._
    import spark.implicits._
    val lists = samples(Gen.listOfN(50,
      Gen.chooseNum(0.0, 1e6).map(v => math.round(v * 100) / 100.0)), 10)
    lists.filter(_.nonEmpty).foreach { xs =>
      val c = org.apache.spark.sql.functions.col("v")
      val r = xs.toDF("v").agg(Exact.dsum(c).as("d"), Exact.lsum(c).as("l")).head()
      assert(r.getDouble(0) == r.getDouble(1),
        s"dsum=${r.getDouble(0)} lsum=${r.getDouble(1)}")
    }
  }

  test("phash63 matches a model implementation on random payloads") {
    val ph = graft.functions.PHash63(null)
    val payloads = samples(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray), 300)
    payloads.foreach { b =>
      val got = ph.compute(b)
      // independent model: sample, mean test, bit pack
      val want =
        if (b.isEmpty) 0L
        else {
          val s = (0 until 63).map(i => b((i.toLong * b.length / 63).toInt) & 0xff)
          val sum = s.map(_.toLong).sum
          (0 until 63).map(i => if (s(i) * 63L > sum) 1L << i else 0L).sum
        }
      assert(got == want, s"payload len ${b.length}")
      assert(got >= 0L, "63-bit hash must stay non-negative")
    }
  }

  test("secret expansion: no placeholders → identity; unknown vars survive") {
    val texts = samples(asciiText, 100)
    texts.foreach { t =>
      val clean = t.replace("$", "")
      assert(graft.cli.Cli.expandSecrets(clean, _ => None) == clean)
    }
    assert(graft.cli.Cli.expandSecrets("a ${X} b ${Y}",
      Map("X" -> "1").get) == "a 1 b ${Y}")
  }

  test("sanitizer accepts exactly the safe identifiers") {
    val safe = Gen.nonEmptyListOf(Gen.frequency(
      (10, Gen.alphaNumChar), (1, Gen.const('_')), (1, Gen.const('.'))))
      .map(_.mkString.take(128))
    samples(safe, 100).foreach { id =>
      assert(Sanitize.validateIdentifier(id) == id)
    }
    val bads = samples(for {
      id <- safe
      c <- Gen.oneOf('"', '\'', ' ', ';', '`', '\\')
      pos <- Gen.chooseNum(0, 10)
    } yield id.take(pos) + c + id.drop(pos), 100)
    bads.foreach { bad =>
      intercept[Sanitize.UnsafeIdentifier](Sanitize.validateIdentifier(bad))
    }
  }

  test("pg statement splitter recovers the statements through any " +
      "quoting/comment noise") {
    // each generated statement embeds semicolons inside every construct
    // the scanner must pass through verbatim; joining with ';' and
    // splitting must recover exactly the original statements
    val stmt: Gen[String] = Gen.oneOf(
      Gen.const("SELECT 1"),
      Gen.alphaNumStr.map(s => s"SELECT '${s.take(6)};x' AS a"),
      Gen.alphaNumStr.map(s => s"""SELECT 1 AS "c;${s.take(4)}""""),
      Gen.alphaNumStr.map(s => s"SELECT 2 /* no;te ${s.take(5)} */"),
      Gen.alphaNumStr.map(s =>
        "SELECT " + "$$" + "x;y" + s.take(4) + "$$" + " AS d"),
      Gen.const("SELECT 3 -- tail;comment")
    )
    val cases = samples(Gen.nonEmptyListOf(stmt).map(_.take(5)), 120)
    cases.foreach { sts =>
      // "\n;"-joined: a line comment runs to end of line in pg too, so
      // the newline must terminate it BEFORE the separating semicolon —
      // a ';' on the comment's own line is comment CONTENT, not a
      // separator (true of this scanner and of real pg alike)
      val joined = sts.mkString("\n;")
      val got = graft.server.PgWireEdge.splitStatements(joined)
      assert(got.size == sts.size,
        s"split ${got.size} != ${sts.size} for: $joined\n got: $got")
      got.zip(sts).foreach { case (g, s) =>
        assert(g.trim == s.trim, s"fragment mismatch: '$g' vs '$s'")
      }
    }
    // comment-only and whitespace-only inputs have no statements
    Seq("", "   ", ";", " ; ; ", "-- just a comment", "/* only */",
      "/* a */ ; -- b").foreach { s =>
      assert(graft.server.PgWireEdge.splitStatements(s).isEmpty, s"'$s'")
    }
  }

  test("scrubber removes every embedded email") {
    val cases = samples(for {
      text <- asciiText
      u <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(10))
      d <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))
    } yield (text, s"$u@$d.com"), 100)
    cases.foreach { case (text, mail) =>
      val s = Scrubber.scrub(text + " " + mail + " " + text)
      assert(!s.contains(mail), s"leaked $mail in: ${s.take(100)}")
    }
  }
}
