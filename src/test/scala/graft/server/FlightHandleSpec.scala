package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** The stateless prepared-statement handle: every parameter class the
  * DoPut batch decoder can produce must survive the encode → decode
  * round trip value-exact, because the handle IS the server's only
  * state (reference flight_sql.rs:558-561 — handle = SQL bytes; bound
  * values ride inside graft's replacement handle). */
class FlightHandleSpec extends AnyFunSuite {

  test("handle round-trips every parameter class " +
      "(incl. DECIMAL scale, DATE, second+nano timestamps)") {
    val params: Map[String, Any] = Map(
      "n" -> null, "b" -> true, "i" -> 42, "l" -> 9007199254740993L,
      "f" -> 0.1d, "s" -> "héllo",
      "dec" -> new java.math.BigDecimal("1.250"),
      "day" -> java.time.LocalDate.of(2024, 2, 29),
      "ins" -> java.time.Instant.ofEpochSecond(1709296496L, 789123000L),
      "ndt" -> java.time.LocalDateTime.of(2024, 3, 1, 12, 34, 56, 789123000))
    val (sql, back) = FlightSqlEdge.decodeHandle(
      FlightSqlEdge.encodeHandle("SELECT :dec", params))
    assert(sql == "SELECT :dec")
    // ints normalize to Long through the handle (Spark literal-plants
    // both identically); everything else must come back value-exact
    assert(back("i") == 42L && back("l") == 9007199254740993L)
    assert(back("n") == null && back("b") == true && back("f") == 0.1d)
    assert(back("s") == "héllo")
    val dec = back("dec").asInstanceOf[java.math.BigDecimal]
    assert(dec.compareTo(new java.math.BigDecimal("1.250")) == 0 &&
      dec.scale == 3, dec)
    assert(back("day") == params("day"))
    assert(back("ins") == params("ins"))
    assert(back("ndt") == params("ndt"))
    // a micros-precision instant with a NEGATIVE epoch second (pre-1970)
    // must not corrupt under floor vs truncating division
    val old = java.time.Instant.ofEpochSecond(-100L, 250000000L)
    val (_, b2) = FlightSqlEdge.decodeHandle(
      FlightSqlEdge.encodeHandle("SELECT 1", Map("t" -> old)))
    assert(b2("t") == old)
    // an unsupported class refuses loudly, naming the parameter
    val e = intercept[Exception](
      FlightSqlEdge.encodeHandle("SELECT 1", Map("bad" -> Seq(1, 2))))
    assert(e.getMessage.contains("unsupported parameter type") &&
      e.getMessage.contains("bad"), e.getMessage)
  }

  test("a RAW Float normalizes through its decimal string at the " +
      "ENCODER — no binary32 widening error") {
    // decodeParamBatch normalizes Float → Double via toString, so in
    // the normal DoPut path no Float reaches encodeHandle; this pins
    // the encoder's own guard so a future caller binding a raw Float
    // cannot revive 3.14f → 3.140000104904175 through the handle.
    val (_, back) = FlightSqlEdge.decodeHandle(
      FlightSqlEdge.encodeHandle("SELECT :f", Map("f" -> 3.14f)))
    assert(back("f") == 3.14d, back("f"))
    val (_, b2) = FlightSqlEdge.decodeHandle(
      FlightSqlEdge.encodeHandle("SELECT :f", Map("f" -> -0.001f)))
    assert(b2("f") == -0.001d, b2("f"))
  }
}
