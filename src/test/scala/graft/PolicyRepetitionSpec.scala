package graft

import graft.plans.RowPolicyRule
import graft.session._
import org.scalatest.funsuite.AnyFunSuite

/** Regression: masking must survive repeated analysis of the same view and
  * must not be eliminated as a no-op projection by the optimizer (the
  * exprId-reuse bug), and predicates above the governed table must see
  * masked data. */
class PolicyRepetitionSpec extends AnyFunSuite {
  private lazy val gspark = {
    val s = SparkTestSession.spark
    Tables(s, SparkTestSession.sf).registerAll()
    s
  }

  test("masking holds across repeated queries and under predicates") {
    val masked = AuthenticatedUser("m",
      rules = Map("region" -> TablePolicy(masking = Map("r_name" -> MaskingRule.Redact))))
    try {
      RowPolicyRule.setUser(masked)
      val r1 = gspark.sql("SELECT r_name FROM region").collect().map(_.getString(0))
      val r2 = gspark.sql("SELECT r_name FROM region").collect().map(_.getString(0))
      val r3 = gspark.sql("SELECT r_name FROM region WHERE r_name LIKE 'A%'").collect()
      assert(r1.forall(_ == "MASKED"), "first query unmasked")
      assert(r2.forall(_ == "MASKED"), "second query unmasked")
      assert(r3.isEmpty, "LIKE over masked column leaked plaintext")
    } finally RowPolicyRule.clear()
  }

  test("no policies → plans untouched") {
    RowPolicyRule.clear()
    val plan = gspark.sql("SELECT r_name FROM region").queryExecution.analyzed
    assert(!plan.toString.contains("__graft_governed"))
  }
}
