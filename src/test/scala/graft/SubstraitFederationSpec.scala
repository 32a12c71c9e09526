package graft

import graft.plans.FederationRule
import graft.sql.substrait.{SubstraitEngines, SubstraitEngineTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** The router's LIVE Substrait tier: with
  * `spark.graft.federation.substrait.engine` set, a join/aggregate
  * subtree over local parquet collapses to produced Substrait bytes
  * executed by a second engine ([[SubstraitEngines]]) — the analog of
  * the reference running collapsed subplans on embedded DuckDB via
  * `from_substrait` (reference
  * crates/connectors/src/sources/sql/duckdb_federation.rs,
  * crates/sql/src/substrait_producer.rs:529-536). Every case asserts
  * BOTH the plan shape (the [[SubstraitEngineTable]] relation is/isn't
  * present) and value equality against the same query executed locally
  * with the tier off — rows through a second engine must hash the same.
  */
class SubstraitFederationSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val aceroAvailable: Boolean =
    try Process(Seq("python3", "-c", "import pyarrow.substrait"))
      .!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  override def withFixture(test: NoArgTest) = {
    Tables(spark, sf).registerAll()
    super.withFixture(test)
  }

  private def withEngine[T](engine: String)(f: => T): T = {
    spark.conf.set(FederationRule.SubstraitEngineKey, engine)
    try f finally spark.conf.unset(FederationRule.SubstraitEngineKey)
  }

  private def substraitScans(df: DataFrame): Seq[SubstraitEngineTable] =
    df.queryExecution.optimizedPlan.collect {
      // before V2 scan planning the relation is raw; after, it's wrapped
      case r: DataSourceV2Relation if r.table.isInstanceOf[SubstraitEngineTable] =>
        r.table.asInstanceOf[SubstraitEngineTable]
      case r: DataSourceV2ScanRelation
          if r.relation.table.isInstanceOf[SubstraitEngineTable] =>
        r.relation.table.asInstanceOf[SubstraitEngineTable]
    }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "NULL"
      case x: java.lang.Number => BigDecimal(x.doubleValue)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toString
      case x => x.toString
    }.mkString("\t")).sorted

  private val joinAgg =
    """SELECT n.n_name, count(*) AS cnt
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_acctbal > 0
      |GROUP BY n.n_name""".stripMargin

  test("acero tier: a parquet join+aggregate executes through Substrait " +
      "and matches local execution") {
    assume(aceroAvailable, "python3/pyarrow.substrait not available")
    val local = rows(spark.sql(joinAgg))
    assert(local.nonEmpty)
    withEngine("acero") {
      val df = spark.sql(joinAgg)
      val scans = substraitScans(df)
      assert(scans.size == 1,
        s"expected ONE substrait relation, plan:\n${df.queryExecution.optimizedPlan}")
      assert(rows(df) == local, "second-engine rows diverge from Spark")
    }
  }

  test("acero tier: a single-scan grouped aggregate ships; a bare scan " +
      "never does") {
    assume(aceroAvailable, "python3/pyarrow.substrait not available")
    val aggSql =
      "SELECT c_mktsegment, sum(c_acctbal) AS total FROM customer GROUP BY 1"
    val localOff = rows(spark.sql(aggSql))
    withEngine("acero") {
      val agg = spark.sql(aggSql)
      assert(substraitScans(agg).size == 1, agg.queryExecution.optimizedPlan)
      assert(rows(agg) == localOff)

      val bare = spark.sql("SELECT c_name FROM customer WHERE c_custkey < 10")
      assert(substraitScans(bare).isEmpty,
        "a bare scan must stay on Spark (column pruning + parallel reads)")
    }
  }

  test("unsupported shapes fall back to local execution untouched") {
    assume(aceroAvailable, "python3/pyarrow.substrait not available")
    withEngine("acero") {
      // window functions are outside the producer's surface
      val df = spark.sql(
        """SELECT c_custkey,
          |       rank() OVER (ORDER BY c_acctbal DESC) AS r
          |FROM customer""".stripMargin)
      assert(substraitScans(df).isEmpty)
      assert(df.count() > 0)
    }
  }

  test("duckdb tier: executes when the extension probe passes, falls " +
      "back honestly when it does not") {
    val local = rows(spark.sql(joinAgg))
    withEngine("duckdb") {
      val df = spark.sql(joinAgg)
      SubstraitEngines.duckdbStatus match {
        case Right(()) =>
          assert(substraitScans(df).size == 1, df.queryExecution.optimizedPlan)
          assert(rows(df) == local)
        case Left(_) => // egress-blocked: the tier must refuse, not break
          assert(substraitScans(df).isEmpty,
            "an unavailable engine must leave the plan local")
          assert(rows(df) == local)
      }
    }
  }

  test("the tier is off by default: no conf, no substrait relations") {
    val df = spark.sql(joinAgg)
    assert(substraitScans(df).isEmpty)
  }
}
