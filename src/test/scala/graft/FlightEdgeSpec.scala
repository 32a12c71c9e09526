package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.server.{ApiKeyAuthenticator, FlightSqlEdge}
import graft.session._

/** Flight SQL server edge end to end: our own Flight client (which
  * speaks the real wire protocol over h2c) queries the engine session
  * through GetFlightInfo/DoGet — engine-to-engine Flight federation
  * with RLS, auth, and the session's governance in force. */
class FlightEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private var engine: GraftSession = _
  private var edge: FlightSqlEdge = _
  private var url: String = _

  override def beforeAll(): Unit = {
    Tables(spark, sf).registerAll()
    engine = new GraftSession(spark, GraftConfig(defensiveLimit = 1000))
    val auth = new ApiKeyAuthenticator(Map(
      "admin-key" -> AuthenticatedUser("admin", permissions = Set("admin")),
      "analyst-key" -> AuthenticatedUser("analyst",
        permissions = Set("query:*"),
        rules = Map(
          "orders" -> TablePolicy(rlsFilter = Some("o_custkey < 10"))))))
    edge = new FlightSqlEdge(engine, auth.apply)
    url = s"http://127.0.0.1:${edge.start()}"
  }

  override def afterAll(): Unit = if (edge != null) edge.stop()

  private def read(q: String, key: String = "admin-key") =
    spark.read.format("graft.sources.flight.FlightDataSource")
      .option("url", url).option("query", q).option("authToken", key)
      .load()

  test("a flight client runs SQL against the engine session") {
    val rows = read("SELECT n_regionkey, count(*) AS n FROM nation " +
      "GROUP BY n_regionkey ORDER BY n_regionkey").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).sum == 25L)
  }

  test("schema planning happens at GetFlightInfo, rows stream via DoGet") {
    import org.apache.spark.sql.types._
    val df = read("SELECT n_name, n_nationkey FROM nation")
    assert(df.schema.fieldNames.toSeq == Seq("n_name", "n_nationkey"))
    assert(df.schema("n_nationkey").dataType == IntegerType)
    assert(df.count() == 25)
  }

  test("RLS rules ride the wire: analyst sees only permitted orders") {
    val analyst = read("SELECT count(*) AS n FROM orders", "analyst-key")
      .collect()(0).getLong(0)
    val admin = read("SELECT count(*) AS n FROM orders")
      .collect()(0).getLong(0)
    val expected = Tables(spark, sf).orders
      .filter("o_custkey < 10").count()
    assert(analyst == expected, s"analyst=$analyst expected=$expected")
    assert(admin > analyst)
  }

  test("GetFlightInfo is plan-only: zero jobs, no executeQuery") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val logBefore = engine.queryLog.size
      // .schema resolves via GetFlightInfo alone (no DoGet, no collect)
      val schema = read(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = 7").schema
      assert(schema.fieldNames.toSeq == Seq("o_orderkey", "o_totalprice"))
      assert(engine.queryLog.size == logBefore,
        "GetFlightInfo must plan, not executeQuery (double-execution per fetch)")
      // barrier job (raw RDD — exactly one job, no AQE sub-jobs): the
      // listener bus is ordered, so once this job's start event lands,
      // any job GetFlightInfo ran would already be counted
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.currentTimeMillis() + 10000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(jobs.get() == 1,
        s"GetFlightInfo ran ${jobs.get() - 1} Spark job(s); must be plan-only")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("a bad api key is UNAUTHENTICATED (grpc-status 16), not a hang") {
    val e = intercept[Exception] { read("SELECT 1", "wrong-key").collect() }
    def chain(x: Throwable): Seq[String] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).toSeq
    assert(chain(e).exists(_.contains("grpc-status 16")),
      chain(e).mkString(" | "))
  }
}
