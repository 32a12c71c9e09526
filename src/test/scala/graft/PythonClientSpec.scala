package graft

import graft.server.{ApiKeyAuthenticator, ApiServer}
import graft.session._
import java.nio.charset.StandardCharsets
import java.util.concurrent.TimeUnit
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The Python client (`python/graft/`) driven end-to-end against a live
  * ApiServer — the analog of the reference's PyO3 client surface
  * (`python/strake/__init__.pyi`: connect/sql/trace/describe/close). The
  * whole client contract lives in `python/tests/e2e_client.py`: Arrow IPC
  * results, named parameters, plan/schema introspection, GetTables
  * discovery with embedded schemas, sandboxed run_python, and the
  * error-mapping hierarchy. This spec boots the server, hands the script
  * a URL + key, and requires its ALL OK. */
class PythonClientSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private var api: ApiServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    Tables(spark, sf).registerAll()
    val engine = new GraftSession(spark, GraftConfig(defensiveLimit = 100))
    val auth = new ApiKeyAuthenticator(Map(
      "client-key" -> AuthenticatedUser("pyclient", permissions = Set("admin"))))
    api = new ApiServer(engine, auth.apply)
    port = api.start()
  }

  override def afterAll(): Unit = if (api != null) api.stop()

  /** Drain the process output on a thread so the timeout is REAL: a
    * blocking readAllBytes before waitFor could hang the suite forever on
    * a wedged client (and waitFor-then-read can deadlock on a full pipe).
    * On timeout the process is killed and the assert carries the output. */
  private def drainWithTimeout(proc: Process, seconds: Long): String = {
    val buf = new java.io.ByteArrayOutputStream
    val reader = new Thread(() => proc.getInputStream.transferTo(buf))
    reader.setDaemon(true)
    reader.start()
    val finished = proc.waitFor(seconds, TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly().waitFor(10, TimeUnit.SECONDS)
    reader.join(5000)
    val out = buf.toString(StandardCharsets.UTF_8.name)
    assert(finished, s"client timed out after ${seconds}s:\n$out")
    out
  }

  test("python client exercises the full serving surface over HTTP") {
    val repo = new java.io.File(".").getCanonicalFile
    val script = new java.io.File(repo, "python/tests/e2e_client.py")
    assert(script.isFile, s"missing $script")
    val pb = new ProcessBuilder(
      "python3", script.getAbsolutePath, s"http://localhost:$port", "client-key")
    pb.environment().put("PYTHONPATH", new java.io.File(repo, "python").getAbsolutePath)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = drainWithTimeout(proc, 120)
    assert(proc.exitValue == 0, s"client failed:\n$out")
    assert(out.contains("ALL OK"), out)
  }

  test("flight mode: the client speaks Flight SQL to FlightSqlEdge with " +
      "zero-copy Arrow results") {
    val engine = new GraftSession(spark, GraftConfig(defensiveLimit = 100000))
    val auth = new ApiKeyAuthenticator(Map(
      "flight-key" -> AuthenticatedUser("pyflight", permissions = Set("admin"))))
    val edge = new graft.server.FlightSqlEdge(engine, auth.apply)
    val fport = edge.start()
    try {
      val repo = new java.io.File(".").getCanonicalFile
      val script = new java.io.File(repo, "python/tests/e2e_flight.py")
      assert(script.isFile, s"missing $script")
      val pb = new ProcessBuilder(
        "python3", script.getAbsolutePath, s"localhost:$fport", "flight-key")
      pb.environment().put("PYTHONPATH",
        new java.io.File(repo, "python").getAbsolutePath)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val out = drainWithTimeout(proc, 120)
      assert(proc.exitValue == 0, s"flight client failed:\n$out")
      assert(out.contains("FLIGHT OK"), out)
    } finally edge.stop()
  }

  test("embedded mode boots the engine as a child JVM — no pre-started server") {
    val repo = new java.io.File(".").getCanonicalFile
    val dir = java.nio.file.Files.createTempDirectory("graft-embedded-test")
    java.nio.file.Files.writeString(dir.resolve("sources.yaml"),
      s"""sources:
         |  - name: files
         |    type: parquet
         |    tables:
         |      - name: nation
         |        path: $sf/nation.parquet
         |""".stripMargin)
    // engine settings picked up from graft.yaml beside the sources config
    java.nio.file.Files.writeString(dir.resolve("graft.yaml"),
      "defensive_limit: 7\nquery_timeout_seconds: 120\n")
    val script = dir.resolve("embedded_client.py")
    java.nio.file.Files.writeString(script,
      """import sys
        |import graft
        |conn = graft.connect(mode="embedded", config=sys.argv[1])
        |try:
        |    cols, rows, _ = conn.sql_rows(
        |        "SELECT count(*) AS n FROM files_nation")
        |    assert cols == ["n"], cols
        |    assert rows[0][0] == 25, rows
        |    # graft.yaml's defensive_limit: 7 governs unlimited scans
        |    _, limited, warns = conn.sql_rows(
        |        "SELECT n_nationkey FROM files_nation")
        |    assert len(limited) == 7, len(limited)
        |    assert any("LIMIT 7" in str(w) for w in warns), warns
        |    # unauthenticated requests to the child are refused: the
        |    # generated key is real auth, not decoration
        |    probe = graft.GraftConnection(conn._base, api_key="wrong")
        |    try:
        |        probe.sql_rows("SELECT 1")
        |        raise SystemExit("wrong key accepted")
        |    except graft.AuthError:
        |        pass
        |finally:
        |    conn.close()
        |print("EMBEDDED OK")
        |""".stripMargin)
    val pb = new ProcessBuilder("python3", script.toString,
      dir.resolve("sources.yaml").toString)
    pb.environment().put("PYTHONPATH",
      new java.io.File(repo, "python").getAbsolutePath)
    pb.environment().put("GRAFT_HOME", repo.getAbsolutePath)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = drainWithTimeout(proc, 240)
    assert(proc.exitValue == 0, s"embedded client failed:\n$out")
    assert(out.contains("EMBEDDED OK"), out)
  }
}
