package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Cli

/** The GitOps CLI surface: init → validate → apply → diff → apply →
  * history → rollback, plus the structured exit codes
  * (reference: crates/cli/src/main.rs, exit_codes.rs, commands/). */
class CliSpec extends AnyFunSuite {

  private def run(args: String*): (Int, String, String) = {
    val out = new ByteArrayOutputStream(); val err = new ByteArrayOutputStream()
    val code = Cli.run(args.toArray,
      new PrintStream(out, true, "UTF-8"), new PrintStream(err, true, "UTF-8"))
    (code, out.toString("UTF-8"), err.toString("UTF-8"))
  }

  private def tempDir(): Path =
    Files.createTempDirectory("graft-cli-test")

  private def writeConfig(dir: Path, extraTable: Boolean = false,
      dropSource: Boolean = false): Path = {
    val lineitem = "/root/testdata/sf0.001/lineitem.parquet"
    val orders = "/root/testdata/sf0.001/orders.parquet"
    val second =
      if (dropSource) ""
      else s"""|  - name: files2
               |    type: parquet
               |    tables:
               |      - name: orders
               |        path: $orders
               |""".stripMargin
    val extra =
      if (!extraTable) ""
      else s"""|      - name: orders_too
               |        path: $orders
               |""".stripMargin
    val yaml =
      s"""|domain: testdom
          |sources:
          |  - name: files
          |    type: parquet
          |    tables:
          |      - name: lineitem
          |        path: $lineitem
          |        columns:
          |          - {name: l_orderkey, type: int64, not_null: true}
          |$extra$second""".stripMargin
    val p = dir.resolve("sources.yaml")
    Files.writeString(p, yaml)
    p
  }

  test("init scaffolds a project and refuses to overwrite") {
    val dir = tempDir()
    val f = dir.resolve("sources.yaml").toString
    val (code, out, _) = run("init", f)
    assert(code == 0, out)
    assert(Files.exists(dir.resolve("sources.yaml")))
    assert(Files.exists(dir.resolve("graft.yaml")))
    assert(Files.exists(dir.resolve("README.md")))
    val (again, _, err) = run("init", f)
    assert(again == Cli.ConfigError, err)
    // --sources-only skips the scaffolding files
    val dir2 = tempDir()
    val (c2, _, _) = run("init", dir2.resolve("s.yaml").toString, "--sources-only")
    assert(c2 == 0)
    assert(!Files.exists(dir2.resolve("graft.yaml")))
  }

  test("validate: ok config passes, bad type and bad yaml fail with typed codes") {
    val dir = tempDir()
    val f = writeConfig(dir)
    val (ok, out, _) = run("validate", f.toString, "--format", "json")
    assert(ok == 0 && out.contains("\"ok\": true"), out)
    Files.writeString(f, Files.readString(f)
      .replace("type: int64", "type: not_a_type"))
    val (bad, o2, _) = run("validate", f.toString, "--format", "json")
    assert(bad == Cli.ValidationError, o2)
    Files.writeString(f, "sources: : : nonsense[")
    val (worse, _, _) = run("validate", f.toString)
    assert(worse == Cli.ConfigError)
    val (missing, _, _) = run("validate", dir.resolve("nope.yaml").toString)
    assert(missing == Cli.ConfigError)
  }

  test("apply/diff/history/rollback: the full GitOps loop") {
    val dir = tempDir()
    val f = writeConfig(dir)
    // v1
    val (a1, o1, _) = run("apply", f.toString, "--format", "json")
    assert(a1 == 0 && o1.contains("\"version\": 1"), o1)
    // clean diff
    val (d0, od0, _) = run("diff", f.toString, "--format", "json")
    assert(d0 == 0 && od0.contains("\"changes\": []"), od0)
    // add a table -> diff shows it, dry-run persists nothing
    writeConfig(dir, extraTable = true)
    val (d1, od1, _) = run("diff", f.toString, "--format", "json")
    assert(d1 == 0 && od1.contains("tables[orders_too]") &&
      od1.contains("\"change\": \"added\""), od1)
    val (dry, odry, _) = run("apply", f.toString, "--dry-run", "--format", "json")
    assert(dry == 0 && odry.contains("\"dry_run\": true"), odry)
    val (v1, ov1, _) = run("describe", f.toString, "--format", "json")
    assert(v1 == 0 && ov1.contains("\"version\": 1"), ov1)
    // v2
    val (a2, o2, _) = run("apply", f.toString, "--format", "json")
    assert(a2 == 0 && o2.contains("\"version\": 2"), o2)
    // optimistic locking: stale expected version conflicts
    val (c, _, ec) = run("apply", f.toString, "--expected-version", "1")
    assert(c == Cli.ConflictError, ec)
    // history (newest first)
    val (h, oh, _) = run("domain", "history", "testdom",
      "--metadata", dir.resolve(".graft-metadata").toString, "--format", "json")
    assert(h == 0 && oh.indexOf("\"version\": 2") < oh.indexOf("\"version\": 1"), oh)
    // rollback to v1 -> NEW version 3 with v1's content (one table)
    val (r, or, _) = run("domain", "rollback", "testdom", "--to-version", "1",
      "--metadata", dir.resolve(".graft-metadata").toString, "--format", "json")
    assert(r == 0 && or.contains("\"version\": 3"), or)
    val (v3, ov3, _) = run("describe", f.toString, "--format", "json")
    assert(v3 == 0 && ov3.contains("\"version\": 3") &&
      ov3.contains("\"tables\": 2"), ov3) // v1 had lineitem + orders
    // domain list shows the domain at v3
    val (l, ol, _) = run("domain", "list",
      "--metadata", dir.resolve(".graft-metadata").toString, "--format", "json")
    assert(l == 0 && ol.contains("testdom") && ol.contains("\"version\": 3"), ol)
  }

  test("deleting a source requires --force") {
    val dir = tempDir()
    val f = writeConfig(dir)
    assert(run("apply", f.toString)._1 == 0)
    writeConfig(dir, dropSource = true)
    val (noForce, _, err) = run("apply", f.toString)
    assert(noForce == Cli.ConflictError && err.contains("--force"), err)
    val (forced, o, _) = run("apply", f.toString, "--force", "--format", "json")
    assert(forced == 0 && o.contains("\"deleted\": [\"files2\"]"), o)
  }

  test("secret expansion resolves ${VAR} and leaves unknowns verbatim") {
    val expanded = Cli.expandSecrets(
      "url: jdbc:x://h/db?user=${CLI_U}&password=${CLI_MISSING}",
      env = Map("CLI_U" -> "alice").get)
    assert(expanded == "url: jdbc:x://h/db?user=alice&password=${CLI_MISSING}")
  }

  test("test-connection: existing paths pass, missing paths fail with the connection code") {
    val dir = tempDir()
    val f = writeConfig(dir)
    assert(run("test-connection", f.toString)._1 == 0)
    Files.writeString(f, Files.readString(f)
      .replace("/root/testdata/sf0.001/orders.parquet", "/nope/orders.parquet"))
    val (code, out, _) = run("test-connection", f.toString, "--format", "json")
    assert(code == Cli.ConnectionError && out.contains("missing paths"), out)
  }

  test("search lists declared and directory tables; add appends to the yaml") {
    val dir = tempDir()
    val f = writeConfig(dir)
    // point the files source at the testdata directory for discovery
    Files.writeString(f, Files.readString(f).replace("  - name: files\n",
      "  - name: files\n    url: /root/testdata/sf0.001\n"))
    val (s, os, _) = run("search", "files", f.toString, "--format", "json")
    assert(s == 0 && os.contains("\"lineitem\"") && os.contains("\"nation\""), os)
    // introspect is an alias
    assert(run("introspect", "files", f.toString)._1 == 0)
    val (a, _, _) = run("add", "files", "nation", f.toString)
    assert(a == 0)
    val cfg = graft.sources.SourcesConfig.fromYamlString(Files.readString(f))
    assert(cfg.sources.find(_.name == "files").get.tables.exists(_.name == "nation"))
    // the updated yaml still validates, and a duplicate add is refused
    assert(run("validate", f.toString, "--offline")._1 == 0)
    assert(run("add", "files", "nation", f.toString)._1 == Cli.ValidationError)
    // unknown table is refused
    assert(run("add", "files", "no_such", f.toString)._1 == Cli.ValidationError)
  }

  test("search discovers tables from a live JDBC catalog") {
    // an embedded Derby database with two user tables
    val dir = tempDir()
    val dbUrl = s"jdbc:derby:${dir.resolve("discodb")};create=true"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(dbUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE shipments (id INT)")
      st.executeUpdate("CREATE TABLE depots (id INT)")
      st.close()
    } finally conn.close()
    val f = dir.resolve("sources.yaml")
    Files.writeString(f,
      s"""|sources:
          |  - name: warehouse
          |    type: derby
          |    url: jdbc:derby:${dir.resolve("discodb")}
          |""".stripMargin)
    val (code, out, _) = run("search", "warehouse", f.toString, "--format", "json")
    // Derby canonicalizes unquoted identifiers to upper case; discovery
    // preserves the database's own casing (lowercasing would corrupt
    // `add` against case-sensitive engines)
    assert(code == 0 && out.contains("\"SHIPMENTS\"") && out.contains("\"DEPOTS\""), out)
    // system catalogs are excluded
    assert(!out.toLowerCase.contains("systables"), out)
    // unreachable database is a connection error, not a stack trace
    Files.writeString(f, Files.readString(f)
      .replace("discodb", "no_such_db_anywhere"))
    val (bad, _, err) = run("search", "warehouse", f.toString)
    assert(bad == Cli.ConnectionError, err)
  }

  test("usage errors exit 2") {
    assert(run()._1 == Cli.UsageError)
    assert(run("frobnicate")._1 == Cli.UsageError)
    assert(run("domain", "bogus")._1 == Cli.UsageError)
    // non-numeric version flags are usage errors, not raw exceptions
    val dir = tempDir()
    val f = writeConfig(dir)
    val (c, _, err) = run("apply", f.toString, "--expected-version", "next")
    assert(c == Cli.UsageError && err.contains("integer"), err)
    // a value-taking flag without its argument is a usage error, not a
    // silent "true" (e.g. `--metadata --force` once created a Derby store
    // in a directory literally named `true`)
    val (c2, _, err2) = run("validate", f.toString, "--format")
    assert(c2 == Cli.UsageError && err2.contains("--format"), err2)
    val (c3, _, err3) = run("apply", f.toString, "--metadata", "--force")
    assert(c3 == Cli.UsageError && err3.contains("--metadata"), err3)
  }

  test("apply --notify-url posts the webhook; failures never fail the apply") {
    val dir = tempDir()
    val f = writeConfig(dir)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/invalidate", ex => {
      if (ex.getRequestMethod == "POST") hits.incrementAndGet()
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://localhost:${server.getAddress.getPort}/invalidate"
      val (code, outTxt, _) = run("apply", f.toString, "--notify-url", url)
      assert(code == Cli.Success, outTxt)
      assert(hits.get() == 1, s"webhook hit ${hits.get()} times")
      assert(outTxt.contains("notification successful"), outTxt)
      // unreachable notify endpoint: warn, but the apply (already durably
      // persisted) still exits 0 — reference apply.rs:192-211 semantics
      val (code2, outTxt2, _) = run("apply", f.toString,
        "--notify-url", "http://localhost:1/nope")
      assert(code2 == Cli.Success, outTxt2)
      assert(outTxt2.contains("warning: failed to notify"), outTxt2)
    } finally server.stop(0)
  }

  test("apply stores the RAW yaml — expanded secrets never reach the store") {
    val dir = tempDir()
    val f = dir.resolve("sources.yaml")
    val lineitem = "/root/testdata/sf0.001/lineitem.parquet"
    Files.writeString(f,
      s"""|domain: secretdom
          |sources:
          |  - name: files
          |    type: parquet
          |    options:
          |      token: $${CLI_SECRET_TOKEN}
          |    tables:
          |      - name: lineitem
          |        path: $lineitem
          |""".stripMargin)
    assert(run("apply", f.toString)._1 == 0)
    val store = new graft.cli.DerbyMetadataStore(
      dir.resolve(".graft-metadata").toString)
    try {
      store.init()
      val stored = store.getSources("secretdom")
      assert(stored.contains("${CLI_SECRET_TOKEN}"), stored)
      // history hash is env-independent: it hashes the raw file bytes
      val hash = store.getHistory("secretdom", 1).head.configHash
      val fileHash = java.security.MessageDigest.getInstance("SHA-256")
        .digest(Files.readString(f).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(hash == fileHash)
    } finally store.close()
    // a clean diff right after apply, regardless of env expansion
    val (d, od, _) = run("diff", f.toString, "--format", "json")
    assert(d == 0 && od.contains("\"changes\": []"), od)
  }

  test("add targets the top-level source even when a table shares its name") {
    val dir = tempDir()
    val f = dir.resolve("sources.yaml")
    val lineitem = "/root/testdata/sf0.001/lineitem.parquet"
    // source 'alpha' declares a TABLE named 'beta'; source 'beta' follows
    Files.writeString(f,
      s"""|sources:
          |  - name: alpha
          |    type: parquet
          |    tables:
          |      - name: beta
          |        path: $lineitem
          |  - name: beta
          |    type: parquet
          |    url: /root/testdata/sf0.001
          |    tables:
          |      - name: lineitem
          |        path: $lineitem
          |""".stripMargin)
    assert(run("add", "beta", "nation", f.toString)._1 == 0)
    val cfg = graft.sources.SourcesConfig.fromYamlString(Files.readString(f))
    // the table landed under SOURCE beta, and alpha is untouched
    assert(cfg.sources.find(_.name == "beta").get.tables.exists(_.name == "nation"))
    assert(cfg.sources.find(_.name == "alpha").get.tables.map(_.name) == Seq("beta"))
    assert(run("validate", f.toString, "--offline")._1 == 0)
  }
}
