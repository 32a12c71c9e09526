package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.server.McpServer
import org.scalatest.funsuite.AnyFunSuite

/** MCP protocol framing over the agent tools: a full JSON-RPC session —
  * initialize handshake, tools/list declarations, tools/call for all
  * three tools, notification silence, and protocol-level errors. */
class McpServerSpec extends AnyFunSuite {
  import SparkTestSession._

  private val mapper = new ObjectMapper()
  private lazy val srv = {
    Tables(spark, sf).registerAll()
    new McpServer(spark)
  }

  private def call(json: String) = srv.handleLine(json)

  test("initialize handshake negotiates version and declares tool capability") {
    val resp = call("""{"jsonrpc":"2.0","id":1,"method":"initialize",
      |"params":{"protocolVersion":"2024-11-05","capabilities":{}}}""".stripMargin
      .replace("\n", "")).get
    assert(resp.get("id").asInt() == 1)
    val r = resp.get("result")
    assert(r.get("protocolVersion").asText() == "2024-11-05")
    assert(r.get("capabilities").has("tools"))
    assert(r.get("serverInfo").get("name").asText() == "graft")
  }

  test("notifications produce no response; ping produces an empty result") {
    assert(call("""{"jsonrpc":"2.0","method":"notifications/initialized"}""").isEmpty)
    val pong = call("""{"jsonrpc":"2.0","id":2,"method":"ping"}""").get
    assert(pong.get("result").isObject && pong.get("result").isEmpty)
  }

  test("tools/list declares the three reference tools with schemas") {
    val resp = call("""{"jsonrpc":"2.0","id":3,"method":"tools/list"}""").get
    val tools = resp.get("result").get("tools")
    val names = (0 until tools.size()).map(tools.get(_).get("name").asText())
    assert(names == Seq("search_schemas", "get_schema_details", "run_python"))
    val search = tools.get(0)
    assert(search.get("inputSchema").get("required").get(0).asText() == "query")
    assert(search.get("inputSchema").get("properties").has("limit"))
  }

  test("tools/call search_schemas returns ranked hits as text content") {
    val resp = call("""{"jsonrpc":"2.0","id":4,"method":"tools/call",
      |"params":{"name":"search_schemas","arguments":{"query":"vendor"}}}"""
      .stripMargin.replace("\n", "")).get
    val result = resp.get("result")
    assert(!result.get("isError").asBoolean())
    val hits = mapper.readTree(result.get("content").get(0).get("text").asText())
    val tables = (0 until hits.size()).map(hits.get(_).get("table").asText())
    assert(tables.contains("supplier"), tables)
  }

  test("tools/call get_schema_details returns column metadata") {
    val resp = call("""{"jsonrpc":"2.0","id":5,"method":"tools/call",
      |"params":{"name":"get_schema_details","arguments":{"fqn":"nation"}}}"""
      .stripMargin.replace("\n", "")).get
    val result = resp.get("result")
    assert(!result.get("isError").asBoolean())
    val cols = mapper.readTree(result.get("content").get(0).get("text").asText())
    val names = (0 until cols.size()).map(cols.get(_).get("column_name").asText())
    assert(names.contains("n_name") && names.contains("n_nationkey"), names)
  }

  test("tools/call run_python executes in the sandbox and returns stdout") {
    val resp = call("""{"jsonrpc":"2.0","id":6,"method":"tools/call",
      |"params":{"name":"run_python","arguments":{"script":"print(6*7)"}}}"""
      .stripMargin.replace("\n", "")).get
    val result = resp.get("result")
    assert(!result.get("isError").asBoolean(), result.toString)
    assert(result.get("content").get(0).get("text").asText().trim == "42")
  }

  test("tool failures are isError results, protocol failures are RPC errors") {
    // unknown tool -> isError result (MCP convention)
    val bad = call("""{"jsonrpc":"2.0","id":7,"method":"tools/call",
      |"params":{"name":"nope","arguments":{}}}""".stripMargin.replace("\n", "")).get
    assert(bad.get("result").get("isError").asBoolean())
    // bad table -> isError result with the message
    val badFqn = call("""{"jsonrpc":"2.0","id":8,"method":"tools/call",
      |"params":{"name":"get_schema_details","arguments":{"fqn":"no_such"}}}"""
      .stripMargin.replace("\n", "")).get
    assert(badFqn.get("result").get("isError").asBoolean())
    // unknown method -> -32601
    val nf = call("""{"jsonrpc":"2.0","id":9,"method":"resources/list"}""").get
    assert(nf.get("error").get("code").asInt() == -32601)
    // parse failure -> -32700
    val pe = call("{not json").get
    assert(pe.get("error").get("code").asInt() == -32700)
  }

  test("probed remote-catalog comments surface over the live MCP edge") {
    // a JDBC source with an opaque column name whose meaning lives only in
    // the remote catalog: Derby holds both the data table and a comments
    // catalog; the enricher fetches descriptions over a LIVE connection
    val dir = java.nio.file.Files.createTempDirectory("graft-mcp-enrich")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE fin_accounts (acct_id INT, c77_v DOUBLE)")
    st.execute("INSERT INTO fin_accounts VALUES (1, 10.5)")
    st.execute("""CREATE TABLE catalog_comments
      (table_name VARCHAR(64), column_name VARCHAR(64), description VARCHAR(256))""")
    st.execute("""INSERT INTO catalog_comments VALUES
      ('fin_accounts', 'c77_v', 'likelihood the customer will churn next quarter')""")
    st.close(); conn.close()
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", "fin_accounts").load()
      .createOrReplaceTempView("fin_accounts")
    // the probe is a real SQL fetch over the live JDBC connection — the
    // catalog query is custom because embedded Derby has no REMARKS/COMMENT
    // support, but connection, statement, and result-set plumbing are real
    val probe: graft.server.InformationSchemaEnricher.Probe = c => {
      val s = c.createStatement()
      try {
        val rs = s.executeQuery(
          "SELECT table_name, column_name, description FROM catalog_comments")
        val b = Map.newBuilder[(String, Option[String]), String]
        while (rs.next()) b += ((rs.getString(1), Option(rs.getString(2))) ->
          rs.getString(3))
        graft.server.InformationSchemaEnricher.Descriptions(b.result(), 2)
      } finally s.close()
    }
    val enricher = new graft.server.InformationSchemaEnricher(
      _ => java.sql.DriverManager.getConnection(url), _ => Some("derby"),
      probeOverride = Some(Seq(probe)))
    val esrv = new McpServer(spark, enricher = enricher,
      enricherSource = "findb")
    // search by MEANING over the MCP edge: "churn" matches nothing in
    // the opaque name c77_v (no token, synonym, or trigram affinity) —
    // only the probed comment can rank it
    val resp = esrv.handleLine("""{"jsonrpc":"2.0","id":41,"method":"tools/call",
      |"params":{"name":"search_schemas","arguments":{"query":"customer churn"}}}"""
      .stripMargin.replace("\n", "")).get
    val hits = mapper.readTree(
      resp.get("result").get("content").get(0).get("text").asText())
    val cols = (0 until hits.size()).map(h => (hits.get(h).get("table").asText(),
      Option(hits.get(h).get("column")).map(_.asText())))
    assert(cols.exists(c => c._1.equalsIgnoreCase("fin_accounts") &&
      c._2.exists(_.equalsIgnoreCase("c77_v"))), cols)
    // and get_schema_details carries the probed description too
    val det = esrv.handleLine("""{"jsonrpc":"2.0","id":42,"method":"tools/call",
      |"params":{"name":"get_schema_details","arguments":{"fqn":"fin_accounts"}}}"""
      .stripMargin.replace("\n", "")).get
    val fields = mapper.readTree(
      det.get("result").get("content").get(0).get("text").asText())
    val descs = (0 until fields.size()).map(f =>
      Option(fields.get(f).get("column_description")).map(_.asText()).getOrElse(""))
    assert(descs.exists(_.contains("churn next quarter")), descs)
  }

  test("full session over the stream transport") {
    val in = new java.io.ByteArrayInputStream(
      ("""{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""" + "\n" +
        """{"jsonrpc":"2.0","method":"notifications/initialized"}""" + "\n" +
        """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""" + "\n")
        .getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    srv.serve(in, out)
    val lines = out.toString("UTF-8").split("\n").filter(_.nonEmpty)
    assert(lines.length == 2) // notification unanswered
    assert(mapper.readTree(lines(0)).get("id").asInt() == 1)
    assert(mapper.readTree(lines(1)).get("result").has("tools"))
  }
}
