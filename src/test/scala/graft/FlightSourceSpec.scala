package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.Channels
import scala.jdk.CollectionConverters._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.sparkproject.spark_core.protobuf.{Any => PAny, ByteString, DynamicMessage}
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowStreamWriter, WriteChannel}
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}

import graft.sources.flight.FlightProto

/** Arrow Flight SQL client end-to-end over the hand-built h2c carrier:
  * GetFlightInfo(CommandStatementQuery) → ticket + IPC schema, then a
  * server-STREAMING DoGet whose FlightData messages (real Arrow IPC
  * header/body splits, two record batches) reassemble and decode. The
  * server is an independent RFC-7540 peer (Http2TestServer) serving
  * genuine Flight protobufs — not an echo stub. */
class FlightSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  private val alloc = new RootAllocator(Long.MaxValue)
  private var server: Http2TestServer = _
  private var url: String = _
  @volatile private var lastQuery: String = _

  private val arrowSchema = new Schema(Seq(
    new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
    new Field("name", FieldType.nullable(ArrowType.Utf8.INSTANCE), null),
    new Field("score", FieldType.nullable(
      new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)).asJava)

  /** The dataset as a two-batch Arrow IPC stream (multi-batch proves the
    * multi-message DoGet path). */
  private def ipcStream(): Array[Byte] = {
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val out = new ByteArrayOutputStream()
    val w = new ArrowStreamWriter(root, null, Channels.newChannel(out))
    w.start()
    def batch(rows: Seq[(Long, String, Double)]): Unit = {
      root.allocateNew()
      val id = root.getVector("id").asInstanceOf[BigIntVector]
      val nm = root.getVector("name").asInstanceOf[VarCharVector]
      val sc = root.getVector("score").asInstanceOf[Float8Vector]
      rows.zipWithIndex.foreach { case ((i, n, s), r) =>
        id.setSafe(r, i); nm.setSafe(r, n.getBytes("UTF-8")); sc.setSafe(r, s)
      }
      root.setRowCount(rows.size)
      w.writeBatch()
    }
    batch(Seq((1L, "ann", 7.5), (2L, "bob", 3.0)))
    batch(Seq((3L, "cyd", 9.25)))
    w.end(); root.close()
    out.toByteArray
  }

  /** Split a complete IPC stream into its encapsulated messages —
    * the production splitter the Flight edge serves with. */
  private def splitIpc(stream: Array[Byte]): Seq[(Array[Byte], Array[Byte])] =
    graft.server.FlightIpc.split(stream)

  private def schemaBytes(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    MessageSerializer.serialize(
      new WriteChannel(Channels.newChannel(out)), arrowSchema)
    out.toByteArray
  }

  override def beforeAll(): Unit = {
    import FlightProto._
    server = new Http2TestServer((path, payload) => path match {
      case "/arrow.flight.protocol.FlightService/GetFlightInfo" =>
        val desc = DynamicMessage.parseFrom(FlightDescriptorD, payload)
        val anyBytes = desc.getField(
          FlightDescriptorD.findFieldByName("cmd"))
          .asInstanceOf[ByteString].toByteArray
        val any = PAny.parseFrom(anyBytes)
        assert(any.getTypeUrl.endsWith("CommandStatementQuery"), any.getTypeUrl)
        val cmd = DynamicMessage.parseFrom(
          CommandStatementQueryD, any.getValue.toByteArray)
        lastQuery = cmd.getField(
          CommandStatementQueryD.findFieldByName("query")).asInstanceOf[String]
        val ticket = DynamicMessage.newBuilder(TicketD)
          .setField(TicketD.findFieldByName("ticket"),
            ByteString.copyFromUtf8(lastQuery)).build()
        val ep = DynamicMessage.newBuilder(
          msg("arrow.flight.protocol.FlightEndpoint"))
        ep.setField(ep.getDescriptorForType.findFieldByName("ticket"), ticket)
        val info = DynamicMessage.newBuilder(FlightInfoD)
          .setField(FlightInfoD.findFieldByName("schema"),
            ByteString.copyFrom(schemaBytes()))
          .addRepeatedField(FlightInfoD.findFieldByName("endpoint"), ep.build())
          .setField(FlightInfoD.findFieldByName("total_records"),
            java.lang.Long.valueOf(3L))
          .build()
        Seq(info.toByteArray)
      case "/arrow.flight.protocol.FlightService/DoGet" =>
        val t = DynamicMessage.parseFrom(TicketD, payload)
        assert(t.getField(TicketD.findFieldByName("ticket"))
          .asInstanceOf[ByteString].toStringUtf8 == lastQuery)
        splitIpc(ipcStream()).map { case (meta, body) =>
          DynamicMessage.newBuilder(FlightDataD)
            .setField(FlightDataD.findFieldByName("data_header"),
              ByteString.copyFrom(meta))
            .setField(FlightDataD.findFieldByName("data_body"),
              ByteString.copyFrom(body))
            .build().toByteArray
        }
      case other => fail(s"unexpected flight path $other")
    })
    url = s"http://127.0.0.1:${server.start()}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    alloc.close()
  }

  private def read(q: String) =
    spark.read.format("graft.sources.flight.FlightDataSource")
      .option("url", url).option("query", q).load()

  test("schema comes from FlightInfo's IPC schema message") {
    import org.apache.spark.sql.types._
    val s = read("SELECT * FROM users").schema
    assert(s == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType))))
  }

  test("DoGet streams two record batches through FlightData reassembly") {
    val rows = read("SELECT * FROM users").orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq == Seq("ann", "bob", "cyd"))
    assert(rows(2).getDouble(2) == 9.25)
    assert(lastQuery == "SELECT * FROM users")
  }

  test("column pruning reaches the decode: a projected read still works") {
    val rows = read("SELECT * FROM users").select("name").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("ann", "bob", "cyd"))
  }

  test("flight registers through SourceRegistry like any source") {
    import graft.sources.{SourceDef, SourceRegistry, TableDef}
    new SourceRegistry(spark).registerSource(
      SourceDef(name = "remote", sourceType = "flight", url = Some(url),
        tables = Seq(TableDef(name = "users"))),
      new graft.session.WarningCollector)
    // default query = whole-table SELECT on the sanitized table name,
    // backtick-quoted (the remote peer speaks Spark SQL)
    assert(lastQuery == "SELECT * FROM `users`")
    val rows = spark.table("remote_users").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }
}
