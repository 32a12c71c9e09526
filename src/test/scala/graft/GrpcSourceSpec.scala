package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.sparkproject.spark_core.protobuf.{DescriptorProtos, Descriptors, DynamicMessage}

import graft.sources.grpc.{GrpcFraming, ProtoSchema}

/** gRPC-shape source: descriptor-set dynamic decoding end-to-end against
  * a local endpoint speaking gRPC's LENGTH_PREFIXED_MESSAGE framing.
  * The descriptor set is built programmatically (no protoc offline) —
  * byte-identical to `protoc --descriptor_set_out` output for the same
  * .proto. Covers scalar, nested-message, repeated, and enum fields,
  * request-body mapping, rowsField explosion, and column pruning. */
class GrpcSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestSession._

  // descriptor set for:
  //   package demo;
  //   enum Tier { FREE = 0; PRO = 1; }
  //   message Address { string city = 1; int32 zip = 2; }
  //   message User { int64 id = 1; string name = 2; double score = 3;
  //                  bool active = 4; repeated string tags = 5;
  //                  Address addr = 6; Tier tier = 7; }
  //   message UserQuery { string query = 1; int64 limit = 2; }
  //   message UserResponse { repeated User users = 1; int64 total = 2; }
  //   service DataService { rpc GetUsers(UserQuery) returns (UserResponse); }
  private def buildDescriptorSet(): DescriptorProtos.FileDescriptorSet = {
    import DescriptorProtos._
    import FieldDescriptorProto.{Label, Type}
    def field(name: String, num: Int, t: Type, label: Label = Label.LABEL_OPTIONAL,
        typeName: String = null): FieldDescriptorProto = {
      val b = FieldDescriptorProto.newBuilder()
        .setName(name).setNumber(num).setType(t).setLabel(label)
      if (typeName != null) b.setTypeName(typeName)
      b.build()
    }
    val tier = EnumDescriptorProto.newBuilder().setName("Tier")
      .addValue(EnumValueDescriptorProto.newBuilder().setName("FREE").setNumber(0))
      .addValue(EnumValueDescriptorProto.newBuilder().setName("PRO").setNumber(1))
      .build()
    val address = DescriptorProto.newBuilder().setName("Address")
      .addField(field("city", 1, Type.TYPE_STRING))
      .addField(field("zip", 2, Type.TYPE_INT32))
      .build()
    val user = DescriptorProto.newBuilder().setName("User")
      .addField(field("id", 1, Type.TYPE_INT64))
      .addField(field("name", 2, Type.TYPE_STRING))
      .addField(field("score", 3, Type.TYPE_DOUBLE))
      .addField(field("active", 4, Type.TYPE_BOOL))
      .addField(field("tags", 5, Type.TYPE_STRING, Label.LABEL_REPEATED))
      .addField(field("addr", 6, Type.TYPE_MESSAGE, typeName = ".demo.Address"))
      .addField(field("tier", 7, Type.TYPE_ENUM, typeName = ".demo.Tier"))
      .build()
    val userQuery = DescriptorProto.newBuilder().setName("UserQuery")
      .addField(field("query", 1, Type.TYPE_STRING))
      .addField(field("limit", 2, Type.TYPE_INT64))
      .build()
    val userResponse = DescriptorProto.newBuilder().setName("UserResponse")
      .addField(field("users", 1, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".demo.User"))
      .addField(field("total", 2, Type.TYPE_INT64))
      .build()
    val service = ServiceDescriptorProto.newBuilder().setName("DataService")
      .addMethod(MethodDescriptorProto.newBuilder().setName("GetUsers")
        .setInputType(".demo.UserQuery").setOutputType(".demo.UserResponse"))
      .build()
    val file = FileDescriptorProto.newBuilder()
      .setName("demo.proto").setPackage("demo").setSyntax("proto3")
      .addEnumType(tier).addMessageType(address).addMessageType(user)
      .addMessageType(userQuery).addMessageType(userResponse)
      .addService(service)
      .build()
    FileDescriptorSet.newBuilder().addFile(file).build()
  }

  private var server: HttpServer = _
  private var url: String = _
  private var descPath: String = _
  @volatile private var lastRequest: DynamicMessage = _

  private lazy val files = ProtoSchema.linkFiles(buildDescriptorSet())
  private def msgDesc(n: String): Descriptors.Descriptor =
    files.head.findMessageTypeByName(n)

  private def makeUser(id: Long, name: String, score: Double, active: Boolean,
      tags: Seq[String], city: String, zip: Int, tier: String): DynamicMessage = {
    val ud = msgDesc("User"); val ad = msgDesc("Address")
    val b = DynamicMessage.newBuilder(ud)
      .setField(ud.findFieldByName("id"), java.lang.Long.valueOf(id))
      .setField(ud.findFieldByName("name"), name)
      .setField(ud.findFieldByName("score"), java.lang.Double.valueOf(score))
      .setField(ud.findFieldByName("active"), java.lang.Boolean.valueOf(active))
      .setField(ud.findFieldByName("tier"),
        files.head.findEnumTypeByName("Tier").findValueByName(tier))
    tags.foreach(t => b.addRepeatedField(ud.findFieldByName("tags"), t))
    if (city != null) {
      val addr = DynamicMessage.newBuilder(ad)
        .setField(ad.findFieldByName("city"), city)
        .setField(ad.findFieldByName("zip"), java.lang.Integer.valueOf(zip))
        .build()
      b.setField(ud.findFieldByName("addr"), addr)
    }
    b.build()
  }

  override def beforeAll(): Unit = {
    descPath = Files.createTempFile("graft-grpc", ".pb").toString
    Files.write(java.nio.file.Paths.get(descPath), buildDescriptorSet().toByteArray)

    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/demo.DataService/GetUsers", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val reqPayload = GrpcFraming.unframe(ex.getRequestBody)
        lastRequest = DynamicMessage.parseFrom(msgDesc("UserQuery"), reqPayload)
        val limit = lastRequest.getField(
          msgDesc("UserQuery").findFieldByName("limit")).asInstanceOf[Long]
        val rd = msgDesc("UserResponse")
        val all = Seq(
          makeUser(1, "ann", 7.5, active = true, Seq("a", "b"), "oslo", 1001, "PRO"),
          makeUser(2, "bob", 3.0, active = false, Seq(), "bern", 2002, "FREE"),
          makeUser(3, "cyd", 9.25, active = true, Seq("c"), null, 0, "PRO"))
        val take = if (limit > 0) all.take(limit.toInt) else all
        val resp = {
          val b = DynamicMessage.newBuilder(rd)
          take.foreach(u => b.addRepeatedField(rd.findFieldByName("users"), u))
          b.setField(rd.findFieldByName("total"),
            java.lang.Long.valueOf(all.size.toLong)).build()
        }
        val out = GrpcFraming.frame(resp.toByteArray)
        ex.getResponseHeaders.add("Content-Type", "application/grpc+proto")
        ex.sendResponseHeaders(200, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      }
    })
    server.start()
    url = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def read(extra: (String, String)*) =
    extra.foldLeft(spark.read.format("graft.sources.grpc.GrpcDataSource")
        .option("url", url)
        .option("service", "demo.DataService")
        .option("method", "GetUsers")
        .option("descriptorSet", descPath)
        .option("rowsField", "users"))((r, kv) => r.option(kv._1, kv._2))
      .load()

  test("schema derives from the descriptor: scalars, repeated, nested, enum") {
    val s = read().schema
    assert(s.fieldNames.toSeq ==
      Seq("id", "name", "score", "active", "tags", "addr", "tier"))
    import org.apache.spark.sql.types._
    assert(s("id").dataType == LongType)
    assert(s("score").dataType == DoubleType)
    assert(s("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(s("addr").dataType == StructType(Seq(
      StructField("city", StringType, nullable = false),
      StructField("zip", IntegerType, nullable = false))))
    assert(s("tier").dataType == StringType)
  }

  test("rows decode with nested struct, repeated, enum-name, absent message -> null") {
    val rows = read().orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "ann")
    assert(rows(0).getDouble(2) == 7.5 && rows(0).getBoolean(3))
    assert(rows(0).getSeq[String](4) == Seq("a", "b"))
    assert(rows(0).getStruct(5).getString(0) == "oslo")
    assert(rows(0).getStruct(5).getInt(1) == 1001)
    assert(rows(0).getString(6) == "PRO")
    assert(rows(1).getSeq[String](4).isEmpty)
    // absent submessage decodes as null, not a default struct
    assert(rows(2).isNullAt(5))
  }

  test("h2c transport: the real gRPC wire protocol end to end") {
    // same dynamic-proto pipeline, carried over hand-built HTTP/2: the
    // client under test speaks preface/SETTINGS/HPACK/DATA/trailers
    // against an independent RFC-7540 peer (Http2TestServer decodes the
    // client's HPACK with the full-table decoder, not an echo stub)
    val rd = msgDesc("UserResponse")
    val h2 = new Http2TestServer((path, reqPayload) => {
      assert(path == "/demo.DataService/GetUsers", path)
      val q = DynamicMessage.parseFrom(msgDesc("UserQuery"), reqPayload)
      val limit = q.getField(
        msgDesc("UserQuery").findFieldByName("limit")).asInstanceOf[Long]
      val all = Seq(
        makeUser(1, "ann", 7.5, active = true, Seq("a", "b"), "oslo", 1001, "PRO"),
        makeUser(2, "bob", 3.0, active = false, Seq(), "bern", 2002, "FREE"))
      val take = if (limit > 0) all.take(limit.toInt) else all
      val b = DynamicMessage.newBuilder(rd)
      take.foreach(u => b.addRepeatedField(rd.findFieldByName("users"), u))
      Seq(b.setField(rd.findFieldByName("total"),
        java.lang.Long.valueOf(all.size.toLong)).build().toByteArray)
    })
    val port = h2.start()
    try {
      val rows = spark.read.format("graft.sources.grpc.GrpcDataSource")
        .option("url", s"http://127.0.0.1:$port")
        .option("service", "demo.DataService")
        .option("method", "GetUsers")
        .option("descriptorSet", descPath)
        .option("rowsField", "users")
        .option("transport", "h2c")
        .load().orderBy("id").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "ann")
      assert(rows(0).getStruct(5).getString(0) == "oslo")
      assert(rows(1).getString(6) == "FREE")
    } finally h2.stop()
  }

  test("h2c client surfaces a non-zero grpc-status as an error") {
    // a trailers-borne failure must not be silently decoded as 0 rows
    val h2 = new Http2TestServer((_, _) => Seq(Array.emptyByteArray))
    // wrap: respond with grpc-status 13 by a server variant — simplest is
    // a raw socket peer that sends only error trailers
    val server = new java.net.ServerSocket(0, 4,
      java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val s = server.accept()
      try {
        import graft.sources.grpc.{Hpack, Http2Frames}
        import Http2Frames._
        val in = new java.io.DataInputStream(s.getInputStream)
        val out = s.getOutputStream
        in.readFully(new Array[Byte](Preface.length))
        write(out, Settings, 0, 0, Array.emptyByteArray)
        // drain client frames until END_STREAM, then send a
        // trailers-only response (the gRPC error shape)
        var open = true
        while (open) {
          val f = Http2Frames.read(in)
          if ((f.flags & FlagEndStream) != 0 && f.streamId == 1) open = false
          else if (f.tpe == Settings && (f.flags & FlagAck) == 0)
            write(out, Settings, FlagAck, 0, Array.emptyByteArray)
        }
        // Huffman-coded trailers, like a real gRPC server would send
        write(out, Headers, FlagEndHeaders | FlagEndStream, 1,
          Hpack.encode(Seq(":status" -> "200",
            "grpc-status" -> "13", "grpc-message" -> "boom"), huffman = true))
      } finally s.close()
    })
    t.setDaemon(true); t.start()
    try {
      val e = intercept[Exception] {
        spark.read.format("graft.sources.grpc.GrpcDataSource")
          .option("url", s"http://127.0.0.1:${server.getLocalPort}")
          .option("service", "demo.DataService")
          .option("method", "GetUsers")
          .option("descriptorSet", descPath)
          .option("transport", "h2c")
          .load().collect()
      }
      def chain(x: Throwable): Seq[String] =
        Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).filter(_ != null).toSeq
      assert(chain(e).exists(m => m.contains("grpc-status 13")),
        chain(e).mkString(" | "))
    } finally { h2.stop(); server.close() }
  }

  test("hpack decoder: indexed static, incremental indexing, dynamic refs") {
    import graft.sources.grpc.Hpack
    val d = new Hpack.Decoder
    // 0x82 = indexed static 2 (:method GET); 0x41 = literal with
    // incremental indexing, name = static 1 (:authority), value literal;
    // 0xbe = indexed 62 = first dynamic entry (the one just added)
    val block = Array[Byte](0x82.toByte, 0x41.toByte, 0x0b.toByte) ++
      "example.com".getBytes("US-ASCII") ++ Array(0xbe.toByte)
    val hs = d.decode(block)
    assert(hs == Seq(":method" -> "GET", ":authority" -> "example.com",
      ":authority" -> "example.com"))
    // prefix-int continuation: value 1337 in a 5-bit prefix field
    // (dynamic table size update: 0x3f then varint) must not throw
    val big = Hpack.encode(Seq("x-a" -> ("y" * 200))) // 200 > 127 length
    assert((new Hpack.Decoder).decode(big) == Seq("x-a" -> ("y" * 200)))
  }

  test("hpack: a lying string length fails cleanly, never out-of-bounds") {
    import graft.sources.grpc.Hpack
    // literal header, name length claims 100 bytes but only 3 follow —
    // a truncated/hostile block must surface as the codec's IOException
    val lying = Array[Byte](0x40.toByte, 100.toByte, 'a', 'b', 'c')
    val e = intercept[java.io.IOException] {
      (new Hpack.Decoder).decode(lying)
    }
    assert(e.getMessage.contains("exceeds header block"), e.getMessage)
  }

  test("hpack huffman: RFC 7541 Appendix C vectors, round-trip, " +
      "bad-padding rejection") {
    import graft.sources.grpc.Hpack.Huffman
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    def enc(s: String): Array[Byte] = Huffman.encode(s.getBytes("UTF-8"))
    def dec(b: Array[Byte]): String =
      new String(Huffman.decode(b, 0, b.length), "UTF-8")
    // C.4.1-C.4.3 (request examples) and C.6.1/C.6.3 (response examples):
    // known ciphertexts pin the entire code table, not just round-trips
    val vectors = Seq(
      "www.example.com" -> "f1e3 c2e5 f23a 6ba0 ab90 f4ff",
      "no-cache" -> "a8eb 1064 9cbf",
      "custom-key" -> "25a8 49e9 5ba9 7d7f",
      "custom-value" -> "25a8 49e9 5bb8 e8b4 bf",
      "302" -> "6402",
      "private" -> "aec3 771a 4b",
      "Mon, 21 Oct 2013 20:13:21 GMT" ->
        "d07a be94 1054 d444 a820 0595 040b 8166 e082 a62d 1bff",
      "https://www.example.com" -> "9d29 ad17 1863 c78f 0b97 c8e9 ae82 ae43 d3",
      "gzip" -> "9bd9 ab",
      "foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1" ->
        ("94e7 821d d7f2 e6c7 b335 dfdf cd5b 3960 d5af 2708 7f36 72c1" +
         " ab27 0fb5 291f 9587 3160 65c0 03ed 4ee5 b106 3d50 07"))
    vectors.foreach { case (plain, coded) =>
      assert(enc(plain).sameElements(hex(coded)), s"encode '$plain'")
      assert(dec(hex(coded)) == plain, s"decode '$plain'")
    }
    // full byte surface round-trips (covers every code in the table)
    val allBytes = Array.tabulate[Byte](256)(_.toByte)
    assert(Huffman.decode(Huffman.encode(allBytes), 0,
      Huffman.encode(allBytes).length).sameElements(allBytes))
    // padding that is not an all-ones EOS prefix must be refused:
    // 'a' = 00011 + '0xxx' zero padding is invalid
    val bad = Array[Byte](0x18) // 00011000: 'a' then 000 padding
    val e1 = intercept[java.io.IOException] { Huffman.decode(bad, 0, 1) }
    assert(e1.getMessage.contains("padding"))
    // >=8 bits of padding (a whole 0xff byte after a symbol) is invalid
    val longPad = Array[Byte](0x1f, 0xff.toByte) // 'a'=00011 + 11 ones
    val e2 = intercept[java.io.IOException] { Huffman.decode(longPad, 0, 2) }
    assert(e2.getMessage.contains("padding"))
    // a decoder-visible huffman literal inside a header block decodes
    val block = graft.sources.grpc.Hpack.encode(
      Seq("x-hdr" -> "Value-123; q=0.9"), huffman = true)
    assert((new graft.sources.grpc.Hpack.Decoder).decode(block) ==
      Seq("x-hdr" -> "Value-123; q=0.9"))
  }

  test("requestJson maps onto the input message and drives the response") {
    val rows = read("requestJson" -> """{"query": "all", "limit": 2}""").collect()
    assert(rows.length == 2)
    val qd = msgDesc("UserQuery")
    assert(lastRequest.getField(qd.findFieldByName("query")) == "all")
    assert(lastRequest.getField(qd.findFieldByName("limit")) == 2L)
  }

  test("without rowsField the response itself is one row (reference behavior)") {
    val df = spark.read.format("graft.sources.grpc.GrpcDataSource")
      .option("url", url).option("service", "demo.DataService")
      .option("method", "GetUsers").option("descriptorSet", descPath)
      .load()
    assert(df.schema.fieldNames.toSeq == Seq("users", "total"))
    val r = df.collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("total") == 3L)
    assert(r(0).getSeq[org.apache.spark.sql.Row](0).length == 3)
  }

  test("column pruning reaches the decode: only requested fields convert") {
    val df = read().select(col("name"), col("addr").getField("city").as("city"))
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    val scan = leaves.map(_.toString).mkString
    // the scan's read schema excludes unrequested columns
    assert(!scan.contains("score") && !scan.contains("tags"), scan)
    assert(df.orderBy("name").collect().map(_.getString(0)).toSeq ==
      Seq("ann", "bob", "cyd"))
  }

  test("framing round-trips and rejects compressed frames") {
    val payload = Array[Byte](1, 2, 3, 4, 5)
    val framed = GrpcFraming.frame(payload)
    assert(framed(0) == 0 && framed.length == payload.length + 5)
    assert(GrpcFraming.unframe(
      new java.io.ByteArrayInputStream(framed)).toSeq == payload.toSeq)
    val compressed = framed.clone(); compressed(0) = 1
    intercept[IllegalArgumentException] {
      GrpcFraming.unframe(new java.io.ByteArrayInputStream(compressed))
    }
  }

  test("recursive message types are refused, not stack-overflowed") {
    import DescriptorProtos._
    import FieldDescriptorProto.{Label, Type}
    val node = DescriptorProto.newBuilder().setName("Node")
      .addField(FieldDescriptorProto.newBuilder()
        .setName("child").setNumber(1).setType(Type.TYPE_MESSAGE)
        .setLabel(Label.LABEL_OPTIONAL).setTypeName(".rec.Node"))
      .build()
    val file = FileDescriptorProto.newBuilder()
      .setName("rec.proto").setPackage("rec").setSyntax("proto3")
      .addMessageType(node).build()
    val fd = ProtoSchema.linkFiles(
      FileDescriptorSet.newBuilder().addFile(file).build()).head
    val e = intercept[IllegalArgumentException] {
      ProtoSchema.toStructType(fd.findMessageTypeByName("Node"))
    }
    assert(e.getMessage.contains("recursive"), e.getMessage)
  }

  test("unknown service or method fails with a clear error") {
    val e1 = intercept[Exception] {
      spark.read.format("graft.sources.grpc.GrpcDataSource")
        .option("url", url).option("service", "demo.Nope")
        .option("method", "GetUsers").option("descriptorSet", descPath).load()
    }
    assert(e1.getMessage.contains("service"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.grpc.GrpcDataSource")
        .option("url", url).option("service", "demo.DataService")
        .option("method", "Nope").option("descriptorSet", descPath).load()
    }
    assert(e2.getMessage.contains("method"), e2.getMessage)
  }
}
