package graft.server

import java.nio.{ByteBuffer, ByteOrder}
import scala.jdk.CollectionConverters._

import org.sparkproject.spark_core.protobuf.{Any => PAny, ByteString, DynamicMessage}

import graft.session.{AuthenticatedUser, GraftSession}
import graft.sources.flight.FlightProto
import graft.sources.grpc.{GrpcStatusException, Http2Server}

/** Arrow Flight SQL SERVER edge over the hand-built h2c carrier — the
  * counterpart of the reference's flight_sql.rs (48-216:
  * get_flight_info_statement / do_get_statement): any Flight SQL client
  * resolves a SQL statement to a ticket + IPC schema with GetFlightInfo
  * and streams the result as Arrow record batches with DoGet. Runs over
  * the SAME engine session as the REST edge (executeQuery → RLS,
  * defensive limits, cache, trace all in force — this is a wire
  * protocol, not a policy bypass), with the same pluggable
  * authenticator (authorization: Bearer <api-key>; absent/invalid →
  * gRPC status 16 UNAUTHENTICATED).
  *
  * Statement handles are stateless: the ticket IS the query text (the
  * reference caches prepared statements server-side; a stateless ticket
  * survives edge restarts and needs no eviction). GetFlightInfo only
  * PLANS the query (schema from the analyzed plan — no execution);
  * DoGet executes once and streams the capped result. The row cap is
  * the edge's bulk-delivery bound, same stance as the REST Arrow
  * endpoint's capped collect. */
final class FlightSqlEdge(
    engine: GraftSession,
    authenticator: String => Option[AuthenticatedUser],
    maxRows: Int = 100000,
    ssl: Option[javax.net.ssl.SSLContext] = None) {
  import FlightProto._

  private val server = new Http2Server((path, headers, payload) =>
    handle(path, headers, payload), ssl)

  def start(): Int = server.start()
  def stop(): Unit = server.stop()

  private def authed(headers: Map[String, String]): AuthenticatedUser = {
    val token = headers.get("authorization")
      .filter(_.toLowerCase.startsWith("bearer "))
      .map(_.substring("bearer ".length).trim)
    token.flatMap(authenticator)
      .getOrElse(throw new GrpcStatusException(16, "invalid or missing bearer token"))
  }

  private def queryOf(anyBytes: Array[Byte]): String = {
    val any = PAny.parseFrom(anyBytes)
    if (!any.getTypeUrl.endsWith("CommandStatementQuery"))
      throw new GrpcStatusException(3, // INVALID_ARGUMENT
        s"unsupported flight command: ${any.getTypeUrl}")
    DynamicMessage.parseFrom(CommandStatementQueryD, any.getValue.toByteArray)
      .getField(CommandStatementQueryD.findFieldByName("query"))
      .asInstanceOf[String]
  }

  private def handle(path: String, headers: Map[String, String],
      payload: Array[Byte]): Seq[Array[Byte]] = path match {
    case "/arrow.flight.protocol.FlightService/GetFlightInfo" =>
      val user = authed(headers)
      val desc = DynamicMessage.parseFrom(FlightDescriptorD, payload)
      val query = queryOf(desc
        .getField(FlightDescriptorD.findFieldByName("cmd"))
        .asInstanceOf[ByteString].toByteArray)
      // plan only: analyzed schema via planQuery — policy rewrite, defensive
      // limit, and cost gate apply, but nothing executes and nothing is
      // cache-stored (a GetFlightInfo→DoGet pair must run the query ONCE;
      // reference plans-without-executing here, flight_sql.rs:533-566)
      val info = engine.planQuery(query, user)
      val ticket = DynamicMessage.newBuilder(TicketD)
        .setField(TicketD.findFieldByName("ticket"),
          ByteString.copyFromUtf8(query)).build()
      val ep = DynamicMessage.newBuilder(
        msg("arrow.flight.protocol.FlightEndpoint"))
      ep.setField(ep.getDescriptorForType.findFieldByName("ticket"), ticket)
      Seq(DynamicMessage.newBuilder(FlightInfoD)
        .setField(FlightInfoD.findFieldByName("schema"), ByteString.copyFrom(
          ArrowResults.schemaIpcBytes(info.schema)))
        .addRepeatedField(FlightInfoD.findFieldByName("endpoint"), ep.build())
        .build().toByteArray)
    case "/arrow.flight.protocol.FlightService/DoGet" =>
      val user = authed(headers)
      val query = DynamicMessage.parseFrom(TicketD, payload)
        .getField(TicketD.findFieldByName("ticket"))
        .asInstanceOf[ByteString].toStringUtf8
      if (query.isEmpty)
        throw new GrpcStatusException(3, "empty flight ticket")
      val result = engine.executeQuery(query, user, Map.empty)
      val stream = ArrowResults.toArrowStream(result.df, maxRows)
      FlightIpc.split(stream).map { case (meta, body) =>
        DynamicMessage.newBuilder(FlightDataD)
          .setField(FlightDataD.findFieldByName("data_header"),
            ByteString.copyFrom(meta))
          .setField(FlightDataD.findFieldByName("data_body"),
            ByteString.copyFrom(body))
          .build().toByteArray
      }
    case other =>
      throw new GrpcStatusException(12, s"unimplemented: $other") // UNIMPLEMENTED
  }
}

/** Arrow IPC stream ↔ Flight message boundary: split an encapsulated
  * IPC stream into its (metadata, body) messages — the exact payloads
  * of FlightData frames. Shared by the Flight edge (serving) and its
  * spec (verifying the split against the client's reassembly). */
object FlightIpc {
  def split(stream: Array[Byte]): Seq[(Array[Byte], Array[Byte])] = {
    val bb = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[(Array[Byte], Array[Byte])]
    var done = false
    while (!done && bb.remaining() >= 8) {
      val cont = bb.getInt
      require(cont == -1, s"expected IPC continuation marker, got $cont")
      val len = bb.getInt
      if (len == 0) done = true // end-of-stream
      else {
        val meta = new Array[Byte](len); bb.get(meta)
        val m = org.apache.arrow.flatbuf.Message.getRootAsMessage(
          ByteBuffer.wrap(meta).order(ByteOrder.LITTLE_ENDIAN))
        val body = new Array[Byte](m.bodyLength().toInt); bb.get(body)
        out += ((meta, body))
      }
    }
    out.result()
  }
}
