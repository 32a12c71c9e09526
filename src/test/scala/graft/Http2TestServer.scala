package graft

import graft.sources.grpc.Http2Server

/** h2c gRPC test peer — a thin adapter over the production
  * [[Http2Server]] (so specs exercise the same RFC-7540/7541 server code
  * the Flight edge serves with). The handler maps (path, unframed
  * request payload) → the response's unframed payloads — one element
  * for a unary method, several for a server-streaming one (the Flight
  * DoGet shape). */
final class Http2TestServer(handler: (String, Array[Byte]) => Seq[Array[Byte]]) {
  private val server = new Http2Server((path, _, payload) =>
    handler(path, payload.headOption.getOrElse(Array.emptyByteArray)))
  def start(): Int = server.start()
  def stop(): Unit = server.stop()
}
