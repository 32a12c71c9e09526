package graft.sources.flight

import org.sparkproject.spark_core.protobuf.{DescriptorProtos, Descriptors}

/** The Arrow Flight (SQL) protobuf surface, built programmatically from
  * the PUBLIC Flight.proto / FlightSql.proto definitions (apache/arrow
  * format/Flight.proto; the same no-protoc technique the gRPC source's
  * spec uses). Only the messages the read path needs: descriptors,
  * tickets, FlightInfo, FlightData, and the Flight SQL statement
  * command. Field numbers are normative — FlightData.data_body is field
  * 1000 by design in the official proto (it sorts the large payload
  * last on the wire). */
object FlightProto {
  import DescriptorProtos._
  import FieldDescriptorProto.{Label, Type}

  private def field(name: String, num: Int, t: Type,
      label: Label = Label.LABEL_OPTIONAL,
      typeName: String = null): FieldDescriptorProto = {
    val b = FieldDescriptorProto.newBuilder()
      .setName(name).setNumber(num).setType(t).setLabel(label)
    if (typeName != null) b.setTypeName(typeName)
    b.build()
  }

  private def buildSet(): DescriptorProtos.FileDescriptorSet = {
    val descriptorType = EnumDescriptorProto.newBuilder()
      .setName("DescriptorType")
      .addValue(EnumValueDescriptorProto.newBuilder()
        .setName("UNKNOWN").setNumber(0))
      .addValue(EnumValueDescriptorProto.newBuilder()
        .setName("PATH").setNumber(1))
      .addValue(EnumValueDescriptorProto.newBuilder()
        .setName("CMD").setNumber(2))
      .build()
    val flightDescriptor = DescriptorProto.newBuilder()
      .setName("FlightDescriptor")
      .addEnumType(descriptorType)
      .addField(field("type", 1, Type.TYPE_ENUM,
        typeName = ".arrow.flight.protocol.FlightDescriptor.DescriptorType"))
      .addField(field("cmd", 2, Type.TYPE_BYTES))
      .addField(field("path", 3, Type.TYPE_STRING, Label.LABEL_REPEATED))
      .build()
    val ticket = DescriptorProto.newBuilder().setName("Ticket")
      .addField(field("ticket", 1, Type.TYPE_BYTES))
      .build()
    val location = DescriptorProto.newBuilder().setName("Location")
      .addField(field("uri", 1, Type.TYPE_STRING))
      .build()
    val endpoint = DescriptorProto.newBuilder().setName("FlightEndpoint")
      .addField(field("ticket", 1, Type.TYPE_MESSAGE,
        typeName = ".arrow.flight.protocol.Ticket"))
      .addField(field("location", 2, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".arrow.flight.protocol.Location"))
      .build()
    val flightInfo = DescriptorProto.newBuilder().setName("FlightInfo")
      .addField(field("schema", 1, Type.TYPE_BYTES))
      .addField(field("flight_descriptor", 2, Type.TYPE_MESSAGE,
        typeName = ".arrow.flight.protocol.FlightDescriptor"))
      .addField(field("endpoint", 3, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".arrow.flight.protocol.FlightEndpoint"))
      .addField(field("total_records", 4, Type.TYPE_INT64))
      .addField(field("total_bytes", 5, Type.TYPE_INT64))
      .build()
    val flightData = DescriptorProto.newBuilder().setName("FlightData")
      .addField(field("flight_descriptor", 1, Type.TYPE_MESSAGE,
        typeName = ".arrow.flight.protocol.FlightDescriptor"))
      .addField(field("data_header", 2, Type.TYPE_BYTES))
      .addField(field("app_metadata", 3, Type.TYPE_BYTES))
      .addField(field("data_body", 1000, Type.TYPE_BYTES))
      .build()
    val putResult = DescriptorProto.newBuilder().setName("PutResult")
      .addField(field("app_metadata", 1, Type.TYPE_BYTES))
      .build()
    val action = DescriptorProto.newBuilder().setName("Action")
      .addField(field("type", 1, Type.TYPE_STRING))
      .addField(field("body", 2, Type.TYPE_BYTES))
      .build()
    val result = DescriptorProto.newBuilder().setName("Result")
      .addField(field("body", 1, Type.TYPE_BYTES))
      .build()
    val service = ServiceDescriptorProto.newBuilder().setName("FlightService")
      .addMethod(MethodDescriptorProto.newBuilder().setName("GetFlightInfo")
        .setInputType(".arrow.flight.protocol.FlightDescriptor")
        .setOutputType(".arrow.flight.protocol.FlightInfo"))
      .addMethod(MethodDescriptorProto.newBuilder().setName("DoGet")
        .setInputType(".arrow.flight.protocol.Ticket")
        .setOutputType(".arrow.flight.protocol.FlightData")
        .setServerStreaming(true))
      .addMethod(MethodDescriptorProto.newBuilder().setName("DoAction")
        .setInputType(".arrow.flight.protocol.Action")
        .setOutputType(".arrow.flight.protocol.Result")
        .setServerStreaming(true))
      .addMethod(MethodDescriptorProto.newBuilder().setName("DoPut")
        .setInputType(".arrow.flight.protocol.FlightData")
        .setOutputType(".arrow.flight.protocol.PutResult")
        .setClientStreaming(true).setServerStreaming(true))
      .build()
    val flightFile = FileDescriptorProto.newBuilder()
      .setName("Flight.proto").setPackage("arrow.flight.protocol")
      .setSyntax("proto3")
      .addMessageType(flightDescriptor).addMessageType(ticket)
      .addMessageType(location).addMessageType(endpoint)
      .addMessageType(flightInfo).addMessageType(flightData)
      .addMessageType(action).addMessageType(result)
      .addMessageType(putResult)
      .addService(service)
      .build()
    // FlightSql.proto commands are Any-wrapped; the statement query is
    // the one the read path issues (CommandStatementQuery.query = SQL);
    // the catalog-discovery and prepared-statement commands mirror the
    // published FlightSql.proto field numbers exactly.
    val cmdQuery = DescriptorProto.newBuilder()
      .setName("CommandStatementQuery")
      .addField(field("query", 1, Type.TYPE_STRING))
      .build()
    val cmdGetCatalogs = DescriptorProto.newBuilder()
      .setName("CommandGetCatalogs")
      .build()
    val cmdGetDbSchemas = DescriptorProto.newBuilder()
      .setName("CommandGetDbSchemas")
      .addField(field("catalog", 1, Type.TYPE_STRING))
      .addField(field("db_schema_filter_pattern", 2, Type.TYPE_STRING))
      .build()
    val cmdGetTables = DescriptorProto.newBuilder()
      .setName("CommandGetTables")
      .addField(field("catalog", 1, Type.TYPE_STRING))
      .addField(field("db_schema_filter_pattern", 2, Type.TYPE_STRING))
      .addField(field("table_name_filter_pattern", 3, Type.TYPE_STRING))
      .addField(field("table_types", 4, Type.TYPE_STRING, Label.LABEL_REPEATED))
      .addField(field("include_schema", 5, Type.TYPE_BOOL))
      .build()
    val cmdGetSqlInfo = DescriptorProto.newBuilder()
      .setName("CommandGetSqlInfo")
      .addField(field("info", 1, Type.TYPE_UINT32, Label.LABEL_REPEATED))
      .build()
    val cmdPreparedQuery = DescriptorProto.newBuilder()
      .setName("CommandPreparedStatementQuery")
      .addField(field("prepared_statement_handle", 1, Type.TYPE_BYTES))
      .build()
    val actCreatePrepared = DescriptorProto.newBuilder()
      .setName("ActionCreatePreparedStatementRequest")
      .addField(field("query", 1, Type.TYPE_STRING))
      .build()
    val actCreatePreparedResult = DescriptorProto.newBuilder()
      .setName("ActionCreatePreparedStatementResult")
      .addField(field("prepared_statement_handle", 1, Type.TYPE_BYTES))
      .addField(field("dataset_schema", 2, Type.TYPE_BYTES))
      .addField(field("parameter_schema", 3, Type.TYPE_BYTES))
      .build()
    val actClosePrepared = DescriptorProto.newBuilder()
      .setName("ActionClosePreparedStatementRequest")
      .addField(field("prepared_statement_handle", 1, Type.TYPE_BYTES))
      .build()
    val cmdPreparedUpdate = DescriptorProto.newBuilder()
      .setName("CommandPreparedStatementUpdate")
      .addField(field("prepared_statement_handle", 1, Type.TYPE_BYTES))
      .build()
    val doPutUpdateResult = DescriptorProto.newBuilder()
      .setName("DoPutUpdateResult")
      .addField(field("record_count", 1, Type.TYPE_INT64))
      .build()
    // DoPut on a prepared statement answers with a REPLACEMENT handle
    // that captures the bound parameters — the stateless-server shape
    // Flight SQL added for exactly this (arrow Flight SQL spec,
    // FlightSql.proto DoPutPreparedStatementResult)
    val doPutPreparedResult = DescriptorProto.newBuilder()
      .setName("DoPutPreparedStatementResult")
      .addField(field("prepared_statement_handle", 1, Type.TYPE_BYTES))
      .build()
    val cmdGetXdbc = DescriptorProto.newBuilder()
      .setName("CommandGetXdbcTypeInfo")
      .addField(field("data_type", 1, Type.TYPE_INT32))
      .build()
    val sqlFile = FileDescriptorProto.newBuilder()
      .setName("FlightSql.proto").setPackage("arrow.flight.protocol.sql")
      .setSyntax("proto3")
      .addMessageType(cmdQuery)
      .addMessageType(cmdGetCatalogs).addMessageType(cmdGetDbSchemas)
      .addMessageType(cmdGetTables).addMessageType(cmdGetSqlInfo)
      .addMessageType(cmdPreparedQuery)
      .addMessageType(actCreatePrepared)
      .addMessageType(actCreatePreparedResult)
      .addMessageType(actClosePrepared)
      .addMessageType(cmdPreparedUpdate)
      .addMessageType(doPutUpdateResult)
      .addMessageType(doPutPreparedResult)
      .addMessageType(cmdGetXdbc)
      .build()
    FileDescriptorSet.newBuilder().addFile(flightFile).addFile(sqlFile).build()
  }

  lazy val files: Seq[Descriptors.FileDescriptor] = {
    val set = buildSet()
    set.getFileList.toArray(Array.empty[DescriptorProtos.FileDescriptorProto])
      .map(fd => Descriptors.FileDescriptor.buildFrom(fd,
        Array.empty[Descriptors.FileDescriptor]))
      .toSeq
  }

  def msg(fullName: String): Descriptors.Descriptor =
    files.flatMap(f => Option(f.findMessageTypeByName(
      fullName.stripPrefix(f.getPackage + ".")))).headOption
      .getOrElse(throw new IllegalArgumentException(s"no message $fullName"))

  val FlightDescriptorD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.FlightDescriptor")
  val TicketD: Descriptors.Descriptor = msg("arrow.flight.protocol.Ticket")
  val FlightInfoD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.FlightInfo")
  val FlightDataD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.FlightData")
  val CommandStatementQueryD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.CommandStatementQuery")
  val ActionD: Descriptors.Descriptor = msg("arrow.flight.protocol.Action")
  val ResultD: Descriptors.Descriptor = msg("arrow.flight.protocol.Result")
  val CommandGetCatalogsD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.CommandGetCatalogs")
  val CommandGetDbSchemasD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.CommandGetDbSchemas")
  val CommandGetTablesD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.CommandGetTables")
  val CommandGetSqlInfoD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.CommandGetSqlInfo")
  val CommandPreparedStatementQueryD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.CommandPreparedStatementQuery")
  val ActionCreatePreparedStatementRequestD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.ActionCreatePreparedStatementRequest")
  val ActionCreatePreparedStatementResultD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.ActionCreatePreparedStatementResult")
  val ActionClosePreparedStatementRequestD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.ActionClosePreparedStatementRequest")
  val PutResultD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.PutResult")
  val CommandPreparedStatementUpdateD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.CommandPreparedStatementUpdate")
  val DoPutUpdateResultD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.DoPutUpdateResult")
  val DoPutPreparedStatementResultD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.DoPutPreparedStatementResult")
  val CommandGetXdbcTypeInfoD: Descriptors.Descriptor =
    msg("arrow.flight.protocol.sql.CommandGetXdbcTypeInfo")
}
