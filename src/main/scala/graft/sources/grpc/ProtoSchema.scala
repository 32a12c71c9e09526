package graft.sources.grpc

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

// Spark-core's shaded protobuf runtime: present on every Spark classpath
// (driver and executors) by construction, so the dynamic-decode layer has
// zero extra dependencies. A standalone build would swap these imports for
// `com.google.protobuf` — the API is identical.
import org.sparkproject.spark_core.protobuf.{ByteString, DescriptorProtos, Descriptors, DynamicMessage}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Descriptor-pool loading and dynamic protobuf <-> Spark bridging — the
  * Spark-native analog of the reference's prost-reflect pool
  * (/root/reference/crates/connectors/src/sources/grpc.rs:21-43 config,
  * :536-556 descriptor-set load, :316-345 service/method resolution).
  *
  * A compiled `FileDescriptorSet` (protoc --descriptor_set_out, or built
  * programmatically) is parsed into linked [[Descriptors.FileDescriptor]]s;
  * services, methods, and message types resolve by fully-qualified name;
  * response payloads decode as [[DynamicMessage]] and convert to Catalyst
  * rows against a derived (or pruned) StructType.
  */
object ProtoSchema {

  /** All file descriptors of a descriptor set, dependency-linked.
    * Files may reference each other in any order in the set. */
  def loadDescriptorSet(path: String): Seq[Descriptors.FileDescriptor] = {
    val set = DescriptorProtos.FileDescriptorSet.parseFrom(
      Files.readAllBytes(Paths.get(path)))
    linkFiles(set)
  }

  def linkFiles(set: DescriptorProtos.FileDescriptorSet): Seq[Descriptors.FileDescriptor] = {
    val protos = set.getFileList.asScala.toSeq
    val built = scala.collection.mutable.LinkedHashMap[String, Descriptors.FileDescriptor]()
    def build(p: DescriptorProtos.FileDescriptorProto): Descriptors.FileDescriptor =
      built.getOrElseUpdate(p.getName, {
        val deps = p.getDependencyList.asScala.map { dep =>
          protos.find(_.getName == dep).map(build).getOrElse(
            throw new IllegalArgumentException(
              s"descriptor set is missing dependency '$dep' of '${p.getName}'"))
        }.toArray
        Descriptors.FileDescriptor.buildFrom(p, deps)
      })
    protos.foreach(build)
    built.values.toSeq
  }

  /** Resolve `service`/`method` across the set's files; returns the method
    * descriptor (input/output types hang off it). */
  def findMethod(files: Seq[Descriptors.FileDescriptor], service: String,
      method: String): Descriptors.MethodDescriptor = {
    val svc = files.flatMap(f => Option(f.findServiceByName(stripPkg(f, service))))
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"service '$service' not found in descriptor set"))
    Option(svc.findMethodByName(method)).getOrElse(
      throw new IllegalArgumentException(
        s"method '$method' not found in service '$service'"))
  }

  /** `findServiceByName` wants the short name within its file's package. */
  private def stripPkg(f: Descriptors.FileDescriptor, fqn: String): String = {
    val pkg = f.getPackage
    if (pkg.nonEmpty && fqn.startsWith(pkg + ".")) fqn.substring(pkg.length + 1)
    else fqn
  }

  /** Relational schemas don't nest deeper than this; a recursive message
    * type (message Node { Node child = 1; }) has no finite StructType at
    * all, so the mapper must refuse it rather than overflow the stack. */
  private val MaxNestingDepth = 16

  /** Spark type for a proto field (the reference maps via JSON+Arrow
    * inference; a direct mapping is both faster and lossless for 64-bit
    * ints, which JSON inference can mangle). */
  def fieldType(fd: Descriptors.FieldDescriptor): DataType = fieldType(fd, 0)

  private def fieldType(fd: Descriptors.FieldDescriptor, depth: Int): DataType = {
    import Descriptors.FieldDescriptor.JavaType._
    val scalar = fd.getJavaType match {
      case STRING      => StringType
      case INT         => IntegerType
      case LONG        => LongType
      case DOUBLE      => DoubleType
      case FLOAT       => FloatType
      case BOOLEAN     => BooleanType
      case BYTE_STRING => BinaryType
      case ENUM        => StringType // decoded as the enum value's name
      case MESSAGE     => toStructType(fd.getMessageType, depth + 1)
    }
    if (fd.isRepeated) ArrayType(scalar, containsNull = false) else scalar
  }

  /** StructType mirroring a message descriptor (field order preserved). */
  def toStructType(desc: Descriptors.Descriptor): StructType =
    toStructType(desc, 0)

  private def toStructType(desc: Descriptors.Descriptor, depth: Int): StructType = {
    if (depth > MaxNestingDepth)
      throw new IllegalArgumentException(
        s"message '${desc.getFullName}' nests deeper than $MaxNestingDepth " +
          "levels (recursive message types have no finite relational schema)")
    StructType(desc.getFields.asScala.toSeq.map { fd =>
      // proto3 scalars always carry a (default) value; submessages may be
      // absent -> null
      StructField(fd.getName, fieldType(fd, depth),
        nullable = fd.getJavaType == Descriptors.FieldDescriptor.JavaType.MESSAGE
          && !fd.isRepeated)
    })
  }

  /** One decoded message -> InternalRow for the (possibly pruned) schema:
    * only requested fields are converted — column pruning reaches the
    * decode loop. */
  def toRow(msg: DynamicMessage, schema: StructType): InternalRow = {
    val desc = msg.getDescriptorForType
    InternalRow.fromSeq(schema.fields.toSeq.map { sf =>
      val fd = Option(desc.findFieldByName(sf.name)).getOrElse(
        throw new IllegalArgumentException(
          s"column '${sf.name}' not in message '${desc.getFullName}'"))
      fieldValue(msg, fd, sf.dataType)
    })
  }

  private def fieldValue(msg: DynamicMessage, fd: Descriptors.FieldDescriptor,
      dt: DataType): Any = {
    if (fd.isRepeated) {
      val items = msg.getField(fd).asInstanceOf[java.util.List[_]].asScala
      val elemType = dt.asInstanceOf[ArrayType].elementType
      new GenericArrayData(items.map(v => convert(v, elemType)).toArray)
    } else if (fd.getJavaType == Descriptors.FieldDescriptor.JavaType.MESSAGE
        && !msg.hasField(fd)) {
      null
    } else convert(msg.getField(fd), dt)
  }

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (s: String, _)                  => UTF8String.fromString(s)
    case (b: ByteString, _)              => b.toByteArray
    case (e: Descriptors.EnumValueDescriptor, _) => UTF8String.fromString(e.getName)
    case (m: DynamicMessage, st: StructType)     => toRow(m, st)
    case (x, _)                          => x // Int/Long/Float/Double/Boolean
  }

  /** JSON object -> request DynamicMessage (scalars, nested objects,
    * arrays of scalars) — the reference's serde bridge for request_body
    * (grpc.rs:347-368). */
  def jsonToMessage(desc: Descriptors.Descriptor, json: String): DynamicMessage = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    nodeToMessage(desc, mapper.readTree(json))
  }

  private def nodeToMessage(desc: Descriptors.Descriptor,
      node: com.fasterxml.jackson.databind.JsonNode): DynamicMessage = {
    val b = DynamicMessage.newBuilder(desc)
    node.properties().asScala.foreach { e =>
      val fd = Option(desc.findFieldByName(e.getKey)).getOrElse(
        throw new IllegalArgumentException(
          s"request field '${e.getKey}' not in message '${desc.getFullName}'"))
      val v = e.getValue
      if (fd.isRepeated) {
        v.elements().asScala.foreach(el => b.addRepeatedField(fd, jsonScalar(fd, el)))
      } else b.setField(fd, jsonScalar(fd, v))
    }
    b.build()
  }

  private def jsonScalar(fd: Descriptors.FieldDescriptor,
      v: com.fasterxml.jackson.databind.JsonNode): AnyRef = {
    import Descriptors.FieldDescriptor.JavaType._
    fd.getJavaType match {
      case STRING      => v.asText()
      case INT         => java.lang.Integer.valueOf(v.asInt())
      case LONG        => java.lang.Long.valueOf(v.asLong())
      case DOUBLE      => java.lang.Double.valueOf(v.asDouble())
      case FLOAT       => java.lang.Float.valueOf(v.asDouble().toFloat)
      case BOOLEAN     => java.lang.Boolean.valueOf(v.asBoolean())
      case BYTE_STRING => ByteString.copyFrom(
        java.util.Base64.getDecoder.decode(v.asText()))
      case ENUM        => Option(fd.getEnumType.findValueByName(v.asText()))
        .getOrElse(throw new IllegalArgumentException(
          s"enum value '${v.asText()}' not in ${fd.getEnumType.getFullName}"))
      case MESSAGE     => nodeToMessage(fd.getMessageType, v)
    }
  }
}
