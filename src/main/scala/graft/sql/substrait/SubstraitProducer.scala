package graft.sql.substrait

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

/** Minimal protobuf wire-format writer (varint + length-delimited + fixed64
  * — the three wire types Substrait's messages use). Messages are built
  * bottom-up into byte arrays; field emission order follows field numbers
  * the way canonical serializers do. Hand-rolled so the producer has zero
  * dependencies: the substrait runtime the reference leans on
  * (prost + the substrait crate) has no counterpart on this classpath. */
final class ProtoWriter {
  private val buf = new java.io.ByteArrayOutputStream()
  def bytes: Array[Byte] = buf.toByteArray

  private def varint(v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    buf.write(v.toInt)
  }
  private def key(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)

  /** Varint field, emitted even for 0 — callers in oneof/repeated position
    * need the explicit arm; plain proto3 fields may skip defaults but an
    * always-write is valid wire format either way. */
  def int(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
  def double(field: Int, v: Double): Unit = {
    key(field, 1)
    val bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { buf.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
  def bytesField(field: Int, b: Array[Byte]): Unit = {
    key(field, 2); varint(b.length.toLong); buf.write(b, 0, b.length)
  }
  def string(field: Int, s: String): Unit =
    bytesField(field, s.getBytes(StandardCharsets.UTF_8))
  def msg(field: Int)(body: ProtoWriter => Unit): Unit = {
    val w = new ProtoWriter; body(w); bytesField(field, w.bytes)
  }
}

/** Spark logical plan → Substrait `Plan` bytes, for engines that consume
  * binary Substrait instead of SQL text — the role the reference's
  * producer plays for DuckDB (`from_substrait(?)`,
  * /root/reference/crates/sql/src/substrait_producer.rs:14-21,
  * sources/sql/duckdb.rs). The reference delegates the conversion to the
  * datafusion-substrait crate; no such library exists for Spark, so this
  * is a first-party producer for the pushdown-able subset the dialect
  * router's Substrait tier (graft.sql.Dialects) carries:
  *
  *   named-table scan → filter → project → aggregate → sort → fetch,
  *   with column/literal/cast/comparison/boolean/arithmetic expressions
  *   and sum/min/max/avg/count measures.
  *
  * Field numbers follow substrait.io's proto definitions (plan.proto,
  * algebra.proto, type.proto, extensions.proto); the encoding is verified
  * end-to-end by SubstraitExecSpec, which EXECUTES produced plans in a
  * second engine (Acero, pyarrow.substrait.run_query) and diffs row sets
  * against Spark executing the same logical plan.
  *
  * Consumer caveats honored here (both Acero-verified): grouping
  * expressions must be direct field references, and aggregate output is
  * [groupings ++ measures] — an emit mapping reorders it back to the
  * plan's own column order.
  */
object SubstraitProducer {

  final case class SubstraitUnsupported(what: String)
    extends RuntimeException(s"substrait producer: unsupported $what")

  private val UriBase =
    "https://github.com/substrait-io/substrait/blob/main/extensions/"
  private val Comparison = UriBase + "functions_comparison.yaml"
  private val Boolean_ = UriBase + "functions_boolean.yaml"
  private val Arithmetic = UriBase + "functions_arithmetic.yaml"
  private val AggregateGeneric = UriBase + "functions_aggregate_generic.yaml"
  private val FString = UriBase + "functions_string.yaml"

  /** Deterministic anchor assignment, in first-use order. */
  private final class FnRegistry {
    val uriAnchors = scala.collection.mutable.LinkedHashMap[String, Int]()
    val fnAnchors = scala.collection.mutable.LinkedHashMap[(String, String), Int]()
    def ref(uri: String, name: String): Int = {
      val ua = uriAnchors.getOrElseUpdate(uri, uriAnchors.size + 1)
      fnAnchors.getOrElseUpdate((uri, name), fnAnchors.size + 1)
    }
    def uriAnchor(uri: String): Int = uriAnchors(uri)
  }

  def produce(df: DataFrame): Array[Byte] = produce(df.queryExecution.analyzed)

  def produce(plan: LogicalPlan): Array[Byte] = {
    val fns = new FnRegistry
    val (relBytes, _) = emitRel(plan, fns)
    val w = new ProtoWriter
    // Plan.extension_uris = 1; SimpleExtensionURI{anchor=1, uri=2}
    fns.uriAnchors.foreach { case (uri, anchor) =>
      w.msg(1) { u => u.int(1, anchor.toLong); u.string(2, uri) }
    }
    // Plan.extensions = 2; declaration.extension_function = 3
    //   {extension_uri_reference=1, function_anchor=2, name=3}
    fns.fnAnchors.foreach { case ((uri, name), anchor) =>
      w.msg(2)(_.msg(3) { f =>
        f.int(1, fns.uriAnchor(uri).toLong)
        f.int(2, anchor.toLong)
        f.string(3, name)
      })
    }
    // Plan.relations = 3; PlanRel.root = 2; RelRoot{input=1, names=2}
    w.msg(3)(_.msg(2) { root =>
      root.bytesField(1, relBytes)
      plan.output.foreach(a => root.string(2, a.name))
    })
    // Plan.version = 6 {major=1, minor=2} — the substrait release whose
    // proto field layout this producer targets
    w.msg(6) { v => v.int(1, 0L); v.int(2, 52L) }
    w.bytes
  }

  // ------------------------------------------------------------- relations

  /** Emit a Rel message; returns (bytes, output attributes) — the
    * attribute order IS the substrait field order for ordinal resolution. */
  private def emitRel(plan: LogicalPlan, fns: FnRegistry): (Array[Byte], Seq[Attribute]) =
    plan match {
      case s @ SubqueryAlias(id, child) if isScanLeaf(child) =>
        val out = s.output
        val w = new ProtoWriter
        w.msg(1) { read => // Rel.read = 1
          read.msg(2) { ns => // ReadRel.base_schema = 2 (NamedStruct)
            out.foreach(a => ns.string(1, a.name))
            ns.msg(2) { st => // NamedStruct.struct = 2 (Type.Struct)
              out.foreach(a => st.bytesField(1, typeBytes(a.dataType, a.nullable)))
              st.int(3, 2L) // Struct.nullability = NULLABILITY_REQUIRED
            }
          }
          read.msg(7)(_.string(1, id.name)) // ReadRel.named_table = 7 {names=1}
        }
        (w.bytes, out)

      case SubqueryAlias(_, child) => emitRel(child, fns) // transparent alias

      case Project(list, child) =>
        val (cb, cout) = emitRel(child, fns)
        val w = new ProtoWriter
        w.msg(7) { p => // Rel.project = 7
          // output = input ++ expressions; emit only the expressions
          p.msg(1)(_.msg(2) { e => // RelCommon.emit = 2 {output_mapping=1}
            list.indices.foreach(i => e.int(1, (cout.size + i).toLong))
          })
          p.bytesField(2, cb)
          list.foreach(e => p.bytesField(3, exprBytes(stripAlias(e), cout, fns)))
        }
        (w.bytes, list.map(_.toAttribute))

      case Filter(cond, child) =>
        val (cb, cout) = emitRel(child, fns)
        val w = new ProtoWriter
        w.msg(2) { f => // Rel.filter = 2
          f.bytesField(2, cb)
          f.bytesField(3, exprBytes(cond, cout, fns))
        }
        (w.bytes, cout)

      case GlobalLimit(IntegerLiteral(n), LocalLimit(_, child)) =>
        val (cb, cout) = emitRel(child, fns)
        val w = new ProtoWriter
        w.msg(3) { f => // Rel.fetch = 3 {input=2, offset=3, count=4}
          f.bytesField(2, cb)
          f.int(4, n.toLong)
        }
        (w.bytes, cout)

      case Sort(order, true, child, _) =>
        // Acero 16 raises ArrowNotImplementedError on MIXED null
        // placement across sort keys — refuse at produce time so the
        // router falls back instead of shipping unverifiable bytes
        // (the same discipline as semi/anti joins)
        if (order.map(_.nullOrdering).distinct.size > 1)
          throw SubstraitUnsupported(
            "mixed null placement across sort keys")
        val (cb, cout) = emitRel(child, fns)
        val w = new ProtoWriter
        w.msg(5) { s => // Rel.sort = 5 {input=2, sorts=3}
          s.bytesField(2, cb)
          order.foreach { so =>
            s.msg(3) { sf => // SortField{expr=1, direction=2}
              sf.bytesField(1, exprBytes(so.child, cout, fns))
              sf.int(2, direction(so).toLong)
            }
          }
        }
        (w.bytes, cout)

      case Aggregate(groupExprs, aggList, child, _) =>
        emitAggregate(groupExprs, aggList, child, fns)

      case Join(left, right, joinType, cond, _) =>
        val (lb, lout) = emitRel(left, fns)
        val (rb, rout) = emitRel(right, fns)
        import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter, RightOuter}
        // semi/anti stay unsupported: Acero's consumer binds the join
        // condition against the LEFT-ONLY output schema for those types,
        // so right-side key references cannot resolve — a produced plan
        // would be unexecutable on the differential engine
        val (jt, out) = joinType match {
          case Inner => (1, lout ++ rout)
          case FullOuter => (2, lout ++ rout)
          case LeftOuter => (3, lout ++ rout)
          case RightOuter => (4, lout ++ rout)
          case other => throw SubstraitUnsupported(s"join type $other")
        }
        val w = new ProtoWriter
        w.msg(6) { j => // Rel.join = 6 {left=2, right=3, expression=4, type=6}
          j.bytesField(2, lb)
          j.bytesField(3, rb)
          j.bytesField(4, exprBytes(
            cond.getOrElse(Literal(true, BooleanType)), lout ++ rout, fns))
          j.int(6, jt.toLong)
        }
        (w.bytes, out)

      case Deduplicate(keys, child) if keys.toSet == child.output.toSet =>
        // DISTINCT over all columns = group-by-everything, no measures
        val (cb, cout) = emitRel(child, fns)
        val w = new ProtoWriter
        w.msg(4) { ag =>
          ag.bytesField(2, cb)
          ag.msg(3) { g =>
            cout.foreach(a => g.bytesField(1, exprBytes(a, cout, fns)))
          }
        }
        (w.bytes, cout)

      case other => throw SubstraitUnsupported(s"plan node ${other.nodeName}")
    }

  private def isScanLeaf(p: LogicalPlan): Boolean = p match {
    case _: View => true
    case _: LeafNode => true
    case _ => false
  }

  private def emitAggregate(groupExprs: Seq[Expression], aggList: Seq[NamedExpression],
      child: LogicalPlan, fns: FnRegistry): (Array[Byte], Seq[Attribute]) = {
    val (cb0, cout0) = emitRel(child, fns)
    // Acero wants grouping DIRECT REFERENCES; a grouping EXPRESSION
    // (c + 1, a CASE band, …) is computed by an interposed project rel
    // that keeps the child columns and APPENDS the computed groupings,
    // which the aggregate then references by ordinal
    val needProject = groupExprs.exists(!_.isInstanceOf[AttributeReference])
    val (cb, cout, groupAttrs) =
      if (!needProject)
        (cb0, cout0, groupExprs.map(_.asInstanceOf[AttributeReference]))
      else {
        val synth = groupExprs.map(e =>
          AttributeReference("g", e.dataType, nullable = true)())
        val w0 = new ProtoWriter
        w0.msg(7) { p => // Rel.project = 7, emitting input ++ computed
          p.msg(1)(_.msg(2) { e =>
            (0 until (cout0.size + groupExprs.size))
              .foreach(i => e.int(1, i.toLong))
          })
          p.bytesField(2, cb0)
          groupExprs.foreach(g =>
            p.bytesField(3, exprBytes(stripAlias(g), cout0, fns)))
        }
        (w0.bytes, cout0 ++ synth, synth)
      }
    // measures in output order; every output item must be a grouping
    // column/expression or exactly an aliased aggregate call
    val measures = scala.collection.mutable.ArrayBuffer[AggregateExpression]()
    val mapping = aggList.map { item =>
      stripAlias(item) match {
        case a: AttributeReference
            if groupAttrs.exists(_.exprId == a.exprId) =>
          groupAttrs.indexWhere(_.exprId == a.exprId)
        case e if groupExprs.exists(_.semanticEquals(e)) =>
          groupExprs.indexWhere(_.semanticEquals(e))
        case ae: AggregateExpression =>
          measures += ae
          groupAttrs.size + (measures.size - 1)
        case other => throw SubstraitUnsupported(s"aggregate output ${other.sql}")
      }
    }
    val w = new ProtoWriter
    w.msg(4) { ag => // Rel.aggregate = 4
      // substrait output is [groupings ++ measures]; reorder to aggList
      ag.msg(1)(_.msg(2)(e => mapping.foreach(i => e.int(1, i.toLong))))
      ag.bytesField(2, cb)
      ag.msg(3) { g => // AggregateRel.groupings {grouping_expressions=1}
        groupAttrs.foreach(a => g.bytesField(1, exprBytes(a, cout, fns)))
      }
      measures.foreach { ae =>
        ag.msg(4)(_.msg(1) { m => // measures=4 {measure=1 AggregateFunction}
          val (uri, name, args) = aggCall(ae)
          m.int(1, fns.ref(uri, name).toLong) // function_reference
          m.int(4, 3L) // phase = AGGREGATION_PHASE_INITIAL_TO_RESULT
          m.bytesField(5, typeBytes(ae.dataType, nullable = true)) // output_type
          m.int(6, 1L) // invocation = AGGREGATION_INVOCATION_ALL
          args.foreach(a => // arguments=7 {value=3}
            m.msg(7)(_.bytesField(3, exprBytes(a, cout, fns))))
        })
      }
    }
    (w.bytes, aggList.map(_.toAttribute))
  }

  private def aggCall(ae: AggregateExpression): (String, String, Seq[Expression]) = {
    if (ae.isDistinct) throw SubstraitUnsupported("DISTINCT aggregate")
    ae.aggregateFunction match {
      case s: Sum => (Arithmetic, "sum", Seq(s.child))
      case m: Min => (Arithmetic, "min", Seq(m.child))
      case m: Max => (Arithmetic, "max", Seq(m.child))
      case a: Average => (Arithmetic, "avg", Seq(a.child))
      case c: Count if c.children.forall(_.foldable) =>
        (AggregateGeneric, "count", Seq.empty) // count(*) / count(1): nullary
      case c: Count if c.children.size == 1 =>
        (AggregateGeneric, "count", c.children)
      case other => throw SubstraitUnsupported(s"aggregate ${other.prettyName}")
    }
  }

  // ----------------------------------------------------------- expressions

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _) => stripAlias(c)
    case other => other
  }

  /** Expression message bytes against `input` ordinals. */
  private def exprBytes(e: Expression, input: Seq[Attribute], fns: FnRegistry): Array[Byte] = {
    val w = new ProtoWriter
    e match {
      case a: AttributeReference =>
        val idx = input.indexWhere(_.exprId == a.exprId)
        if (idx < 0) throw SubstraitUnsupported(s"unresolved column ${a.name}")
        w.msg(2) { sel => // Expression.selection = 2 (FieldReference)
          // direct_reference=1 → ReferenceSegment.struct_field=2 {field=1}
          sel.msg(1)(_.msg(2)(sf => if (idx != 0) sf.int(1, idx.toLong)))
          sel.msg(4)(_ => ()) // root_reference = 4 (empty RootReference)
        }
      case Literal(null, dt) =>
        // typed null (Literal.null = 29 carries the Type message)
        w.msg(1)(_.bytesField(29, typeBytes(dt, nullable = true)))
      case Literal(v, dt) =>
        w.msg(1) { lit => // Expression.literal = 1
          dt match {
            case BooleanType => lit.int(1, if (v.asInstanceOf[Boolean]) 1L else 0L)
            case IntegerType => lit.int(5, v.asInstanceOf[Int].toLong)
            case LongType => lit.int(7, v.asInstanceOf[Long])
            case DoubleType => lit.double(11, v.asInstanceOf[Double])
            case StringType => lit.string(12, v.toString)
            case DateType => lit.int(16, v.asInstanceOf[Int].toLong)
            case other => throw SubstraitUnsupported(s"literal of type ${other.simpleString}")
          }
        }
      case c: Cast =>
        w.msg(11) { cast => // Expression.cast = 11 {type=1, input=2, failure=3}
          cast.bytesField(1, typeBytes(c.dataType, nullable = true))
          cast.bytesField(2, exprBytes(c.child, input, fns))
          cast.int(3, 2L) // FAILURE_BEHAVIOR_THROW_EXCEPTION
        }
      case EqualTo(l, r) => scalarFn(w, Comparison, "equal", BooleanType, Seq(l, r), input, fns)
      case Not(EqualTo(l, r)) => scalarFn(w, Comparison, "not_equal", BooleanType, Seq(l, r), input, fns)
      case LessThan(l, r) => scalarFn(w, Comparison, "lt", BooleanType, Seq(l, r), input, fns)
      case LessThanOrEqual(l, r) => scalarFn(w, Comparison, "lte", BooleanType, Seq(l, r), input, fns)
      case GreaterThan(l, r) => scalarFn(w, Comparison, "gt", BooleanType, Seq(l, r), input, fns)
      case GreaterThanOrEqual(l, r) => scalarFn(w, Comparison, "gte", BooleanType, Seq(l, r), input, fns)
      case IsNull(c) => scalarFn(w, Comparison, "is_null", BooleanType, Seq(c), input, fns)
      case IsNotNull(c) => scalarFn(w, Comparison, "is_not_null", BooleanType, Seq(c), input, fns)
      case And(l, r) => scalarFn(w, Boolean_, "and", BooleanType, Seq(l, r), input, fns)
      case Or(l, r) => scalarFn(w, Boolean_, "or", BooleanType, Seq(l, r), input, fns)
      case Not(c) => scalarFn(w, Boolean_, "not", BooleanType, Seq(c), input, fns)
      case a: Add => scalarFn(w, Arithmetic, "add", a.dataType, Seq(a.left, a.right), input, fns)
      case s: Subtract => scalarFn(w, Arithmetic, "subtract", s.dataType, Seq(s.left, s.right), input, fns)
      case m: Multiply => scalarFn(w, Arithmetic, "multiply", m.dataType, Seq(m.left, m.right), input, fns)
      case d: Divide => scalarFn(w, Arithmetic, "divide", d.dataType, Seq(d.left, d.right), input, fns)
      case If(p, t, f) =>
        w.msg(6) { it => // Expression.if_then = 6 {ifs=1 {if=1, then=2}, else=2}
          it.msg(1) { c =>
            c.bytesField(1, exprBytes(p, input, fns))
            c.bytesField(2, exprBytes(t, input, fns))
          }
          it.bytesField(2, exprBytes(f, input, fns))
        }
      case cw: CaseWhen =>
        // CASE without ELSE falls to a typed null, same as Spark's
        val els = cw.elseValue.getOrElse(Literal(null, cw.dataType))
        w.msg(6) { it =>
          cw.branches.foreach { case (p, v) =>
            it.msg(1) { c =>
              c.bytesField(1, exprBytes(p, input, fns))
              c.bytesField(2, exprBytes(v, input, fns))
            }
          }
          it.bytesField(2, exprBytes(els, input, fns))
        }
      case In(v, list) if list.forall(_.isInstanceOf[Literal]) =>
        w.msg(8) { sl => // Expression.singular_or_list = 8 {value=1, options=2}
          sl.bytesField(1, exprBytes(v, input, fns))
          list.foreach(o => sl.bytesField(2, exprBytes(o, input, fns)))
        }
      case InSet(v, hset) =>
        // the optimizer's large-IN form; re-literalize in sorted order so
        // produced bytes are deterministic for the fuzz corpora
        val lits = hset.toSeq.map(x => Literal.create(x, v.dataType))
          .sortBy(_.toString)
        w.msg(8) { sl =>
          sl.bytesField(1, exprBytes(v, input, fns))
          lits.foreach(o => sl.bytesField(2, exprBytes(o, input, fns)))
        }
      // only `concat` from functions_string.yaml: Acero 16 (the
      // differential engine) has no conversion for upper/lower — an
      // unexecutable mapping would ship unverified bytes
      case c: Concat => scalarFn(w, FString, "concat", c.dataType, c.children, input, fns)
      case other => throw SubstraitUnsupported(s"expression ${other.prettyName}")
    }
    w.bytes
  }

  private def scalarFn(w: ProtoWriter, uri: String, name: String, out: DataType,
      args: Seq[Expression], input: Seq[Attribute], fns: FnRegistry): Unit =
    w.msg(3) { fn => // Expression.scalar_function = 3
      fn.int(1, fns.ref(uri, name).toLong) // function_reference
      fn.bytesField(3, typeBytes(out, nullable = true)) // output_type
      args.foreach(a => // arguments=4 {value=3}
        fn.msg(4)(_.bytesField(3, exprBytes(a, input, fns))))
    }

  // ----------------------------------------------------------------- types

  /** Type message bytes; oneof arm numbers from type.proto, each arm
    * carrying {nullability = 2} (NULLABLE=1, REQUIRED=2). */
  private def typeBytes(dt: DataType, nullable: Boolean): Array[Byte] = {
    val arm = dt match {
      case BooleanType => 1
      case IntegerType => 5
      case LongType => 7
      case FloatType => 10
      case DoubleType => 11
      case _: StringType => 12
      case BinaryType => 13
      case DateType => 16
      case other => throw SubstraitUnsupported(s"type ${other.simpleString}")
    }
    val w = new ProtoWriter
    w.msg(arm)(_.int(2, if (nullable) 1L else 2L))
    w.bytes
  }

  private def direction(so: SortOrder): Int = (so.direction, so.nullOrdering) match {
    case (Ascending, NullsFirst) => 1
    case (Ascending, NullsLast) => 2
    case (Descending, NullsFirst) => 3
    case (Descending, NullsLast) => 4
  }
}
