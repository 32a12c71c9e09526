package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Engine-portable string hash for the sketch pipelines (MinHash / SimHash
  * shingle and token bases).
  *
  * `hash63(s)` = fmix64(poly257(bytes(s))) >>> 1:
  *  - polynomial accumulation base 257 mod 2^64 over the UTF-8 bytes
  *    (the same Karp-Rabin base the winnowing fingerprint uses, unmasked);
  *  - the MurmurHash3 64-bit finalizer (public-domain avalanche constants)
  *    so every output bit depends on every input byte — the property
  *    SimHash's per-bit votes and MinHash's mod-P ordering rely on, which
  *    the raw polynomial lacks in its low bits;
  *  - a final >>> 1 clears the sign bit, so the value is the SAME
  *    nonnegative integer in any engine regardless of signed/unsigned
  *    64-bit convention, and plain `%` equals floored/unsigned mod
  *    everywhere downstream.
  *
  * This replaces the previous xxhash64 basis: identical sketch quality for
  * this purpose, but any engine with 64-bit integers can re-derive the
  * exact signatures in plain SQL (DuckDB recomputes them with
  * list_reduce + 128-bit staging — see the sketch-family oracles in
  * [[graft.operators.TextPipeline]]), which turns the whole dedup pipeline
  * from "trust the spec" into driver-verified. The reference's own dedup
  * uses an engine-internal hash; portability across engines is an
  * improvement a federation-oriented engine actually wants — a remote
  * engine can compute signatures next to the data.
  */
object PortableHash {
  final val PolyB = 257L
  /** FNV-1 64-bit prime — the signature-fold multiplier for band buckets. */
  final val FoldP = 1099511628211L

  /** MurmurHash3 fmix64 finalizer (wrapping 64-bit arithmetic). */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33); h
  }

  /** 63-bit portable hash of a byte string; always nonnegative. */
  def hash63(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * PolyB + (bytes(i) & 0xff); i += 1 }
    fmix64(h) >>> 1
  }

  def hash63(s: org.apache.spark.unsafe.types.UTF8String): Long =
    hash63(s.getBytes)
}

/** `graft_porthash63(string)` → 63-bit nonnegative portable hash. */
final case class PortHash63(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PortableHash.hash63(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PortableHash.hash63($s);")

  override protected def withNewChildInternal(newChild: Expression): PortHash63 =
    copy(child = newChild)
}

/** `graft_fmix63(bigint)` → fmix64 finalizer with the sign bit cleared:
  * the portable integer hash (deterministic sampling, bucket keys).
  * Inline wrapping-long arithmetic — far cheaper than the md5-of-concat
  * string hash it replaces in TABLESAMPLE (no per-row string allocation
  * or digest), and any engine re-derives it with 128-bit staging. */
final case class Fmix63(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PortableHash.fmix64(input.asInstanceOf[Long]) >>> 1

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PortableHash.fmix64($v) >>> 1;")

  override protected def withNewChildInternal(newChild: Expression): Fmix63 =
    copy(child = newChild)
}

/** `graft_porthash_arr(array<string>)` → `array<long>`: hash63 of every
  * element, one fused loop (replaces `transform(arr, w -> hash(w))`, which
  * is CodegenFallback with per-element lambda dispatch). Null elements
  * hash to 0. */
final case class PortHashArr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = PortableHash.hash63(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("portHashArr", this, classOf[PortHashArr].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): PortHashArr =
    copy(child = newChild)
}
