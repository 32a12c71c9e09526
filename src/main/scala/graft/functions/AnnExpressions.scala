package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expressions for the ANN pipelines ([[graft.operators.Similarity]]).
  *
  * The constant centroid / hyperplane matrices used to be inlined as
  * `array(0.13D, -0.87D, ...)` literals — 8-16 vectors x 64 components,
  * each repeated per comparison — which made the expression tree (and the
  * generated Java) enormous: most of the per-query second went to codegen
  * compilation, and at cluster scale every task would deserialize that
  * tree. Here the matrix rides along as ONE reference object per
  * expression; codegen emits a single virtual call per row and the O(k*dim)
  * arithmetic runs in a tight JVM loop.
  *
  * All dot products widen each element to double before multiplying —
  * bit-identical to `CAST(x AS DOUBLE)` per element, so results match the
  * previous literal-array formulation and the DuckDB oracle exactly. Inputs
  * may be `array<float>` or `array<double>`; the float path avoids
  * materializing a doubled copy of every embedding (half the bytes through
  * scan and shuffle).
  *
  * Reference capability this extends: vector scoring for the training-data
  * extension set (SURVEY.md §2.2 names DataFusion's scalar library as the
  * function surface; these are additive).
  */
private[functions] trait VecInput { self: UnaryExpression =>
  /** True when the child array's elements are floats (else doubles). */
  @transient protected lazy val floatIn: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected final def elem(a: ArrayData, i: Int): Double =
    if (floatIn) a.getFloat(i).toDouble else a.getDouble(i)
}

/** argmax over `cents` of dot(v, c_i); ties resolve to the HIGHER index —
  * the same total order as `array_max(array(struct(d_0, 0), ...)).i`, the
  * composed form this replaces. */
final case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression with VecInput {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  def compute(input: Any): Int = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0; var bestD = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0; var i = 0
      while (i < n) { d += elem(v, i) * cent(i); i += 1 }
      if (d >= bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("nearCentroid", this, classOf[NearestCentroid].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Indexes of the `nprobe` centroids nearest to `v`, best first; ties
  * resolve to the LOWER index — the order of
  * `transform(slice(array_sort(array(struct(-d_i, i)...)), 1, nprobe), e -> e.i)`,
  * the composed form this replaces. */
final case class TopCentroids(child: Expression, cents: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression with VecInput {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val v = input.asInstanceOf[ArrayData]
    val k = cents.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0; var i = 0
      while (i < n) { d += elem(v, i) * cent(i); i += 1 }
      dots(c) = d
      c += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1; var bestD = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        // `best < 0` adopts the first untaken index even when every dot is
        // NaN (corrupt embedding): NaN > x is always false, which would
        // otherwise leave best = -1 and crash taken(best) below.
        if (!taken(j) && (best < 0 || dots(j) > bestD)) { bestD = dots(j); best = j }
        j += 1
      }
      taken(best) = true; out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("topCentroids", this, classOf[TopCentroids].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

/** Random-hyperplane band keys: output[b] packs `planesPerBand` sign bits,
  * bit j = 1 iff dot(v, planes[b*planesPerBand + j]) > 0 — identical to the
  * `CASE WHEN graft_dot(v, <literal>) > 0 THEN 1<<j ELSE 0` sum chain it
  * replaces. */
final case class HyperplaneBands(child: Expression, planes: Array[Array[Double]],
    bands: Int, planesPerBand: Int) extends UnaryExpression with VecInput {
  require(planes.length == bands * planesPerBand)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < planesPerBand) {
        val p = planes(b * planesPerBand + j)
        val n = math.min(v.numElements(), p.length)
        var d = 0.0; var i = 0
        while (i < n) { d += elem(v, i) * p(i); i += 1 }
        if (d > 0) key |= (1L << j)
        j += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("hyperBands", this, classOf[HyperplaneBands].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

/** RMS energy of a binary chunk's bytes around `center`:
  * sqrt(Σ (b_i - center)² / n). The audio feature kernel of
  * `m_audio_energy`, fused into one codegen'd loop — value-identical to
  * the `aggregate(sequence(...), ... pow(ascii(substring(chunk, p, 1)) -
  * center, 2) ...)` higher-order form it replaces (same index-order
  * summation; for ASCII payloads byte == char code), which is
  * CodegenFallback and pays per-position lambda dispatch plus a substring
  * allocation. Null for an empty chunk. */
final case class ByteEnergy(child: Expression, center: Double)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length == 0) return null
    var acc = 0.0
    var i = 0
    while (i < b.length) {
      val d = (b(i) & 0xff) - center
      acc += d * d
      i += 1
    }
    math.sqrt(acc / b.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($b.length == 0) { ${ev.isNull} = true; } else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $b.length; $i++) {
         |    double $d = ($b[$i] & 0xff) - $center;
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($acc / $b.length);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteEnergy =
    copy(child = newChild)
}

/** Integer energy of a binary chunk: Σ (b_i - center)² as a BIGINT —
  * the exact-arithmetic sibling of [[ByteEnergy]] for operators whose
  * cross-engine contract THRESHOLDS the energy (`m_audio_vad`): a
  * voiced/unvoiced decision on a double rms is one summation-order ULP
  * away from flipping, on an integer sum it cannot. Empty chunk → 0. */
final case class ByteSsq(child: Expression, center: Int)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var acc = 0L
    var i = 0
    while (i < b.length) {
      val d = (b(i) & 0xff) - center
      acc += d.toLong * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  long $d = ($b[$i] & 0xff) - $center;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteSsq =
    copy(child = newChild)
}

/** `target` evenly spaced bytes of a binary payload: output[i] =
  * payload[⌊i·n/target⌋] — the resize-stub kernel of `m_resize`, fused
  * into one codegen'd loop so the whole pipeline stays inside whole-stage
  * codegen (the previous `mapPartitions` formulation broke codegen and
  * pushdown at the encoder boundary). Empty payload ⇒ empty result.
  * DuckDB re-derives the same positions with
  * `list_transform(range(0, target), i -> i * n // target)`. */
final case class ByteSample(child: Expression, target: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  def compute(input: Array[Byte]): Array[Byte] = {
    val n = input.length
    if (n == 0) return Array.emptyByteArray
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) {
      out(i) = input((i.toLong * n / target).toInt)
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val ref = ctx.addReferenceObj("byteSample", this, classOf[ByteSample].getName)
      s"${ev.value} = $ref.compute($b);"
    })

  override protected def withNewChildInternal(newChild: Expression): ByteSample =
    copy(child = newChild)
}

/** 63-bit perceptual hash of a binary payload (the average-hash family —
  * aHash in the pHash literature): sample 63 evenly spaced bytes
  * (`payload[⌊i·n/63⌋]`, the ByteSample positions), and set bit `i` when
  * sample `i` exceeds the sample mean. The mean test is pure integer
  * arithmetic (`b_i · 63 > Σ b`) so any engine reproduces the bit pattern
  * exactly; 63 bits keep the result non-negative, which DuckDB's BIGINT
  * bit-shift arithmetic re-derives without sign traps. Near-identical
  * payloads differ in few sampled bytes ⇒ small Hamming distance; the
  * pair-generation query bands the hash the same way SimHash is banded.
  * Empty payload ⇒ 0. */
final case class PHash63(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  def compute(input: Array[Byte]): Long = {
    val n = input.length
    if (n == 0) return 0L
    val samples = new Array[Int](63)
    var sum = 0L
    var i = 0
    while (i < 63) {
      val b = input((i.toLong * n / 63).toInt) & 0xff
      samples(i) = b
      sum += b
      i += 1
    }
    var h = 0L
    i = 0
    while (i < 63) {
      if (samples(i) * 63L > sum) h |= 1L << i
      i += 1
    }
    h
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val ref = ctx.addReferenceObj("pHash63", this, classOf[PHash63].getName)
      s"${ev.value} = $ref.compute($b);"
    })

  override protected def withNewChildInternal(newChild: Expression): PHash63 =
    copy(child = newChild)
}

/** Product-quantization codes: the vector is L2-normalized in-register,
  * split into `cents.length` contiguous subvectors, and each subvector is
  * assigned its nearest sub-codebook centroid by squared L2 distance
  * (ties → lower code, the deterministic convention). `cents(j)(c)` is
  * centroid `c` of subspace `j`; all sub-codebooks share one reference
  * object, so the expression tree stays constant-size however many
  * centroids are configured (the NearestCentroid discipline). Output is
  * `array<int>` of m codes — at 100 TB the corpus index is m bytes-ish
  * per vector instead of 4·dim, which is the entire point of PQ
  * (Jégou, Douze, Schmid 2011). */
final case class PqEncode(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression with VecInput {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = cents.length
    val subdim = if (m > 0 && cents(0).nonEmpty) cents(0)(0).length else 0
    var nrm2 = 0.0
    var i = 0
    while (i < n) { val x = elem(v, i); nrm2 += x * x; i += 1 }
    val inv = if (nrm2 > 0) 1.0 / math.sqrt(nrm2) else 0.0
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * subdim
      val book = cents(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d2 = 0.0
        var t = 0
        while (t < subdim) {
          val x = (if (base + t < n) elem(v, base + t) * inv else 0.0) - cent(t)
          d2 += x * x
          t += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric-distance lookup table for a PQ query: output[j·k + c] =
  * ‖u_j − cents(j)(c)‖² over the L2-normalized query u. Computed ONCE per
  * query row (O(k·dim)), so scoring a corpus vector against the query is
  * m array reads ([[PqAdc]]) instead of a dim-length float loop — the
  * ADC trick that makes flat-PQ scans memory-bound rather than
  * compute-bound. */
final case class PqLut(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression with VecInput {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = cents.length
    val k = if (m > 0) cents(0).length else 0
    val subdim = if (m > 0 && k > 0) cents(0)(0).length else 0
    var nrm2 = 0.0
    var i = 0
    while (i < n) { val x = elem(v, i); nrm2 += x * x; i += 1 }
    val inv = if (nrm2 > 0) 1.0 / math.sqrt(nrm2) else 0.0
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      val base = j * subdim
      val book = cents(j)
      var c = 0
      while (c < k) {
        val cent = book(c)
        var d2 = 0.0
        var t = 0
        while (t < subdim) {
          val x = (if (base + t < n) elem(v, base + t) * inv else 0.0) - cent(t)
          d2 += x * x
          t += 1
        }
        out(j * k + c) = d2
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** ADC distance: Σ_j lut[j·k + codes[j]] — the per-(query, corpus-vector)
  * kernel of the PQ scan. `left` = the query's [[PqLut]] table, `right` =
  * the corpus vector's [[PqEncode]] codes; m array reads per pair. */
final case class PqAdc(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  def compute(l: Any, r: Any): Double = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    // fail fast on a k that disagrees with the LUT the query built —
    // silently skipping out-of-range entries would collapse distances
    // to the surviving subspaces and return garbage rankings
    if (m.toLong * k != lut.numElements())
      throw new IllegalStateException(
        s"graft_pq_adc: LUT has ${lut.numElements()} entries for $m " +
          s"subspaces × k=$k — codebook size mismatch")
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += lut.getDouble(j * k + codes.getInt(j))
      j += 1
    }
    acc
  }

  override def nullSafeEval(l: Any, r: Any): Any = compute(l, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
      s"${ev.value} = $ref.compute($l, $r);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
}

/** LSH band buckets over a MinHash signature (`array<long>`): output[b] =
  * low 32 bits of fmix63(FNV-fold of signature rows
  * [b*rowsPerBand, (b+1)*rowsPerBand)) — the portable-combine analog of
  * `transform(sequence(0, bands-1), b -> hash(slice(sig, b*rows+1, rows)))`
  * (equivalence with an independent reimplementation asserted by spec),
  * minus the interpreted lambda and per-band slice allocations. Uses
  * [[PortableHash]] so an external engine can re-derive the exact bucket
  * partition (the LSH-pairs oracle does, in DuckDB SQL). */
final case class MinHashBandBuckets(child: Expression, bands: Int,
    rowsPerBand: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val sig = input.asInstanceOf[ArrayData]
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var h = 0L
      var j = 0
      while (j < rowsPerBand) {
        val idx = b * rowsPerBand + j
        if (idx < sig.numElements()) {
          h = h * PortableHash.FoldP + sig.getLong(idx)
        }
        j += 1
      }
      out(b) = ((PortableHash.fmix64(h) >>> 1) % 4294967296L).toInt
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sig => {
      val ref = ctx.addReferenceObj("bandBuckets", this, classOf[MinHashBandBuckets].getName)
      s"${ev.value} = $ref.compute($sig);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBandBuckets =
    copy(child = newChild)
}
