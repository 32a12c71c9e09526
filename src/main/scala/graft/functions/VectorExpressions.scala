package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<double>` /
  * `array<float>` embedding columns.
  *
  * The composable form (`aggregate(zip_with(a, b, ...), ...)`) allocates an
  * intermediate array per row and evaluates a lambda per element; this
  * expression generates a tight fused loop instead — the difference between
  * O(rows·dim) arithmetic and O(rows·dim) allocation+dispatch. At 100 TB of
  * embeddings the scoring loop IS the workload, so it must be a real loop.
  *
  * Summation is sequential in index order, bit-identical to the
  * `aggregate()` fold it replaces (keeps the DuckDB oracle exact).
  *
  * Reference capability this extends: the engine's function surface is
  * DataFusion's scalar library (SURVEY.md §2.2); vector ops are part of
  * the training-data extension set.
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float|double> (AbstractDataType is private[sql], so
  // the contract is enforced by the registering wrapper, not
  // ExpectsInputTypes). Float elements widen to double before multiplying —
  // bit-identical to a per-element CAST(x AS DOUBLE), without materializing
  // the doubled array.
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val lFloat = isFloat(left)
  @transient private lazy val rFloat = isFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val ax = if (lFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val bx = if (rFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $ax * $bx;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) with the norm product guarded against zero vectors. */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val lFloat = isFloat(left)
  @transient private lazy val rFloat = isFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      val ax = if (lFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val bx = if (rFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $ax; double $y = $bx;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two 64-bit signatures (SimHash rerank). */
final case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)
}

/** 32-bit SimHash over an `array<long>` of per-token hashes.
  *
  * Replaces the `aggregate(hashes, array_repeat(0L, 32), zip_with(...))`
  * formulation: higher-order functions are CodegenFallback in Spark, so
  * that form pays lambda dispatch + two intermediate arrays *per token per
  * row*. This is one fused loop inside whole-stage codegen — semantics
  * bit-identical (bit i counts +1 when bit i of the token hash is set,
  * else -1; output bit i set when the count is positive).
  */
final case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](32)
    var k = 0
    val n = hs.numElements()
    while (k < n) {
      val h = hs.getLong(k)
      var i = 0
      while (i < 32) {
        if (((h >>> i) & 1L) != 0L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      k += 1
    }
    var sim = 0L
    var i = 0
    while (i < 32) { if (counts(i) > 0) sim |= (1L << i); i += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val counts = ctx.freshName("counts"); val n = ctx.freshName("n")
      val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val sim = ctx.freshName("sim")
      s"""
         |int[] $counts = new int[32];
         |int $n = $hs.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $hs.getLong($k);
         |  for (int $i = 0; $i < 32; $i++) {
         |    $counts[$i] += (($h >>> $i) & 1L) != 0L ? 1 : -1;
         |  }
         |}
         |long $sim = 0L;
         |for (int $i = 0; $i < 32; $i++) {
         |  if ($counts[$i] > 0) $sim |= (1L << $i);
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** MinHash signature: for base hashes `bh` (each in [0, P)), signature
  * element j = min over h of (h * a_j + b_j) mod P. One fused loop, one
  * output allocation — replaces 32 interpreted `array_min(transform(...))`
  * expressions (each allocating an intermediate array per row). Products
  * stay < 2^62 (h < 2^31, a_j < 2^31), so plain `%` == pmod here.
  * Returns null for an empty input (the `array_min(empty)` analog).
  */
final case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {
  require(as.length == bs.length)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bh = input.asInstanceOf[ArrayData]
    val n = bh.numElements()
    if (n == 0) return null
    val m = as.length
    val mins = Array.fill(m)(Long.MaxValue)
    var k = 0
    while (k < n) {
      val h = bh.getLong(k)
      var j = 0
      while (j < m) {
        val v = (h * as(j) + bs(j)) % VectorFunctions.MinHashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      k += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bh => {
      val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val mins = ctx.freshName("mins"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $bh.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  int $m = $aRef.length;
         |  long[] $mins = new long[$m];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $k = 0; $k < $n; $k++) {
         |    long $h = $bh.getLong($k);
         |    for (int $j = 0; $j < $m; $j++) {
         |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${VectorFunctions.MinHashP}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Hashed 3-word shingles: for `words` (array<string>) emit
  * `graft_porthash63(concat_ws(' ', w_i, w_i+1, w_i+2)) % P` for every
  * position i (the whole text as one shingle when fewer than 3 words).
  *
  * Value-identical to the composed
  * `transform(sequence(...), i -> porthash63(concat_ws(...)) % P)`
  * pipeline it replaces (asserted by spec) — but that form is interpreted:
  * higher-order lambdas are CodegenFallback, paying per-shingle dispatch
  * plus intermediate array allocations. The portable basis hash keeps the
  * whole MinHash pipeline re-derivable in any engine (see
  * [[PortableHash]]). Output is a multiset (no distinct): MinHash minima
  * are duplicate-insensitive, and set consumers apply `array_distinct` to
  * the (small) hash array instead of to shingle strings.
  */
final case class ShingleHash3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** Shared by eval + codegen (one virtual call per row, loops inside). */
  def compute(input: Any): ArrayData = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    if (n < 3) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = ws.getUTF8String(i); i += 1 }
      val joined = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
      new GenericArrayData(Array(
        PortableHash.hash63(joined) % VectorFunctions.MinHashP))
    } else {
      val out = new Array[Long](n - 2)
      var i = 0
      while (i < n - 2) {
        val s = org.apache.spark.unsafe.types.UTF8String.concatWs(space,
          ws.getUTF8String(i), ws.getUTF8String(i + 1), ws.getUTF8String(i + 2))
        out(i) = PortableHash.hash63(s) % VectorFunctions.MinHashP
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ws => {
      val ref = ctx.addReferenceObj("shingleExpr", this, classOf[ShingleHash3].getName)
      s"${ev.value} = $ref.compute($ws);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHash3 =
    copy(child = newChild)
}

/** Multiset membership count: elements of `left` (array<string>) found in
  * `right` (array<string>, typically a constant marker-word list).
  * Duplicates in `left` count each time — identical to
  * `size(filter(arr, w -> w IN (...)))`, minus the per-element lambda
  * dispatch and the 8-way OR chain. When `right` is foldable (the normal
  * case) the lookup set is built once per expression instance.
  */
final case class CountIn(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val staticSet: java.util.HashSet[Any] = {
    val s = new java.util.HashSet[Any]()
    if (right.foldable) {
      val arr = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        s.add(arr.getUTF8String(i)); i += 1
      }
    }
    s
  }

  private def toSet(r: Any): java.util.HashSet[Any] =
    if (right.foldable) staticSet
    else {
      val s = new java.util.HashSet[Any]()
      val arr = r.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) { s.add(arr.getUTF8String(i)); i += 1 }
      s
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val set = toSet(r)
    val arr = l.asInstanceOf[ArrayData]
    var n = 0; var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val setRef = ctx.addReferenceObj("countInExpr", this, classOf[CountIn].getName)
      if (right.foldable) {
        val arr = ctx.freshName("arr"); val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $arr = $l;
           |int $n = 0;
           |for (int $i = 0; $i < $arr.numElements(); $i++) {
           |  if (!$arr.isNullAt($i) && $setRef.staticContains($arr.getUTF8String($i))) $n++;
           |}
           |${ev.value} = $n;
         """.stripMargin
      } else s"${ev.value} = $setRef.dynCount($l, $r);"
    })

  /** Codegen entry points. */
  def staticContains(s: Any): Boolean = staticSet.contains(s)
  def dynCount(l: Any, r: Any): Int = nullSafeEval(l, r).asInstanceOf[Int]

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountIn =
    copy(left = newLeft, right = newRight)
}

/** Fused text normalization: lowercase, strip every char outside
  * `[a-z0-9 ]`, squash space runs, trim — one pass, one allocation.
  *
  * Value-identical (spec-asserted on the corpus, incl. non-ASCII docs) to
  * `trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''),
  * ' +', ' '))`, which costs two regex traversals plus three intermediate
  * strings per row and dominates every normalized-text pipeline's scan
  * stage. Byte-level filtering is safe because after `toLowerCase` every
  * byte of a multi-byte UTF-8 char is ≥ 0x80 — dropping those bytes drops
  * exactly the chars the regex removes.
  */
final case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  def compute(input: Any): org.apache.spark.unsafe.types.UTF8String = {
    val lowered = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase
    val b = lowered.getBytes
    val out = new Array[Byte](b.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = c; n += 1
      } else if (c == ' ') {
        pendingSpace = true // emitted only if more kept chars follow
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out, 0, n)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("normExpr", this, classOf[NormalizeText].getName)
      s"${ev.value} = $ref.compute($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Winnowed rolling-hash document fingerprints (the MOSS scheme:
  * Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003).
  *
  * Karp-Rabin rolling hash over UTF-8 bytes: h_i covers the k-byte window
  * starting at i, h = Σ b[i+j]·B^(k-1-j) masked to 31 bits (B = 257).
  * Winnowing then keeps, for every window of `w` consecutive hashes, the
  * RIGHTMOST minimal hash — guaranteeing any match of length ≥ w+k-1 shares
  * a fingerprint while keeping fingerprint density ~2/(w+1). Output is the
  * sorted distinct selected hashes.
  *
  * One fused pass per row, no per-window rescans (sliding-minimum deque).
  * Texts shorter than k yield a single whole-text hash.
  */
final case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private final val B = 257L
  private final val Mask = 0x7fffffffL

  def compute(input: Any): ArrayData = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + (bytes(i) & 0xff)) & Mask; i += 1 }
      return new GenericArrayData(Array(h))
    }
    // rolling hashes, 31-bit masked; B^(k-1) mod 2^31 for the remove term
    var bk = 1L
    var e = 0
    while (e < k - 1) { bk = (bk * B) & Mask; e += 1 }
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xff)) & Mask; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (((h - ((bytes(i - 1) & 0xff) * bk & Mask) + (Mask + 1)) & Mask) * B
        + (bytes(i + k - 1) & 0xff)) & Mask
      hs(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each w-window via a sliding-min deque
    // holding indices with strictly increasing hash values; on ties the
    // LATER index wins (rightmost-minimal rule), so pops use >=
    val sel = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) sel.add(hs(deque(head)))
      i += 1
    }
    if (sel.isEmpty) sel.add(hs(deque(head))) // m < w: whole-text window
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowFingerprint].getName)
      s"${ev.value} = $ref.compute($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Per-document repetition statistics over the word array, one fused
  * pass: output = [n_distinct_words, top_bigram_count, n_bigrams]. The
  * composed form (explode bigrams → groupBy(doc, gram) → groupBy(doc))
  * shuffles every bigram STRING in the corpus twice; each document's
  * statistics only ever depend on its own words, so this is map-only
  * work — at 100 TB the difference between scan-bandwidth scaling and a
  * corpus-sized string shuffle. Cross-engine parity is unaffected: the
  * counts are over exact gram strings either way. */
/** BPE token count of a word array under a fixed ordered merge table:
  * each word segments as characters + the `_` end-of-word symbol, every
  * merge (w1, w2) applies greedily left-to-right (replace the last
  * emitted symbol when it equals w1 and the current symbol equals w2 —
  * identical semantics to the string fold the trainer and the DuckDB
  * oracle use), and the result is the summed token count over all
  * non-empty words. The merge table rides as ONE reference object (the
  * NearestCentroid discipline); per-row work is
  * O(word-length · merges) in a tight loop — the corpus-wide encode
  * stays map-only and codegen'd while training happens once on the
  * vocabulary. */
final case class BpeTokenCount(child: Expression,
    merges: Array[Array[String]]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  def compute(input: Any): Long = {
    val ws = input.asInstanceOf[ArrayData]
    var total = 0L
    var i = 0
    while (i < ws.numElements()) {
      val w = if (ws.isNullAt(i)) "" else ws.getUTF8String(i).toString
      if (w.nonEmpty) {
        var symbols = new Array[String](w.length + 1)
        var j = 0
        while (j < w.length) { symbols(j) = String.valueOf(w.charAt(j)); j += 1 }
        symbols(w.length) = "_"
        var m = 0
        while (m < merges.length) {
          val w1 = merges(m)(0); val w2 = merges(m)(1)
          val out = new Array[String](symbols.length)
          var k = 0
          var s = 0
          while (s < symbols.length) {
            val x = symbols(s)
            if (k > 0 && out(k - 1) == w1 && x == w2) out(k - 1) = w1 + w2
            else { out(k) = x; k += 1 }
            s += 1
          }
          symbols = java.util.Arrays.copyOf(out, k)
          m += 1
        }
        total += symbols.length
      }
      i += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ws => {
      val ref = ctx.addReferenceObj("bpeCount", this, classOf[BpeTokenCount].getName)
      s"${ev.value} = $ref.compute($ws);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

final case class GramStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val distinct = new java.util.HashSet[Any]()
    var i = 0
    while (i < n) { distinct.add(ws.getUTF8String(i)); i += 1 }
    var top = 0
    if (n >= 2) {
      val counts = new java.util.HashMap[Any, Int]()
      val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      i = 0
      while (i < n - 1) {
        val gram = org.apache.spark.unsafe.types.UTF8String.concatWs(space,
          ws.getUTF8String(i), ws.getUTF8String(i + 1))
        val c = counts.merge(gram, 1, (a, b) => a + b)
        if (c > top) top = c
        i += 1
      }
    }
    new GenericArrayData(Array(distinct.size.toLong, top.toLong,
      math.max(n - 1, 0).toLong))
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("gramStats", this, classOf[GramStats].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

/** `graft_gram_hashes(array<string>, n)` → `array<long>`: the DISTINCT
  * 63-bit portable hashes of every space-joined n-gram, first-occurrence
  * order, in one fused pass. Each value equals
  * `graft_porthash63(concat_ws(' ', slice(words, i, n)))` — the polynomial
  * runs straight across the gram's words with the joining space folded in,
  * no gram string is ever materialized. Replaces the
  * `array_distinct(transform(sequence(...), i -> md5(concat_ws(...))))`
  * shape, which is CodegenFallback (per-gram lambda dispatch) and
  * allocates a 32-char hex string per gram; downstream joins ship 8-byte
  * longs instead of those strings. */
final case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val ws = input.asInstanceOf[ArrayData]
    val m = ws.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](m - n + 1)
    var k = 0
    var i = 0
    while (i <= m - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        val b =
          if (ws.isNullAt(i + j)) Array.emptyByteArray
          else ws.getUTF8String(i + j).getBytes
        var p = 0
        while (p < b.length) { h = h * PortableHash.PolyB + (b(p) & 0xff); p += 1 }
        if (j < n - 1) h = h * PortableHash.PolyB + ' '.toInt
        j += 1
      }
      val hv = PortableHash.fmix64(h) >>> 1
      if (seen.add(hv)) { out(k) = hv; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** `graft_ordered_pairs(array<long>)` → `array<struct<u,v>>`: every
  * ordered pair (u < v in value order) of the input's DISTINCT elements
  * (repeated values are compacted after the sort, so the strict u < v
  * contract holds on any input — no self-loops, no duplicate pairs) — the
  * per-gram candidate-pair expansion of the near-dup graph derivation
  * (d_dup_pagerank). One tight sorted double loop per row, embedded in
  * whole-stage codegen; the nested higher-order
  * `flatten(transform(…, transform(slice(…))))` formulation it replaces
  * is CodegenFallback with per-element lambda dispatch and nested array
  * allocation — ~2× slower at the 50× probe scale. Callers cap input
  * sizes upstream (df ≤ 64 ⇒ ≤ 2016 pairs). */
final case class OrderedPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("u", LongType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val ds = input.asInstanceOf[ArrayData]
    val n = ds.numElements()
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) { vals(i) = ds.getLong(i); i += 1 }
    java.util.Arrays.sort(vals)
    // compact duplicates in place so the double loop honors the STRICT
    // u < v contract even on non-deduped input (repeated values would
    // otherwise emit (x, x) self-loops and duplicate pairs)
    var m = 0
    i = 0
    while (i < n) {
      if (m == 0 || vals(i) != vals(m - 1)) { vals(m) = vals(i); m += 1 }
      i += 1
    }
    val out = new Array[Any](m * (m - 1) / 2)
    var k = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(vals(i), vals(j))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("orderedPairs", this,
        classOf[OrderedPairs].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

/** `graft_collect_capped(bigint, cap)` → `array<long>`: `collect_list`
  * with a hard per-group element cap enforced INSIDE the aggregation
  * buffer — update stops appending once the buffer holds `cap` elements
  * and merge tops out at `cap`, so a partial buffer is never larger than
  * `cap` longs (~8·cap bytes) no matter how hot the group is.
  *
  * Exactness contract: the result is `min(count, cap)` elements, so a
  * caller filtering `size(xs) BETWEEN lo AND hi` with `hi < cap` gets
  * EXACTLY the uncapped semantics — groups with `count ≤ hi` were never
  * capped (their full list survives), and groups with `count > hi`
  * saturate at `cap > hi` and are dropped by the same predicate. This is
  * the skew-proof form of the d_dup_pagerank gram filter: a boilerplate
  * gram shared by millions of documents costs 65 longs per partial
  * buffer instead of one multi-GB list in a single final-aggregation
  * task. Element order is partition-dependent, exactly like
  * `collect_list` — downstream [[OrderedPairs]] sorts and dedupes.
  *
  * NOT distinct-capped: duplicates count toward the cap. Callers whose
  * input can repeat a value per group (the gram relation cannot —
  * [[GramHashes]] dedupes per document) must dedupe upstream. */
final case class CollectCappedLongs(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(cap >= 1, "cap must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty[Long]

  override def update(
      buf: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    if (buf.length < cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(
      buf: scala.collection.mutable.ArrayBuffer[Long],
      other: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (buf.length < cap && i < other.length) { buf += other(i); i += 1 }
    buf
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { out += bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCappedLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCappedLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCappedLongs =
    copy(child = newChild)
}

/** `graft_gram_pos_hashes(array<string>, n)` → `array<long>`: the 63-bit
  * portable hash of the n-gram starting at EVERY position, index i = the
  * gram over words i..i+n-1 (0-based, NOT deduplicated — the positional
  * twin of [[GramHashes]]). `posexplode` over the result yields the
  * (position, gram) relation that substring-level span detection needs:
  * where [[GramHashes]] answers "which grams does this doc contain",
  * this answers "which gram sits at each offset". Same fused polynomial
  * as GramHashes — hash values are interchangeable between the two. */
final case class GramPosHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: Any): ArrayData = {
    val ws = input.asInstanceOf[ArrayData]
    val m = ws.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        val b =
          if (ws.isNullAt(i + j)) Array.emptyByteArray
          else ws.getUTF8String(i + j).getBytes
        var p = 0
        while (p < b.length) { h = h * PortableHash.PolyB + (b(p) & 0xff); p += 1 }
        if (j < n - 1) h = h * PortableHash.PolyB + ' '.toInt
        j += 1
      }
      out(i) = PortableHash.fmix64(h) >>> 1
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("gramPosHashes", this,
        classOf[GramPosHashes].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): GramPosHashes =
    copy(child = newChild)
}

object VectorFunctions {

  /** MinHash modulus: 2^31 - 1 (Mersenne prime). */
  val MinHashP: Long = 2147483647L

  /** The 32 (a, b) permutation constants for `graft_minhash32`.
    * Deterministic seed — signatures are stable across runs and sessions. */
  val minhashPerms: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    Seq.fill(32)((rng.nextInt(Int.MaxValue - 1).toLong + 1, rng.nextInt(Int.MaxValue).toLong))
  }

  private val permA: Array[Long] = minhashPerms.map(_._1).toArray
  private val permB: Array[Long] = minhashPerms.map(_._2).toArray

  /** Sessions whose registry already holds the graft functions (weak so a
    * stopped session doesn't pin its state). Registration is
    * createOrReplace, so this guard is purely log hygiene: every
    * re-registration emitted a SimpleFunctionRegistry "replaced a
    * previously registered function" warning per function per query. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register the graft functions in the session's function registry so
    * SQL and `expr(...)` can use them. Idempotent and once per session. */
  def register(spark: SparkSession): Unit = {
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) != null) return
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_hamming64",
      es => Hamming64(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash32",
      es => SimHash32(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash32",
      es => MinHashSig(es.head, permA, permB), "built-in")
    reg.createOrReplaceTempFunction("graft_count_in",
      es => CountIn(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle3",
      es => ShingleHash3(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_winnow",
      es => WinnowFingerprint(es.head, k = 8, w = 16), "built-in")
    reg.createOrReplaceTempFunction("graft_byte_energy",
      es => ByteEnergy(es.head, center = 96.0), "built-in")
    reg.createOrReplaceTempFunction("graft_byte_ssq",
      es => ByteSsq(es.head, center = 96), "built-in")
    reg.createOrReplaceTempFunction("graft_byte_sample",
      es => ByteSample(es.head, target = 16), "built-in")
    reg.createOrReplaceTempFunction("graft_phash63",
      es => PHash63(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_norm",
      es => NormalizeText(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_porthash63",
      es => PortHash63(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_porthash_arr",
      es => PortHashArr(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_fmix63",
      es => Fmix63(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_gram_stats",
      es => GramStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_gram_hashes",
      es => GramHashes(es.head, gramSizeLiteral(es(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_gram_pos_hashes",
      es => GramPosHashes(es.head, gramSizeLiteral(es(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_ordered_pairs",
      es => OrderedPairs(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_collect_capped",
      es => CollectCappedLongs(es.head,
        intLiteral(es(1), "graft_collect_capped: cap")), "built-in")
  }

  /** The gram size must be a foldable integral literal — a column (or a
    * null) here would otherwise surface as an opaque NPE/ClassCast from
    * eval at registration time. */
  private def gramSizeLiteral(e: Expression): Int =
    intLiteral(e, "graft_gram_hashes: gram size")

  /** A foldable integral literal argument, with the failing parameter
    * named in the error. */
  private def intLiteral(e: Expression, what: String): Int = {
    val ok = e.foldable && (e.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
      case _ => false
    })
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
    if (!ok) fail(s"$what must be an integer literal")
    e.eval(null) match {
      case n: Number => n.intValue
      case _ => fail(s"$what must be a non-null integer literal")
    }
  }
}
