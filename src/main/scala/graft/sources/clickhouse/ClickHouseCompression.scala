package graft.sources.clickhouse

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream}

/** ClickHouse native-protocol compressed framing — the default posture
  * of real deployments (`network_compression_method = LZ4`). Each frame:
  *
  * {{{
  *   16 bytes  CityHash128 v1.0.2 of the frame below (2× u64 LE)
  *    1 byte   method: 0x82 LZ4, 0x02 None
  *    4 bytes  compressed_size LE (frame bytes from the method byte on)
  *    4 bytes  uncompressed_size LE
  *    N bytes  LZ4 block data
  * }}}
  *
  * The reference's clickhouse connector gets this from the official
  * client crate; here the framing is hand-built on the public protocol
  * layout, LZ4 block codec via lz4-java (Spark's own shuffle-codec
  * dependency). The checksum is the OLD CityHash 1.0.2 — ClickHouse
  * pinned it before CityHash 1.1 changed the algorithm — implemented
  * below from the public-domain city.cc; round-trip verified in-repo
  * (both directions run it, and a corrupted frame must be rejected). */
object ClickHouseCompression {

  val MethodLz4: Int = 0x82
  val MethodNone: Int = 0x02

  private val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()

  /** Compress `raw` into one checksummed LZ4 frame. */
  def writeFrame(out: DataOutputStream, raw: Array[Byte]): Unit = {
    val compressor = lz4.fastCompressor()
    val compressed = compressor.compress(raw)
    val frame = new Array[Byte](9 + compressed.length)
    frame(0) = MethodLz4.toByte
    putIntLe(frame, 1, 9 + compressed.length)
    putIntLe(frame, 5, raw.length)
    System.arraycopy(compressed, 0, frame, 9, compressed.length)
    val (lo, hi) = CityHash102.cityHash128(frame, 0, frame.length)
    val sum = new Array[Byte](16)
    putLongLe(sum, 0, lo); putLongLe(sum, 8, hi)
    out.write(sum)
    out.write(frame)
  }

  /** Read one frame, verify its checksum, return the raw bytes. */
  def readFrame(in: DataInputStream): Array[Byte] = {
    val sum = new Array[Byte](16); in.readFully(sum)
    val head = new Array[Byte](9); in.readFully(head)
    val method = head(0) & 0xff
    val compressedSize = getIntLe(head, 1)
    val rawSize = getIntLe(head, 5)
    if (compressedSize < 9 || compressedSize > (1 << 30) ||
      rawSize < 0 || rawSize > (1 << 30))
      throw new ClickHouseProtocolException(
        s"compressed frame sizes out of range ($compressedSize/$rawSize)")
    val frame = new Array[Byte](compressedSize)
    System.arraycopy(head, 0, frame, 0, 9)
    in.readFully(frame, 9, compressedSize - 9)
    val (lo, hi) = CityHash102.cityHash128(frame, 0, frame.length)
    if (lo != getLongLe(sum, 0) || hi != getLongLe(sum, 8))
      throw new ClickHouseProtocolException(
        "compressed frame checksum mismatch (corrupt block)")
    method match {
      case MethodLz4 =>
        lz4.fastDecompressor().decompress(frame, 9, rawSize)
      case MethodNone =>
        java.util.Arrays.copyOfRange(frame, 9, frame.length)
      case other =>
        throw new ClickHouseProtocolException(
          f"unsupported compression method 0x$other%02x")
    }
  }

  /** A stream that decompresses frames on demand — blocks may span
    * frames (ClickHouse's CompressedReadBuffer model). */
  final class FramedInputStream(in: DataInputStream) extends InputStream {
    private var buf: Array[Byte] = Array.emptyByteArray
    private var pos = 0
    private def refill(): Boolean = {
      if (pos < buf.length) return true
      buf = readFrame(in); pos = 0
      buf.length > 0 || refill()
    }
    override def read(): Int =
      if (!refill()) -1 else { val b = buf(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      if (!refill()) return -1
      val n = math.min(len, buf.length - pos)
      System.arraycopy(buf, pos, b, off, n)
      pos += n
      n
    }
  }

  /** Buffer block writes, flushing each complete block as one frame. */
  final class FrameBuffer {
    private val bytes = new ByteArrayOutputStream()
    val data = new DataOutputStream(bytes)
    def flushTo(out: DataOutputStream): Unit = {
      data.flush()
      writeFrame(out, bytes.toByteArray)
      bytes.reset()
    }
  }

  private def putIntLe(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }
  private def getIntLe(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putLongLe(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = (v >>> (8 * i)).toByte; i += 1 }
  }
  private def getLongLe(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }
}

/** CityHash128 as of city.cc v1.0.2 (public domain, Google) — the exact
  * revision ClickHouse pinned for its wire checksums (later CityHash
  * releases changed the mixing and would not interoperate). Direct
  * transcription of the 1.0.2 algorithm in Scala on unsigned-wrapping
  * Long arithmetic. */
object CityHash102 {

  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL
  private val k3 = 0xc949d7c7509e6557L
  private val kMul = 0x9ddfea08eb382d69L

  @inline private def fetch64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var j = 0
    while (j < 8) { v |= (b(i + j) & 0xffL) << (8 * j); j += 1 }
    v
  }
  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  @inline private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))
  @inline private def rotateByAtLeast1(v: Long, shift: Int): Long =
    (v >>> shift) | (v << (64 - shift))
  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  private def hashLen16(u: Long, v: Long): Long = {
    var a = (u ^ v) * kMul
    a ^= (a >>> 47)
    var b = (v ^ a) * kMul
    b ^= (b >>> 47)
    b * kMul
  }

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = fetch64(s, off)
      val b = fetch64(s, off + len - 8)
      hashLen16(a, rotateByAtLeast1(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4))
    } else if (len > 0) {
      val a = s(off) & 0xffL
      val b = s(off + (len >> 1)) & 0xffL
      val c = s(off + len - 1) & 0xffL
      val y = a + (b << 8)
      val z = len + (c << 2)
      shiftMix(y * k2 ^ z * k3) * k2
    } else k2
  }

  /** WeakHashLen32WithSeeds over s[off, off+32). */
  private def weak32(s: Array[Byte], off: Int, a0: Long, b0: Long): (Long, Long) = {
    val w = fetch64(s, off)
    val x = fetch64(s, off + 8)
    val y = fetch64(s, off + 16)
    val z = fetch64(s, off + 24)
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  private def cityMurmur(s: Array[Byte], off: Int, len: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    var a = seedLo
    var b = seedHi
    var c = 0L
    var d = 0L
    var l = len - 16
    if (l <= 0) {
      a = shiftMix(a * k1) * k1
      c = b * k1 + hashLen0to16(s, off, len)
      d = shiftMix(a + (if (len >= 8) fetch64(s, off) else c))
    } else {
      c = hashLen16(fetch64(s, off + len - 8) + k1, a)
      d = hashLen16(b + len, c + fetch64(s, off + len - 16))
      a += d
      var p = off
      while ({
        a ^= shiftMix(fetch64(s, p) * k1) * k1
        a *= k1
        b ^= a
        c ^= shiftMix(fetch64(s, p + 8) * k1) * k1
        c *= k1
        d ^= c
        p += 16
        l -= 16
        l > 0
      }) ()
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    (a ^ b, hashLen16(b, a))
  }

  def cityHash128WithSeed(s: Array[Byte], off0: Int, len0: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len0 < 128) return cityMurmur(s, off0, len0, seedLo, seedHi)
    var off = off0
    var len = len0
    var x = seedLo
    var y = seedHi
    var z = len * k1
    var v1 = rotate(y ^ k1, 49) * k1 + fetch64(s, off)
    var v2 = rotate(v1, 42) * k1 + fetch64(s, off + 8)
    var w1 = rotate(y + z, 35) * k1 + x
    var w2 = rotate(x + fetch64(s, off + 88), 53) * k1
    while ({
      var i = 0
      while (i < 2) {
        x = rotate(x + y + v1 + fetch64(s, off + 16), 37) * k1
        y = rotate(y + v2 + fetch64(s, off + 48), 42) * k1
        x ^= w2
        y ^= v1
        z = rotate(z ^ w1, 33)
        val v = weak32(s, off, v2 * k1, x + w1)
        val w = weak32(s, off + 32, z + w2, y)
        v1 = v._1; v2 = v._2; w1 = w._1; w2 = w._2
        val t = z; z = x; x = t
        off += 64
        i += 1
      }
      len -= 128
      len >= 128
    }) ()
    y += rotate(w1, 37) * k0 + z
    x += rotate(v1 + z, 49) * k0
    // hash up to 4 chunks of 32 bytes each from the END of the data
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rotate(y - x, 42) * k0 + v2
      w1 += fetch64(s, off + len - tailDone + 16)
      x = rotate(x, 49) * k0 + w1
      w1 += v1
      val v = weak32(s, off + len - tailDone, v2, w1)
      v1 = v._1; v2 = v._2
    }
    x = hashLen16(x, v1)
    y = hashLen16(y, w1)
    (hashLen16(x + v2, w2) + y, hashLen16(x + w2, y + v2))
  }

  def cityHash128(s: Array[Byte], off: Int, len: Int): (Long, Long) =
    if (len >= 16)
      cityHash128WithSeed(s, off + 16, len - 16,
        fetch64(s, off) ^ k3, fetch64(s, off + 8))
    else if (len >= 8)
      cityHash128WithSeed(s, 0, 0,
        fetch64(s, off) ^ (len * k0), fetch64(s, off + len - 8) ^ k1)
    else cityHash128WithSeed(s, off, len, k0, k1)
}
