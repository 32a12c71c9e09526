package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as
  * partition-local batch functions.
  *
  * Codecs: PNG and WAV run REAL decoders — the JDK's own `ImageIO` and
  * `javax.sound.sampled` (`m_image_decode`, `m_wav_decode`: encode →
  * decode → pixel/sample stats, hash-oracled against the generator
  * arithmetic, which lossless codecs must reproduce exactly). Formats
  * the JDK does not ship (video, lossy audio) stay STUBBED:
  * `decodeStub` derives deterministic fake features from the bytes.
  * Everything around the codec call — the binary column schema, the
  * mapPartitions batch shape, partitioning, and the metadata contract —
  * is identical in both modes and is what matters at 100 TB: payload
  * bytes never shuffle except where the plan requires it, and feature
  * extraction is embarrassingly parallel map-only work.
  */
object Multimodal {

  // ImageIO's convenience read/write paths wrap streams in DISK-backed
  // FileCache caches by default — a temp file created and deleted per
  // image, which dominates per-asset codec cost at thousands of tiny
  // assets per task (measured 2× on the GIF queries). All images here
  // are KB-sized; cache in memory. JVM-global, runs once per executor
  // when this object loads.
  javax.imageio.ImageIO.setUseCache(false)

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** Decouple a CPU-bound codec kernel's parallelism from the scan's
    * byte-based file splits. The id-driven rows below synthesize and
    * decode a per-asset media container from `doc_id` alone, so their
    * cost per ROW (GIF/WAV codec work, ~ms) is invisible to the
    * scanner's bytes-per-core split logic — and split COUNT is no
    * signal either: splits align to parquet row groups, so a
    * one-row-group file (any single-writer output, e.g. the 50×
    * ScaleGen dir) lands every row in ONE task no matter how many
    * empty byte-range splits surround it. Measured at sf5.0: 250k
    * assets demuxed on 1 of 32 cores, 491 s and climbing, before this
    * spread; 6.5 s after (with the throughput collector — see
    * tools/sweep50.sh on the G1 pathology). The repartition moves ONLY the 8-byte ids
    * (payloads are synthesized on the receiving side — never shuffled,
    * same contract the m_phash_pairs plan pin enforces), and its width
    * follows `spark.sql.shuffle.partitions`, i.e. the ShuffleWidth
    * volume rule. Rows whose input carries a REAL payload column
    * (m_decode_features) deliberately do NOT spread: shuffling payload
    * bytes to chase parallelism is the wrong trade at 100 TB, where
    * multi-file layout already provisions the scan. */
  private def spreadIds(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Synthesize a binary payload column from the documents table (the
    * container ships no media files); downstream treats it as opaque. */
  /** The VAD segment-merge contract — ONE definition interpolated into
    * BOTH engines' SQL (src = the windowed-ssq relation: the oracle's
    * `e` CTE / the Spark `{e}` view), so the voicing threshold and the
    * run/segment logic cannot drift between the twins. */
  private def vadSegmentSql(src: String): String =
    s"""v AS (SELECT doc_id, win_idx, (ssq > 57000) AS voiced FROM $src),
       |r AS (SELECT doc_id, win_idx, voiced,
       |        CASE WHEN voiced AND NOT coalesce(lag(voiced) OVER
       |            (PARTITION BY doc_id ORDER BY win_idx), FALSE)
       |          THEN 1 ELSE 0 END AS seg_start FROM v),
       |rr AS (SELECT doc_id, voiced,
       |         sum(seg_start) OVER (PARTITION BY doc_id ORDER BY win_idx) AS run_id
       |       FROM r),
       |runs AS (SELECT doc_id, run_id, count(*) AS run_len FROM rr
       |         WHERE voiced GROUP BY 1, 2),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
       |          CAST(count(CASE WHEN voiced THEN 1 END) AS BIGINT) AS n_voiced
       |        FROM v GROUP BY 1),
       |seg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
       |          CAST(max(run_len) AS BIGINT) AS max_run FROM runs GROUP BY 1)
       |SELECT agg.doc_id, n_windows, n_voiced,
       |  coalesce(n_segments, CAST(0 AS BIGINT)) AS n_segments,
       |  coalesce(max_run, CAST(0 AS BIGINT)) AS max_run
       |FROM agg LEFT JOIN seg USING (doc_id)""".stripMargin

  private def assets(s: SparkSession, dir: String): DataFrame =
    t(s, dir).documents.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("n_chars").as("n_chars"), col("source").as("source"),
        lit("text/plain").as("mime")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("byte_checksum", LongType, nullable = false)))

  /** Stub decoder: in production this is the codec call (image decode,
    * audio resample, frame sample). Deterministic fake: byte stats. The
    * checksum is a polynomial hash MOD 1e9+7 — modular (not wrapping)
    * arithmetic so any engine with 64-bit ints can recompute it exactly;
    * Java's silent i64 wraparound is not portable (DuckDB errors on
    * overflow). */
  def decodeStub(assetId: Long, payload: Array[Byte]): Row = {
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      sum = (sum * 31 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    Row(assetId, payload.length.toLong, if (payload.isEmpty) -1 else payload(0) & 0xff, sum)
  }

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  val wavFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  val ulawSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("halved_bytes", org.apache.spark.sql.types.BooleanType,
      nullable = false),
    StructField("codebook_bounded", org.apache.spark.sql.types.BooleanType,
      nullable = false),
    StructField("error_bounded", org.apache.spark.sql.types.BooleanType,
      nullable = false)))

  val resampleSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_in", LongType, nullable = false),
    StructField("rate_out", IntegerType, nullable = false),
    StructField("length_doubled", org.apache.spark.sql.types.BooleanType,
      nullable = false),
    StructField("energy_preserved", org.apache.spark.sql.types.BooleanType,
      nullable = false)))

  val adpcmSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("quarter_bytes", org.apache.spark.sql.types.BooleanType,
      nullable = false),
    StructField("snr_bounded", org.apache.spark.sql.types.BooleanType,
      nullable = false),
    StructField("truly_lossy", org.apache.spark.sql.types.BooleanType,
      nullable = false)))

  /** IMA/DVI ADPCM quantizer step table (89 entries) and index
    * adaptation table — the public IMA Digital Audio Pack spec (1992),
    * the 4-bit differential codec WAV format tag 0x11 / RTP DVI4 use. */
  private[graft] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private[graft] val ImaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Encode 16-bit samples to 4-bit IMA ADPCM nibbles (packed two per
    * byte, low nibble first — the WAV/IMA packing order). */
  private[graft] def imaEncode(samples: Array[Int]): Array[Byte] = {
    var predictor = 0; var index = 0
    val out = new Array[Byte]((samples.length + 1) / 2)
    var i = 0
    while (i < samples.length) {
      val step = ImaStepTable(index)
      var diff = samples(i) - predictor
      var code = 0
      if (diff < 0) { code = 8; diff = -diff }
      // bit-by-bit quantize: code bits 2..0 approximate diff/step in
      // quarters (the spec's integer-only formulation)
      var tempStep = step
      if (diff >= tempStep) { code |= 4; diff -= tempStep }
      tempStep >>= 1
      if (diff >= tempStep) { code |= 2; diff -= tempStep }
      tempStep >>= 1
      if (diff >= tempStep) { code |= 1 }
      // decoder-mirrored reconstruction keeps encoder and decoder state
      // in lockstep (predict from what the DECODER will compute)
      var delta = step >> 3
      if ((code & 4) != 0) delta += step
      if ((code & 2) != 0) delta += step >> 1
      if ((code & 1) != 0) delta += step >> 2
      predictor = if ((code & 8) != 0) predictor - delta else predictor + delta
      if (predictor > 32767) predictor = 32767
      else if (predictor < -32768) predictor = -32768
      index += ImaIndexTable(code & 7)
      if (index < 0) index = 0 else if (index > 88) index = 88
      if ((i & 1) == 0) out(i >> 1) = (code & 0x0f).toByte
      else out(i >> 1) = (out(i >> 1) | ((code & 0x0f) << 4)).toByte
      i += 1
    }
    out
  }

  /** Decode packed IMA ADPCM nibbles back to 16-bit samples. */
  private[graft] def imaDecode(nibbles: Array[Byte], n: Int)
      : Array[Int] = {
    var predictor = 0; var index = 0
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val byte = nibbles(i >> 1) & 0xff
      val code = if ((i & 1) == 0) byte & 0x0f else (byte >> 4) & 0x0f
      val step = ImaStepTable(index)
      var delta = step >> 3
      if ((code & 4) != 0) delta += step
      if ((code & 2) != 0) delta += step >> 1
      if ((code & 1) != 0) delta += step >> 2
      predictor = if ((code & 8) != 0) predictor - delta else predictor + delta
      if (predictor > 32767) predictor = 32767
      else if (predictor < -32768) predictor = -32768
      index += ImaIndexTable(code & 7)
      if (index < 0) index = 0 else if (index > 88) index = 88
      out(i) = predictor
      i += 1
    }
    out
  }

  val spectralSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("dominant_bin", IntegerType, nullable = false),
    StructField("peak_isolated", org.apache.spark.sql.types.BooleanType,
      nullable = false)))

  /** Render the deterministic per-asset RGB image straight into the
    * TYPE_INT_RGB backing array — one store per pixel. `setRGB` runs a
    * color-model conversion per CALL (the classic ImageIO slow path);
    * on the bulk raster the same fill is ~an order of magnitude
    * cheaper, with identical pixels and therefore identical PNG bytes. */
  private def renderRgb(d: Long, w: Int, h: Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pr = ((d * 31 + x * 7 + y * 13) % 256).toInt
        val pg = ((d * 17 + x * 11 + y * 5) % 256).toInt
        val pb = ((d * 7 + x * 3 + y * 19) % 256).toInt
        data(i) = (pr << 16) | (pg << 8) | pb
        i += 1
        x += 1
      }
      y += 1
    }
    img
  }

  /** JPEG quantization bound for the double-generation thumbnail
    * contract: smooth gradients keep DCT error small (single-generation
    * contract pin is ≤ 24, `OperatorSemanticsSpec`); two generations
    * plus 4:2:0 chroma subsampling on the 4×4 thumb stay well under 64,
    * while a channel-order or stride bug produces near-full-scale
    * (≥ 128) error on the channel-distinct ramps — spec-proven. */
  private[graft] val JpegErrorBound = 64

  /** Smooth channel-distinct RGB ramps (R = x, G = y, B = diagonal),
    * rendered into the backing raster. Smoothness keeps JPEG DCT error
    * inside [[JpegErrorBound]]; channel-distinctness makes a swap loud. */
  private[graft] def renderSmooth(w: Int, h: Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pr = x * 255 / (w - 1)
        val pg = y * 255 / (h - 1)
        val pb = (x + y) * 255 / (w + h - 2)
        data(i) = (pr << 16) | (pg << 8) | pb
        i += 1
        x += 1
      }
      y += 1
    }
    img
  }

  /** Per-thread pooled JPEG codec: `ImageIO.write/read` convenience
    * calls do a registry scan + writer/reader construction + dispose
    * per ASSET, and each allocates fresh memory-cache buffers — at 20×
    * corpus scale that churn put m_jpeg_thumbs ~15% over its linear
    * floor on fixed-host heap pressure (round-16 verdict #5). The
    * writer/reader pair and the encode buffer live per thread
    * (ImageIO codecs are not thread-safe) and are reused per call. */
  private val jpegCodec = new ThreadLocal[(javax.imageio.ImageWriter,
      javax.imageio.ImageReader, java.io.ByteArrayOutputStream)] {
    override def initialValue()
        : (javax.imageio.ImageWriter, javax.imageio.ImageReader,
           java.io.ByteArrayOutputStream) = {
      val ws = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
      if (!ws.hasNext)
        throw new IllegalStateException("no JPEG writer on this JVM")
      val rs = javax.imageio.ImageIO.getImageReadersByFormatName("jpg")
      if (!rs.hasNext)
        throw new IllegalStateException("no JPEG reader on this JVM")
      (ws.next(), rs.next(), new java.io.ByteArrayOutputStream(16 << 10))
    }
  }

  /** One REAL JPEG encode→decode generation through ImageIO. */
  private[graft] def jpegRoundTrip(img: java.awt.image.BufferedImage)
      : java.awt.image.BufferedImage = {
    val (writer, reader, bos) = jpegCodec.get()
    bos.reset()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally { writer.setOutput(null); ios.close() }
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    try {
      reader.setInput(iis)
      reader.read(0)
    } finally { reader.setInput(null); iis.close() }
  }

  /** Decoded pixels as packed RGB ints, row-major — BULK extraction:
    * the 3-byte BGR backing array when the decoder produced one (what
    * ImageIO's PNG reader yields for 8-bit RGB), else ONE bulk getRGB
    * call. Never per-pixel getRGB. */
  private def rgbOf(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    img.getRaster.getDataBuffer match {
      case b: java.awt.image.DataBufferByte
          if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR =>
        val src = b.getData
        val out = new Array[Int](w * h)
        var i = 0
        var o = 0
        while (o < out.length) {
          out(o) = ((src(i + 2) & 0xff) << 16) |
            ((src(i + 1) & 0xff) << 8) | (src(i) & 0xff)
          i += 3
          o += 1
        }
        out
      case _ => img.getRGB(0, 0, w, h, null, 0, w)
    }
  }

  /** 256-gray palette: GIF is 8-bit indexed, and a gray palette whose
    * entry i is (i,i,i) makes the encode LOSSLESS — the decoded red
    * channel IS the original pixel byte, so container bugs (not codec
    * quantization) are the only thing that can break the hash. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** ENCODE a real multi-frame ANIMATED GIF through ImageIO's sequence
    * writer: `nf` full-size indexed frames, frame f's pixel (x,y) =
    * (d*31 + f*101 + x*7 + y*13) % 256 — the formula the DuckDB oracle
    * recomputes arithmetically. */
  private[graft] def encodeGif(d: Long, w: Int, h: Int, nf: Int)
      : Array[Byte] =
    encodeGifWith(javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next(), d, w, h, nf)

  /** [[encodeGif]] with a CALLER-OWNED writer — the per-partition reuse
    * path: ImageIO's registry lookup + writer construction per asset is
    * pure overhead when a partition encodes thousands of assets. */
  private[graft] def encodeGifWith(writer: javax.imageio.ImageWriter,
      d: Long, w: Int, h: Int, nf: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    // MEMORY-cache stream, explicitly: ImageIO.createImageOutputStream
    // defaults to a disk-backed FileCache stream — a temp FILE created
    // and deleted per asset, which dominates the cost at thousands of
    // tiny assets per task
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nf) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          data(i) = ((d * 31 + f * 101 + x * 7 + y * 13) % 256).toByte
          i += 1
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** DEMUX a real GIF container: frame count read from the stream,
    * each frame decoded independently, pixels back as the raw byte
    * plane (gray palette: red channel == index == original byte). */
  private[graft] def demuxGif(bytes: Array[Byte])
      : Seq[(Int, Int, Array[Byte])] =
    demuxGifWith(javax.imageio.ImageIO
      .getImageReadersByFormatName("gif").next(), bytes)

  /** [[demuxGif]] with a CALLER-OWNED reader (per-partition reuse). */
  private[graft] def demuxGifWith(reader: javax.imageio.ImageReader,
      bytes: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    // memory-cache stream for the same reason as the encode side
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    reader.setInput(iis, false, true)
    try {
      val n = reader.getNumImages(true)
      (0 until n).map { i =>
        val img = reader.read(i)
        val px = rgbOf(img)
        val out = new Array[Byte](px.length)
        var j = 0
        while (j < out.length) {
          out(j) = ((px(j) >> 16) & 0xff).toByte
          j += 1
        }
        (img.getWidth, img.getHeight, out)
      }
    } finally iis.close()
  }

  val frameSampleSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pix_sum", LongType, nullable = false)))

  val frameBytesSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("fr", org.apache.spark.sql.types.BinaryType,
      nullable = false)))

  /** Per-asset GIF encode → container demux, shared by the frame
    * queries: one codec instance per partition, map-only, frames never
    * wider than the 8-frame grid. */
  private def demuxedFrames(s: SparkSession, dir: String): DataFrame = {
    val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(frameBytesSchema)
    df.mapPartitions { rows =>
      // ONE codec pair per partition — registry lookup + construction
      // per asset is pure overhead at thousands of assets per task
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      rows.flatMap { r =>
        val d = r.getLong(0)
        val w = 8 + (d % 5).toInt
        val h = 8 + (d % 3).toInt
        val nf = 2 + (d % 7).toInt
        val gif = encodeGifWith(writer, d, w, h, nf) // REAL GIF encode
        val frames = demuxGifWith(reader, gif)       // REAL demux
        require(frames.size == nf,
          s"demux found ${frames.size} frames, wrote $nf")
        frames.zipWithIndex.map { case ((fw, fh, bytes), i) =>
          require(fw == w && fh == h, s"frame $i decoded ${fw}x$fh, wrote ${w}x$h")
          Row(d, i.toLong, bytes)
        }
      }
    }
  }

  val defs: Seq[GraftQuery] = Seq(

    // ------------------------------------------------- REAL image codec
    // PNG decode through the JDK's own ImageIO — an actual codec, not
    // the stub: each asset renders a deterministic RGB image from its
    // id, ENCODES it to real PNG bytes, DECODES those bytes back, and
    // reports per-channel pixel sums from the DECODED pixels. PNG is
    // lossless, so the round trip must reproduce the generator formula
    // exactly — which is what DuckDB independently recomputes from the
    // id arithmetic. Any codec misuse (channel order, premultiplication,
    // row stride) breaks the hash. Shape at 100 TB: one codec instance
    // per partition, map-only, pixels never in an exchange.
    GraftQuery("m_image_decode",
      """WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |              FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
        |SELECT doc_id AS asset_id,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((doc_id * 17 + x * 11 + y * 5) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((doc_id * 7 + x * 3 + y * 19) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h""".stripMargin) { (s, dir) =>
      val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(imageFeatureSchema)
      df.mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val w = 8 + (d % 9).toInt
          val h = 8 + (d % 7).toInt
          val img = renderRgb(d, w, h)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos) // REAL PNG encode
          val back = javax.imageio.ImageIO.read(        // REAL PNG decode
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val px = rgbOf(back) // bulk raster read, no per-pixel getRGB
          var (sr, sg, sb) = (0L, 0L, 0L)
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            i += 1
          }
          Row(d, back.getWidth, back.getHeight, sr, sg, sb)
        }
      }
    },

    // -------------------------------------------------- REAL audio codec
    // WAV (RIFF PCM) decode through the JDK's javax.sound.sampled — a
    // real container parse, not the stub: each asset synthesizes 16-bit
    // mono PCM from its id, WRITES a real WAV file (AudioSystem), PARSES
    // it back (header, format, frame payload), and reports sample count,
    // the parsed sample rate, and integer energy from the DECODED
    // samples. PCM WAV is lossless; DuckDB recomputes the generator
    // formula. Byte order, header offsets, or frame-size errors all
    // break the hash.
    GraftQuery("m_wav_decode",
      """WITH dims AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
        |smp AS (SELECT doc_id, n, ((doc_id * 37 + i * 97) % 4001) - 2000 AS s
        |        FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims))
        |SELECT doc_id AS asset_id,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(sum(s * s) AS BIGINT) AS energy
        |FROM smp GROUP BY doc_id, n""".stripMargin) { (s, dir) =>
      val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(wavFeatureSchema)
      df.mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val n = 64 + (d % 64).toInt
          val pcm = new Array[Byte](n * 2) // 16-bit mono little-endian
          var i = 0
          while (i < n) {
            val v = (((d * 37 + i.toLong * 97) % 4001) - 2000).toInt
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
            true, false) // signed, little-endian
          val bos = new java.io.ByteArrayOutputStream()
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos) // REAL write
          val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bos.toByteArray)) // REAL parse
          val bf = back.getFormat
          val frames = back.readAllBytes()
          val m = frames.length / bf.getFrameSize
          var energy = 0L
          i = 0
          while (i < m) {
            // decode per the PARSED format, not assumptions
            val b0 = frames(i * bf.getFrameSize)
            val b1 = frames(i * bf.getFrameSize + 1)
            val v = if (bf.isBigEndian) (b0.toInt << 8) | (b1 & 0xff)
                    else (b1.toInt << 8) | (b0 & 0xff)
            energy += v.toLong * v.toLong
            i += 1
          }
          Row(d, m.toLong, bf.getSampleRate.toInt, energy)
        }
      }
    },

    // ------------------------------------------------ REAL LOSSY codec
    // G.711 μ-law through javax.sound.sampled — an actual LOSSY audio
    // codec (logarithmic companding, 16 → 8 bits/sample), not a stub:
    // each asset synthesizes full-range 16-bit PCM, ENCODES it to μ-law
    // via the JDK's format-conversion provider, DECODES back to PCM,
    // and reports the lossy-codec signature as hashable booleans the
    // oracle pins TRUE: (a) the encoded stream is exactly half the PCM
    // bytes (real compression), (b) the decoded signal collapses to
    // ≤ 256 distinct values (the 8-bit codebook — PROOF of lossiness,
    // since the input carries far more), (c) every sample's quantization
    // error stays inside the G.711 segment bound (a channel/endianness/
    // bias bug produces near-full-scale error). Same 100 TB shape as
    // every codec here: map-only, one converter chain per row batch,
    // samples never shuffle.
    GraftQuery("m_ulaw_roundtrip",
      """WITH dims AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents)
        |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_samples,
        |  TRUE AS halved_bytes, TRUE AS codebook_bounded,
        |  TRUE AS error_bounded
        |FROM dims""".stripMargin) { (s, dir) =>
      val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
      implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(ulawSchema)
      df.mapPartitions { rows =>
        import javax.sound.sampled._
        val pcmFmt = new AudioFormat(8000f, 16, 1, true, false)
        rows.map { r =>
          val d = r.getLong(0)
          val n = 64 + (d % 64).toInt
          val orig = new Array[Int](n)
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            // full-range signal so every μ-law segment is exercised
            val v = (((d * 37 + i.toLong * 97) % 60001) - 30000).toInt
            orig(i) = v
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val src = new AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), pcmFmt, n.toLong)
          val ulaw = AudioSystem.getAudioInputStream(
            AudioFormat.Encoding.ULAW, src) // REAL lossy encode
          val encBytes = ulaw.readAllBytes()
          val ulawFmt = ulaw.getFormat
          val back = AudioSystem.getAudioInputStream(pcmFmt,
            new AudioInputStream(new java.io.ByteArrayInputStream(encBytes),
              ulawFmt, encBytes.length / ulawFmt.getFrameSize)) // REAL decode
          val dec = back.readAllBytes()
          val m = dec.length / 2
          val seen = new java.util.HashSet[Integer]()
          var maxErr = 0
          i = 0
          while (i < m) {
            val v = ((dec(2 * i + 1).toInt << 8) | (dec(2 * i) & 0xff))
            seen.add(Integer.valueOf(v))
            if (i < n) {
              val e = math.abs(v - orig(i))
              if (e > maxErr) maxErr = e
            }
            i += 1
          }
          // G.711's widest segment step is 256 in the 14-bit domain =
          // 1024 at 16 bits → worst quantization error ≤ 512 + bias
          // rounding; 1024 is a loose-but-meaningful bound (a byte-order
          // or sign bug lands in the tens of thousands)
          Row(d, m.toLong, encBytes.length == n, seen.size() <= 256,
            m == n && maxErr <= 1024)
        }
      }
    },

    // -------------------------------------------- SAMPLE-RATE conversion
    // Real 8 kHz → 16 kHz resampling through the JDK's format-conversion
    // provider (javax.sound.sampled rate conversion) — the whisper-style
    // preprocessing step every audio curation pipeline runs before a
    // 16 kHz model. Each asset synthesizes a deterministic full-scale
    // tone, converts through AudioSystem's REAL resampler, and reports
    // the resampling contract as hashable values the oracle pins: the
    // parsed output format's rate (exactly 16000), the length ratio
    // (2× within the converter's edge padding), and energy preservation
    // (RMS within 10% — an interpolation/byte-order bug lands far
    // outside). Map-only; one converter chain per row, samples never
    // shuffle — at 100 TB this is embarrassingly parallel decode work.
    GraftQuery("m_resample",
      """WITH dims AS (SELECT doc_id, 400 + doc_id % 256 AS n FROM documents)
        |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_in,
        |  16000 AS rate_out,
        |  TRUE AS length_doubled, TRUE AS energy_preserved
        |FROM dims""".stripMargin) { (s, dir) =>
      val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(resampleSchema)
      df.mapPartitions { rows =>
        import javax.sound.sampled._
        val srcFmt = new AudioFormat(8000f, 16, 1, true, false)
        val dstFmt = new AudioFormat(16000f, 16, 1, true, false)
        rows.map { r =>
          val d = r.getLong(0)
          val n = 400 + (d % 256).toInt
          // deterministic tone, frequency varying per asset but kept
          // WELL under the source Nyquist (4 kHz): an interpolating
          // resampler attenuates near-Nyquist content (≈3% at 950 Hz,
          // ≈27% at 3.3 kHz), so the band is capped where the energy
          // contract is physical, not converter-specific
          val freq = 200.0 + (d % 16) * 50.0
          val pcm = new Array[Byte](n * 2)
          var e1 = 0.0
          var i = 0
          while (i < n) {
            val v = (math.sin(2 * math.Pi * freq * i / 8000.0) * 20000).toInt
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            e1 += v.toDouble * v
            i += 1
          }
          val out = AudioSystem.getAudioInputStream(dstFmt,
            new AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), srcFmt, n.toLong))
          val res = out.readAllBytes()
          val m = res.length / 2
          var e2 = 0.0
          i = 0
          while (i < m) {
            val v = (res(2 * i + 1).toInt << 8) | (res(2 * i) & 0xff)
            e2 += v.toDouble * v
            i += 1
          }
          val rmsIn = math.sqrt(e1 / n)
          val rmsOut = math.sqrt(e2 / math.max(m, 1))
          Row(d, n.toLong, out.getFormat.getSampleRate.toInt,
            math.abs(m - 2 * n) <= 8,
            rmsOut >= rmsIn * 0.9 && rmsOut <= rmsIn * 1.1)
        }
      }
    },

    // ------------------------------------------ IMA ADPCM (4:1 lossy)
    // The OTHER classic telephony codec, implemented from the public
    // IMA Digital Audio Pack spec (WAV format tag 0x11 / RTP DVI4):
    // 4-bit DIFFERENTIAL coding with an adaptive step size — where
    // μ-law compands each sample independently (2:1), ADPCM predicts
    // from the previous sample and transmits only a quantized delta
    // (4:1). Each asset synthesizes a deterministic sine, encodes to
    // packed nibbles, decodes back, and reports the codec contract as
    // hashable booleans the oracle pins TRUE: (a) the bitstream is
    // exactly ceil(n/2) bytes — 4:1 against 16-bit PCM, (b) SNR ≥ 12 dB
    // (sum-sq error ≤ 1/16 of signal energy: a sign/step/packing bug
    // collapses this to ~0 dB; the codec really achieves ~20+ dB on
    // tones), (c) nonzero total error — PROOF of lossiness. Encoder and
    // decoder share the decoder-mirrored reconstruction, the property
    // that keeps their state machines in lockstep. Map-only; at 100 TB
    // the nibble streams stay inside their partition.
    GraftQuery("m_adpcm",
      """WITH dims AS (SELECT doc_id, 400 + doc_id % 256 AS n FROM documents)
        |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_samples,
        |  TRUE AS quarter_bytes, TRUE AS snr_bounded, TRUE AS truly_lossy
        |FROM dims""".stripMargin) { (s, dir) =>
      val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(adpcmSchema)
      df.mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val n = 400 + (d % 256).toInt
          // smooth tone (differential codecs assume sample-to-sample
          // correlation; the band matches m_resample's source)
          val freq = 200.0 + (d % 16) * 50.0
          val x = new Array[Int](n)
          var i = 0
          while (i < n) {
            x(i) = (math.sin(2 * math.Pi * freq * i / 8000.0) * 20000).toInt
            i += 1
          }
          val encoded = imaEncode(x)
          val decoded = imaDecode(encoded, n)
          var errSq = 0.0; var sigSq = 0.0; var errAbs = 0L
          i = 0
          while (i < n) {
            val e = decoded(i) - x(i)
            errSq += e.toDouble * e
            sigSq += x(i).toDouble * x(i)
            errAbs += math.abs(e)
            i += 1
          }
          Row(d, n.toLong, encoded.length == (n + 1) / 2,
            errSq * 16 <= sigSq, errAbs > 0)
        }
      }
    },

    // ---------------------------------------------- SPECTRAL features
    // Real frequency-domain analysis (Goertzel DFT, the tone-detection
    // kernel telephony DSPs run) — the audio-curation feature that
    // tells music from speech from noise by band energies: each asset
    // synthesizes a tone whose frequency is PLANTED as doc_id % 8 of
    // an 8-bin bank (250..2000 Hz, every bin an exact multiple of the
    // 10 Hz resolution so rectangular-window leakage is zero), runs
    // the actual Goertzel recurrence over all 8 bins, and reports the
    // argmax bin — which must equal the planted bin EXACTLY (an integer
    // the oracle recomputes from doc_id), plus an isolation boolean
    // (peak ≥ 4× runner-up; a recurrence/phase bug spreads energy and
    // breaks it). Map-only, samples never leave the partition.
    GraftQuery("m_spectral",
      """SELECT doc_id AS asset_id, CAST(800 AS BIGINT) AS n_samples,
        |  CAST(doc_id % 8 AS INTEGER) AS dominant_bin,
        |  TRUE AS peak_isolated
        |FROM documents""".stripMargin) { (s, dir) =>
      val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(spectralSchema)
      df.mapPartitions { rows =>
        val n = 800 // 0.1 s at 8 kHz -> 10 Hz bin resolution
        val bins = Array.tabulate(8)(k => 250.0 * (k + 1))
        rows.map { r =>
          val d = r.getLong(0)
          val f = bins((d % 8).toInt)
          val x = new Array[Double](n)
          var i = 0
          while (i < n) {
            x(i) = math.sin(2 * math.Pi * f * i / 8000.0) * 20000
            i += 1
          }
          val power = bins.map { fb =>
            // Goertzel: s[i] = x[i] + 2cos(w)s[i-1] - s[i-2]
            val w = 2 * math.Pi * fb / 8000.0
            val coeff = 2 * math.cos(w)
            var s1 = 0.0; var s2 = 0.0
            var j = 0
            while (j < n) {
              val s0 = x(j) + coeff * s1 - s2
              s2 = s1; s1 = s0
              j += 1
            }
            s1 * s1 + s2 * s2 - coeff * s1 * s2
          }
          var best = 0; var second = 0.0
          var k = 1
          while (k < 8) {
            if (power(k) > power(best)) { second = power(best); best = k }
            else if (power(k) > second) second = power(k)
            k += 1
          }
          Row(d, n.toLong, best, power(best) >= 4 * math.max(second, 1e-9))
        }
      }
    },

    // Binary metadata path — fully oracled: byte length + sha256 of the
    // payload computed by the engine's native binary functions.
    GraftQuery("m_binary_meta",
      """SELECT doc_id AS asset_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS payload_sha,
        |  n_chars
        |FROM documents""".stripMargin) { (s, dir) =>
      t(s, dir).documents.select(
        col("doc_id").as("asset_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("n_bytes"),
        sha2(encode(col("text"), "UTF-8"), 256).as("payload_sha"),
        col("n_chars"))
    },

    // Decode/feature-extract pipeline: binary column → mapPartitions batch
    // decode (stubbed) → typed feature rows. The stub is deterministic
    // byte arithmetic, so it IS oracle-able: DuckDB recomputes the same
    // features with list_reduce over the character positions (pure-ASCII
    // corpus ⇒ byte == char, the same identity m_audio_energy relies on).
    GraftQuery("m_decode_features",
      """SELECT doc_id AS asset_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CASE WHEN length(text) = 0 THEN -1
        |       ELSE ord(substr(text, 1, 1)) END AS first_byte,
        |  CASE WHEN length(text) = 0 THEN 0
        |       ELSE list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           list_transform(range(1, length(text) + 1),
        |                          p -> CAST(ord(substr(text, p, 1)) AS BIGINT))),
        |         (acc, b) -> (acc * 31 + b) % 1000000007) END AS byte_checksum
        |FROM documents""".stripMargin) { (s, dir) =>
      val df = assets(s, dir)
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(featureSchema)
      df.select(col("asset_id"), col("payload"))
        .mapPartitions { rows =>
          // one decoder instance per partition — the real-codec pattern
          rows.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
        }
    },

    // Frame sampling through a REAL container: each asset encodes a
    // multi-frame ANIMATED GIF (ImageIO sequence writer, lossless gray
    // palette), then DEMUXES it back — frame count read from the
    // stream, every frame decoded by the JDK's GIF codec — and reports
    // per-frame dimensions + pixel sums from the DECODED planes. The
    // oracle recomputes the generator arithmetic: a frame-count,
    // disposal, palette, or stride bug in the demux breaks the hash.
    // Shape at 100 TB: per-asset encode+demux is map-only inside one
    // partition; frames (≤8, ~150 bytes) are the only exploded rows.
    GraftQuery("m_frame_sample",
      """WITH dims AS (SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
        |                     2 + doc_id % 7 AS nf FROM documents),
        |fr AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM dims),
        |xs AS (SELECT doc_id, w, h, f, unnest(range(0, w)) AS x FROM fr),
        |px AS (SELECT doc_id, w, h, f, x, unnest(range(0, h)) AS y FROM xs)
        |SELECT doc_id AS asset_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(sum((doc_id*31 + f*101 + x*7 + y*13) % 256) AS BIGINT) AS pix_sum
        |FROM px GROUP BY doc_id, f, w, h""".stripMargin) { (s, dir) =>
      val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(frameSampleSchema)
      df.mapPartitions { rows =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        rows.flatMap { r =>
          val d = r.getLong(0)
          val w = 8 + (d % 5).toInt
          val h = 8 + (d % 3).toInt
          val nf = 2 + (d % 7).toInt
          val frames = demuxGifWith(reader, encodeGifWith(writer, d, w, h, nf))
          require(frames.size == nf,
            s"demux found ${frames.size} frames, wrote $nf")
          frames.zipWithIndex.map { case ((fw, fh, bytes), i) =>
            var sum = 0L
            var j = 0
            while (j < bytes.length) { sum += bytes(j) & 0xff; j += 1 }
            Row(d, i.toLong, fw, fh, sum)
          }
        }
      }
    },

    // Scene-change keyframe selection over REAL demuxed frames: the
    // per-asset animated GIF is decoded back frame by frame (same
    // container path as m_frame_sample), each DECODED pixel plane gets
    // a perceptual hash, and a frame is a KEYFRAME when its pHash sits
    // ≥ 16 Hamming bits from the previous frame's (or it is the first)
    // — the video-curation step that picks which frames of a clip feed
    // a VLM training set, dropping near-static runs. Per-media work
    // only: the lag window partitions by asset (≤ 8 frames per
    // partition — bounded by the frame grid, never corpus cardinality),
    // and the 8-byte hashes are the only thing compared. Fully oracled:
    // the oracle regenerates the pixel planes arithmetically and
    // re-derives the same pHash (as m_phash), xor/bit_count distance.
    GraftQuery("m_keyframes",
      """WITH dims AS (SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
        |                     2 + doc_id % 7 AS nf FROM documents),
        |fs AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS frame_idx FROM dims),
        |pix AS (SELECT doc_id, frame_idx, w * h AS len,
        |  list_transform(range(0, w * h),
        |    p -> (doc_id*31 + frame_idx*101 + (p % w)*7 + (p // w)*13) % 256) AS bytes
        |  FROM fs),
        |sm AS (SELECT doc_id, frame_idx,
        |  list_transform(range(0, 63),
        |    i -> bytes[CAST(i * len // 63 AS INTEGER) + 1]) AS sm
        |  FROM pix),
        |ph AS (SELECT doc_id, frame_idx,
        |  CAST(list_sum(list_transform(range(0, 63),
        |    i -> CASE WHEN sm[i + 1] * 63 > list_sum(sm)
        |              THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS h
        |  FROM sm),
        |lagged AS (SELECT doc_id, frame_idx, h,
        |    lag(h) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS hp
        |  FROM ph)
        |SELECT doc_id AS asset_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(CASE WHEN hp IS NULL THEN NULL
        |       ELSE bit_count(xor(h, hp)) END AS INT) AS hamming_prev,
        |  (hp IS NULL OR bit_count(xor(h, hp)) >= 16) AS keyframe
        |FROM lagged""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("asset_id")).orderBy(col("frame_idx"))
      demuxedFrames(s, dir)
        .select(col("asset_id"), col("frame_idx"),
          expr("graft_phash63(fr)").as("h"))
        .withColumn("hp", lag(col("h"), 1).over(w))
        .select(col("asset_id"), col("frame_idx"),
          when(col("hp").isNull, lit(null).cast("int"))
            .otherwise(expr("bit_count(h ^ hp)").cast("int")).as("hamming_prev"),
          (col("hp").isNull || expr("bit_count(h ^ hp)") >= 16).as("keyframe"))
    },

    // Audio-style windowed energy: slice the opaque payload into fixed
    // 64-byte "sample windows" and compute RMS energy per window — the
    // audio feature-extraction shape (chunk → per-window kernel) with the
    // kernel running on raw byte values. Fully declarative AND fully
    // oracled via the same ASCII byte==char identity as m_frame_sample:
    // the per-window fold visits positions in index order in both engines.
    GraftQuery("m_audio_energy",
      """WITH win AS (
        |  SELECT doc_id, i AS win_idx, substring(text, i*64 + 1, 64) AS chunk
        |  FROM documents, UNNEST([0,1,2,3]) AS t(i)
        |  WHERE i*64 + 64 <= length(text)),
        |pos AS (SELECT doc_id, win_idx, chunk, unnest(range(1, 65)) AS p FROM win)
        |SELECT doc_id, win_idx,
        |  round(sqrt(sum(pow(ord(substr(chunk, p, 1)) - 96.0, 2)) / 64), 6) AS rms
        |FROM pos GROUP BY doc_id, win_idx""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      // the RMS kernel is the codegen'd graft_byte_energy expression over
      // the raw binary window — one fused loop, value-identical to the
      // interpreted aggregate/ascii/substring fold (same index order)
      assets(s, dir)
        .select(col("asset_id").as("doc_id"), col("payload"),
          octet_length(col("payload")).as("n_bytes"))
        .select(col("doc_id"), col("payload"),
          explode(expr("filter(sequence(0, 3), i -> i*64 + 64 <= n_bytes)")).as("win_idx"))
        .select(col("doc_id"), col("win_idx"),
          expr("round(graft_byte_energy(substring(payload, win_idx*64 + 1, 64)), 6)")
            .as("rms"))
    },

    // Voice-activity detection: threshold the windowed energy, merge
    // consecutive voiced windows into segments, report per-asset segment
    // structure (count, longest run) — the speech-curation pass that
    // decides which audio is worth transcribing. The energy is the
    // INTEGER Σ(b−96)² kernel (graft_byte_ssq), not the double rms: a
    // threshold on a float is one summation-order ULP from flipping
    // across engines, on an exact BIGINT it cannot. Run structure comes
    // from lag + running-sum windows PARTITIONED BY asset (≤16 rows per
    // partition by construction — bounded, the q_events_sessions shape).
    GraftQuery("m_audio_vad",
      s"""WITH win AS (
         |  SELECT doc_id, i AS win_idx,
         |    substring(text, CAST(i*64 + 1 AS BIGINT), 64) AS chunk
         |  FROM documents, UNNEST(range(0, 16)) AS t(i)
         |  WHERE i*64 + 64 <= length(text)),
         |pos AS (SELECT doc_id, win_idx, chunk, unnest(range(1, 65)) AS p FROM win),
         |e AS (SELECT doc_id, win_idx,
         |        CAST(sum((ord(substr(chunk, p, 1)) - 96)
         |          * (ord(substr(chunk, p, 1)) - 96)) AS BIGINT) AS ssq
         |      FROM pos GROUP BY 1, 2),
         |${vadSegmentSql("e")}""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val e = assets(s, dir)
        .select(col("asset_id").as("doc_id"), col("payload"),
          octet_length(col("payload")).as("n_bytes"))
        .select(col("doc_id"), col("payload"),
          explode(expr("filter(sequence(0, 15), i -> i*64 + 64 <= n_bytes)"))
            .as("win_idx"))
        .select(col("doc_id"), col("win_idx").cast("bigint").as("win_idx"),
          expr("graft_byte_ssq(substring(payload, win_idx*64 + 1, 64))")
            .as("ssq"))
      graft.GraftQuery.sqlOn(s, Map("e" -> e),
        "WITH " + vadSegmentSql("{e}"))
    },

    // Resize: downsample each payload to a fixed-size thumbnail by evenly
    // spaced byte sampling (the stub stand-in for an image resize kernel),
    // fused into the codegen'd `graft_byte_sample` expression — the stub
    // kernel is pure byte arithmetic, so it belongs inside whole-stage
    // codegen rather than behind a mapPartitions encoder boundary (a real
    // codec would need the partition-local batch shape; see
    // m_decode_features for that pattern). Output carries the hex rendering
    // only: the raw thumbnail blob is informationally identical and binary
    // columns are not hashable by the oracle diff. Oracled: DuckDB
    // re-derives the 16 sampled byte positions with list_transform over
    // range().
    // Real-pixel resize: the PNG round trip from m_image_decode, then a
    // nearest-neighbor downsample to a fixed 4x4 thumbnail computed on
    // the DECODED pixels (src index = floor(dst * src_dim / 4) — exact
    // integer arithmetic, so DuckDB re-derives every output pixel from
    // the generator formula; any off-by-one in the index map or a codec
    // channel swap breaks the hash). The thumbnail ships as one packed
    // BIGINT per output pixel's red channel sum — 16 integers per asset.
    // ------------------------------------------- REAL lossy (JPEG) codec
    // The standard multimodal-curation thumbnail step, driven
    // DISTRIBUTED through the REAL JDK JPEG codec: render a smooth RGB
    // gradient (channel-distinct: R = x-ramp, G = y-ramp, B = diagonal
    // — a channel swap shows up as ~full-scale error), encode JPEG,
    // decode, nearest-neighbor 4×4 thumbnail from the DECODED pixels,
    // re-encode the thumbnail as JPEG, decode again. JPEG is lossy, so
    // the pixel values can't hash-match an oracle — but the CONTRACT
    // can: dimensions survive both generations exactly, and the
    // double-generation pixel error stays within the quantization
    // bound. Both ride the hash gate as boolean columns the oracle
    // asserts true (a codec misuse — stride, channel order, subsampling
    // bug — flips them and fails the driver compare).
    // OperatorSemanticsSpec additionally proves the bound DETECTS: a
    // deliberate R/B swap blows max_err past it.
    GraftQuery("m_jpeg_thumbs",
      """SELECT doc_id AS asset_id,
        |  CAST(16 + doc_id % 17 AS INTEGER) AS width,
        |  CAST(16 + doc_id % 13 AS INTEGER) AS height,
        |  CAST(4 AS INTEGER) AS thumb_w, CAST(4 AS INTEGER) AS thumb_h,
        |  true AS jpeg_ok, true AS within_bound
        |FROM documents""".stripMargin) { (s, dir) =>
      val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
      val schema = StructType(Seq(
        StructField("asset_id", LongType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("thumb_w", IntegerType, nullable = false),
        StructField("thumb_h", IntegerType, nullable = false),
        StructField("jpeg_ok", BooleanType, nullable = false),
        StructField("within_bound", BooleanType, nullable = false)))
      implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(schema)
      df.mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val w = 16 + (d % 17).toInt
          val h = 16 + (d % 13).toInt
          val img = renderSmooth(w, h)
          val full = jpegRoundTrip(img)
          val jpegOk = full.getWidth == w && full.getHeight == h
          // nearest-neighbor 4x4 on DECODED pixels (bulk raster)
          val px = rgbOf(full)
          val thumb = new java.awt.image.BufferedImage(
            4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val tdata = thumb.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferInt].getData
          var dy = 0
          while (dy < 4) {
            var dx = 0
            while (dx < 4) {
              tdata(dy * 4 + dx) = px((dy * h / 4) * full.getWidth + dx * w / 4)
              dx += 1
            }
            dy += 1
          }
          val thumbBack = jpegRoundTrip(thumb)
          val tpx = rgbOf(thumbBack)
          var maxErr = 0
          var i = 0
          while (i < 16) {
            val a = tdata(i); val b = tpx(i)
            var sh = 0
            while (sh <= 16) {
              maxErr = math.max(maxErr,
                math.abs(((a >> sh) & 0xff) - ((b >> sh) & 0xff)))
              sh += 8
            }
            i += 1
          }
          Row(d, w, h, thumbBack.getWidth, thumbBack.getHeight,
            jpegOk, maxErr <= JpegErrorBound)
        }
      }
    },

    GraftQuery("m_image_resize",
      """WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |              FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(0, 4)) AS dx FROM dims),
        |px AS (SELECT doc_id, w, h, dx, unnest(range(0, 4)) AS dy FROM xs),
        |src AS (SELECT doc_id, dx, dy,
        |          (dx * w) // 4 AS sx, (dy * h) // 4 AS sy, w, h FROM px)
        |SELECT doc_id AS asset_id,
        |  CAST(sum((doc_id * 31 + sx * 7 + sy * 13) % 256) AS BIGINT) AS thumb_r,
        |  CAST(sum((doc_id * 17 + sx * 11 + sy * 5) % 256) AS BIGINT) AS thumb_g,
        |  CAST(sum((doc_id * 7 + sx * 3 + sy * 19) % 256) AS BIGINT) AS thumb_b
        |FROM src GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val df = spreadIds(t(s, dir).documents.select(col("doc_id")))
      val schema = StructType(Seq(
        StructField("asset_id", LongType, nullable = false),
        StructField("thumb_r", LongType, nullable = false),
        StructField("thumb_g", LongType, nullable = false),
        StructField("thumb_b", LongType, nullable = false)))
      implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(schema)
      df.mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val w = 8 + (d % 9).toInt
          val h = 8 + (d % 7).toInt
          val img = renderRgb(d, w, h)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val px = rgbOf(back) // bulk raster read, no per-pixel getRGB
          val bw = back.getWidth
          var (tr, tg, tb) = (0L, 0L, 0L)
          var dy = 0
          while (dy < 4) {
            var dx = 0
            while (dx < 4) {
              val rgb = px((dy * h / 4) * bw + (dx * w / 4))
              tr += (rgb >> 16) & 0xff; tg += (rgb >> 8) & 0xff; tb += rgb & 0xff
              dx += 1
            }
            dy += 1
          }
          Row(d, tr, tg, tb)
        }
      }
    },

    GraftQuery("m_resize",
      """SELECT doc_id AS asset_id,
        |  CASE WHEN length(text) = 0 THEN ''
        |       ELSE list_aggregate(
        |         list_transform(range(0, 16),
        |           i -> format('{:02x}', ord(substr(text,
        |                  CAST(i * length(text) // 16 AS INTEGER) + 1, 1)))),
        |         'string_agg', '') END AS thumb_hex
        |FROM documents""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      assets(s, dir).select(col("asset_id"),
        lower(hex(expr("graft_byte_sample(payload)"))).as("thumb_hex"))
    },

    // Perceptual hash (average-hash family) over the opaque payload: the
    // image-dedup primitive. Map-only, fused into the codegen'd
    // graft_phash63 kernel; the bit pattern is integer arithmetic on 63
    // evenly sampled bytes, so DuckDB re-derives it exactly (ASCII corpus
    // ⇒ byte == char code, as every m_* oracle relies on).
    GraftQuery("m_phash",
      s"""WITH $phashCtes
         |SELECT doc_id AS asset_id, h AS phash FROM ph""".stripMargin) {
      (s, dir) =>
        graft.functions.VectorFunctions.register(s)
        assets(s, dir).select(col("asset_id"),
          expr("graft_phash63(payload)").as("phash"))
    },

    // Perceptual near-duplicate pairs: band the 63-bit hash into four
    // 16-bit windows and equi-join per window (any shared window makes a
    // candidate — by pigeonhole, recall is PERFECT for Hamming ≤ 3), then
    // rerank candidates with the exact popcount distance. At 100 TB the
    // join ships (id, window-key, 8-byte hash) — payload bytes never
    // shuffle and there is never an all-pairs comparison.
    GraftQuery("m_phash_pairs",
      s"""WITH $phashCtes,
         |allbands AS (
         |  SELECT doc_id, h, b, (h >> (b * 16)) & 65535 AS w
         |  FROM ph, UNNEST([0, 1, 2, 3]) AS t(b)),
         |bands AS (
         |  SELECT * FROM (SELECT doc_id, h, b, w,
         |    count(*) OVER (PARTITION BY b, w) AS bsize FROM allbands)
         |  WHERE bsize <= 500),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |                  a.h AS ha, b.h AS hb
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.w = b.w
         |  WHERE a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 8""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val ph = assets(s, dir).select(col("asset_id").as("doc_id"),
        expr("graft_phash63(payload)").as("h"))
      // degenerate-window cap (the minhash shape): identical or trivial
      // payloads piling into one 16-bit window must not go quadratic —
      // the cap (500 ≫ observed sizes here) is mirrored in the oracle
      val bands = graft.util.Buckets.cap(
        ph.select(col("doc_id"), col("h"),
            explode(expr("sequence(0, 3)")).as("b"))
          .withColumn("w", expr("shiftright(h, b * 16) & 65535")),
        500, col("b"), col("w"))
      val a = bands.select(col("b"), col("w"),
        col("doc_id").as("id_a"), col("h").as("ha"))
      val b = bands.select(col("b"), col("w"),
        col("doc_id").as("id_b"), col("h").as("hb"))
      a.join(b, Seq("b", "w")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("ha"), col("hb")).distinct()
        .select(col("id_a"), col("id_b"),
          expr("graft_hamming64(ha, hb)").as("hamming"))
        .filter(col("hamming") <= 8)
    }
  )

  /** DuckDB re-derivation of graft_phash63 over the text payload, as CTEs
    * `sm` (the 63 sampled byte positions) and `ph(doc_id, h)` (the integer
    * mean test + bit packing; 63 bits ⇒ the BIGINT stays non-negative
    * through `<<`). */
  private def phashCtes: String =
    """sm AS (SELECT doc_id,
      |  CASE WHEN length(text) = 0 THEN CAST([] AS INTEGER[]) ELSE
      |    list_transform(range(0, 63),
      |      i -> ord(substr(text, CAST(i * length(text) // 63 AS INTEGER) + 1, 1)))
      |  END AS sm FROM documents),
      |ph AS (SELECT doc_id,
      |  CAST(CASE WHEN len(sm) = 0 THEN 0 ELSE
      |    list_sum(list_transform(range(0, 63),
      |      i -> CASE WHEN sm[i + 1] * 63 > list_sum(sm)
      |                THEN (CAST(1 AS BIGINT) << i) ELSE 0 END))
      |  END AS BIGINT) AS h FROM sm)""".stripMargin
}
