package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image / audio /
  * video payloads ride as opaque `BinaryType` columns with typed metadata
  * structs beside them.
  *
  * The heavy decode (JPEG→pixels, PCM resample, frame sampling) is a
  * per-partition batch operation behind [[decodeStub]] — in this container no
  * media libraries exist, so the decoder is a clearly-marked deterministic
  * fake; the Spark-side contract (schema, batch iteration, partitioning) is
  * real and tested. On a cluster the stub body is replaced by a JNI/library
  * call with the identical signature.
  *
  * Scale: media bytes dominate row size, so the rules are (1) never shuffle
  * the binary column — project metadata first, shuffle that, join back by id
  * if needed; (2) decode via mapPartitions so per-partition decoder state
  * (codec contexts) is reused across rows; (3) size partitions by
  * `maxPartitionBytes` so a partition of blobs fits executor memory.
  */
object Multimodal {

  /** Decoded-media feature record produced by the decode step. */
  case class MediaFeatures(
      media_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  val mediaFeaturesSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType))))

  /** Metadata extraction that needs no decode: byte length, content digest,
    * magic-byte format sniff. Pure codegen'd expressions — this is the cheap
    * pass you run over 100 TB before deciding what to decode.
    */
  def withBinaryMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast(LongType))
      .withColumn("content_sha256", sha2(col(binCol), 256))
      .withColumn("format", sniffFormat(col(binCol)))

  /** Magic-byte container sniff over the first bytes of the payload. */
  def sniffFormat(bin: Column): Column = {
    val hexHead = hex(substring(bin, 1, 12))
    when(hexHead.startsWith("FFD8FF"), "jpeg")
      .when(hexHead.startsWith("89504E47"), "png")
      .when(hexHead.startsWith("52494646"), "riff_wav_avi")
      .when(hexHead.startsWith("494433") || hexHead.startsWith("FFFB"), "mp3")
      .when(substring(bin, 5, 4) === lit("ftyp".getBytes("US-ASCII")), "mp4")
      .otherwise("unknown")
  }

  /** Per-partition media decode + feature extraction.
    *
    * STUB DECODER: media codecs are unavailable in this environment, so
    * dimensions/frames/features are computed as a deterministic function of
    * the payload bytes (stable across runs, so downstream plumbing is
    * testable). Replace `decodeOne` with the real codec call to productionize
    * — the partitioning, batching, and output schema do not change.
    */
  def decodeStub(df: DataFrame, binCol: String, idCol: String, featureDim: Int = 8): DataFrame = {
    import df.sparkSession.implicits._
    val input = df.select(col(idCol).cast(LongType), col(binCol)).as[(Long, Array[Byte])]
    input.mapPartitions { rows =>
      // per-partition "codec context" initialized once (real decoders are
      // expensive to construct — this is the pattern that amortizes them)
      rows.map { case (id, bytes) => decodeOne(id, bytes, featureDim) }
    }.toDF()
  }

  private def decodeOne(id: Long, bytes: Array[Byte], featureDim: Int): MediaFeatures = {
    val n = if (bytes == null) 0 else bytes.length
    // ??? — real implementation: codec.decode(bytes) → pixels/samples.
    // Deterministic fake below derives every field from the payload content.
    // The arithmetic is deliberately SQL-replicable (int32 31-polynomial over
    // signed bytes = java.util.Arrays.hashCode; power-of-two feature
    // quantization so float/double conversions are exact) — the DuckDB oracle
    // reproduces the full decode output bit for bit, which keeps the
    // mapPartitions row contract under the driver's hard correctness signal
    // even though the codec itself is a stub.
    val h = java.util.Arrays.hashCode(bytes)
    val feature = Array.tabulate(featureDim)(i =>
      ((h * 31 + i) & 0x7fffffff) % 1024 / 1024.0f)
    MediaFeatures(
      media_id = id, n_bytes = n.toLong,
      format = if (n >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg" else "unknown",
      width = if (n == 0) 0 else 16 + math.abs(h % 1024),
      height = if (n == 0) 0 else 16 + math.abs(h / 1024 % 1024),
      n_frames = 1 + math.abs(h % 32),
      feature = feature)
  }

  /** Decoded-image stat record produced by [[decodeImages]]. */
  case class ImageStats(
      media_id: Long, width: Long, height: Long,
      mean_r: Double, mean_g: Double, mean_b: Double, checksum: Long)

  /** REAL image decode (r11 — the stub upgrade): `javax.imageio` BMP/PNG
    * decode behind the same per-partition contract as [[decodeStub]]. The
    * decoder context (`ImageIO` readers resolved once per partition via the
    * registry scan) amortizes across the partition's rows; per row the bytes
    * stream through `ImageIO.read` into a `BufferedImage` and reduce to
    * per-channel means + an order-free pixel checksum — genuinely decoded
    * pixels, not payload arithmetic. Undecodable payloads (no codec,
    * truncated file) emit a null-stats row with width = height = 0 rather
    * than killing the partition — the production contract for dirty corpora.
    *
    * Scale: identical to [[decodeStub]] — binary column never shuffles, the
    * decode is a narrow mapPartitions, partitions sized by
    * `maxPartitionBytes` so a blob batch fits executor memory.
    */
  def decodeImages(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val input = df.select(col(idCol).cast(LongType), col(binCol)).as[(Long, Array[Byte])]
    input.mapPartitions { rows =>
      // per-partition decoder state: one reusable stream wrapper per batch —
      // ImageIO's reader registry is scanned once per JVM, and the
      // BufferedImage working buffers are allocated per image by the codec
      rows.map { case (id, bytes) =>
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch {
            // NonFatal, not just IOException: ImageIO codecs throw
            // RuntimeExceptions (IllegalArgumentException, CMMException,
            // IndexOutOfBoundsException, NegativeArraySizeException) on
            // adversarially malformed containers — on a dirty 100 TB corpus
            // one such payload must land on the null-stats row, not kill the
            // partition (and, with retries, the job)
            case scala.util.control.NonFatal(_) => null
          }
        if (img == null) ImageStats(id, 0L, 0L, Double.NaN, Double.NaN, Double.NaN, -1L)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          ImageStats(id, w.toLong, h.toLong, sr / n, sg / n, sb / n, sr + sg + sb)
        }
      }
    }.toDF()
  }

  /** Per-image perceptual hash record produced by [[dHash]]. */
  case class ImageHash(media_id: Long, dhash: Long)

  /** Difference-hash (dHash) perceptual fingerprint: the sign of the
    * luminance gradient between adjacent pixels, packed into a long — row
    * gradients first (bit y·(w−1)+x set iff gray(x+1,y) > gray(x,y)), then
    * column gradients (bit rowBits+y·w+x iff gray(x,y+1) > gray(x,y)).
    * Gray = r+g+b (integer sum, no division — exact, oracle-restatable).
    * Classic dHash resamples to 9×8 first; here the hash runs on the native
    * raster (the fixtures are 4×4 → 24 bits) — the resample step is a
    * pre-processing policy, the gradient-sign structure is the operator.
    *
    * This is the MULTIMODAL member of the near-dup family: byte-identical
    * images share a content hash ([[withBinaryMetadata]]'s sha256), but
    * re-encoded/recompressed copies don't — dHash survives codec round-trips
    * (the PNG fixture of an id hashes identically to its BMP twin, gated).
    * Undecodable payloads emit dhash = −1, the null-stats contract.
    *
    * Scale: same as [[decodeImages]] — narrow mapPartitions, binary column
    * never shuffles; downstream dedup groups on the 8-byte hash.
    */
  def dHash(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case scala.util.control.NonFatal(_) => null }
        ImageHash(id, rasterDHash(img))
      }).toDF()
  }

  /** The dHash gradient walk over a decoded raster, shared by [[dHash]] and
    * [[imageMeta]]. Gradient bits must fit one long: a raster with
    * h(w−1)+(h−1)w > 64 would wrap the shift amounts mod 64 and silently
    * fold distinct gradients onto shared bit positions (unrelated images
    * hashing equal) — such rasters land on the −1 sentinel like undecodable
    * payloads; classic dHash's 9×8 pre-resample is the policy that brings
    * arbitrary rasters under the cap.
    */
  private def rasterDHash(img: java.awt.image.BufferedImage): Long = {
    if (img == null ||
        img.getHeight * (img.getWidth - 1) + (img.getHeight - 1) * img.getWidth > 64)
      return -1L
    val w = img.getWidth
    val h = img.getHeight
    def g(x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    }
    var hash = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        if (g(x + 1, y) > g(x, y)) hash |= 1L << (y * (w - 1) + x)
        x += 1
      }
      y += 1
    }
    val rowBits = h * (w - 1)
    y = 0
    while (y < h - 1) {
      var x = 0
      while (x < w) {
        if (g(x, y + 1) > g(x, y)) hash |= 1L << (rowBits + y * w + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Decoded-image identity record produced by [[imageMeta]]: container-
    * independent dimensions, channel count, and the perceptual dHash — the
    * fields a LOSSY codec preserves exactly, which is what makes this the
    * JPEG gate (the per-pixel stats of [[decodeImages]] are only
    * formula-restatable for lossless containers).
    */
  case class ImageMetaRow(media_id: Long, width: Long, height: Long,
      channels: Long, dhash: Long)

  /** One-pass decode → (dims, channels, dHash) for ANY `javax.imageio`
    * container — BMP, PNG, and crucially JPEG, the format real web corpora
    * are dominated by (r13). JPEG is lossy, so raster bytes are not
    * formula-restatable; dims/channels survive exactly and the dHash
    * gradient signs survive any sane quality level when the source image's
    * adjacent-luminance margins exceed the codec error (the committed
    * fixtures guarantee ≥60 gray levels per channel vs ≲5 of JPEG noise at
    * q=0.95 — see [[jpegRaster]]). Undecodable payloads land on the
    * (0, 0, 0, −1) sentinel row, the [[decodeImages]] dirty-corpus contract.
    *
    * Scale: identical to [[decodeImages]] — narrow mapPartitions, the
    * binary column never shuffles.
    */
  def imageMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImageMetaRow(id, 0L, 0L, 0L, -1L)
        else ImageMetaRow(id, img.getWidth.toLong, img.getHeight.toLong,
          img.getRaster.getNumBands.toLong, rasterDHash(img))
      }).toDF()
  }

  /** The JPEG fixture raster: 6×6 grayscale-in-RGB where
    * `gray(x, y) = 40 + 20·((3x + 5y + id) mod 9)` on all three channels.
    * Designed for codec-noise-proof gradient signs: adjacent cells differ by
    * ±60 or ∓120 gray levels per channel (the mod-9 lattice never produces a
    * tie), so JPEG quantization error at quality 0.95 (≲5 levels) can never
    * flip a dHash bit — dims, channels, and dHash are EXACT decode
    * invariants even through the lossy codec. 6×6 keeps the gradient-bit
    * count at 60 ≤ 64.
    */
  def jpegRaster(id: Long, w: Int = 6, h: Int = 6): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (40 + 20 * (((3 * x + 5 * y + id) % 9 + 9) % 9)).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Real JPEG encode at an explicit quality (ImageIO's bare `write` hides
    * the quality knob at 0.75; the fixtures pin 0.95 so the margin math in
    * [[jpegRaster]] holds).
    */
  def encodeJpeg(img: java.awt.image.BufferedImage, quality: Float = 0.95f): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val buf = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(buf)
    try {
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { out.close(); writer.dispose() }
    buf.toByteArray
  }

  /** Real GIF encode (r14 — the third real ImageIO codec beside BMP/PNG and
    * JPEG): palette-based, so a raster with ≤256 distinct colors — the
    * [[jpegRaster]] formula has 9 grays — round-trips LOSSLESSLY
    * (empirically bit-exact through the JDK encoder/decoder), which makes
    * the decode gate strictly stronger than JPEG's: the oracle restates the
    * raster FORMULA and the decoded pixels must land on it exactly, not
    * merely within quantization-safe margins. The decoded image is indexed
    * (TYPE_BYTE_BINARY, raster bands = 1) — the channels column records
    * that, and [[rasterDHash]] reads through `getRGB` (color-model
    * resolved), so the hash is representation-independent.
    */
  def encodeGif(img: java.awt.image.BufferedImage): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", buf)
    buf.toByteArray
  }

  /** Tri-codec payload fixture (r14): for each id, THREE encodings of the
    * same [[jpegRaster]] — PNG (lossless deflate), GIF (lossless palette),
    * JPEG (lossy, margin-safe) — as media_id = id·10 + {1 png, 2 gif,
    * 3 jpeg}. The cross-codec dedup gate proves the perceptual key is
    * CODEC-INVARIANT: all three encodings of a raster (and every id sharing
    * its mod-9 lattice class) fold into one dHash cluster. Built per
    * partition like every payload fixture — bytes never shuffle.
    */
  def withTriCodecPayload(ids: DataFrame, idCol: String): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions(_.flatMap { id =>
        val img = jpegRaster(id)
        val png = {
          val b = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", b)
          b.toByteArray
        }
        Seq((id * 10 + 1, png), (id * 10 + 2, encodeGif(img)),
          (id * 10 + 3, encodeJpeg(img)))
      }).toDF("media_id", "payload")
  }

  /** Deterministic 24-bit BMP fixture bytes: pixel-array byte j carries
    * `(id·131 + j·7) mod 256` — pure integer arithmetic an oracle can
    * restate WITHOUT decoding, which is exactly what makes [[decodeImages]]
    * oracle-checkable end to end: the Spark side must parse the real BMP
    * container and surface the real raster for the stats to land on the
    * formula values. 4×4 keeps rows 4-byte aligned (no padding ambiguity)
    * and the pixel count a power of two (mean division exact in IEEE).
    * BMP stores BGR bottom-up; both are order/channel-mapped in the dual.
    */
  def bmp24(id: Long, w: Int = 4, h: Int = 4): Array[Byte] = {
    require(w * 3 % 4 == 0, "row stride must be 4-byte aligned (no pad bytes)")
    val pixelBytes = w * h * 3
    val out = java.nio.ByteBuffer.allocate(54 + pixelBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
      .putInt(54 + pixelBytes).putShort(0).putShort(0).putInt(54) // file header
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)   // info header
      .putInt(0).putInt(pixelBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var j = 0
    while (j < pixelBytes) {
      out.put(((id * 131 + j * 7) % 256).toByte)
      j += 1
    }
    out.array()
  }

  /** Attach [[bmp24]] fixture payloads to an id frame — the corpus-derived
    * media table the decode queries read (ids from the sf dir, bytes built
    * per-partition; the binary column is born distributed, never collected).
    */
  def withBmpPayload(ids: DataFrame, idCol: String): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions(_.map(id => (id, bmp24(id))))
      .toDF("media_id", "payload")
  }

  /** Adversarially malformed container bytes — a [[bmp24]] truncated mid
    * pixel array (valid magic + header, missing raster), the classic dirty-
    * corpus payload. [[decodeImages]] must land it on the null-stats row
    * (width = height = 0, NaN means, checksum −1), never kill the partition.
    */
  def corruptBmp(id: Long): Array[Byte] = bmp24(id).take(58)

  /** Append one corrupt-container row (media_id = −1, [[corruptBmp]] bytes)
    * to a (media_id, payload) fixture frame — the poisoned-partition row the
    * gated decode queries carry so the dirty-input contract is itself
    * hash-gated, not just spec'd.
    */
  def withCorruptRow(payloads: DataFrame): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.unionByName(
      Seq((-1L, corruptBmp(-1L))).toDF("media_id", "payload"))
  }

  /** PNG round-trip twin: the same formula raster encoded to REAL PNG bytes
    * (`ImageIO.write` — zlib-compressed, a genuinely non-trivial container)
    * per partition, for [[decodeImages]] to decode back. Proves the decode
    * path through a compressed codec; the oracle states the raster formula.
    */
  def withPngPayload(ids: DataFrame, idCol: String, w: Int = 4, h: Int = 4): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { it =>
        val buf = new java.io.ByteArrayOutputStream()
        it.map { id =>
          // same byte formula as bmp24, mapped to (x, y, channel) through the
          // BMP layout (BGR, bottom-up) so ONE oracle text covers both
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val base = ((h - 1 - y) * w + x) * 3
              def v(off: Int) = ((id * 131 + (base + off) * 7) % 256).toInt
              img.setRGB(x, y, (v(2) << 16) | (v(1) << 8) | v(0))
              x += 1
            }
            y += 1
          }
          buf.reset()
          javax.imageio.ImageIO.write(img, "png", buf)
          (id, buf.toByteArray)
        }
      }.toDF("media_id", "payload")
  }

  // --------------------------------------------------------------------
  // Audio (WAV/RIFF, PCM16 mono) — the second modality branch. Same design
  // as the image family: a REAL container (44-byte canonical RIFF header +
  // little-endian PCM16 samples) built per partition from a pure integer
  // formula, a REAL chunk-walking parser behind the per-partition decode
  // contract, and stats/fingerprints in exact integer arithmetic so the
  // DuckDB dual restates the sample formula WITHOUT decoding — the decode
  // itself is what the hash gate proves.
  // --------------------------------------------------------------------

  /** Decoded-audio stat record produced by [[decodeWav]]. */
  case class AudioStats(media_id: Long, sample_rate: Long, n_samples: Long,
      total_energy: Long, peak_abs: Long)

  /** Per-asset acoustic fingerprint record produced by [[audioFingerprint]]. */
  case class AudioFp(media_id: Long, n_frames: Long, afp: Long)

  /** Deterministic PCM16 mono WAV fixture: sample t carries
    * `((id·31 + t²·7) mod 4096) − 2048` — pure integer arithmetic the oracle
    * restates without parsing, in [−2048, 2047] so it fits PCM16 with
    * headroom. 256 samples / 8 kHz keeps frame math exact (8 frames of 32).
    * Canonical RIFF layout: `RIFF` size `WAVE` + `fmt ` (PCM, mono, 16-bit)
    * + `data` chunk of little-endian shorts.
    */
  def wav16(id: Long, sampleRate: Int = 8000, nSamples: Int = 256): Array[Byte] = {
    val dataBytes = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                       // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)     // byte rate = sr·2
      .putShort(2).putShort(16)                      // block align, bits
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var t = 0
    while (t < nSamples) {
      out.putShort((((id * 31 + t.toLong * t * 7) % 4096) - 2048).toShort)
      t += 1
    }
    out.array()
  }

  /** Attach [[wav16]] fixture payloads to an id frame — the audio twin of
    * [[withBmpPayload]]: bytes are born distributed, never collected.
    */
  def withWavPayload(ids: DataFrame, idCol: String): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions(_.map(id => (id, wav16(id))))
      .toDF("media_id", "payload")
  }

  /** Deterministic PCM16 mono AIFF fixture (r15 — the SECOND real audio
    * container, the audio twin of the image family's PNG/GIF/JPEG spread):
    * the SAME sample formula as [[wav16]] inside an IFF `FORM…AIFF`
    * container — big-endian throughout, `COMM` carrying the sample rate as
    * the real 80-bit extended float (sign/15-bit exponent/64-bit mantissa,
    * the one genuinely AIFF-specific encoding), `SSND` with offset/blockSize
    * prelude and big-endian PCM16. Same id ⇒ byte-DIFFERENT container,
    * IDENTICAL decoded stream — the cross-container dedup contract.
    */
  def aiff16(id: Long, sampleRate: Int = 8000, nSamples: Int = 256): Array[Byte] = {
    val dataBytes = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(54 + dataBytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    out.put("FORM".getBytes("US-ASCII")).putInt(46 + dataBytes)
      .put("AIFF".getBytes("US-ASCII"))
    out.put("COMM".getBytes("US-ASCII")).putInt(18)
      .putShort(1)                                    // channels
      .putInt(nSamples)                               // sample frames (mono)
      .putShort(16)                                   // bits
    // 80-bit extended float: exponent = 16383 + floor(log2(sr)), mantissa =
    // sr << (63 − floor(log2(sr))) — integer rates are exact
    val p = 63 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
    out.putShort((16383 + p).toShort).putLong(sampleRate.toLong << (63 - p))
    out.put("SSND".getBytes("US-ASCII")).putInt(8 + dataBytes)
      .putInt(0).putInt(0)                            // offset, blockSize
    var t = 0
    while (t < nSamples) {
      out.putShort((((id * 31 + t.toLong * t * 7) % 4096) - 2048).toShort)
      t += 1
    }
    out.array()
  }

  /** Attach [[aiff16]] payloads to an id frame — [[withWavPayload]]'s AIFF
    * twin.
    */
  def withAiffPayload(ids: DataFrame, idCol: String): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions(_.map(id => (id, aiff16(id))))
      .toDF("media_id", "payload")
  }

  /** Dual-container payload fixture (r15): for each id, the SAME PCM stream
    * (class c = id mod 7, spread into the formula's varied-fingerprint
    * region via key = c·9 + 1 — consecutive small keys share delta signs)
    * encoded as BOTH containers — media_id = id·10 + {1 wav, 2 aiff}. The
    * cross-container dedup gate proves the acoustic fingerprint is
    * CONTAINER-INVARIANT: every encoding of a stream class folds into one
    * afp cluster, the audio mirror of [[withTriCodecPayload]]'s
    * codec-invariant dHash. (Two of the seven classes legitimately share a
    * fingerprint — the merged cluster exercises n_streams > 1.)
    */
  def withDualContainerPayload(ids: DataFrame, idCol: String): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions(_.flatMap { id =>
        val key = (((id % 7) + 7) % 7) * 9 + 1
        Seq((id * 10 + 1, wav16(key)), (id * 10 + 2, aiff16(key)))
      }).toDF("media_id", "payload")
  }

  /** Malformed audio container: valid RIFF magic, truncated before the data
    * chunk completes its declaration — [[decodeWav]] must land it on the
    * null-stats row, never kill the partition.
    */
  def corruptWav(id: Long): Array[Byte] = wav16(id).take(30)

  /** [[corruptWav]]'s AIFF twin: valid FORM/AIFF magic, truncated inside the
    * COMM chunk — the parser must land it on the null-stats contract.
    */
  def corruptAiff(id: Long): Array[Byte] = aiff16(id).take(20)

  /** Append one corrupt-AIFF row (media_id = −1, matching the shared
    * null-stats oracle row) — the AIFF arm of the poisoned-row discipline.
    */
  def withCorruptAiffRow(payloads: DataFrame): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.unionByName(
      Seq((-1L, corruptAiff(-1L))).toDF("media_id", "payload"))
  }

  /** Append one corrupt-container row (media_id = −1, [[corruptWav]] bytes)
    * to a (media_id, payload) frame — same poisoned-row discipline as
    * [[withCorruptRow]].
    */
  def withCorruptWavRow(payloads: DataFrame): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.unionByName(
      Seq((-1L, corruptWav(-1L))).toDF("media_id", "payload"))
  }

  /** Parse a WAV payload into (sampleRate, PCM16 samples), or null when the
    * container is malformed. A real chunk walker (not a fixed-offset read):
    * validates RIFF/WAVE magic, walks chunk headers honoring sizes + word
    * alignment, requires PCM/mono/16-bit from `fmt `, bounds-checks `data`.
    */
  private def parseWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    if (bytes == null || bytes.length < 12) return null
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(at: Int): String =
      new String(bytes, at, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return null
    var pos = 12
    var fmtOk = false
    var sampleRate = 0
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val cid = fourcc(pos)
      val csize = buf.getInt(pos + 4)
      // Long arithmetic: an adversarial csize near Int.MaxValue overflows
      // the Int sum negative, sneaks past the bound, and the data-chunk
      // allocation below becomes a fatal ~2 GB OutOfMemoryError that no
      // NonFatal handler catches — Long comparison keeps the hostile
      // container on the null-stats contract instead
      if (csize < 0 || pos.toLong + 8L + csize.toLong > bytes.length) return null
      cid match {
        case "fmt " if csize >= 16 =>
          val fmt = buf.getShort(pos + 8)
          val ch = buf.getShort(pos + 10)
          val bits = buf.getShort(pos + 22)
          sampleRate = buf.getInt(pos + 12)
          fmtOk = fmt == 1 && ch == 1 && bits == 16 && sampleRate > 0
        case "data" =>
          val n = csize / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
        case _ => () // unknown chunks are legal RIFF — skip them
      }
      pos += 8 + csize + (csize & 1) // RIFF chunks are word-aligned
    }
    if (!fmtOk || samples == null) null else (sampleRate, samples)
  }

  /** Parse an AIFF payload into (sampleRate, PCM16 samples), or null when
    * malformed — [[parseWav]]'s big-endian IFF twin (r15): validates
    * FORM/AIFF magic, walks chunks with Long-guarded sizes + word alignment,
    * requires mono/16-bit from `COMM` (decoding the 80-bit extended sample
    * rate: value = mantissa >>> (16446 − exponent) for integral rates),
    * honors `SSND`'s offset prelude, reads big-endian shorts.
    */
  private def parseAiff(bytes: Array[Byte]): (Int, Array[Short]) = {
    if (bytes == null || bytes.length < 12) return null
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    def fourcc(at: Int): String = new String(bytes, at, 4, "US-ASCII")
    if (fourcc(0) != "FORM" || fourcc(8) != "AIFF") return null
    var pos = 12
    var commOk = false
    var sampleRate = 0
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val cid = fourcc(pos)
      val csize = buf.getInt(pos + 4)
      if (csize < 0 || pos.toLong + 8L + csize.toLong > bytes.length) return null
      cid match {
        case "COMM" if csize >= 18 =>
          val ch = buf.getShort(pos + 8)
          val bits = buf.getShort(pos + 14)
          val exp = java.lang.Short.toUnsignedInt(buf.getShort(pos + 16))
          val mant = buf.getLong(pos + 18)
          val shift = 16446 - exp
          sampleRate =
            if (shift >= 0 && shift <= 63) (mant >>> shift).toInt else 0
          commOk = ch == 1 && bits == 16 && sampleRate > 0
        case "SSND" if csize >= 8 =>
          val off = buf.getInt(pos + 8)
          if (off < 0 || 8L + off > csize.toLong) return null
          val n = (csize - 8 - off) / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort(pos + 16 + off + i * 2); i += 1 }
        case _ => () // unknown chunks are legal IFF — skip them
      }
      pos += 8 + csize + (csize & 1)
    }
    if (!commOk || samples == null) null else (sampleRate, samples)
  }

  /** Container dispatch: RIFF → [[parseWav]], FORM → [[parseAiff]], anything
    * else null — one decode surface over both real containers, so every
    * stat/fingerprint consumer is container-invariant by construction.
    */
  private def parseAudio(bytes: Array[Byte]): (Int, Array[Short]) = {
    if (bytes == null || bytes.length < 12) return null
    new String(bytes, 0, 4, "US-ASCII") match {
      case "RIFF" => parseWav(bytes)
      case "FORM" => parseAiff(bytes)
      case _ => null
    }
  }

  /** REAL audio decode: RIFF/PCM16 or AIFF/PCM16 ([[parseAudio]] container
    * dispatch, r15) behind the per-partition contract
    * of [[decodeImages]] — narrow mapPartitions, binary column never
    * shuffles; stats are exact integers (energy = Σ s², peak = max |s|) so
    * the dual restates them from the sample formula. Undecodable payloads
    * emit the null-stats row (rate = samples = 0, energy = peak = −1).
    */
  def decodeWav(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val parsed =
          try parseAudio(bytes)
          catch { case scala.util.control.NonFatal(_) => null }
        if (parsed == null) AudioStats(id, 0L, 0L, -1L, -1L)
        else {
          val (sr, s) = parsed
          var energy = 0L
          var peak = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            energy += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          AudioStats(id, sr.toLong, s.length.toLong, energy, peak)
        }
      }).toDF()
  }

  /** Acoustic fingerprint (chromaprint-style energy-delta signs): the decoded
    * PCM divides into fixed 32-sample frames, E[f] = Σ s² per frame (exact
    * longs), and bit f of the fingerprint is sign(E[f+1] − E[f]) — the
    * audio member of the near-dup family, robust to container-level
    * re-encoding exactly as [[dHash]] is for rasters. Undecodable → −1.
    */
  def audioFingerprint(df: DataFrame, binCol: String, idCol: String,
      frame: Int = 32): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val parsed =
          try parseAudio(bytes)
          catch { case scala.util.control.NonFatal(_) => null }
        if (parsed == null) AudioFp(id, -1L, -1L)
        else {
          val s = parsed._2
          val nf = s.length / frame
          val e = Array.tabulate(nf) { f =>
            var acc = 0L
            var i = f * frame
            val end = i + frame
            while (i < end) { acc += s(i).toLong * s(i); i += 1 }
            acc
          }
          var fp = 0L
          var f = 0
          while (f < nf - 1) {
            if (e(f + 1) > e(f)) fp |= 1L << f
            f += 1
          }
          AudioFp(id, nf.toLong, fp)
        }
      }).toDF()
  }

  /** Deterministic frame-sample selector: which of `nFrames` frames to keep at
    * `rate` frames-per-frame-count. Pure expression, used to plan decode work
    * before touching bytes.
    */
  def frameSampleIndices(nFrames: Column, every: Int): Column =
    // zero-frame guard: sequence(0, -1) would default to a DESCENDING step
    // and plan frame 0 of an asset that has none
    when(nFrames <= 0, array().cast("array<long>"))
      .otherwise(filter(sequence(lit(0L), nFrames.cast("long") - 1), i => i % every === 0))
}
