package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2, 3)),
    (2L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)),
    (3L, "plain text bytes".getBytes("UTF-8"))
  ).toDF("media_id", "payload")

  test("withBinaryMetadata: byte length, sha256 digest, magic-byte sniff — no decode") {
    val out = Multimodal.withBinaryMetadata(media, "payload")
    val r = rows(out.orderBy("media_id")).map(x =>
      (x.getAs[Long]("n_bytes"), x.getAs[String]("format")))
    r shouldBe Seq((7L, "jpeg"), (8L, "png"), (16L, "unknown"))
    rows(out.filter(col("media_id") === 3L).select("content_sha256")).head.getString(0) should
      fullyMatch regex "[0-9a-f]{64}"
  }

  test("decodeImages: real ImageIO BMP decode lands on the independent raster formula; " +
       "corrupt payloads degrade to a null-stats row, not a task failure") {
    val ids = Seq(5L, 6L).toDF("doc_id")
    val out = rows(Multimodal.decodeImages(
      Multimodal.withBmpPayload(ids, "doc_id"), "payload", "media_id")
      .orderBy("media_id"))
    // formula computed here WITHOUT touching the decode path: byte j of the
    // pixel array is (id·131 + j·7) mod 256; checksum = Σ all 48 bytes
    def checksum(id: Long) = (0 until 48).map(j => (id * 131 + j * 7) % 256).sum
    out.map(_.getAs[Long]("media_id")) shouldBe Seq(5L, 6L)
    out.foreach { r =>
      r.getAs[Long]("width") shouldBe 4L
      r.getAs[Long]("height") shouldBe 4L
      r.getAs[Long]("checksum") shouldBe checksum(r.getAs[Long]("media_id"))
    }
    // PNG round-trip through the zlib codec reaches the identical raster
    val png = rows(Multimodal.decodeImages(
      Multimodal.withPngPayload(ids, "doc_id"), "payload", "media_id")
      .orderBy("media_id"))
    png.map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("checksum"))) shouldBe
      out.map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("checksum")))
    // truncation: ImageIO cannot decode 10 header bytes → contract row
    val bad = Seq((9L, Multimodal.bmp24(9L).take(10))).toDF("media_id", "payload")
    val badRow = rows(Multimodal.decodeImages(bad, "payload", "media_id")).head
    badRow.getAs[Long]("width") shouldBe 0L
    badRow.getAs[Long]("checksum") shouldBe -1L
    // the gated fixture's corrupt row (withCorruptRow): mid-raster truncation
    // with a VALID header — lands on the same contract row
    val mixed = rows(Multimodal.decodeImages(
      Multimodal.withCorruptRow(Multimodal.withBmpPayload(ids, "doc_id")),
      "payload", "media_id").orderBy("media_id"))
    mixed.map(_.getAs[Long]("media_id")) shouldBe Seq(-1L, 5L, 6L)
    mixed.head.getAs[Long]("width") shouldBe 0L
    mixed.head.getAs[Long]("checksum") shouldBe -1L
  }

  /** Hostile codec SPI: claims payloads with magic "GRFT" then throws a
    * RuntimeException from read() — the failure class the JDK's own
    * hardened BMP/PNG/JPEG readers no longer exhibit (verified: truncated /
    * bogus-header / corrupt-zlib / bad-RLE containers all surface as
    * IIOException today) but third-party and older codecs do
    * (CMMException, IndexOutOfBoundsException, NegativeArraySizeException).
    */
  private class HostileSpi extends javax.imageio.spi.ImageReaderSpi(
      "graft-test", "1.0", Array("grft"), Array("grft"),
      Array("application/x-grft"), "graft.MultimodalSpec$HostileReader",
      Array[Class[_]](classOf[javax.imageio.stream.ImageInputStream]),
      null, false, null, null, null, null, false, null, null, null, null) {
    override def canDecodeInput(src: Object): Boolean = {
      val s = src.asInstanceOf[javax.imageio.stream.ImageInputStream]
      val b = new Array[Byte](4)
      s.mark()
      val n = s.read(b)
      s.reset()
      n == 4 && new String(b, "US-ASCII") == "GRFT"
    }
    override def getDescription(l: java.util.Locale) = "graft hostile test codec"
    override def createReaderInstance(ext: Object): javax.imageio.ImageReader =
      new javax.imageio.ImageReader(this) {
        private def boom = throw new IllegalArgumentException("hostile codec")
        override def getNumImages(allowSearch: Boolean) = 1
        override def getWidth(i: Int): Int = boom
        override def getHeight(i: Int): Int = boom
        override def getImageTypes(i: Int): java.util.Iterator[javax.imageio.ImageTypeSpecifier] = boom
        override def getStreamMetadata(): javax.imageio.metadata.IIOMetadata = null
        override def getImageMetadata(i: Int): javax.imageio.metadata.IIOMetadata = null
        override def read(i: Int, p: javax.imageio.ImageReadParam): java.awt.image.BufferedImage = boom
      }
  }

  test("decodeImages: a RuntimeException-throwing codec degrades to the null-stats row " +
       "(NonFatal, not just IOException) and the rest of the partition decodes") {
    val spi = new HostileSpi
    val reg = javax.imageio.spi.IIORegistry.getDefaultInstance
    reg.registerServiceProvider(spi)
    try {
      val df = Seq(
        (1L, "GRFThostile-payload".getBytes("US-ASCII")),
        (5L, Multimodal.bmp24(5L))).toDF("media_id", "payload").coalesce(1)
      val out = rows(Multimodal.decodeImages(df, "payload", "media_id").orderBy("media_id"))
      out.map(_.getAs[Long]("media_id")) shouldBe Seq(1L, 5L)
      out(0).getAs[Long]("width") shouldBe 0L
      out(0).getAs[Long]("checksum") shouldBe -1L
      out(1).getAs[Long]("width") shouldBe 4L // same partition survived
    } finally reg.deregisterServiceProvider(spi)
  }

  test("dHash: perceptual fingerprint survives the codec round-trip (BMP twin == PNG twin), " +
       "corrupt containers emit -1") {
    val ids = Seq(3L, 7L, 11L).toDF("doc_id")
    def hashes(payloads: org.apache.spark.sql.DataFrame) =
      rows(Multimodal.dHash(payloads, "payload", "media_id").orderBy("media_id"))
        .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("dhash")))
    val bmp = hashes(Multimodal.withBmpPayload(ids, "doc_id"))
    val png = hashes(Multimodal.withPngPayload(ids, "doc_id"))
    // the re-encoded copy fingerprints identically — the property that makes
    // dHash the multimodal near-dup key where sha256 sees different bytes
    png shouldBe bmp
    bmp.map(_._2).foreach(_ should be >= 0L)
    hashes(Multimodal.withCorruptRow(Multimodal.withBmpPayload(ids, "doc_id")))
      .head shouldBe (-1L, -1L)
  }

  test("decodeStub: deterministic per-content features with the production schema") {
    val out1 = rows(Multimodal.decodeStub(media, "payload", "media_id").orderBy("media_id"))
    val out2 = rows(Multimodal.decodeStub(media, "payload", "media_id").orderBy("media_id"))
    out1 shouldBe out2 // deterministic fake
    out1.head.getAs[String]("format") shouldBe "jpeg"
    out1.foreach { r =>
      r.getAs[Seq[Float]]("feature").length shouldBe 8
      r.getAs[Int]("width") should be > 0
    }
  }

  test("decodeWav: chunk-walking RIFF/PCM16 parse reproduces the sample formula's " +
       "exact stats; truncated and garbage containers land on the null-stats row") {
    val ids = Seq(0L, 5L, 9L).toDF("doc_id")
    val out = rows(Multimodal.decodeWav(
        Multimodal.withWavPayload(ids, "doc_id"), "payload", "media_id")
      .orderBy("media_id"))
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      r.getAs[Long]("sample_rate") shouldBe 8000L
      r.getAs[Long]("n_samples") shouldBe 256L
      val samples = (0 until 256).map(t => ((id * 31 + t.toLong * t * 7) % 4096) - 2048)
      r.getAs[Long]("total_energy") shouldBe samples.map(v => v * v).sum
      r.getAs[Long]("peak_abs") shouldBe samples.map(math.abs).max
    }
    // poisoned rows: truncated container AND non-RIFF garbage both survive
    val dirty = rows(Multimodal.decodeWav(
        Multimodal.withCorruptWavRow(Multimodal.withWavPayload(ids, "doc_id"))
          .unionByName(Seq((-2L, Array.fill[Byte](64)(42))).toDF("media_id", "payload")),
        "payload", "media_id")
      .orderBy("media_id"))
    dirty.take(2).foreach { r =>
      r.getAs[Long]("sample_rate") shouldBe 0L
      r.getAs[Long]("total_energy") shouldBe -1L
    }
  }

  test("audioFingerprint: energy-delta sign bits match the direct computation; " +
       "an appended extra RIFF chunk (re-containerized copy) fingerprints identically") {
    val ids = Seq(2L, 6L).toDF("doc_id")
    def direct(id: Long): Long = {
      val s = (0 until 256).map(t => ((id * 31 + t.toLong * t * 7) % 4096) - 2048)
      val e = s.grouped(32).map(fr => fr.map(v => v * v).sum).toArray
      (0 until 7).foldLeft(0L)((acc, f) => if (e(f + 1) > e(f)) acc | (1L << f) else acc)
    }
    val fp = rows(Multimodal.audioFingerprint(
        Multimodal.withWavPayload(ids, "doc_id"), "payload", "media_id")
      .orderBy("media_id"))
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_frames"), r.getAs[Long]("afp")))
    fp shouldBe Seq((2L, 8L, direct(2L)), (6L, 8L, direct(6L)))
    // same PCM re-wrapped with a trailing LIST chunk: different bytes (sha256
    // would split them), same fingerprint — the chunk walker skips unknown
    // chunks per the RIFF spec, so the perceptual key survives
    val rewrapped = Seq((2L, {
      val base = Multimodal.wav16(2L)
      val extra = java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      extra.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
      val joined = base ++ extra.array()
      // patch the RIFF size field for the appended chunk
      val bb = java.nio.ByteBuffer.wrap(joined).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(4, joined.length - 8)
      joined
    })).toDF("media_id", "payload")
    rows(Multimodal.audioFingerprint(rewrapped, "payload", "media_id"))
      .head.getAs[Long]("afp") shouldBe direct(2L)
  }

  test("aiff16/parseAiff: the big-endian IFF walk (80-bit extended rate included) decodes " +
       "to the SAME stats and fingerprint as the WAV of the same stream; corrupt arm nulls") {
    val ids = Seq(0L, 5L, 9L).toDF("doc_id")
    val wav = rows(Multimodal.decodeWav(
        Multimodal.withWavPayload(ids, "doc_id"), "payload", "media_id")
      .orderBy("media_id")).map(_.toSeq)
    val aiff = rows(Multimodal.decodeWav(
        Multimodal.withAiffPayload(ids, "doc_id"), "payload", "media_id")
      .orderBy("media_id")).map(_.toSeq)
    aiff shouldBe wav // container-invariant decode: rate, samples, energy, peak
    // fingerprints agree too — the cross-container dedup contract
    val wfp = rows(Multimodal.audioFingerprint(
        Multimodal.withWavPayload(ids, "doc_id"), "payload", "media_id")
      .orderBy("media_id")).map(_.toSeq)
    val afp = rows(Multimodal.audioFingerprint(
        Multimodal.withAiffPayload(ids, "doc_id"), "payload", "media_id")
      .orderBy("media_id")).map(_.toSeq)
    afp shouldBe wfp
    // truncated-COMM AIFF and FORM-but-not-AIFF garbage land on null stats
    val dirty = rows(Multimodal.decodeWav(
        Seq((-1L, Multimodal.corruptAiff(-1L)),
          (-2L, "FORMxxxxAIFC0000".getBytes("US-ASCII"))).toDF("media_id", "payload"),
        "payload", "media_id").orderBy("media_id"))
    dirty.foreach { r =>
      r.getAs[Long]("sample_rate") shouldBe 0L
      r.getAs[Long]("total_energy") shouldBe -1L
    }
  }

  test("withDualContainerPayload: WAV and AIFF encodings of one stream class fold into " +
       "one fingerprint cluster (cross-container dedup)") {
    val ids = Seq(0L, 1L, 7L, 8L).toDF("doc_id") // classes 0,1 each ×2 ids ×2 containers
    val clusters = rows(Multimodal.audioFingerprint(
        Multimodal.withDualContainerPayload(ids, "doc_id"), "payload", "media_id")
      .groupBy("afp").agg(count(lit(1)).as("n"), min(col("media_id")).as("keeper"))
      .orderBy("keeper"))
      .map(r => (r.getLong(1), r.getLong(2)))
    // class 0 = ids {0,7} → media {1,2,71,72}; class 1 = ids {1,8} → media
    // {11,12,81,82}: four encodings each, keeper = min media id
    clusters shouldBe Seq((4L, 1L), (4L, 11L))
  }

  test("q_video_scenes: injected scene changes at frame 4 of even assets are the ONLY " +
       "cuts; within-scene frames stay perceptually near (hamming <= 3)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"$dir missing")
    val out = rows(SparkEntry.queries("q_video_scenes")(spark, dir))
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx"),
        Option(r.getAs[java.lang.Long]("hamming_prev")).map(_.toLong),
        Option(r.getAs[java.lang.Boolean]("is_cut")).map(_.booleanValue)))
    out.length shouldBe 64 // 16 assets × 4 planned frames
    out.filter(_._2 == 0L).foreach { r => r._3 shouldBe None; r._4 shouldBe None }
    val cuts = out.filter(_._4.contains(true))
    cuts.map(r => (r._1, r._2)) shouldBe
      (0L until 16L by 2).map(mid => (mid, 4L))
    cuts.foreach(_._3.get should be >= 10L)
    out.filter(_._4.contains(false)).foreach(_._3.get should be <= 3L)
  }

  test("dHash: rasters whose gradient bits exceed 64 land on the -1 sentinel " +
       "instead of silently folding bit positions mod 64") {
    // 9x8: 8*8 + 7*9 = 127 gradient bits > 64 — the classic-dHash size that
    // REQUIRES the pre-resample policy; hashing it natively would wrap shifts
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 9).foreach(x => img.setRGB(x, y, (x * 37 + y * 91) << 8)))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val payload = Seq((1L, buf.toByteArray)).toDF("media_id", "payload")
    rows(Multimodal.dHash(payload, "payload", "media_id"))
      .head.getAs[Long]("dhash") shouldBe -1L
  }

  test("decodeWav: an adversarial data-chunk size near Int.MaxValue fails the " +
       "Long bounds check and lands on null-stats (no 2 GB allocation attempt)") {
    val base = Multimodal.wav16(1L)
    val bb = java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 2147483640) // the 'data' chunk's declared size field
    val out = rows(Multimodal.decodeWav(
      Seq((1L, base)).toDF("media_id", "payload"), "payload", "media_id")).head
    out.getAs[Long]("sample_rate") shouldBe 0L
    out.getAs[Long]("total_energy") shouldBe -1L
  }

  test("imageMeta decodes committed-formula JPEG to the pre-encode dims/channels/dHash") {
    // the decoded (lossy) raster must carry the SAME gradient signs as the
    // source raster — the ±60-gray-level margin vs ≲5 of codec noise
    val ids = Seq(0L, 3L, 8L, 15L)
    val payload = ids.map(id => (id, Multimodal.encodeJpeg(Multimodal.jpegRaster(id))))
      .toDF("media_id", "payload")
    val out = rows(Multimodal.imageMeta(payload, "payload", "media_id").orderBy("media_id"))
    out.map(_.getAs[Long]("width")) shouldBe Seq.fill(4)(6L)
    out.map(_.getAs[Long]("channels")) shouldBe Seq.fill(4)(3L)
    val sourceHashes = ids.map(id =>
      rows(Multimodal.dHash(
        // lossless PNG of the same raster = the source-raster dHash
        Seq((id, {
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(Multimodal.jpegRaster(id), "png", buf)
          buf.toByteArray
        })).toDF("media_id", "payload"), "payload", "media_id")).head.getAs[Long]("dhash"))
    out.map(_.getAs[Long]("dhash")) shouldBe sourceHashes
  }

  test("encodeGif round-trips the 9-gray raster LOSSLESSLY (pixel-exact, indexed)") {
    // the palette holds all 9 grays, so unlike JPEG the decode must land on
    // the raster formula exactly — and as a 1-band indexed image whose
    // color-model-resolved pixels equal the RGB source
    val src = Multimodal.jpegRaster(7L)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodeGif(src)))
    back.getRaster.getNumBands shouldBe 1
    for (y <- 0 until 6; x <- 0 until 6)
      (back.getRGB(x, y) & 0xFFFFFF) shouldBe (src.getRGB(x, y) & 0xFFFFFF)
    val meta = rows(Multimodal.imageMeta(
      Seq((7L, Multimodal.encodeGif(src))).toDF("media_id", "payload"),
      "payload", "media_id")).head
    meta.getAs[Long]("channels") shouldBe 1L
    val pngHash = rows(Multimodal.dHash(
      Seq((7L, {
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(src, "png", buf)
        buf.toByteArray
      })).toDF("media_id", "payload"), "payload", "media_id")).head.getAs[Long]("dhash")
    meta.getAs[Long]("dhash") shouldBe pngHash
  }

  test("dHash is stable across JPEG RE-encodes (decode → re-encode → decode)") {
    val first = Multimodal.encodeJpeg(Multimodal.jpegRaster(5L))
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(first))
    val second = Multimodal.encodeJpeg(decoded) // a re-compressed copy of the copy
    val hashes = rows(Multimodal.dHash(
      Seq((1L, first), (2L, second)).toDF("media_id", "payload"),
      "payload", "media_id").orderBy("media_id")).map(_.getAs[Long]("dhash"))
    hashes(0) shouldBe hashes(1)
    hashes(0) should not be -1L
  }

  test("imageMeta: truncated JPEG rides the NonFatal arm onto the sentinel row") {
    val corrupt = Multimodal.encodeJpeg(Multimodal.jpegRaster(0L)).take(24)
    val out = rows(Multimodal.imageMeta(
      Seq((-1L, corrupt)).toDF("media_id", "payload"), "payload", "media_id")).head
    (out.getAs[Long]("width"), out.getAs[Long]("height"),
      out.getAs[Long]("channels"), out.getAs[Long]("dhash")) shouldBe (0L, 0L, 0L, -1L)
  }

  test("frameSampleIndices plans every-k frame decode without touching bytes") {
    rows(Seq(Tuple1(10)).toDF("n")
      .select(Multimodal.frameSampleIndices(col("n"), 3).as("idx")))
      .head.getSeq[Long](0) shouldBe Seq(0L, 3L, 6L, 9L)
    // zero-frame asset: nothing to decode (not a phantom frame 0)
    rows(Seq(Tuple1(0)).toDF("n")
      .select(Multimodal.frameSampleIndices(col("n"), 3).as("idx")))
      .head.getSeq[Long](0) shouldBe Seq.empty
  }
}
