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
