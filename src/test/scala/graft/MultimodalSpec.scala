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
