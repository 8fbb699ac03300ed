package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bit-interleave: place bit i of a at 2i, bit i of b at 2i+1. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("mortonKey matches the bit-by-bit reference interleave") {
    val cases = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (123456L, 654321L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), // max 31-bit inputs: key stays non-negative
      (0xFFFFFFFFL, 2L) // bit 31+ of the input is masked off, not interleaved
    )
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.mortonKey(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (a, b, z) =>
      z shouldBe mortonRef(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL)
      z should be >= 0L
    }
  }

  test("mortonSql is the same formula: spark SQL dual agrees with the Column form") {
    val df = (0L until 500L).map(i => (i * 7919L % 100003L, i * 104729L % 99991L))
      .toDF("a", "b")
    val mismatches = df.select(
        Layout.mortonKey(col("a"), col("b")).as("zc"),
        expr(Layout.mortonSql("a", "b")).as("zs"))
      .filter(col("zc") =!= col("zs")).count()
    mismatches shouldBe 0L
  }

  test("zorderWrite round-trips the data and gives every file a tight 2-D bounding box") {
    // a 64x64 grid: under Z-order, 16 files of 256 points each should cover
    // bounding boxes FAR smaller than the full plane (a 1-D sort on `a`
    // would give each file the full `b` range)
    val n = 64
    val grid = (for (a <- 0 until n; b <- 0 until n) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val path = new java.io.File(sys.props("java.io.tmpdir"), "graft_zorder_spec").toString
    Layout.zorderWrite(grid, Seq("a", "b"), path, 16)
    val back = spark.read.parquet(path)
    back.count() shouldBe (n * n).toLong
    // per-file bounding boxes from the layout itself
    val boxes = back
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("a0"), max("a").as("a1"), min("b").as("b0"), max("b").as("b1"))
      .collect()
    boxes.length shouldBe 16
    val fullArea = (n.toLong - 1) * (n.toLong - 1)
    boxes.foreach { r =>
      val area = (r.getLong(2) - r.getLong(1)) * (r.getLong(4) - r.getLong(3))
      // each Morton range of 256 grid points covers ~a 16x16 tile (maybe a
      // ragged union of tiles at range-boundary files): well under 1/8 of
      // the plane, vs ~1/1 for the b-side of a 1-D layout
      area should be <= fullArea / 8
    }
  }

  test("compact rewrites a fragmented layout into the planned file count, content intact") {
    val df = (0L until 1000L).map(i => (i, i % 7)).toDF("id", "v")
    val frag = new java.io.File(sys.props("java.io.tmpdir"), "graft_compact_spec_in").toString
    val out = new java.io.File(sys.props("java.io.tmpdir"), "graft_compact_spec_out").toString
    // fragment: 50 files of 20 rows
    df.repartition(50).write.mode("overwrite").parquet(frag)
    val planned = Layout.compact(spark.read.parquet(frag), "id", out, targetFileRows = 300L)
    planned shouldBe 4 // ceil(1000/300)
    val files = new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    files shouldBe 4
    val back = spark.read.parquet(out)
    back.count() shouldBe 1000L
    rows(back.orderBy("id")) shouldBe rows(df.orderBy("id"))
    // range-partitioned on id: per-file id ranges must not overlap
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => hi1 should be < lo2
      case _ =>
    }
  }
}
