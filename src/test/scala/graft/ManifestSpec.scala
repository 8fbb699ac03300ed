package graft

import graft.sources.Manifest
import org.apache.spark.sql.functions._

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def chunkedFixture(path: String): Long = {
    val df = (0L until 1000L).map(i => (i, i % 37, i.toDouble / 3)).toDF("k", "u", "v")
    Manifest.writeChunked(df, "k", 8, path)
  }

  test("writeChunked + stats: per-chunk ranges are disjoint, contiguous, and complete") {
    val path = new java.io.File(sys.props("java.io.tmpdir"), "graft_manifest_spec").toString
    val width = chunkedFixture(path)
    width shouldBe 125L // max=999 -> 999/8+1
    val man = Manifest.stats(spark, path, "__chunk", Seq("k"))
      .orderBy("chunk").collect()
    man.length shouldBe 8
    man.map(_.getLong(1)).sum shouldBe 1000L // n_rows covers everything
    // each chunk is exactly its formula range [i*width, (i+1)*width-1]
    man.zipWithIndex.foreach { case (r, i) =>
      r.getString(0) shouldBe s"__chunk=$i"
      r.getLong(2) shouldBe i * width
      r.getLong(3) shouldBe math.min(999L, (i + 1) * width - 1)
    }
  }

  test("prunedRead scans only intersecting chunks and equals the full filtered read") {
    val path = new java.io.File(sys.props("java.io.tmpdir"), "graft_manifest_spec_pr").toString
    chunkedFixture(path) // width 125: [0,124], [125,249], [250,374], ...
    val man = Manifest.stats(spark, path, "__chunk", Seq("k"))
    val pruned = Manifest.prunedRead(spark, path, man, "k", 130L, 260L)
    // correctness: identical to the unpruned filter
    val full = spark.read.parquet(path).filter(col("k").between(130L, 260L))
    pruned.count() shouldBe full.count()
    pruned.agg(sum("k")).head().getLong(0) shouldBe full.agg(sum("k")).head().getLong(0)
    // pruning: [130, 260] intersects chunks 1 and 2 only — the scan must
    // touch 2 of the 8 chunk directories
    val filesTouched = pruned.select(input_file_name()).distinct().collect()
      .map(_.getString(0).replaceAll("/[^/]*$", "")).distinct
    filesTouched.length shouldBe 2
  }

  test("prunedRead with a range beyond the manifest reads nothing but keeps the schema") {
    val path = new java.io.File(sys.props("java.io.tmpdir"), "graft_manifest_spec_pr").toString
    chunkedFixture(path)
    val man = Manifest.stats(spark, path, "__chunk", Seq("k"))
    val out = Manifest.prunedRead(spark, path, man, "k", 5000L, 6000L)
    out.count() shouldBe 0L
    out.columns should contain allOf ("k", "u", "v")
  }
}
