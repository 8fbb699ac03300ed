package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing of one lane (not registered, not a query). */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val W = graft.operators.Web
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[scratch] $name%-28s $best%8.3f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def synth = W.withWarc(W.withHtml(W.withUrls(docs)))
    def recs = W.warcRecords(synth.select(col("doc_id"), col("warc")), "warc")
      .filter(col("rec_type") === "response" && col("http_status") === 200)
    def curated = recs.select(col("doc_id"), col("target_uri").as("url"),
      col("warc_date"), W.htmlToText(col("payload")).as("text"))
    def wet = W.toWet(curated, "doc_id", "url", "warc_date", "text")
    def gz = W.gzipWarcRecords(wet.select(col("doc_id"), col("wet")), "doc_id", "wet")
    def gunz = W.gunzipWarc(gz, "doc_id", "warc_gz")
    def full = W.warcRecords(gunz, "warc")
      .select(col("doc_id"), col("rec_type"), md5(col("payload")).as("m"))

    // warm
    noop(full)
    t("synth")(noop(synth.select("doc_id", "warc")))
    t("recs (parse)")(noop(recs))
    t("curated (htmlToText)")(noop(curated))
    t("wet (serialize)")(noop(wet.select("doc_id", "wet")))
    t("gz (gzip)")(noop(gz))
    t("gunz (gunzip)")(noop(gunz))
    t("full (parse+md5)")(noop(full))
    t("full count()")(full.count())
    spark.stop()
  }
}
