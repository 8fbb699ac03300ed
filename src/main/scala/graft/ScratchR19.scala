package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only r19 build-time decomposition (not registered, not a query):
  * how much of the crawl family's per-build Catalyst cost is the FIXTURE
  * SYNTHESIS expression tree vs the canon/robots subplans — measured by
  * timing `localCheckpoint(false)` (which forces optimize+physical-plan+
  * codegen of the cut subtree) over (a) the declarative synthesis chain
  * and (b) an identical pre-materialized frame.
  */
object ScratchR19 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val W = graft.operators.Web
    def t(name: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch19] $name%-44s min=${times.min}%7.3f  passes=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def synth = W.withWarc(W.withHtml(W.withUrls(docs)))

    // materialized synthesis (untimed, eager)
    val landed = synth.select(col("doc_id"), col("warc")).localCheckpoint(true)

    // (a) parse-barrier checkpoint over the DECLARATIVE synthesis
    t("checkpoint(parse(declarative synth))") {
      W.warcRecords(synth.select(col("doc_id"), col("warc")), "warc")
        .filter(col("rec_type") === "response")
        .select(col("doc_id"), col("target_uri"), col("http_status"))
        .localCheckpoint(false)
    }
    // (b) same over the LANDED frame — the synthesis tree absent
    t("checkpoint(parse(landed warc))") {
      W.warcRecords(landed, "warc")
        .filter(col("rec_type") === "response")
        .select(col("doc_id"), col("target_uri"), col("http_status"))
        .localCheckpoint(false)
    }
    // (c) the synthesis projection alone, no checkpoint (analysis only)
    t("analyze synth projection only") {
      synth.select(col("doc_id"), col("warc")).queryExecution.analyzed
    }
    // (d) optimize+plan the synthesis projection (what a checkpoint pays)
    t("toRdd(synth projection)") {
      synth.select(col("doc_id"), col("warc")).queryExecution.toRdd
    }
    // (f) EXEC cost of the synthesis formulations (noop sink, same JVM)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("exec: declarative withHtml(withUrls)") {
      noop(W.withHtml(W.withUrls(docs)).select(col("doc_id"), col("url"), col("html")))
    }
    t("exec: synthPages kernel") {
      noop(W.synthPages(docs).select(col("doc_id"), col("url"), col("html")))
    }
    t("exec: declarative withWarc chain") {
      noop(synth.select(col("doc_id"), col("warc")))
    }
    t("exec: synthCrawl kernel") {
      noop(W.synthCrawl(docs).select(col("doc_id"), col("warc")))
    }
    // (e) canonicalize chain over a landed recs frame, checkpointed
    val recsLanded = W.warcRecords(landed, "warc")
      .filter(col("rec_type") === "response")
      .select(col("doc_id"), col("target_uri").as("url"), col("http_status"))
      .localCheckpoint(true)
    t("checkpoint(canonicalize(landed recs))") {
      W.canonicalize(recsLanded, "url")
        .select(col("doc_id"), col("http_status"), col("domain"), col("surt"))
        .localCheckpoint(false)
    }
    spark.stop()
  }
}
