package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only same-JVM A/B timing (not registered, not a query). */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_REP", "10").toInt
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
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-34s min=${times.min}%8.3f s  passes=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val docs = (1 until rep).foldLeft(base)((d, i) =>
      d.unionByName(base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))))

    def synth = W.withWarc(W.withHtml(W.withUrls(docs)))
    def recs = W.warcRecords(synth.select(col("doc_id"), col("warc")), "warc")
      .filter(col("rec_type") === "response" && col("http_status") === 200)
    def metaBase = recs.select(col("doc_id"), col("target_uri").as("url"),
        col("warc_date"), col("http_status"), col("mime"), col("payload"))
      .withColumn("title",
        regexp_extract(col("payload"), "<title>(.*?)</title>", 1))

    // A: interpreted transform lambda resolve (current production shape)
    def metaLambda = metaBase.withColumn("links",
      transform(W.extractLinks(col("payload")), l => W.resolveUrl(col("url"), l)))
    // B: no resolve at all (links raw) — isolates the resolve cost
    def metaRaw = metaBase.withColumn("links", W.extractLinks(col("payload")))

    // toWat with kernel (current) vs the OLD chain+lambda serializer
    def toWatOld(df: DataFrame): DataFrame = {
      val idStr = col("doc_id").cast(org.apache.spark.sql.types.StringType)
      val esc = (c: org.apache.spark.sql.Column) => W.jsonEsc(c)
      val linksJson = array_join(
        transform(col("links"), l => concat(lit("\""), esc(l), lit("\""))), ",")
      val json = concat(
        lit("{\"url\":\""), esc(col("url")),
        lit("\",\"status\":"), col("http_status").cast(org.apache.spark.sql.types.StringType),
        lit(",\"mime\":\""), esc(col("mime")),
        lit("\",\"title\":\""), esc(col("title")),
        lit("\",\"links\":["), linksJson, lit("]}"))
      df.withColumn("wat", concat(lit("X"), json))
    }
    def toWatNew(df: DataFrame): DataFrame =
      W.toWat(df, "doc_id", "url", "warc_date", "http_status", "mime",
        "title", "links").select(col("doc_id"), col("wat"))

    println(s"[scratch] rep=$rep docs=${docs.count()}")
    noop(toWatNew(metaLambda)) // warm
    t("meta (no links)")(noop(metaBase.drop("payload")))
    t("meta raw links")(noop(metaRaw.drop("payload")))
    t("meta resolved links (lambda)")(noop(metaLambda.drop("payload")))
    t("wat NEW kernel (resolved)")(noop(toWatNew(metaLambda)))
    t("wat OLD chain+lambda (resolved)")(noop(toWatOld(metaLambda).select("doc_id", "wat")))
    t("wat NEW kernel (raw links)")(noop(toWatNew(metaRaw)))
    spark.stop()
  }
}
