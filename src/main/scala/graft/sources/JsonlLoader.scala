package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the de-facto interchange format for training
  * documents. Schema-enforced (no inference job over 100 TB) and
  * corrupt-tolerant: lines are read as text and parsed with `from_json`, so a
  * malformed line yields a null record instead of failing the job — at corpus
  * scale some broken lines are a certainty, and a pipeline that dies on line
  * 40 billion is useless. (Deliberately NOT the reader's internal
  * `_corrupt_record` column: Spark rejects several useful plan shapes over
  * it; an explicit raw-line + parsed-struct pair has no such restrictions.)
  *
  * Scale: JSONL is splittable (newline-delimited), so the text scan
  * parallelizes per block; `from_json` is a single codegen'd parse per line.
  */
object JsonlLoader {

  import scala.jdk.CollectionConverters._

  /** Default training-document shape (mirrors `documents.parquet`). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  private val corruptField = "__corrupt"

  /** Read JSONL as (raw_line, rec STRUCT): `rec.__corrupt` carries the raw
    * text of malformed or schema-violating lines (null for clean ones). The
    * corrupt marker lives INSIDE the `from_json` schema — expression-level
    * parsing has none of the plan-shape restrictions Spark places on the
    * datasource reader's `_corrupt_record` column. Blank lines are skipped.
    */
  def read(spark: SparkSession, path: String, schema: StructType = documentsSchema): DataFrame = {
    val parseSchema = schema.add(StructField(corruptField, StringType))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("raw_line"),
        from_json(col("value"), parseSchema,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptField).asJava).as("rec"))
  }

  /** Clean parsed rows, schema columns only. */
  def good(df: DataFrame): DataFrame =
    df.filter(col(s"rec.$corruptField").isNull).select(col("rec.*")).drop(corruptField)

  /** Malformed / schema-violating raw lines, for repair and audit. */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(col(s"rec.$corruptField").isNotNull).select("raw_line")
}
