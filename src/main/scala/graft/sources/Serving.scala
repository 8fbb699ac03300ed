package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Fns

/** Serving-path sinks (reference routes.py:174-259).
  *
  * The reference serves whole datasets through a 4-worker API; the engine
  * keeps the same output contracts but computes them as pruned, limited Spark
  * plans so a preview of a 100 TB dataset reads one parquet row-group, not
  * the table.
  */
object Serving {

  /** F10' request-ID generation (reference helpers.py:18-20): every API
    * envelope carries a `request_id = str(uuid4())`.
    */
  def generateRequestId(): String = java.util.UUID.randomUUID().toString

  /** S15 JSON-records view (reference routes.py:174-220): `±inf`/`NaN` → null
    * on every float column, timestamps → ISO-8601 µs `Z` strings. Returns the
    * normalized frame; `.limit(n).toJSON` or `collect` at the API boundary.
    */
  def jsonRecordsView(df: DataFrame): DataFrame = {
    val normalized = Fns.nullNormalizeAll(df)
    normalized.select(normalized.schema.fields.map { f =>
      f.dataType match {
        // NTZ included: the serving contract is "timestamps render as ISO
        // strings", regardless of which physical timestamp flavor upstream
        // parquet delivered (the generator has shipped both)
        case TimestampType | TimestampNTZType => Fns.isoMicros(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** Preview contract (reference index.html:945 caps rendering at 100 rows). */
  def preview(df: DataFrame, n: Int = 100): Array[String] =
    jsonRecordsView(df).limit(n).toJSON.collect()

  /** F13' display rounding (reference index.html:960 `toFixed(4)`): fixed
    * 4-decimal rendering of a double column for presentation surfaces.
    * `format_string`, not `format_number` — the latter inserts thousands
    * separators ("1,234.5679"), which JS `toFixed` never does.
    */
  def formatFixed(c: org.apache.spark.sql.Column, decimals: Int = 4): org.apache.spark.sql.Column =
    format_string(s"%.${decimals}f", c)

  /** S16 CSV download sink (reference routes.py:238-259): header CSV, one
    * file per dataset at serving scale.
    */
  def csvDownload(df: DataFrame, outDir: String): String = {
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(outDir)
    outDir
  }
}
