package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level statistics manifest and manifest-driven pruned reads — the
  * Delta/Iceberg "add-file stats" pattern as plain operators.
  *
  * Why this exists (100 TB design point): partition pruning only helps on the
  * partition columns. For every OTHER selective column, the lakehouse answer
  * is a per-file (min, max, count) manifest collected once at ingest: a range
  * predicate then intersects the manifest (kilobytes) instead of opening
  * footers across the lake (one listing + footer read per file — minutes of
  * driver time at 10⁶ files), and only intersecting files are scanned at all.
  * The manifest is itself a DataFrame — stored like any gold table, refreshed
  * incrementally per landed chunk.
  *
  * The manifest content is a pure function of data + chunking formula, so a
  * SQL oracle can recompute it from the source table without touching the
  * written files — equality between "derived from actual files" (here) and
  * "derived from the formula" (oracle) proves the layout landed as designed.
  */
object Manifest {

  /** Per-chunk (count, min, max) stats for `statCols`, grouped by the hive
    * partition directory token `chunkKey=N` in each row's file path. One
    * narrow scan + one partial-aggregable shuffle keyed on the chunk — no
    * footer reads, no driver listing.
    */
  def stats(spark: SparkSession, path: String, chunkKey: String,
      statCols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
      .withColumn("chunk", regexp_extract(input_file_name(), s"$chunkKey=[0-9]+", 0))
    val statAggs = count(lit(1)).as("n_rows") +:
      statCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(col("chunk")).agg(statAggs.head, statAggs.tail: _*)
  }

  /** Chunked ingest write: hive-partition `df` by `floor(col / width)` so each
    * chunk directory covers one contiguous `chunkCol` range (the natural
    * layout when `chunkCol` is ingestion-ordered — Delta's add-file stats get
    * their selectivity exactly this way). Returns the chunk width used.
    */
  def writeChunked(df: DataFrame, chunkCol: String, nChunks: Int,
      path: String): Long = {
    // one-row bounds job: metadata-scale collect (same class as a pivot's
    // internal distinct), not a data collect
    val boundsRow = df.agg(max(col(chunkCol))).head()
    require(!boundsRow.isNullAt(0),
      s"writeChunked: input has no non-null '$chunkCol' rows — nothing to chunk")
    val hi = boundsRow.getLong(0)
    val width = math.max(1L, hi / nChunks + 1L)
    // integral `div`, not `/`+cast: double division would round where both
    // the oracle's `//` and this formula must floor, and large keys lose
    // precision in the double detour
    df.withColumn("__chunk", expr(s"`$chunkCol` div ${width}L"))
      .write.mode("overwrite").partitionBy("__chunk").parquet(path)
    width
  }

  /** Manifest-pruned range read: keep only chunks whose [min, max] interval
    * intersects [lo, hi], read just those directories, apply the residual
    * filter. The manifest collect is chunk-count rows (bounded by layout, not
    * data). Result is by construction identical to filtering the full read —
    * the pruning is the point: non-intersecting chunks are never scanned.
    */
  def prunedRead(spark: SparkSession, path: String, manifest: DataFrame,
      statCol: String, lo: Long, hi: Long,
      chunkKey: String = "__chunk"): DataFrame = {
    val live = manifest
      .filter(!(col(s"max_$statCol") < lo || col(s"min_$statCol") > hi))
      .select("chunk").collect().map(_.getString(0))
    val base =
      // the root read discovers the hive chunk column the chunk-directory
      // reads below never see — drop it so both branches return one schema
      if (live.isEmpty) spark.read.parquet(path).limit(0).drop(chunkKey)
      else spark.read.parquet(live.toIndexedSeq.map(c => s"$path/$c"): _*)
    base.filter(col(statCol) >= lo && col(statCol) <= hi)
  }
}
