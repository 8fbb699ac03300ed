package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering keys and the
  * clustered write that makes 2-D predicates skippable at scale.
  *
  * Why this exists (100 TB design point): parquet min/max stats prune files
  * and row groups only when the data is CLUSTERED on the filtered column — a
  * layout sorted on `a` alone gives tight `a` ranges per file but full-span
  * `b` ranges, so a predicate on `(a, b)` still opens every file for the `b`
  * side. Interleaving the bits of both keys (Morton order) and range-writing
  * on the interleaved key gives every file a tight bounding BOX in (a, b)
  * space: a 2-D predicate then skips all files whose box misses the query
  * rectangle. This is the standard lakehouse technique (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`), expressed here as a pure column formula + a
  * declarative range-partitioned write — no custom expression needed, the
  * whole key is codegen'd Spark built-ins (shifts/masks), and the same
  * formula is expressible in ANSI SQL for the oracle.
  */
object Layout {

  private val spreadSteps = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 31 bits of a non-negative long so bit i lands at bit 2i
    * (the classic magic-number Morton spread). 31 bits, not 32: the second
    * dimension shifts one further left, and bit 31 of dimension b at slot 63
    * would flip the sign of the 64-bit key — keys must stay non-negative so
    * that BIGINT comparisons order identically in every engine.
    */
  def spreadBits(x: Column): Column =
    spreadSteps.foldLeft(x.bitwiseAND(lit(0x7FFFFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** 62-bit Morton key interleaving the low 31 bits of `a` (even bit slots)
    * and `b` (odd slots). Monotone in each dimension when the other is fixed;
    * nearby (a, b) points get nearby keys — the property the clustered write
    * turns into tight per-file bounding boxes.
    */
  def mortonKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** The same spread as a SQL string, for oracle duals: both engines compute
    * bit-identical BIGINT keys (shifts/and/or on non-negative int64 agree
    * everywhere).
    */
  def spreadSql(x: String): String =
    spreadSteps.foldLeft(s"($x & 2147483647)") { case (acc, (s, m)) =>
      s"(($acc | ($acc << $s)) & $m)"
    }

  /** SQL dual of [[mortonKey]]. */
  def mortonSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** Z-order-clustered write: range-partition on the Morton key of
    * (`cols(0)`, `cols(1)`) into `nFiles` files, sort within each, write
    * parquet. Each output file covers one contiguous Morton range — a tight
    * 2-D bounding box — so parquet min/max stats on BOTH columns become
    * selective. The shuffle is the one range exchange any clustered rewrite
    * pays; the sort is within-partition (no global sort).
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String, nFiles: Int): Unit = {
    require(cols.length == 2, "zorderWrite clusters exactly two dimensions")
    df.withColumn("__z", mortonKey(col(cols.head), col(cols(1))))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the OPTIMIZE half of lakehouse table maintenance
    * (the Z-order write above is the CLUSTER half). Fragmented ingest (one
    * file per micro-batch/chunk) rewrites into `ceil(rows / targetFileRows)`
    * files, range-partitioned and sorted on `orderCol`, so the compacted
    * layout keeps (or gains) min/max selectivity on that column instead of
    * just gluing bytes together.
    *
    * Returns the planned file count. Cost: one metadata-served count, then
    * the one range exchange + within-partition sort any clustered rewrite
    * pays — rows never collect, nothing is quadratic. At 100 TB this runs
    * per-partition (compact yesterday's chunks), not whole-table.
    */
  def compact(df: DataFrame, orderCol: String, outPath: String,
      targetFileRows: Long): Int = {
    require(targetFileRows > 0, "targetFileRows must be positive")
    val n = df.count()
    val files = math.max(1L, (n + targetFileRows - 1) / targetFileRows).toInt
    df.repartitionByRange(files, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite").parquet(outPath)
    files
  }
}
