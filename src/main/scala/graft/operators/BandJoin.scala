package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-band self-join — "rows of the same key within ±Δt of each other" —
  * decomposed so it scales. The naive shape is a non-equi theta-join
  * (quadratic per key); the scalable decomposition buckets time by the band
  * width and equi-joins on (key, bucket) with a 3-bucket probe fan-out, so
  * candidate volume is bounded by per-bucket population, never n² per key,
  * and the exact predicate runs only over the candidates.
  */
object BandJoin {

  /** For each row, the number of OTHER rows sharing `keyCols` whose `tsCol`
    * lies within ±`bandSeconds`. Rows with no neighbors report 0.
    *
    * Plan: probe side explodes each row to its bucket and both adjacent
    * buckets (a pair within ±Δt can straddle at most one bucket boundary
    * when the bucket width equals Δt); build side keeps one bucket per row.
    * The equi-join shuffles on (keys…, bucket) — partition-pruned, skew
    * bounded by bucket population — then the exact |t₂−t₁| ≤ Δt filter and
    * a partial-aggregable count per probe row. A left join back to the
    * input restores zero-neighbor rows.
    */
  def neighborCounts(df: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, bandSeconds: Long): DataFrame = {
    val bandMicros = bandSeconds * 1000000L
    val base = df.select(col(idCol) +: keyCols.map(col) :+
      unix_micros(col(tsCol)).as("__t"): _*)
    // `div` is integral long division (Column `/` would go through double)
    val bucket = expr(s"__t div ${bandMicros}L")
    val probe = base.withColumn("__b",
      explode(array(bucket - 1, bucket, bucket + 1)))
    val build = base.select(
      keyCols.map(col) ++ Seq(col(idCol).as("__rid"), col("__t").as("__rt"),
        bucket.as("__b")): _*)
    val counts = probe.join(build,
        keyCols.map(k => probe(k) === build(k)).reduce(_ && _) &&
          probe("__b") === build("__b") &&
          probe(idCol) =!= build("__rid") &&
          abs(probe("__t") - build("__rt")) <= bandMicros)
      .groupBy(probe(idCol).as(idCol))
      .agg(count(lit(1)).as("n_neighbors"))
    df.select(col(idCol) +: keyCols.map(col): _*)
      .join(counts, Seq(idCol), "left")
      .withColumn("n_neighbors", coalesce(col("n_neighbors"), lit(0L)))
  }
}
