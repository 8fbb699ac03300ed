package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Declarative data-quality validation — the Deequ/Great-Expectations shape
  * an ingest pipeline gates promotion on (bronze → silver in the reference's
  * medallion layout): a check list compiles into ONE aggregate pass over the
  * table, producing a (check, column, observed, passed) report.
  *
  * Every check's observed metric is an algebraic aggregate (count /
  * conditional count / exact distinct), so the whole report costs a single
  * partial-aggregable scan regardless of how many checks run — at 100 TB the
  * validation adds one reduce to the ingest it is gating, not a pass per
  * check. The report is rows, not an exception: callers decide whether a
  * failed check blocks promotion or just pages someone.
  */
object Checks {

  sealed trait Check {
    def name: String
    def colName: String
    /** Observed metric (cast to double in the report). */
    private[operators] def observed: Column
    /** Pass predicate over the observed metric. */
    private[operators] def passed(observed: Column): Column
  }

  /** Table has at least `n` rows. */
  final case class RowCountMin(n: Long) extends Check {
    val name = "row_count_min"; val colName = "*"
    private[operators] def observed = count(lit(1)).cast(DoubleType)
    private[operators] def passed(o: Column) = o >= lit(n.toDouble)
  }

  /** No NULLs in `colName`; observed = null count. */
  final case class NotNull(colName: String) extends Check {
    val name = "not_null"
    private[operators] def observed =
      sum(when(col(colName).isNull, 1L).otherwise(0L)).cast(DoubleType)
    private[operators] def passed(o: Column) = o === lit(0.0)
  }

  /** `colName` is unique; observed = surplus rows beyond distinct values
    * (exact `countDistinct` — NULLs excluded from distinct, counted as
    * surplus, matching SQL COUNT(DISTINCT)).
    */
  final case class Unique(colName: String) extends Check {
    val name = "unique"
    private[operators] def observed =
      (count(lit(1)) - countDistinct(col(colName))).cast(DoubleType)
    private[operators] def passed(o: Column) = o === lit(0.0)
  }

  /** Non-null values of `colName` lie in [lo, hi]; observed = violations. */
  final case class InRange(colName: String, lo: Double, hi: Double) extends Check {
    val name = "in_range"
    private[operators] def observed =
      sum(when(col(colName).isNotNull && (col(colName) < lo || col(colName) > hi), 1L)
        .otherwise(0L)).cast(DoubleType)
    private[operators] def passed(o: Column) = o === lit(0.0)
  }

  /** Non-null values of `colName` are in the allowed set; observed = rows
    * outside it.
    */
  final case class InSet(colName: String, values: Seq[String]) extends Check {
    val name = "in_set"
    private[operators] def observed =
      sum(when(col(colName).isNotNull && !col(colName).isInCollection(values), 1L)
        .otherwise(0L)).cast(DoubleType)
    private[operators] def passed(o: Column) = o === lit(0.0)
  }

  /** Run the checks in one aggregate pass; returns
    * (check, col_name, observed DOUBLE, passed BOOLEAN) — one row per check,
    * in the caller's check order (an `ord` column is exposed for sorting).
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate: empty check list")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.observed.as(s"__m$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val report = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("ord"), lit(c.name).as("check"), lit(c.colName).as("col_name"),
        col(s"__m$i").as("observed"), c.passed(col(s"__m$i")).as("passed"))
    }
    one.select(explode(array(report: _*)).as("r")).select("r.*")
  }
}
