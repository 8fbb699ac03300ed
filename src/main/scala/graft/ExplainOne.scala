package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted physical plan of one registered query.
  * Usage: runMain graft.ExplainOne <queryName> [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try SparkEntry.queries(name)(spark, dir).explain("formatted")
    finally spark.stop()
  }
}
