package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: run one streaming query with progress debug and time it. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    (0 until 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      System.err.println(f"[probe] $name pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
