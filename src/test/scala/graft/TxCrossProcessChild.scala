package graft

import org.apache.spark.sql.SparkSession

/** Second-JVM arm of the TxTable cross-process specs (r16, verdict ask #7):
  * a genuinely separate process opening the SAME table directory.
  *
  * Modes:
  *  - `commits <root> <n>`: perform n appends — run AFTER the parent's
  *    commits, it must adopt the landed log (manifest chain + pointer) and
  *    extend it; the parent then asserts the merged history.
  *  - `reader <root> <n>`: poll n times while the parent commits/compacts —
  *    the pointer must never regress across reads (the r15 publishPointer
  *    guarantee observed from ANOTHER process) and every observed current
  *    version must be readable (manifest resolvable, snapshot countable) —
  *    snapshot isolation under live cross-process maintenance.
  *
  * Exit codes: 0 ok, 2 pointer regression, 3 unreadable snapshot.
  */
object TxCrossProcessChild {
  def main(args: Array[String]): Unit = {
    val mode = args(0); val root = args(1); val n = args(2).toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-txchild")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = graft.sources.TxTable(spark, root, "t")
    mode match {
      case "commits" =>
        (1 to n).foreach(i => t.append(Seq(1000 + i).toDF("x")))
        println(s"[txchild] committed $n, version=${t.currentVersion}")
      case "reader" =>
        var last = 0L
        var i = 0
        while (i < n) {
          val v = t.currentVersion
          if (v < last) {
            System.err.println(s"[txchild] pointer regressed $last -> $v")
            spark.stop(); sys.exit(2)
          }
          last = v
          if (v > 0) {
            try t.snapshot(v).count()
            catch {
              case e: Exception =>
                System.err.println(s"[txchild] snapshot($v) unreadable: $e")
                spark.stop(); sys.exit(3)
            }
          }
          i += 1
          Thread.sleep(50)
        }
        println(s"[txchild] $n reads ok, last version=$last")
    }
    spark.stop()
    sys.exit(0)
  }
}
