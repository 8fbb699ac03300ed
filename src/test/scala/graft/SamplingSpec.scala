package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (0L until 2000L).toDF("id")

  test("withSplit is deterministic, covers all labels, roughly honors weights") {
    val a = rows(Sampling.withSplit(ids, "id").orderBy("id")).map(_.getString(1))
    val b = rows(Sampling.withSplit(ids, "id").orderBy("id")).map(_.getString(1))
    a shouldBe b
    val byLabel = a.groupBy(identity).view.mapValues(_.size).toMap
    byLabel.keySet shouldBe Set("train", "val", "test")
    byLabel("train").toDouble / a.size shouldBe 0.8 +- 0.05
    byLabel("val").toDouble / a.size shouldBe 0.1 +- 0.03
  }

  test("split assignment is stable under corpus growth (no example crosses splits)") {
    val small = rows(Sampling.withSplit(ids.filter(col("id") < 500), "id").orderBy("id"))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = rows(Sampling.withSplit(ids, "id").orderBy("id"))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, label) => big(id) shouldBe label }
  }

  test("hashSample keeps approximately the requested fraction, deterministically") {
    val n1 = Sampling.hashSample(ids, "id", 0.2).count()
    val n2 = Sampling.hashSample(ids, "id", 0.2).count()
    n1 shouldBe n2
    n1.toDouble / 2000 shouldBe 0.2 +- 0.04
  }

  test("stratifiedQuota takes exactly ceil(fraction * |stratum|) rows per stratum") {
    val df = Seq.tabulate(100)(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val out = Sampling.stratifiedQuota(df, Seq("grp"), "id", 0.25)
    val counts = rows(out.groupBy("grp").count().orderBy("grp"))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts("a") shouldBe math.ceil(34 * 0.25).toLong // 34 rows in 'a'
    counts("b") shouldBe math.ceil(66 * 0.25).toLong
  }
}
