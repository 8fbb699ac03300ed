package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.operators.{Queries, Similarity, Sketches, TextAnalysis}

/** Property invariants for the round-11 operators: each distributed
  * formulation checked against an independent in-JVM reference (or a
  * structural invariant) on scalacheck-generated inputs, deterministic
  * seeds — the algorithm-level complement of the DuckDB duals.
  */
class Wave5PropertySpec extends SparkSpec {
  import spark.implicits._

  private val seeds = 1L to 4L

  private def gen[T](g: Gen[List[T]], s: Long): List[T] =
    g(Gen.Parameters.default, rng.Seed(s)).get

  // --- histogram quantile sketch: bounded error vs the exact quantile -----

  test("histogramQuantiles: estimate ∈ [exact, exact + binWidth] on random data") {
    val g = Gen.listOfN(300, Gen.chooseNum(-1000, 1000).map(_ / 7.0))
    seeds.foreach { s =>
      val xs = gen(g, s)
      val df = xs.map(("k", _)).toDF("k", "v")
      val r = rows(Sketches.histogramQuantiles(df, Seq("k"), "v",
        bins = 32, qs = Seq(0.5, 0.9))).head
      val sorted = xs.sorted
      val width = (sorted.last - sorted.head) / 32
      Seq(0.5 -> "p50_est", 0.9 -> "p90_est").foreach { case (q, cname) =>
        val exact = sorted(math.ceil(q * xs.size).toInt - 1)
        val est = r.getAs[Double](cname)
        est should be >= exact - 1e-9
        est should be <= exact + width + 1e-9
      }
    }
  }

  // --- TopKAgg ≡ window ranking on arbitrary data incl. score ties --------

  test("groupedTopKAgg equals the window formulation on random frames with ties") {
    val g = Gen.listOfN(120, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 9)))
    seeds.foreach { s =>
      val xs = gen(g, s).zipWithIndex.map { case ((k, v), i) =>
        (k.toLong, i.toLong, v.toDouble)
      }
      val df = xs.toDF("k", "id", "v")
      val agg = rows(Queries.groupedTopKAgg(df, "k", "v", "id", 3)
        .orderBy("k", "rnk")).map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      val ref = xs.groupBy(_._1).toSeq.flatMap { case (k, rows0) =>
        rows0.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case (t, i) => (k, t._2, (i + 1).toLong) }
      }.sortBy(t => (t._1, t._3))
      agg shouldBe ref
    }
  }

  // --- semDedup cap: recall-only loss on random vectors -------------------

  test("semDedup maxCellSize drops ⊆ unguarded drops on random vector sets") {
    val g = Gen.listOfN(60, Gen.zip(Gen.chooseNum(-10, 10), Gen.chooseNum(-10, 10)))
    seeds.foreach { s =>
      val vs = gen(g, s).zipWithIndex
        .filter { case ((a, b), _) => a != 0 || b != 0 }
        .map { case ((a, b), i) => (i.toLong, Array(a.toFloat, b.toFloat)) }
      val df = vs.toDF("vec_id", "embedding")
      val cents = Seq((0L, Seq(1.0, 0.0))).toDF("cell_id", "centroid")
      def drops(cap: Option[Long]) =
        rows(Similarity.semDedup(df, cents, "embedding", "vec_id",
          threshold = 0.98, maxCellSize = cap))
          .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
      val guarded = drops(Some(8L))
      guarded.subsetOf(drops(None)) shouldBe true
    }
  }

  // --- gumbelTopK: top-k1 is a prefix of top-k2 ---------------------------

  test("gumbelTopK prefix stability: the top-3 is a prefix of the top-6") {
    val g = Gen.listOfN(30, Gen.chooseNum(-100, 100).map(_ / 10.0))
    seeds.foreach { s =>
      val ws = gen(g, s).zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val df = ws.toDF("doc_id", "log_weight")
      def pick(k: Int) = rows(TextAnalysis.gumbelTopK(df, "doc_id", "log_weight", k)
        .orderBy(col("gumbel_key").desc, col("doc_id")))
        .map(r => (r.getLong(0), r.getDouble(2)))
      pick(6).take(3) shouldBe pick(3)
    }
  }

  // --- kCenters: the second pick IS the farthest point from the first ----

  test("kCenters second pick maximizes squared-L2 from the first (id tie-break)") {
    val g = Gen.listOfN(40, Gen.zip(Gen.chooseNum(-50, 50), Gen.chooseNum(-50, 50)))
    seeds.foreach { s =>
      val vs = gen(g, s).zipWithIndex
        .map { case ((a, b), i) => (i.toLong, Array(a.toFloat, b.toFloat)) }
      val df = vs.toDF("vec_id", "embedding")
      val out = rows(Similarity.kCenters(df, "embedding", "vec_id", k = 2)
        .orderBy("center_rank")).map(_.getLong(1))
      val first = vs.minBy(_._1)
      def d2(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
      val expect = vs.filter(_._1 != first._1)
        .map { case (id, v) => (id, d2(v, first._2)) }
        .minBy { case (id, d) => (-d, id) }._1
      out shouldBe Seq(first._1, expect)
    }
  }
}
