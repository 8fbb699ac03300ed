package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches a hand-rolled reference on a small graph") {
    // 1→2, 1→3, 2→3, 3→1 (3 has the only edge into 1; 3 collects from both)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = rows(Graph.pageRank(edges, "src", "dst", iterations = 3).orderBy("node"))
      .map(r => (r.getLong(0), r.getDouble(1))).toMap

    // reference: same formula, scalar arithmetic (sums here are 1-2 terms,
    // so decimal rounding at 1e-12 is the only divergence — assert to 1e-9)
    var rank = Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0)
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L), 3L -> Seq(1L))
    (1 to 3).foreach { _ =>
      val contrib = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      out.foreach { case (s, ds) => ds.foreach(d => contrib(d) += rank(s) / ds.size) }
      rank = rank.keys.map(n => n -> (0.15000000000000002 + 0.85 * contrib(n))).toMap
    }
    got.keySet shouldBe rank.keySet
    got.foreach { case (n, r) => r shouldBe rank(n) +- 1e-9 }
  }

  test("dangling nodes keep teleport-only rank and absorb nothing after their inflow stops") {
    // 1→2: node 2 is dangling (no out-edges)
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = rows(Graph.pageRank(edges, "src", "dst", iterations = 2).orderBy("node"))
      .map(r => (r.getLong(0), r.getDouble(1)))
    // node 1 has no in-edges: teleport only. node 2: teleport + d·rank(1)
    val t = 0.15000000000000002
    got(0)._2 shouldBe t +- 1e-12
    got(1)._2 shouldBe (t + 0.85 * t) +- 1e-9
  }

  test("triangles: per-node counts and coefficients on a diamond graph") {
    // K4 minus edge (1,4): triangles {1,2,3} and {2,3,4}. Input deliberately
    // dirty: a reversed duplicate (2,1), a self-loop (3,3) — both collapse
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L), (3L, 3L))
      .toDF("a", "b")
    val got = rows(Graph.triangles(edges, "a", "b").orderBy("node"))
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    got shouldBe Map(
      1L -> ((2L, 1L, 1.0)),
      2L -> ((3L, 2L, 2.0 * 2 / (3.0 * 2.0))),
      3L -> ((3L, 2L, 2.0 * 2 / (3.0 * 2.0))),
      4L -> ((2L, 1L, 1.0)))
  }

  test("triangles: a hub star has zero triangles and zero coefficients") {
    // star around 0 — the degree orientation points every edge AT the hub,
    // so the wedge join produces nothing (the curse-of-the-last-reducer case)
    val edges = (1L to 20L).map(i => (0L, i)).toDF("a", "b")
    val got = rows(Graph.triangles(edges, "a", "b").orderBy("node"))
    got.map(_.getLong(2)).sum shouldBe 0L
    got.map(_.getDouble(3)).sum shouldBe 0.0
    got.find(_.getLong(0) == 0L).get.getLong(1) shouldBe 20L
  }

  test("neighborhoodJaccard: common neighbors and jaccard per edge") {
    // path-with-chord: edges 1-2, 2-3, 3-4, 4-1, 1-3 (dirty: reversed dup)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val got = rows(Graph.neighborhoodJaccard(edges, "a", "b").orderBy("id_a", "id_b"))
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // N(1)={2,3,4} N(2)={1,3} N(3)={1,2,4} N(4)={1,3}
    got((1L, 2L)) shouldBe ((3L, 2L, 1L, 1.0 / 4.0)) // common {3}
    got((1L, 3L)) shouldBe ((3L, 3L, 2L, 2.0 / 4.0)) // common {2,4}
    got((1L, 4L)) shouldBe ((3L, 2L, 1L, 1.0 / 4.0)) // common {3}
    got((2L, 3L)) shouldBe ((2L, 3L, 1L, 1.0 / 4.0)) // common {1}
    got((3L, 4L)) shouldBe ((3L, 2L, 1L, 1.0 / 4.0)) // common {1}
    got.size shouldBe 5
  }

  test("resourceAllocation: hub-discounted common-neighbor sums, decimal-quantized") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("a", "b")
    val got = rows(Graph.resourceAllocation(edges, "a", "b").orderBy("id_a", "id_b"))
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // deg: 1→3, 2→2, 3→3, 4→2; 1/3 quantizes to 0.333333 at DECIMAL(30,6)
    got((1L, 2L)) shouldBe 0.333333 // common {3}: 1/deg(3)
    got((1L, 3L)) shouldBe 1.0      // common {2,4}: 1/2 + 1/2
    got((2L, 3L)) shouldBe 0.333333 // common {1}: 1/deg(1)
  }

  test("neighborhoodJaccard: disconnected edge has zero common, jaccard 0") {
    val edges = Seq((1L, 2L), (8L, 9L)).toDF("a", "b")
    val got = rows(Graph.neighborhoodJaccard(edges, "a", "b").orderBy("id_a"))
      .map(r => (r.getLong(0), r.getLong(4), r.getDouble(5)))
    got shouldBe Seq((1L, 0L, 0.0), (8L, 0L, 0.0))
  }
}
