package graft

import graft.operators.TextSearch

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark table window spark"), // both terms, spark tf=2
    (2L, "spark table"),              // both terms once
    (3L, "spark spark spark"),        // missing 'table' — excluded
    (4L, "table chair lamp"),         // missing 'spark' — excluded
    (5L, "nothing relevant here")
  ).toDF("doc_id", "text")

  test("conjunctive: only docs containing ALL terms match; ranked by tf-idf sum") {
    val out = rows(TextSearch.search(docs, "text", "doc_id", Seq("spark", "table"), 10))
      .map(r => (r.getLong(0), r.getDouble(1)))
    out.map(_._1) shouldBe Seq(1L, 2L)
    // doc 1 outranks doc 2 (same terms, higher spark tf)
    out(0)._2 should be > out(1)._2
  }

  test("query terms are lowercased and deduplicated") {
    val out = rows(TextSearch.search(docs, "text", "doc_id", Seq("SPARK", "spark", "Table"), 10))
      .map(_.getLong(0))
    out shouldBe Seq(1L, 2L)
  }

  test("k truncates deterministically with doc_id as the tiebreak") {
    val tied = Seq((10L, "a b"), (11L, "a b"), (12L, "a b")).toDF("doc_id", "text")
    rows(TextSearch.search(tied, "text", "doc_id", Seq("a", "b"), 2))
      .map(_.getLong(0)) shouldBe Seq(10L, 11L)
  }
}
