package graft

import graft.operators.Fuzzy

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("blockedMatch pairs values within maxDist that share the block prefix") {
    val left = Seq("blue bolt", "bleu bolt", "red widget").toDF("a")
    val right = Seq("blue bolt", "blue bol", "red midget", "green bolt").toDF("b")
    val out = rows(Fuzzy.blockedMatch(left, "a", right, "b").orderBy("a", "b"))
      .map(r => (r.getString(0), r.getString(1)))
    // "bleu bolt"→"blue bolt" is distance 2 (transposition = 2 edits in
    // plain Levenshtein): excluded. "red widget"→"red midget" is one
    // substitution: matched. "green bolt" shares no prefix with any.
    out shouldBe Seq(("blue bolt", "blue bol"), ("blue bolt", "blue bolt"),
      ("red widget", "red midget"))
  }

  test("blocking is the recall boundary: an edit inside the block prefix never matches") {
    val left = Seq("xlue bolt").toDF("a") // distance 1 from "blue bolt", prefix differs
    val right = Seq("blue bolt").toDF("b")
    rows(Fuzzy.blockedMatch(left, "a", right, "b")) shouldBe empty
  }

  test("runs over distinct domains: duplicate values produce one pair") {
    val left = Seq("blue bolt", "blue bolt").toDF("a")
    val right = Seq("blue bolt", "blue bolt").toDF("b")
    rows(Fuzzy.blockedMatch(left, "a", right, "b")).size shouldBe 1
  }
}
