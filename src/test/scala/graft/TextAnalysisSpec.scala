package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("wsTokens counts whitespace tokens, ignoring runs and edges") {
    val out = rows(Seq("  the quick\tbrown\n fox ", "", "one").toDF("t")
      .select(TextAnalysis.wsTokens(col("t")).as("n"))).map(_.getInt(0))
    out shouldBe Seq(4, 0, 1)
  }

  test("bpeTokens counts letter runs, digit runs, and single punctuation") {
    val out = rows(Seq("Hello, world42! It's 3.14").toDF("t")
      .select(TextAnalysis.bpeTokens(col("t")).as("n"))).map(_.getInt(0))
    // Hello , world 42 ! It ' s 3 . 14 -> 11
    out shouldBe Seq(11)
  }

  test("qualityFeatures computes ratios and word stats") {
    val out = rows(TextAnalysis.qualityFeatures(
      Seq((1L, "The cat and the dog. 42!")).toDF("id", "text"), "text")).head
    out.getAs[Long]("n_chars") shouldBe 24L
    out.getAs[Long]("n_words") shouldBe 6L // the cat and the dog 42
    out.getAs[Double]("stopword_ratio") shouldBe (3.0 / 6.0) // the, and, the
    out.getAs[Double]("digit_ratio") shouldBe (2.0 / 24.0)
    out.getAs[Double]("punct_ratio") shouldBe (2.0 / 24.0) // '.' and '!'
  }

  test("qualityFeatures on empty text yields zeros, not NaN/errors") {
    val out = rows(TextAnalysis.qualityFeatures(Seq((1L, "")).toDF("id", "text"), "text")).head
    out.getAs[Long]("n_words") shouldBe 0L
    out.getAs[Double]("punct_ratio") shouldBe 0.0
    out.isNullAt(out.fieldIndex("mean_word_len")) shouldBe true
  }

  test("langId votes by marker words with deterministic tie-break") {
    val df = Seq(
      "the cat is in the house and it was good",
      "der Hund ist nicht mit der Katze auf dem Sofa und das ist gut",
      "le chat est dans la maison et il est pour les oiseaux",
      "el gato es una maravilla para los pájaros como el sol",
      "qqqq zzzz xxxx"
    ).toDF("text")
    val out = rows(df.select(TextAnalysis.langId(col("text")).as("l"))).map(_.getString(0))
    out shouldBe Seq("en", "de", "fr", "es", "und")
  }

  test("fingerprint is order-sensitive and deterministic") {
    val out = rows(Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("f"))).map(_.getLong(0))
    out(0) shouldBe out(2)
    out(0) should not be out(1)
    out.foreach(f => f should (be >= 0L and be < 2147483647L))
  }

  test("contentHash normalizes whitespace before hashing") {
    val out = rows(Seq("a  b\tc", "a b c", "a b d").toDF("t")
      .select(TextAnalysis.contentHash(col("t")).as("h"))).map(_.getString(0))
    out(0) shouldBe out(1)
    out(0) should not be out(2)
  }
}
