package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.operators.Dedup

/** The registered SQL surface: every graft expression callable from
  * `spark.sql(...)` with plan-time literal parameters.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("vector_dot / simhash64 / minhash_sig / shingle_hashes / rolling_fingerprint via SQL") {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox jumps")).toDF("id", "text").createOrReplaceTempView("sql_docs")
    val toks = "regexp_extract_all(lower(text), '[\\\\p{L}\\\\p{Nd}]+', 0)"
    val sqlRow = spark.sql(
      s"""SELECT simhash64($toks, 2) AS sh, minhash_sig($toks, 2, 8) AS mh,
         | shingle_hashes($toks, 2) AS sg, rolling_fingerprint($toks) AS fp,
         | vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd
         | FROM sql_docs""".stripMargin).head()
    val colRow = Seq((1L, "the quick brown fox jumps")).toDF("id", "text").select(
      Dedup.simhash(col("text"), 2).as("sh"),
      Dedup.minhashSignature(col("text"), 2, 8).as("mh"),
      Dedup.shingleHashSet(col("text"), 2).as("sg"),
      graft.operators.TextAnalysis.fingerprint(col("text")).as("fp")).head()
    sqlRow.getLong(0) shouldBe colRow.getLong(0)
    sqlRow.getSeq[Long](1) shouldBe colRow.getSeq[Long](1)
    sqlRow.getSeq[Long](2) shouldBe colRow.getSeq[Long](2)
    sqlRow.getLong(3) shouldBe colRow.getLong(3)
    sqlRow.getDouble(4) shouldBe 11.0
  }

  test("ngram_strings via SQL matches the Column API") {
    GraftFunctions.register(spark)
    spark.sql("SELECT ngram_strings(array('a', 'b', 'c'), 2) AS bg")
      .head().getSeq[String](0) shouldBe Seq("a b", "b c")
    spark.sql("SELECT ngram_strings(array('a'), 2) AS bg")
      .head().getSeq[String](0) shouldBe Seq.empty
  }

  test("vector_max_abs via SQL matches the Column API") {
    GraftFunctions.register(spark)
    spark.sql("SELECT vector_max_abs(array(CAST(1.5 AS FLOAT), CAST(-7.25 AS FLOAT))) AS m")
      .head().getDouble(0) shouldBe 7.25
  }

  test("non-literal size parameter is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), id, 4) FROM range(1) AS t(id)").collect()
    }
    e.getMessage should include("integer literal")
  }
}
