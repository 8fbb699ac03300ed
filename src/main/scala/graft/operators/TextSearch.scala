package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.Fns

/** Conjunctive term search with tf-idf ranking — the retrieval query a text
  * corpus serves: documents containing ALL query terms, scored by
  * Σ tf(term)·N/df(term), top-k.
  */
object TextSearch {

  /** Plan: the token explode filters to the QUERY TERMS before any shuffle,
    * so the exchange carries only the posting lists of the searched terms
    * (∝ Σ df of the terms, not corpus volume); per-term document frequency
    * is a count window over the same postings frame (one row per
    * (doc, term)); the conjunctive gate and the score sum are one
    * partial-aggregable groupBy; top-k ends as TakeOrderedAndProject
    * (map-side partial top-k — no global sort). Rational idf (tf·N/df, a
    * single double division) plus the exact-decimal score sum keep ranking
    * bit-reproducible across engines — no `log`, whose last-ulp behavior
    * differs between libm implementations.
    */
  def search(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int, corpusN: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val termList = terms.map(_.toLowerCase).distinct
    val tf = df.select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("token"))
      .filter(col("token").isin(termList: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val nDf = corpusN match {
      case Some(n) => df.sparkSession.range(1).select(lit(n).as("__n"))
      case None => df.agg(count(lit(1)).as("__n"))
    }
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
      .crossJoin(broadcast(nDf))
      .withColumn("term_score",
        (col("tf") * col("__n")).cast(DoubleType) / col("df").cast(DoubleType))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"), Fns.exactSum(col("term_score")).as("score"))
      .filter(col("n_matched") === termList.size)
      .drop("n_matched")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
