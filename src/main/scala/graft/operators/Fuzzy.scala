package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching — field-level entity resolution: candidate pairs
  * from an equi-join on a cheap blocking key, verified by edit distance.
  * The all-pairs comparison a naive fuzzy join runs is |L|·|R|; blocking
  * bounds candidates to the per-block populations, the standard
  * entity-resolution tradeoff (recall limited to pairs agreeing on the
  * block key — callers pick a key their corruption model preserves).
  */
object Fuzzy {

  /** Pairs (left, right) whose values share a `blockLen`-char prefix and
    * sit within `maxDist` edits. Runs over the DISTINCT value domains —
    * resolution at 100 TB is a property of the vocabulary, not the rows;
    * join results back on the value to land per-row matches.
    */
  def blockedMatch(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String,
      blockLen: Int = 2, maxDist: Int = 1): DataFrame = {
    val l = left.select(col(leftCol)).distinct()
      .withColumn("__blk", substring(col(leftCol), 1, blockLen))
    val r = right.select(col(rightCol)).distinct()
      .withColumn("__blk", substring(col(rightCol), 1, blockLen))
    l.join(r, "__blk")
      .filter(levenshtein(col(leftCol), col(rightCol)) <= maxDist)
      .drop("__blk")
  }
}
