package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: "concat-and-chunk".
  *
  * Training examples are built by concatenating the token streams of
  * consecutive documents (in a deterministic order) and slicing the combined
  * stream into fixed-`budget` sequences. Each document therefore needs its
  * GLOBAL token offset — an exclusive prefix sum over the whole corpus — from
  * which its starting sequence (`seq_id`) and position within it
  * (`seq_offset`) follow by integer division.
  *
  * A naive `sum().over(Window.orderBy(id))` computes that prefix sum through
  * ONE unpartitioned window — a single task scanning the entire corpus, the
  * classic global-window scale killer. This implementation uses the standard
  * two-level distributed prefix sum instead:
  *
  *   1. rows are grouped into fixed id-ranges (`groupSize` ids per group);
  *      the within-group exclusive prefix sum runs under a window PARTITIONED
  *      by group — thousands of independent tasks;
  *   2. per-group totals (|corpus| / groupSize rows — the "carry" table) get
  *      their own exclusive prefix sum; that window is unpartitioned but scans
  *      only the tiny totals table, and the result broadcast-joins back.
  *
  * Every quantity is integer arithmetic, so the result is bit-exact against a
  * single global window (the oracle's formulation) at any grouping.
  *
  * 100 TB: stage 1 is embarrassingly parallel; stage 2 touches one row per
  * group (pick `groupSize` so the totals table is ~10⁵-10⁶ rows); the
  * broadcast is a few MB. No stage scans the corpus serially.
  */
object Packing {

  /** Assign each row its packed-sequence coordinates.
    *
    * @param df       input; one row per document
    * @param tokenCol integral column: the document's token count
    * @param orderCol integral column defining the deterministic concatenation
    *                 order (documents are packed in ascending `orderCol`).
    *                 Values must be UNIQUE — ties would make the prefix sum
    *                 order-dependent among the tied rows (true of any
    *                 formulation, including a single global window)
    * @param budget   tokens per packed training sequence
    * @param groupSize ids per prefix-sum group (scale knob, not semantics)
    * @return input plus `seq_start` (global token offset), `seq_id`
    *         (sequence index containing the document's first token) and
    *         `seq_offset` (position of that token within the sequence)
    */
  def packSequences(df: DataFrame, tokenCol: String, orderCol: String,
      budget: Long, groupSize: Long = 4096L): DataFrame = {
    require(budget > 0 && groupSize > 0, "budget and groupSize must be positive")
    val grp = expr(s"CAST($orderCol AS BIGINT) div $groupSize")
    val wIn = Window.partitionBy(col("__grp")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = df.withColumn("__grp", grp)
      .withColumn("__local_start",
        coalesce(sum(col(tokenCol)).over(wIn), lit(0L)))
    val wCarry = Window.orderBy(col("__grp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = local.groupBy(col("__grp"))
      .agg(sum(col(tokenCol)).as("__gtot"))
      .withColumn("__goff", coalesce(sum(col("__gtot")).over(wCarry), lit(0L)))
      .select(col("__grp"), col("__goff"))
    local.join(broadcast(carries), Seq("__grp"))
      .withColumn("seq_start", col("__goff") + col("__local_start"))
      .withColumn("seq_id", expr(s"seq_start div $budget"))
      .withColumn("seq_offset", col("seq_start") % budget)
      .drop("__grp", "__local_start", "__goff")
  }

  /** Per-document sliding-window chunking — the context-window splitter for
    * long documents: token windows of `size` starting every `stride` tokens
    * (`stride < size` ⇒ overlapping chunks). The final window is the short
    * tail unless the previous chunks already cover the document. A document
    * shorter than `size` yields exactly one chunk; a document with ZERO
    * tokens yields none (generator semantics — absent from the output).
    *
    * Pure narrow plan: tokenize once, `sequence` + explode generates chunk
    * starts, `slice`+`concat_ws` rebuilds each chunk's text — all codegen'd
    * expressions (no interpreted lambdas), zero shuffle at any corpus size.
    */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val toks = df.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("__ts"))
      .withColumn("__n", size(col("__ts")).cast("long"))
    // smallest multiple of stride whose chunk reaches the document's end:
    // ceil(max(n - chunkSize, 0) / stride) * stride
    val lastStart = ceil(greatest(col("__n") - chunkSize, lit(0L)).cast("double") / stride)
      .cast("long") * stride
    toks.filter(col("__n") > 0)
      .withColumn("chunk_start", explode(sequence(lit(0L), lastStart, lit(stride.toLong))))
      .select(col("doc_id"), (col("chunk_start") / stride).cast("long").as("chunk_id"),
        col("chunk_start"),
        least(col("chunk_start") + chunkSize, col("__n")).as("chunk_end"),
        concat_ws(" ", slice(col("__ts"), col("chunk_start").cast("int") + 1,
          lit(chunkSize))).as("chunk_text"))
  }
}
