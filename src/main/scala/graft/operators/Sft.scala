package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SFT / conversation-data preparation (r15).
  *
  * Instruction-tuning corpora arrive as multi-turn transcripts, and the
  * pipeline in front of the trainer is relational: parse transcripts into
  * turns, VALIDATE the role structure (a malformed conversation silently
  * corrupts the loss), mine adjacent (prompt → response) pairs, and compute
  * the loss-mask token spans — the [start, end) offsets of assistant turns
  * in each conversation's token stream that the trainer unmasks.
  *
  * Everything here is explode + codegen'd narrow string ops plus at most
  * one per-conversation window (the prefix-sum for mask offsets, keyed on
  * the conversation id — bounded partitions, no skew). At 100 TB the parse
  * rides the scan; only the cross-corpus response-dedup signal shuffles,
  * keyed on a 16-byte response hash.
  *
  * No counterpart in the reference (ticker APIs); the LLM-pipeline
  * extension family, same class as Web / TextAnalysis.
  */
object Sft {

  /** Deterministic transcript fixture over (doc_id, text): a system turn
    * followed by 2·(doc_id%3 + 1) alternating user/assistant turns whose
    * contents are word-slices of the document text (slice clamping at
    * short docs is part of the gate). One doc per 17 swaps the second
    * assistant turn's role to `user` — a broken alternation the validator
    * must flag and the pair miner must refuse to pair.
    */
  def withTranscript(docs: DataFrame): DataFrame = {
    val words = filter(split(col("text"), "\\s+"), w => length(w) > 0)
    def turn(i: Int): Column = {
      val normal = if (i % 2 == 0) "user" else "assistant"
      val role =
        if (i == 3) when(col("doc_id") % 17 === 0, lit("user")).otherwise(lit(normal))
        else lit(normal)
      val content = array_join(slice(words, i * 4 + 1, 4), " ")
      when(lit(i) < (col("doc_id") % 3 + 1) * 2,
        concat(lit("<|"), role, lit("|>"), content)).otherwise(lit(""))
    }
    docs.withColumn("transcript", concat(
      lit("<|system|>be concise and helpful"),
      turn(0), turn(1), turn(2), turn(3), turn(4), turn(5)))
  }

  /** Parse transcripts into one row per turn: split on the `<|` marker
    * (literal — no lookaround, so the DuckDB dual restates it verbatim),
    * role = the segment up to `|>`, content = the rest. Emits
    * (conversation id passthrough, turn_idx, role, content) — everything
    * downstream (validation, pairing, masking) derives from THIS frame,
    * never from the raw string again.
    */
  def parseTurns(df: DataFrame, idCol: String, transcriptCol: String): DataFrame = {
    val seg = col("__seg")
    val role = substring_index(seg, "|>", 1)
    df.select(col(idCol),
        posexplode(split(col(transcriptCol), "<\\|")).as(Seq("__pos", "__seg")))
      // a segment without the role delimiter (e.g. preamble text before
      // the first marker) is NOT a turn — dropped, not emitted as garbage
      .filter(length(seg) > 0 && seg.contains("|>"))
      .select(col(idCol), (col("__pos") - 1).cast(LongType).as("turn_idx"),
        role.as("role"),
        seg.substr(length(role) + lit(3), length(seg)).as("content"))
  }

  /** Expected role at a turn index: system first, then user/assistant
    * alternating — the validation contract.
    */
  def expectedRole(turnIdx: Column): Column =
    when(turnIdx === 0, lit("system"))
      .when(turnIdx % 2 === 1, lit("user"))
      .otherwise(lit("assistant"))

  /** Adjacent (user → assistant) pair mining over a parsed turn frame:
    * a pair exists only where a user turn is IMMEDIATELY followed by an
    * assistant turn (the broken-alternation fixture docs lose exactly the
    * corrupted slot), plus the cross-corpus duplicate-response signal —
    * identical assistant responses across conversations are the classic
    * SFT near-dup (templated answers) and shuffle only a 16-byte hash.
    */
  def minePairs(turns: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = turns.filter(col("role") === "user")
      .select(col(idCol), col("turn_idx"), col("content").as("prompt"))
    val a = turns.filter(col("role") === "assistant")
      .select(col(idCol), (col("turn_idx") - 1).as("turn_idx"),
        col("content").as("response"))
    u.join(a, Seq(idCol, "turn_idx"))
      // turn_idx div 2, NOT (turn_idx-1)/2: div semantics on a possible
      // turn_idx 0 (no system turn) diverge between truncate-toward-zero
      // and floor — idx div 2 is identical in both engines for all idx ≥ 0
      .withColumn("pair_idx", expr("turn_idx div 2").cast(LongType))
      .withColumn("prompt_md5", md5(col("prompt")))
      .withColumn("response_md5", md5(col("response")))
      .withColumn("n_same_response",
        count(lit(1)).over(Window.partitionBy(col("response_md5"))))
  }

  /** Loss-mask spans: per conversation, the exclusive prefix sum of turn
    * token counts gives each turn's [tok_start, tok_end) in the
    * conversation's token stream; assistant turns are the spans a trainer
    * unmasks. One window per conversation id.
    */
  def maskSpans(turns: DataFrame, idCol: String, toks: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    turns.withColumn("__toks", toks.cast(LongType))
      .withColumn("tok_start", coalesce(sum(col("__toks")).over(w), lit(0L)))
      .withColumn("tok_end", col("tok_start") + col("__toks"))
      .filter(col("role") === "assistant")
      .select(col(idCol), col("turn_idx"), col("tok_start"), col("tok_end"))
  }
}
