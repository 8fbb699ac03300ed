package graft

import org.apache.spark.sql.functions._
import graft.operators.Sft

class SftSpec extends SparkSpec {
  import spark.implicits._

  private val tr = "<|system|>sys<|user|>hello there<|assistant|>hi<|user|>bye<|assistant|>"

  test("parseTurns: marker split, role/content cut, 0-based turn index") {
    val t = rows(Sft.parseTurns(Seq((1L, tr)).toDF("doc_id", "transcript"),
      "doc_id", "transcript").orderBy("turn_idx"))
    t.map(r => (r.getLong(1), r.getString(2), r.getString(3))) shouldBe Seq(
      (0L, "system", "sys"), (1L, "user", "hello there"), (2L, "assistant", "hi"),
      (3L, "user", "bye"), (4L, "assistant", ""))
  }

  test("minePairs: adjacency only — a user turn followed by a user turn yields no pair") {
    val broken = "<|system|>s<|user|>q1<|assistant|>a1<|user|>q2<|user|>q3<|assistant|>a3"
    val t = Sft.parseTurns(Seq((7L, broken)).toDF("doc_id", "transcript"),
      "doc_id", "transcript")
    val p = rows(Sft.minePairs(t, "doc_id").select("turn_idx", "prompt", "response")
      .orderBy("turn_idx"))
    // q1->a1 pairs; q2 (followed by q3) does not; q3->a3 pairs
    p.map(r => (r.getString(1), r.getString(2))) shouldBe Seq(("q1", "a1"), ("q3", "a3"))
  }

  test("maskSpans: exclusive prefix sums in the conversation token stream") {
    val t = Sft.parseTurns(Seq((1L, tr)).toDF("doc_id", "transcript"),
      "doc_id", "transcript")
    val m = rows(Sft.maskSpans(t, "doc_id",
      graft.operators.TextAnalysis.wsTokens(col("content"))).orderBy("turn_idx"))
    // tokens: sys=1, hello there=2, hi=1, bye=1, ''=0
    m.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) shouldBe Seq(
      (2L, 3L, 4L),  // assistant "hi": starts after sys(1)+prompt(2)
      (4L, 5L, 5L))  // empty final assistant: zero-width span
  }

  test("packed mask spans split exactly at sequence boundaries — including " +
    "the MIDDLE sequences of a span wider than one budget") {
    // the PRODUCTION construction from q_sft_packed_masks (the full
    // sequence() boundary range, r15 review fix — the old 2-endpoint
    // array_distinct explode dropped middle sequences): a boundary-
    // straddling span splits in two, a narrow span stays whole, and a span
    // WIDER than one 2048 budget ([100, 4500)) yields exactly THREE pieces
    // with the middle sequence fully covered
    val spans = Seq((1L, 2L, 2040L, 2060L), (2L, 2L, 100L, 110L),
        (3L, 2L, 100L, 4500L))
      .toDF("doc_id", "turn_idx", "a", "b")
    val pieces = rows(spans
      .withColumn("seq_id", explode(sequence(
        expr("a div 2048"), expr("(b - 1) div 2048"))))
      .withColumn("span_start", greatest(col("a"), col("seq_id") * 2048) - col("seq_id") * 2048)
      .withColumn("span_end", least(col("b"), (col("seq_id") + 1) * 2048) - col("seq_id") * 2048)
      .select("doc_id", "seq_id", "span_start", "span_end")
      .orderBy("doc_id", "seq_id"))
    pieces.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))) shouldBe
      Seq((1L, 0L, 2040L, 2048L), (1L, 1L, 0L, 12L), (2L, 0L, 100L, 110L),
        (3L, 0L, 100L, 2048L), (3L, 1L, 0L, 2048L), (3L, 2L, 0L, 404L))
  }

  test("withTranscript corrupt arm: doc_id % 17 == 0 with >= 4 turns breaks alternation") {
    val docs = Seq((17L, "a b c d e f g h i j k l m n o p q r s t"),
      (18L, "a b c d e f g h i j k l m n o p q r s t")).toDF("doc_id", "text")
    val t = Sft.parseTurns(Sft.withTranscript(docs), "doc_id", "transcript")
      .withColumn("ok", col("role") === Sft.expectedRole(col("turn_idx")))
    val bad = rows(t.filter(!col("ok")).select("doc_id", "turn_idx"))
    // 17 % 3 == 2 -> 6 turns, so turn(3) exists and is corrupted (turn_idx 4)
    bad.map(r => (r.getLong(0), r.getLong(1))) shouldBe Seq((17L, 4L))
  }
}
