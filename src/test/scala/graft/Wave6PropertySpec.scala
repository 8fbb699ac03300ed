package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.expressions.{GraftFunctions => G, SubwordMatcher}
import graft.operators.TextAnalysis

/** Property invariants for the round-12 tokenizer/shard operators: the
  * Catalyst kernels checked against independent in-JVM references on
  * scalacheck-generated inputs (deterministic seeds), including non-BMP
  * code points the parquet corpus never exercises — the algorithm-level
  * complement of the DuckDB duals.
  */
class Wave6PropertySpec extends SparkSpec {
  import spark.implicits._

  private val seeds = 1L to 4L

  private def gen[T](g: Gen[List[T]], s: Long): List[T] =
    g(Gen.Parameters.default, rng.Seed(s)).get

  // word generator over a small alphabet (dense vocab hits) PLUS non-BMP
  // code points (surrogate-pair handling in the offset walk)
  private val cpGen: Gen[String] =
    Gen.frequency(
      8 -> Gen.oneOf("a", "b", "c", "d"),
      1 -> Gen.oneOf("😀", "𝄞")) // 😀, 𝄞
  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, cpGen).map(_.mkString))
  // nonempty by construction — suchThat retry budgets fail inside listOfN
  private val neWordGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, cpGen).map(_.mkString))

  /** Independent greedy longest-match reference in plain Scala. */
  private def refSegment(w: String, vocab: Set[String]): (Long, Long) = {
    val cps = w.codePoints().toArray
    val maxLen = if (vocab.isEmpty) 0 else vocab.iterator.map(v => v.codePointCount(0, v.length)).max
    var pos = 0
    var toks = 0L
    var fb = 0L
    while (pos < cps.length) {
      val best = (math.min(maxLen, cps.length - pos) to 1 by -1).find { l =>
        vocab.contains(new String(cps, pos, l))
      }
      best match {
        case Some(l) => pos += l
        case None    => pos += 1; fb += 1
      }
      toks += 1
    }
    (toks, fb)
  }

  test("SubwordMatcher == the plain-Scala greedy reference on random words incl. non-BMP") {
    val vg = Gen.listOfN(12, neWordGen)
    val wg = Gen.listOfN(40, wordGen)
    seeds.foreach { s =>
      val vocab = gen(vg, s).toSet
      val m = new SubwordMatcher(vocab.toSeq)
      gen(wg, s + 100).foreach { w =>
        val packed = m.segmentPacked(w)
        val (toks, fb) = (packed >>> 32, packed & 0xffffffffL)
        (toks, fb) shouldBe refSegment(w, vocab)
        // structural invariants: fallback within tokens, tokens within cp count
        val cp = w.codePointCount(0, w.length)
        fb should be <= toks
        toks should be <= cp.toLong
        if (vocab.contains(w) && w.nonEmpty) { toks shouldBe 1L; fb shouldBe 0L }
      }
      // empty vocab degenerates to per-code-point fallback
      val m0 = new SubwordMatcher(Nil)
      gen(wg, s + 200).foreach { w =>
        val p = m0.segmentPacked(w)
        val cp = w.codePointCount(0, w.length).toLong
        (p >>> 32) shouldBe cp
        (p & 0xffffffffL) shouldBe cp
      }
    }
  }

  test("SubwordStats == per-word matcher sums (doc kernel vs word reference)") {
    val wg = Gen.listOfN(10, neWordGen)
    seeds.foreach { s =>
      val vocab = gen(Gen.listOfN(6, neWordGen), s).distinct
      val words = gen(wg, s + 50)
      val df = Seq(Tuple1(words)).toDF("toks")
      val st = rows(df.select(G.subwordStats(col("toks"), vocab).as("st")))
        .head.getSeq[Long](0)
      val ref = words.map(refSegment(_, vocab.toSet))
      st(0) shouldBe words.size.toLong
      st(1) shouldBe ref.map(_._1).sum
      st(2) shouldBe ref.map(_._2).sum
      st(3) shouldBe words.map(w => w.codePointCount(0, w.length).toLong).sum
    }
  }

  test("VocabGramEntries == prefixed word + code-point 3-/2-gram reference") {
    val wg = Gen.listOfN(8, neWordGen)
    seeds.foreach { s =>
      val words = gen(wg, s)
      val df = Seq(Tuple1(words)).toDF("toks")
      val got = rows(df.select(G.vocabGramEntries(col("toks")).as("e")))
        .head.getSeq[String](0)
      val ref = words.flatMap { w =>
        val cps = w.codePoints().toArray
        Seq("w" + w) ++
          (0 to cps.length - 3).map(i => "3" + new String(cps, i, 3)) ++
          (0 to cps.length - 2).map(i => "2" + new String(cps, i, 2))
      }
      got shouldBe ref
    }
  }

  test("tokenShardReport == in-JVM snake reference on random token-count corpora") {
    val ng = Gen.listOfN(60, Gen.chooseNum(0, 30))
    seeds.foreach { s =>
      val counts = gen(ng, s)
      // doc i gets exactly counts(i) single-char words
      val df = counts.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = rows(TextAnalysis.tokenShardReport(df, "text", "doc_id", nShards = 4))
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens")))
      // reference: sort by (toks desc, doc_id asc), snake over 4 shards
      val ranked = counts.zipWithIndex.map { case (n, i) => (n.toLong, i.toLong) }
        .sortBy { case (n, i) => (-n, i) }
      val ref = ranked.zipWithIndex.map { case ((n, _), r) =>
        val shard = if ((r / 4) % 2 == 0) r % 4 else 3 - r % 4
        (shard.toLong, n)
      }.groupBy(_._1).map { case (sh, xs) => (sh, xs.size.toLong, xs.map(_._2).sum) }
        .toSeq.sortBy(_._1)
      got shouldBe ref
    }
  }
}
