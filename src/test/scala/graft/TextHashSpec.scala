package graft

import org.apache.spark.sql.functions._
import graft.expressions.{GraftFunctions => G}
import graft.operators.Dedup

/** Pins the precompiled text-hash kernels (TextHashExpressions.scala) to their
  * interpreted Spark-builtin formulations — the kernels must be drop-in
  * replacements for the lambda pipelines they made obsolete.
  */
class TextHashSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox, jumps over the lazy dog!"),
    (2L, "one two"),
    (3L, ""),
    (4L, "Hello, World! 123 foo-bar baz")
  ).toDF("doc_id", "text")

  test("shingleHashes matches xxhash64 over string shingles (sorted distinct)") {
    val expected = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)))).as("e"))
    val actual = docs.select(col("doc_id"),
      G.shingleHashes(Dedup.tokens(col("text")), 3, distinct = true).as("a"))
    val j = expected.join(actual, "doc_id")
    rows(j.filter(col("e") =!= col("a"))) shouldBe empty
    rows(j).length shouldBe 4
  }

  test("shingleHashes short-doc fallback hashes the whole token list") {
    // "one two" with n=3 -> single shingle "one two"
    val out = rows(Seq("one two").toDF("t").select(
      G.shingleHashes(Dedup.tokens(col("t")), 3, distinct = true).as("a"),
      xxhash64(lit("one two")).as("e"))).head
    out.getSeq[Long](0) shouldBe Seq(out.getLong(1))
  }

  test("shingleStats single pass equals the two-kernel formulation") {
    // includes a repetitive doc so total != distinct, plus the spec corpus
    val d = docs.union(Seq((5L, "ha ha ha ha ha ha ha ha")).toDF("doc_id", "text"))
    val toks = Dedup.tokens(col("text"))
    val two = d.select(col("doc_id"),
      org.apache.spark.sql.functions.size(G.shingleHashes(toks, 3, distinct = false)).cast("long").as("e_total"),
      org.apache.spark.sql.functions.size(G.shingleHashes(toks, 3, distinct = true)).cast("long").as("e_dist"))
    val one = d.select(col("doc_id"), G.shingleStats(toks, 3).as("st"))
      .select(col("doc_id"), col("st.n_ngrams").as("a_total"),
        col("st.n_distinct_ngrams").as("a_dist"))
    val j = two.join(one, "doc_id")
    rows(j.filter(col("e_total") =!= col("a_total") || col("e_dist") =!= col("a_dist"))) shouldBe empty
    rows(j).length shouldBe 5
  }

  test("ngramStrings: adjacency pairs in document order, empty below n") {
    val out = rows(docs.select(col("doc_id"),
      G.ngramStrings(Dedup.tokens(col("text")), 2).as("bg")).orderBy("doc_id"))
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    out.toMap shouldBe Map(
      1L -> Seq("the quick", "quick brown", "brown fox", "fox jumps", "jumps over",
        "over the", "the lazy", "lazy dog"),
      2L -> Seq("one two"),
      3L -> Seq.empty, // no tokens — no pair, NOT the whole-list fallback
      4L -> Seq("hello world", "world 123", "123 foo", "foo bar", "bar baz"))
    // matches the lead-over-window pairing it replaced
    val lead_pairs = {
      import org.apache.spark.sql.expressions.Window
      val toks = docs.select(col("doc_id"),
        posexplode(Dedup.tokens(col("text"))).as(Seq("p", "t")))
      val w = Window.partitionBy("doc_id").orderBy("p")
      rows(toks.withColumn("nx", lead(col("t"), 1).over(w))
        .filter(col("nx").isNotNull)
        .select(concat_ws(" ", col("t"), col("nx")).as("bg")).orderBy("bg"))
        .map(_.getString(0))
    }
    out.flatMap(_._2).sorted shouldBe lead_pairs
  }

  test("minhash sig: equal docs equal, unrelated differ, length k") {
    val d = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "x y z w v u t")).toDF("id", "t")
    val sigs = rows(d.select(col("id"), G.minhashSig(Dedup.tokens(col("t")), 2, 16).as("s")))
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigs(1L) shouldBe sigs(2L)
    sigs(1L) should not be sigs(3L)
    sigs(1L).length shouldBe 16
  }

  test("simhash64: md5-derived bits match a direct reimplementation") {
    // direct Scala reference: distinct string shingles -> md5 prefix64 votes
    def ref(text: String, n: Int): Long = {
      val toks = "[\\p{L}\\p{Nd}]+".r.findAllIn(text.toLowerCase).toSeq
      val shingles =
        if (toks.length < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val votes = new Array[Int](64)
      shingles.distinct.foreach { s =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        val h = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
        (0 until 64).foreach(j => if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1)
      }
      (0 until 64).foldLeft(0L)((fp, j) => if (votes(j) > 0) fp | (1L << j) else fp)
    }
    val out = rows(docs.select(col("doc_id"), Dedup.simhash(col("text"), 2).as("fp")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 2L, 4L).foreach { id =>
      val text = Seq("The quick brown fox, jumps over the lazy dog!", "one two", "", "Hello, World! 123 foo-bar baz")(id.toInt - 1)
      out(id) shouldBe ref(text, 2)
    }
  }

  test("nfcNormalize: NFD composes to NFC, already-NFC and ASCII pass through, " +
       "nulls stay null, SQL surface matches the Column API") {
    import graft.expressions.{GraftFunctions => GF}
    val nfc = "caf\u00e9"            // precomposed U+00E9
    val nfd = "cafe\u0301"           // e + combining acute U+0301
    val df = Seq((1L, nfd), (2L, nfc), (3L, "plain ascii"), (4L, null))
      .toDF("id", "t")
    val out = rows(df.select(col("id"), GF.nfcNormalize(col("t")).as("n"))
      .orderBy("id")).map(r => if (r.isNullAt(1)) null else r.getString(1))
    out(0) shouldBe nfc                       // composed
    out(1) shouldBe nfc                       // identity
    out(2) shouldBe "plain ascii"             // ASCII fast path
    out(3) shouldBe null
    // normalization-sensitive dedup law: raw keys differ, NFC keys fold
    rows(df.filter(col("id") <= 2)
      .agg(countDistinct(col("t")).as("raw"),
        countDistinct(GF.nfcNormalize(col("t"))).as("nfc")))
      .head.toSeq shouldBe Seq(2L, 1L)
    // registered SQL function
    GF.register(spark)
    df.createOrReplaceTempView("v_nfc")
    rows(spark.sql("SELECT nfc_normalize(t) FROM v_nfc WHERE id = 1"))
      .head.getString(0) shouldBe nfc
  }

  test("rollingFingerprint matches the interpreted aggregate formulation") {
    def ref(text: String): Long = {
      val toks = "[\\p{L}\\p{Nd}]+".r.findAllIn(text.toLowerCase).toSeq
      toks.foldLeft(0L) { (acc, w) =>
        val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
        val h60 = ((0 until 8).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))) >>> 4
        (acc * 31L + h60 % 1073741824L) % 2147483647L
      }
    }
    val out = rows(docs.select(col("doc_id"),
      graft.operators.TextAnalysis.fingerprint(col("text")).as("fp")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe ref("The quick brown fox, jumps over the lazy dog!")
    out(4L) shouldBe ref("Hello, World! 123 foo-bar baz")
    out(3L) shouldBe 0L
  }
}
