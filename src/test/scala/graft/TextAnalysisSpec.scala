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

  test("charEntropy: uniform chars score log2(k), single-char spam scores 0") {
    val out = rows(Seq("abcd", "aaaa", "", "aab").toDF("t")
      .select(TextAnalysis.charEntropy(col("t")).as("h"))).map(_.getDouble(0))
    out(0) shouldBe 2.0 +- 1e-12 // 4 distinct, uniform
    out(1) shouldBe 0.0
    out(2) shouldBe 0.0
    // H(2/3, 1/3)
    val want = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3)) / math.log(2)
    out(3) shouldBe want +- 1e-12
  }

  test("bigramLogProb: add-one model over the corpus's own bigram counts") {
    // corpus: "a b a b" (bigrams ab, ba, ab) and "a b" (ab) → C(a,b)=3, C(b,a)=1
    // C(a,·)=3, C(b,·)=1, V=2
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = rows(TextAnalysis.bigramLogProb(df, "text", "doc_id").orderBy("doc_id"))
    val pAb = (3.0 + 1.0) / (3.0 + 2.0)
    val pBa = (1.0 + 1.0) / (1.0 + 2.0)
    out(0).getLong(1) shouldBe 3L
    out(0).getDouble(2) shouldBe (2 * math.log(pAb) + math.log(pBa)) / 3 +- 1e-12
    out(1).getLong(1) shouldBe 1L
    out(1).getDouble(2) shouldBe math.log(pAb) +- 1e-12
  }

  test("bigramLogProb: sub-2-token documents emit no row") {
    val df = Seq((1L, "single"), (2L, ""), (3L, "two words")).toDF("doc_id", "text")
    rows(TextAnalysis.bigramLogProb(df, "text", "doc_id").select("doc_id"))
      .map(_.getLong(0)) shouldBe Seq(3L)
  }

  test("featureHash: md5-prefix buckets, repeated tokens accumulate counts") {
    val got = rows(TextAnalysis.featureHash(
      Seq((1L, "the cat THE"), (2L, "")).toDF("doc_id", "text"),
      "text", "doc_id", dim = 64))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference bucket: first 8 md5 hex chars, big-endian, mod 64
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % 64
    }
    val expected =
      Map(bucket("the") -> 2L, bucket("cat") -> 1L).map { case (b, n) => (1L, b, n) }
    got.toSet shouldBe expected.toSet  // doc 2 tokenizes to nothing: no rows
    got.map(_._3).sum shouldBe 3L      // "the" twice + "cat" once
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

  test("topBigrams counts adjacent token pairs across documents") {
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "solo")).toDF("doc_id", "text")
    val out = rows(TextAnalysis.topBigrams(df, "text", "doc_id", 10))
      .map(r => (r.getString(0), r.getLong(1)))
    // doc1: "a b","b a","a b"; doc2: "b a"; doc3: no bigram
    out shouldBe Seq(("a b", 2L), ("b a", 2L))
  }

  test("bigramLift: hand-computed lift; totals taken before the support floor") {
    // corpus bigrams: "x y" ×2, "y x" ×1, "a b" ×1 → N = 4
    // unigrams: x×2, y×2, a×1, b×1 → U = 6
    val df = Seq((1L, "x y x y"), (2L, "a b")).toDF("doc_id", "text")
    val out = rows(TextAnalysis.bigramLift(df, "text", minCount = 2, k = 10))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // only "x y" survives minCount=2; lift = (2/4) / ((2/6)·(2/6)) = 9/2
    out.map(t => (t._1, t._2, t._3, t._4)) shouldBe Seq(("x y", 2L, 2L, 2L))
    out.head._5 shouldBe 4.5 +- 1e-12
  }

  test("bigramLift: perfectly-coupled pair outranks an independent frequent pair") {
    val coupled = Seq.fill(5)("p q").mkString(" z ")              // "p q" always adjacent
    val indep = "m n m z n m z n z m n z"                        // m,n frequent, loosely paired
    val df = Seq((1L, coupled), (2L, indep)).toDF("doc_id", "text")
    val out = rows(TextAnalysis.bigramLift(df, "text", minCount = 2, k = 50))
      .map(r => (r.getString(0), r.getDouble(4)))
    val lifts = out.toMap
    assert(lifts("p q") > lifts.getOrElse("m n", 0.0),
      s"coupled pair should outrank independent pair: $out")
    // descending-lift output order with bigram tie-break
    out.map(_._2) shouldBe out.map(_._2).sorted.reverse
  }

  test("ngramNovelty: duplicated docs score 0, unique doc scores 1, mixed doc in between") {
    val shared = "alpha beta gamma delta epsilon zeta"        // 2 shingles, both in docs 1+2
    val df = Seq(
      (1L, shared), (2L, shared),
      (3L, "one two three four five six seven"),              // 3 shingles, all unique
      (4L, s"novel tokens here live happily $shared")         // mix of unique and shared
    ).toDF("doc_id", "text")
    val out = rows(TextAnalysis.ngramNovelty(df, "text", "doc_id", n = 5).orderBy("doc_id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.filter(t => t._1 <= 2).map(_._4) shouldBe Seq(0.0, 0.0)
    out(2)._4 shouldBe 1.0
    assert(out(3)._4 > 0.0 && out(3)._4 < 1.0)
    // counts are of DISTINCT shingles
    out(2)._2 shouldBe 3L
  }

  test("ngramNovelty: short docs fall back to the whole-token-list shingle") {
    val df = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other small")).toDF("doc_id", "text")
    val out = rows(TextAnalysis.ngramNovelty(df, "text", "doc_id", n = 5).orderBy("doc_id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    out shouldBe Seq((1L, 1L, 0.0), (2L, 1L, 0.0), (3L, 1L, 1.0))
  }

  test("docRarity ranks the vocabulary by (freq desc, token asc) and aggregates per doc") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = rows(TextAnalysis.docRarity(df, "text", "doc_id").orderBy("doc_id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // vocab: a→2, b→2, c→1; ranks: a=1, b=2, c=3
    out shouldBe Seq((1L, 3L, 2L, 4.0 / 3, 2L), (2L, 2L, 2L, 2.5, 1L))
  }

  test("docRarity two-level rank equals the single-window global rank") {
    // 40 docs of varied content: the (freq, prefix)-grouped rank with carry
    // offsets must reproduce row_number() over (freq desc, token asc) exactly.
    val docs = (1L to 40L).map(i => (i, s"w${i % 7} w${i % 11} w${i % 13} shared"))
    val df = docs.toDF("doc_id", "text")
    val tok = df.select(col("doc_id"), explode(graft.operators.Dedup.tokens(col("text"))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token").asc)
    val direct = rows(vocab.withColumn("r", row_number().over(w)).orderBy("token"))
      .map(r => (r.getString(0), r.getInt(2).toLong)).toMap
    // reach the ranked vocabulary through the public aggregate: mean_rank of a
    // one-token doc equals that token's global rank
    val probes = direct.keys.toSeq.sorted
    val probeDf = probes.zipWithIndex.map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
    val ranked = rows(TextAnalysis.docRarity(df.unionByName(probeDf), "text", "doc_id")
      .filter(col("doc_id") >= 1000L).orderBy("doc_id")).map(_.getDouble(3))
    // adding the probe docs shifts every freq by one but preserves order;
    // recompute the direct rank on the union for the comparison
    val tok2 = df.unionByName(probeDf)
      .select(col("doc_id"), explode(graft.operators.Dedup.tokens(col("text"))).as("token"))
    val direct2 = rows(tok2.groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("r", row_number().over(w)).orderBy("token"))
      .map(r => (r.getString(0), r.getInt(2).toLong)).toMap
    ranked shouldBe probes.map(t => direct2(t).toDouble)
  }

  test("groupVocabOverlap: identical vocab -> 1, disjoint -> absent, partial exact") {
    val df = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "alpha beta gamma", "s2"),    // s2 vocab == s1 vocab
      (3L, "alpha delta", "s3"),         // s3 ∩ s1 = {alpha}: J = 1/4
      (4L, "omega psi", "s4")            // disjoint from s1/s2 except...
    ).toDF("doc_id", "text", "source")
    val out = rows(TextAnalysis.groupVocabOverlap(df, "text", "source")
      .orderBy("group_a", "group_b"))
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    out(("s1", "s2")) shouldBe 1.0
    out(("s1", "s3")) shouldBe 0.25 // |{alpha}| / |{alpha,beta,gamma,delta}|
    out.keySet should not contain (("s1", "s4")) // zero-overlap pairs absent
  }

  test("groupDivergence: identical distribution -> 0, hand-computed partial") {
    val df = Seq(
      (1L, "x x y y", "a"),   // p: x=.5 y=.5
      (2L, "x x y y", "b"),   // identical distribution
      (3L, "x x x y", "c")    // p: x=.75 y=.25 → Σmin vs a = .5+.25 → TV=.25
    ).toDF("doc_id", "text", "source")
    val out = rows(TextAnalysis.groupDivergence(df, "text", "source"))
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    out(("a", "b")) shouldBe 0.0 +- 1e-6
    out(("a", "c")) shouldBe 0.25 +- 1e-6
  }

  test("zipfFit: exact power law fits slope -1 with intercept ln(c)") {
    // freq = 12 / rank for ranks 1..4: ln(freq) = ln(12) - 1·ln(rank) exactly
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(3)("d")).mkString(" ")
    val df = Seq((1L, text, "s1")).toDF("doc_id", "text", "source")
    val r = rows(TextAnalysis.zipfFit(df, "text", "source", topK = 100)).head
    r.getString(0) shouldBe "s1"
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe -1.0 +- 1e-6
    r.getDouble(3) shouldBe math.log(12.0) +- 1e-6
  }

  test("boilerplate: per-source df-ratio bigrams; short docs count in n_docs only") {
    val df = Seq(
      (1L, "click here now alpha", "s1"),
      (2L, "click here now beta", "s1"),
      (3L, "click here gamma", "s1"),
      (4L, "x", "s1"),                    // 1 token: no bigrams, still a doc
      (5L, "click here now", "s2")        // s2: every bigram df=1 → none pass
    ).toDF("doc_id", "text", "source")
    val bp = rows(TextAnalysis.boilerplate(df, "text", "doc_id", "source",
      n = 2, minShare = 0.5, minDf = 2).orderBy("gram"))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // s1 (n_docs = 4): "click here" df=3 (0.75 ≥ .5), "here now" df=2 (0.5 ≥ .5)
    bp shouldBe Seq(("s1", "click here", 3L, 4L, 0.75), ("s1", "here now", 2L, 4L, 0.5))
  }

  test("boilerplateScrub drops covered positions; fully-covered docs vanish") {
    val df = Seq(
      (1L, "click here alpha", "s1"),
      (2L, "click here beta", "s1"),
      (3L, "click here", "s1")            // both tokens covered → absent
    ).toDF("doc_id", "text", "source")
    val bp = TextAnalysis.boilerplate(df, "text", "doc_id", "source",
      n = 2, minShare = 0.5, minDf = 2) // "click here" df=3/3
    val out = rows(TextAnalysis.boilerplateScrub(df, bp, "text", "doc_id", "source", n = 2)
      .orderBy("doc_id"))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out shouldBe Seq((1L, "alpha", 1L), (2L, "beta", 1L))
  }

  test("chi2Terms: perfectly label-exclusive token scores N exactly; " +
       "shared filler scores 0; ubiquitous tokens are filtered") {
    import spark.implicits._
    // "zebra" in all 3 A-docs, no B-doc: a=3 b=0 c=0 d=3 -> chi2 = 6(9)^2/81 = 6
    // "filler" in every doc -> df = N, filtered (zero-signal denominator)
    // "half" in 2 A + 1 B: a=2 b=1 c=1 d=2 -> 6(4-1)^2/(3*3*3*3) = 54/81
    val docs = Seq(
      (1L, "A", "zebra filler half"), (2L, "A", "zebra filler half"),
      (3L, "A", "zebra filler"), (4L, "B", "filler half"),
      (5L, "B", "filler"), (6L, "B", "filler")
    ).toDF("doc_id", "label", "text")
    val out = rows(TextAnalysis.chi2Terms(docs, "text", "doc_id", "label",
        minDf = 1, topK = 5).orderBy("label", "rank"))
      .map(r => (r.getString(0), r.getString(1), r.getDouble(5)))
    out.map(t => (t._1, t._2)) should contain allOf (("A", "zebra"), ("A", "half"))
    out.find(t => t._1 == "A" && t._2 == "zebra").get._3 shouldBe 6.0 +- 1e-12
    out.find(t => t._1 == "A" && t._2 == "half").get._3 shouldBe (54.0 / 81.0) +- 1e-12
    out.map(_._2) should not contain "filler"
    // symmetric 2x2: B's zebra cell has a=0 and is absent (presence cells only)
    out.filter(_._1 == "B").map(_._2) should not contain "zebra"
  }

  test("dsirWeights: a raw doc written in the target's vocabulary outscores gibberish; " +
       "target_like tracks the exact sign") {
    val target = (1L to 20L).map(i => (i, "the cat sat on the mat and the dog ran"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (100L, "the cat sat on the mat"),          // pure target phrasing
      (101L, "zxq vbn qwerty asdfgh zzz yyy")    // buckets the target never hits
    ).toDF("doc_id", "text")
    val w = rows(TextAnalysis.dsirWeights(raw, target, "text", "doc_id").orderBy("doc_id"))
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    w(100L)._1 should be > w(101L)._1
    w(100L)._2 shouldBe true   // leans target
    w(101L)._2 shouldBe false  // leans raw-average
  }

  test("gumbelTopK: k >= n keeps every row; selection is deterministic across invocations") {
    val weights = Seq((1L, 0.5), (2L, -0.5), (3L, 2.0)).toDF("doc_id", "log_weight")
    val all = rows(TextAnalysis.gumbelTopK(weights, "doc_id", "log_weight", k = 10))
    all.length shouldBe 3
    val a = rows(TextAnalysis.gumbelTopK(weights, "doc_id", "log_weight", k = 2))
      .map(r => (r.getLong(0), r.getDouble(2)))
    val b = rows(TextAnalysis.gumbelTopK(weights, "doc_id", "log_weight", k = 2))
      .map(r => (r.getLong(0), r.getDouble(2)))
    a shouldBe b
  }

  test("bigramCrossScore: bigrams seen in the target score above the unseen add-1 floor") {
    val target = (1L to 10L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (100L, "the cat sat"),        // both bigrams target-attested
      (101L, "purple elephant sky") // wholly unseen -> 1/V floor per bigram
    ).toDF("doc_id", "text")
    val sc = rows(TextAnalysis.bigramCrossScore(raw, target, "text", "doc_id").orderBy("doc_id"))
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    sc(100L) should be > sc(101L)
    // the unseen floor is exactly ln(1 / V) with V = 5 distinct target
    // tokens ({the, cat, sat, on, mat})
    sc(101L) shouldBe math.log(1.0 / 5.0) +- 1e-6
  }

  test("greedySegment: longest match wins, single-char fallback, empty word") {
    import graft.expressions.{GraftFunctions => G}
    val vocab = Seq("ab", "abc", "c", "de")
    val out = rows(Seq("abcde", "xabcz", "").toDF("w")
      .select(G.greedySegment(col("w"), vocab).as("s")))
      .map(_.getSeq[Long](0))
    out(0) shouldBe Seq(2L, 0L) // abc + de (longest-first: abc beats ab)
    out(1) shouldBe Seq(3L, 2L) // x(fb) + abc + z(fb)
    out(2) shouldBe Seq(0L, 0L)
  }

  test("charGrams emits code-point n-grams in order; short words give empty") {
    val out = rows(Seq("abcd", "ab", "x").toDF("w")
      .select(TextAnalysis.charGrams(col("w"), 3).as("g")))
      .map(_.getSeq[String](0))
    out(0) shouldBe Seq("abc", "bcd")
    out(1) shouldBe Seq()
    out(2) shouldBe Seq()
  }

  test("subwordStats (doc kernel) == per-word greedySegment composition") {
    import graft.expressions.{GraftFunctions => G}
    val vocab = Seq("ab", "abc", "de", "ü")
    val df = Seq("abcde xx ü", "", "abc abc abc").toDF("text")
    val toks = graft.operators.Dedup.tokens(col("text"))
    val out = rows(df.select(
      G.subwordStats(toks, vocab).as("st"),
      org.apache.spark.sql.functions.size(toks).cast("long").as("nw"),
      aggregate(transform(toks, w => G.greedySegment(w, vocab)),
        array(lit(0L), lit(0L)),
        (a, s) => array(a.getItem(0) + s.getItem(0), a.getItem(1) + s.getItem(1))).as("tf"),
      aggregate(toks, lit(0L),
        (a, w) => a + org.apache.spark.sql.functions.length(w)).as("ch")))
    out.foreach { r =>
      val st = r.getSeq[Long](0)
      st(0) shouldBe r.getLong(1)              // n_words
      st(1) shouldBe r.getSeq[Long](2).head    // n_tokens
      st(2) shouldBe r.getSeq[Long](2)(1)      // n_fallback
      st(3) shouldBe r.getLong(3)              // n_chars (code points)
    }
  }

  test("subwordEncodeReport totals: tokens, fallback, chars, ratios") {
    val df = Seq(("a", "ab ab zz"), ("a", "")).toDF("source", "text")
    val r = rows(TextAnalysis.subwordEncodeReport(df, "text", "source", Seq("ab"))).head
    r.getAs[Long]("n_docs") shouldBe 2L
    r.getAs[Long]("n_words") shouldBe 3L
    r.getAs[Long]("n_tokens") shouldBe 4L   // ab, ab, z+z
    r.getAs[Long]("n_fallback") shouldBe 2L // the two z's
    r.getAs[Long]("n_chars") shouldBe 6L
    r.getAs[Double]("fallback_rate") shouldBe 0.5
    r.getAs[Double]("chars_per_token") shouldBe 1.5
  }

  test("subwordVocab ranks by count desc then string asc and dedupes") {
    val df = Seq("aa bb aa").toDF("text")
    val v = TextAnalysis.subwordVocab(df, "text", topWords = 2, topGrams = 2)
    v.toSet shouldBe Set("aa", "bb") // words {aa,bb}; 2-grams {aa,bb}; deduped
  }

  test("q_shard_plan: HRW movement only ever lands in the four NEW shards") {
    val out = rows(SparkEntry.queries("q_shard_plan")(spark, "/root/testdata/sf0.001"))
    out.size should be <= 20
    val moved = out.map(r => r.getAs[Long]("shard_after") -> r.getAs[Long]("n_moved_in"))
    moved.filter(_._1 < 16).foreach { case (_, m) => m shouldBe 0L }
    moved.filter(_._1 >= 16).map(_._2).sum should be > 0L
  }

  test("q_token_shards: doc counts within 1, tokens balanced, corpus reconciles") {
    val dir = "/root/testdata/sf0.001"
    val out = rows(SparkEntry.queries("q_token_shards")(spark, dir))
    out.size shouldBe 8
    val docs = out.map(_.getAs[Long]("n_docs"))
    (docs.max - docs.min) should be <= 1L // serpentine rank assigns round-robin
    docs.sum shouldBe spark.read.parquet(s"$dir/documents.parquet").count()
    out.foreach(r => r.getAs[Double]("balance_ratio") shouldBe 1.0 +- 0.15)
  }

  test("q_vocab_curve: sizes ordered, chars invariant, rates well-formed and distinct") {
    val out = rows(SparkEntry.queries("q_vocab_curve")(spark, "/root/testdata/sf0.001"))
    out.map(_.getAs[Long]("vocab_size")) shouldBe Seq(5L, 25L, 100L)
    // chars are a property of the corpus, not the vocab
    out.map(_.getAs[Long]("n_chars")).distinct.size shouldBe 1
    // NOTE: greedy longest-match is NOT monotone under vocabulary inclusion
    // (a newly admitted short prefix can pre-empt a longer match and WORSEN
    // fallback), so the curve's structural invariants are well-formedness,
    // not monotonicity: rates in [0, 1], every token covers >= 1 char, and
    // the three vocab slices actually produce different encodings.
    out.foreach { r =>
      val fb = r.getAs[Double]("fallback_rate")
      fb should (be >= 0.0 and be <= 1.0)
      r.getAs[Double]("chars_per_token") should be >= 1.0
      r.getAs[Long]("n_tokens") should be >= r.getAs[Long]("n_fallback")
    }
    out.map(_.getAs[Long]("n_tokens")).distinct.size should be > 1
  }

  test("q_vocab_drift: both cohorts present, parity split, rates well-formed") {
    val dir = "/root/testdata/sf0.001"
    val out = rows(SparkEntry.queries("q_vocab_drift")(spark, dir))
    out.map(_.getString(0)).sorted shouldBe Seq("arriving", "landed")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val evenDocs = docs.filter(col("doc_id") % 2 === 0).count()
    out.find(_.getString(0) == "landed").get.getAs[Long]("n_docs") shouldBe evenDocs
    out.map(_.getAs[Long]("n_docs")).sum shouldBe docs.count()
    out.foreach { r =>
      r.getAs[Double]("fallback_rate") should (be >= 0.0 and be <= 1.0)
    }
  }

  test("drift construction: unseen-vocabulary cohort falls back strictly more") {
    // the deterministic version of the drift signal: cohort B is written in
    // words the landed vocab never saw, so its fallback must exceed A's
    val df = Seq(("landed", "aaa bbb aaa"), ("landed", "bbb aaa"),
      ("arriving", "zzz qqq xyz")).toDF("cohort", "text")
    val vocab = TextAnalysis.subwordVocab(df.filter(col("cohort") === "landed"),
      "text", topWords = 2, topGrams = 2)
    val out = rows(TextAnalysis.subwordEncodeReport(df, "text", "cohort", vocab))
      .map(r => r.getString(0) -> r.getAs[Double]("fallback_rate")).toMap
    out("arriving") should be > out("landed")
  }

  test("q_stream_subword drains to exactly the batch encode report") {
    val dir = "/root/testdata/sf0.001"
    val streamed = rows(SparkEntry.queries("q_stream_subword")(spark, dir))
    val batch = rows(SparkEntry.queries("q_subword_encode")(spark, dir))
    streamed.map(_.toSeq) shouldBe batch.map(_.toSeq)
  }

  test("q_dedup_savings: totals reconcile with the corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = rows(SparkEntry.queries("q_dedup_savings")(spark, dir))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    out.map(r => r.getAs[Long]("n_docs")).sum shouldBe docs.count()
    // every singleton cluster removes nothing
    out.filter(_.getAs[Long]("cluster_size") == 1L)
      .foreach(r => r.getAs[Long]("tokens_removed") shouldBe 0L)
  }
}
