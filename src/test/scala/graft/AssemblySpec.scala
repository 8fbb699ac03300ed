package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Packing, Sampling, TextAnalysis}

/** Training-data assembly operators: sequence packing, TF-IDF scoring,
  * mixture resampling.
  */
class AssemblySpec extends SparkSpec {
  import spark.implicits._

  test("packSequences equals a single global prefix sum at any groupSize") {
    val df = (0L until 100L).map(i => (i * 7 % 101, 1L + (i * 13 % 50)))
      .toDF("doc_id", "n_tokens")
    val naive = df.withColumn("seq_start",
      coalesce(sum("n_tokens").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_id", expr("seq_start div 64"))
      .withColumn("seq_offset", col("seq_start") % 64)
      .select("doc_id", "seq_start", "seq_id", "seq_offset")
      .orderBy("doc_id").collect().toSeq
    for (g <- Seq(1L, 3L, 17L, 1000L)) {
      val packed = Packing.packSequences(df, "n_tokens", "doc_id", budget = 64L, groupSize = g)
        .select("doc_id", "seq_start", "seq_id", "seq_offset")
        .orderBy("doc_id").collect().toSeq
      packed shouldBe naive
    }
  }

  test("packSequences coordinates: first doc at origin, chunks advance by budget") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("doc_id", "n_tokens")
    val out = Packing.packSequences(df, "n_tokens", "doc_id", budget = 16L)
      .orderBy("doc_id")
      .select("seq_start", "seq_id", "seq_offset").collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
    // starts 0, 10, 20 → sequences 0, 0, 1; offsets 0, 10, 4
    out shouldBe Seq((0L, 0L, 0L), (10L, 0L, 10L), (20L, 1L, 4L))
  }

  test("chunkDocs: overlapping windows cover the document, short tail kept") {
    // 10 tokens, size 4, stride 3 → starts 0,3,6 (6+4 ≥ 10): chunks of 4,4,4
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val out = rows(Packing.chunkDocs(df, "text", "doc_id", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id"))
    val chunks = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    chunks shouldBe Seq(
      (1L, 0L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 3L, 7L, "w4 w5 w6 w7"),
      (1L, 2L, 6L, 10L, "w7 w8 w9 w10"),
      (2L, 0L, 0L, 2L, "a b")) // short doc: one chunk; empty doc: none
    // every token position is covered by at least one chunk
    val covered = chunks.filter(_._1 == 1L).flatMap(c => c._3 until c._4).toSet
    covered shouldBe (0L until 10L).toSet
  }

  test("chunkDocs with stride == size tiles without overlap; exact-fit emits no empty tail") {
    val doc = (1 to 8).map(i => s"t$i").mkString(" ")
    val out = rows(Packing.chunkDocs(Seq((1L, doc)).toDF("doc_id", "text"),
      "text", "doc_id", chunkSize = 4, stride = 4).orderBy("chunk_id"))
    out.map(r => (r.getLong(2), r.getLong(3))) shouldBe Seq((0L, 4L), (4L, 8L))
  }

  test("tfidfTopTerms: rare terms outscore common ones; rank is deterministic") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "apple banana date")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .orderBy("doc_id", "rnk").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // doc 1: apple tf=2 df=3 → 2·3/3=2.0 ; banana tf=1 df=2 → 1.5
    out.take(2) shouldBe Seq((1L, 1L, "apple", 2L, 3L), (1L, 2L, "banana", 1L, 2L))
    // doc 2: cherry (df=1, tfidf=3.0) beats apple (df=3, tfidf=1.0)
    out.slice(2, 4).map(_._3) shouldBe Seq("cherry", "apple")
    // doc 3: date (3.0) then banana (1.5); apple (1.0) dropped by k=2
    out.slice(4, 6).map(_._3) shouldBe Seq("date", "banana")
  }

  test("mixtureResample: integer weights repeat exactly, zero drops, deterministic") {
    val df = (1L to 20L).map(i => (i, if (i <= 10) "hi" else "lo")).toDF("doc_id", "source")
    val out = Sampling.mixtureResample(df, "source", "doc_id",
      Seq("hi" -> 3.0, "lo" -> 0.0))
    val byDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"), max("copy_id").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    byDoc.foreach { case (id, n, mx) =>
      withClue(s"doc $id: ") { n shouldBe 3L; mx shouldBe 3L }
    }
    byDoc.map(_._1).toSet shouldBe (1L to 10L).toSet // all "lo" rows dropped
    // deterministic under re-evaluation
    val again = Sampling.mixtureResample(df, "source", "doc_id",
      Seq("hi" -> 3.0, "lo" -> 0.0)).orderBy("doc_id", "copy_id").collect().toSeq
    out.orderBy("doc_id", "copy_id").collect().toSeq shouldBe again
  }

  test("saltedSum is bit-identical to a direct groupBy at any bucket count") {
    import graft.operators.Transforms
    val df = (1 to 500).map(i => (if (i % 7 == 0) "hot" else s"k${i % 3}", i * 0.37))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(30,6)")).cast("double").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq.map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    for (b <- Seq(1, 4, 64)) {
      val salted = Transforms.saltedSum(df, Seq("k"), "v", "s", buckets = b)
        .orderBy("k").collect().toSeq.map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      withClue(s"buckets=$b: ") { salted shouldBe direct }
    }
  }

  test("deterministicShuffle equals the naive global row_number at any group width") {
    import graft.operators.Sampling
    val df = (0L until 300L).map(i => Tuple1(i * 13 % 1009)).toDF("doc_id")
    val naive = df.withColumn("__h", Sampling.idHash(col("doc_id")))
      .withColumn("shuffle_pos",
        row_number().over(Window.orderBy(col("__h"), col("doc_id"))).cast("long") - 1)
      .select("doc_id", "shuffle_pos").orderBy("doc_id").collect().toSeq
    for (bits <- Seq(1, 8, 20)) {
      val out = Sampling.deterministicShuffle(df, "doc_id", groupBits = bits)
        .select("doc_id", "shuffle_pos").orderBy("doc_id").collect().toSeq
      withClue(s"groupBits=$bits: ") { out shouldBe naive }
    }
  }

  test("saltedJoin produces the same row multiset as a plain join") {
    import graft.operators.Transforms
    val big = (1 to 200).map(i => (s"k${i % 5}", i.toDouble)).toDF("k", "v")
    val small = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k9", "z")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).orderBy("k", "v", "tag").collect().toSeq
    for (b <- Seq(1, 3, 16)) {
      val salted = Transforms.saltedJoin(big, small, Seq("k"), saltBy = "v", buckets = b)
        .select("k", "v", "tag").orderBy("k", "v", "tag").collect().toSeq
      withClue(s"buckets=$b: ") { salted shouldBe plain }
    }
  }

  test("meanPooledCentroids averages per (key, dim) exactly") {
    import graft.operators.Similarity
    val df = Seq(
      (0, Array(1.0f, 2.0f)),
      (0, Array(3.0f, 6.0f)),
      (1, Array(10.0f, 20.0f))).toDF("label", "embedding")
    val out = Similarity.meanPooledCentroids(df, "embedding", "label")
      .orderBy("label", "dim").collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    out shouldBe Seq((0, 0L, 2.0), (0, 1L, 4.0), (1, 0L, 10.0), (1, 1L, 20.0))
  }

  test("incremental dedup drops within-batch dups and already-landed content") {
    import graft.operators.Dedup
    val landed = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"),  // already landed → dropped
      (11L, "gamma"),  // new
      (12L, "gamma"),  // within-batch dup → dropped (11 kept)
      (13L, "delta")   // new
    ).toDF("doc_id", "text")
    val out = Dedup.incremental(batch, Dedup.contentIndex(landed, "text"), "text", "doc_id")
      .orderBy("doc_id").collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
    out shouldBe Seq((11L, "gamma"), (13L, "delta"))
  }

  test("bruteForceTopKAgg equals the window formulation and partially aggregates") {
    import graft.operators.Similarity
    val vecs = (0L until 50L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val win = Similarity.bruteForceTopK(vecs, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank").collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val agg = Similarity.bruteForceTopKAgg(vecs, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank").collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    agg shouldBe win
    // the plan must aggregate in two phases (map-side partial top-k)
    val plan = Similarity.bruteForceTopKAgg(vecs, queries, "embedding", "vec_id", k = 5)
      .queryExecution.executedPlan.toString
    plan should include regex "(?i)ObjectHashAggregate|SortAggregate"
  }

  test("mixtureResample fractional weights hit the expected rate on average") {
    val df = (1L to 2000L).map(i => (i, "s")).toDF("doc_id", "source")
    val n = Sampling.mixtureResample(df, "source", "doc_id", Seq("s" -> 1.5)).count()
    // E[copies] = 1.5 per row; the md5 deviate is uniform so the count
    // concentrates tightly around 3000
    n.toDouble shouldBe 3000.0 +- 150.0
  }
}
