package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup
    (4L, "completely different content about distributed query engines and columnar storage formats")
  ).toDF("doc_id", "text")

  test("shingles builds word n-grams, lowercased, punctuation-stripped") {
    val out = rows(Seq("Hello, World! Foo").toDF("t")
      .select(Dedup.shingles(col("t"), 2).as("s"))).head.getSeq[String](0)
    out shouldBe Seq("hello world", "world foo")
  }

  test("shingles falls back to whole text when shorter than n") {
    val out = rows(Seq("one two").toDF("t").select(Dedup.shingles(col("t"), 5).as("s")))
      .head.getSeq[String](0)
    out shouldBe Seq("one two")
  }

  test("exact dedup keeps min-id representative per distinct text") {
    val out = Dedup.exact(docs, "text", "doc_id")
    rows(out.select("doc_id").orderBy("doc_id")).map(_.getLong(0)) shouldBe Seq(1L, 3L, 4L)
  }

  test("minhash signature is identical for identical texts, mostly differs for unrelated") {
    val sigs = rows(docs.select(col("doc_id"), Dedup.minhashSignature(col("text"), 3, 32).as("sig")))
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigs(1L) shouldBe sigs(2L)
    sigs(1L) should not be sigs(4L)
  }

  test("minhashPairs finds exact and near duplicates above threshold") {
    val pairs = rows(Dedup.minhashPairs(docs, "text", "doc_id", shingleN = 2, k = 64,
      bands = 16, threshold = 0.5).select("id_a", "id_b").orderBy("id_a", "id_b"))
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 2L)) // exact dup always survives
    pairs.flatMap(p => Seq(p._1, p._2)) should not contain 4L
  }

  test("minhashPairsIncremental: delta probes the base index; base-base pairs never form") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val base = Seq((10L, text), (11L, text), (12L, "completely different words here entirely"))
      .toDF("doc_id", "text")
    val delta = Seq((20L, text), (21L, text), (22L, "unrelated delta content of its own"))
      .toDF("doc_id", "text")
    val out = rows(Dedup.minhashPairsIncremental(delta,
      Dedup.bandBuckets(base, "text", "doc_id", 2, 64, 16),
      Dedup.shingleSets(base, "text", "doc_id", 2),
      "text", "doc_id", shingleN = 2, k = 64, bands = 16, threshold = 0.5)
      .orderBy("id_a", "id_b"))
      .map(r => (r.getLong(0), r.getLong(1)))
    // delta×base and delta×delta dups found; the base-internal (10,11) pair is NOT emitted
    out should contain allOf ((10L, 20L), (10L, 21L), (11L, 20L), (11L, 21L), (20L, 21L))
    out should not contain ((10L, 11L))
    // every pair has at least one delta side
    out.foreach { case (a, b) => (a >= 20L || b >= 20L) shouldBe true }
  }

  test("ngramJaccardPairs computes exact jaccard on candidate pairs") {
    val out = rows(Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 2, threshold = 0.3)
      .orderBy("id_a", "id_b"))
    val pairs = out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    pairs.map(p => (p._1, p._2)) should contain allOf ((1L, 2L), (1L, 3L))
    pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 shouldBe 1.0 // identical
    pairs.foreach(p => p._3 should (be >= 0.3 and be <= 1.0))
  }

  test("simhash: identical texts equal; near-dups within small hamming distance") {
    val fps = rows(docs.select(col("doc_id"), Dedup.simhash(col("text"), 2).as("fp")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    fps(1L) shouldBe fps(2L)
    val nearHam = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    val farHam = java.lang.Long.bitCount(fps(1L) ^ fps(4L))
    nearHam should be < farHam
  }

  test("hamming distance expression matches bitCount") {
    rows(Seq((5L, 6L)).toDF("a", "b").select(Dedup.hamming(col("a"), col("b"))))
      .head.getInt(0) shouldBe 2 // 101 ^ 110 = 011
  }

  test("connectedComponents labels transitive near-dup chains with the min id") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // chain 1-2-3 (transitive: 1 and 3 not directly paired), island 4, pair 5-6
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val comps = rows(Dedup.connectedComponents(ids, pairs).orderBy("id"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    comps shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L)
  }

  test("duplicatedSpans merges overlapping cross-document shingles into token spans") {
    import spark.implicits._
    // a 10-token passage shared between docs 1 and 2 at different offsets:
    // its three 8-token shingles overlap and must merge into ONE span each
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"aa bb $shared cc dd"), // shared passage at token offset 2
      (2L, s"ee $shared ff"),       // shared passage at token offset 1
      (3L, "totally unrelated words that appear nowhere else at all right here")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "text", "doc_id", n = 8, minDocFreq = 2)
    val out = rows(spans.orderBy("id", "span_start"))
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    out shouldBe Seq((1L, 2, 11, 3L), (2L, 1, 10, 3L))
    // consumer side: covered tokens removed, untouched doc passes through
    val clean = rows(Dedup.removeSpans(docs, spans, "text", "doc_id").orderBy("id"))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    clean shouldBe Seq(
      (1L, "aa bb cc dd", 4L),
      (2L, "ee ff", 2L),
      (3L, "totally unrelated words that appear nowhere else at all right here", 11L))
  }

  test("connectedComponents keeps edges through off-corpus ids inert") {
    import spark.implicits._
    val ids = Seq(5L, 7L, 9L).toDF("id")
    // id 0 appears only in pairs: it must not relay labels between 5 and 7,
    // must not appear in the output, and must never become a cluster_id
    // (nearDupSurvivors would then drop the whole cluster)
    val pairs = Seq((0L, 5L), (0L, 7L)).toDF("id_a", "id_b")
    val comps = rows(Dedup.connectedComponents(ids, pairs).orderBy("id"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    comps shouldBe Map(5L -> 5L, 7L -> 7L, 9L -> 9L)
  }

  test("connectedComponents driver and distributed paths agree on random graphs with off-corpus edges") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 30 + trial * 10
      val corpus = (0L until n.toLong).toSeq
      val ids = corpus.toDF("id")
      // ~n random edges over a 50%-wider id range so some endpoints are off-corpus
      val edgeList = Seq.fill(n)((rng.nextInt(n * 3 / 2).toLong, rng.nextInt(n * 3 / 2).toLong))
      val pairs = edgeList.toDF("id_a", "id_b")
      val driver = rows(Dedup.connectedComponents(ids, pairs, driverThreshold = 10000).orderBy("id"))
        .map(r => r.getLong(0) -> r.getLong(1))
      val dist = rows(Dedup.connectedComponents(ids, pairs, driverThreshold = 0).orderBy("id"))
        .map(r => r.getLong(0) -> r.getLong(1))
      driver shouldBe dist
      // every emitted label must itself be a corpus member (no phantom cluster ids)
      val corpusSet = corpus.toSet
      driver.foreach { case (_, label) => corpusSet should contain(label) }
    }
  }

  test("connectedComponents DEFAULT-threshold overflow takes the distributed path and matches driver labels") {
    // the large-graph gate: > driverThreshold (default 10,000) pairs forces
    // the take(n+1) overflow into the iterative-CC fallback with DEFAULT
    // arguments — the code path a 100 TB dup graph actually runs — and the
    // driver union-find on the same graph is the ground truth. The edge count
    // (12k on 3k nodes, plus off-corpus endpoints) makes the giant component
    // dense, so min-label propagation converges in ~O(log diameter) rounds.
    val rng = new scala.util.Random(7)
    val n = 3000
    val corpus = (0L until n.toLong).toSeq
    val ids = corpus.toDF("id")
    val edgeList = Seq.fill(12001)((rng.nextInt(n * 3 / 2).toLong, rng.nextInt(n * 3 / 2).toLong))
    val pairs = edgeList.toDF("id_a", "id_b")
    // default driverThreshold (overflowed) → distributed fallback
    val dist = rows(Dedup.connectedComponents(ids, pairs, maxIter = 60).orderBy("id"))
      .map(r => r.getLong(0) -> r.getLong(1))
    val driver = rows(Dedup.connectedComponents(ids, pairs, driverThreshold = 20000).orderBy("id"))
      .map(r => r.getLong(0) -> r.getLong(1))
    dist shouldBe driver
    val corpusSet = corpus.toSet
    dist.foreach { case (_, label) => corpusSet should contain(label) }
  }

  test("nearDupSurvivors keeps one representative per cluster plus unpaired rows") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", shingleN = 2, k = 64,
      bands = 32, threshold = 0.9)
    val out = rows(Dedup.nearDupSurvivors(docs, "doc_id", pairs).select("doc_id").orderBy("doc_id"))
      .map(_.getLong(0))
    out shouldBe Seq(1L, 3L, 4L) // 2 is 1's exact dup; 3 is below 0.9 to 1
  }

  test("nearDupSurvivorsBy keeps the max-priority member, ties to min id") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "aaa", 10L), (2L, "bbb", 30L), (3L, "ccc", 30L), // one cluster
      (9L, "zzz", 1L) // unpaired singleton
    ).toDF("id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    // highest quality wins (2 and 3 tie at 30 -> min id 2); singleton kept
    val out = rows(Dedup.nearDupSurvivorsBy(corpus, "id", pairs, col("quality"))
      .select("id").orderBy("id")).map(_.getLong(0))
    out shouldBe Seq(2L, 9L)
    // degenerate policy = constant priority -> same result as min-id survivors
    val byConst = rows(Dedup.nearDupSurvivorsBy(corpus, "id", pairs, lit(0))
      .select("id").orderBy("id")).map(_.getLong(0))
    val byMin = rows(Dedup.nearDupSurvivors(corpus, "id", pairs)
      .select("id").orderBy("id")).map(_.getLong(0))
    byConst shouldBe byMin
  }

  test("embeddingPairs finds identical vectors in the same LSH bucket") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(1.0f, 0.0f, 0.5f, 0.2f)), // identical -> cos 1
      (3L, Array(-1.0f, 0.3f, -0.5f, 0.1f))
    ).toDF("vec_id", "embedding")
    val pairs = rows(Dedup.embeddingPairs(vecs, "embedding", "vec_id", threshold = 0.99,
      dim = 4, planes = 4, bands = 2))
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs shouldBe Seq((1L, 2L))
  }

  test("embeddingPairsSlim == embeddingPairs exactly (values incl. cos) on random vectors") {
    // the PB-scale join-back shape must emit the identical pair multiset —
    // same signatures, same first-band rule, same cosine kernel
    val rng = new scala.util.Random(11)
    val dim = 8; val planes = 8; val bands = 4
    val vecs = (0L until 80L).map(i =>
      (i, Array.fill(dim)(rng.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    def run(f: => org.apache.spark.sql.DataFrame) =
      rows(f.orderBy("id_a", "id_b")).map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val carried = run(Dedup.embeddingPairs(vecs, "embedding", "vec_id",
      threshold = 0.3, dim = dim, planes = planes, bands = bands))
    val slim = run(Dedup.embeddingPairsSlim(vecs, "embedding", "vec_id",
      threshold = 0.3, dim = dim, planes = planes, bands = bands))
    carried.nonEmpty shouldBe true
    slim shouldBe carried
  }

  test("embeddingPairsDeduped total weight == direct pair count under replication") {
    // the replication-proof composition must cover the direct run's logical
    // pair multiset exactly: every replica pair is accounted once, either as
    // a weighted survivor pair or an intra-cluster C(sz,2) row
    val rng = new scala.util.Random(23)
    val dim = 8; val planes = 8; val bands = 4
    val base = (0L until 40L).map(i => (i, Array.fill(dim)(rng.nextFloat() * 2f - 1f)))
    val replicated = (0 until 3).flatMap(r =>
      base.map { case (id, v) => (id + r * 1000L, v) }).toDF("vec_id", "embedding")
    val direct = Dedup.embeddingPairsSlim(replicated, "embedding", "vec_id",
      threshold = 0.3, dim = dim, planes = planes, bands = bands).count()
    val composed = rows(Dedup.embeddingPairsDeduped(replicated, "embedding", "vec_id",
      threshold = 0.3, dim = dim, planes = planes, bands = bands)
      .agg(sum(col("n_pairs")))).head.getLong(0)
    direct should be > 0L
    composed shouldBe direct
  }

  test("ngramJaccardPairsDeduped: logical multiset equals direct under no cap, " +
      "and survives the cap the direct run drowns under") {
    // 3 distinct texts, replicated 6x each: with a cap replication can't
    // cross (100), composed total weight == the direct run's physical pair
    // count; with cap 5 EVERY shingle's doc frequency is >= its 6 replicas
    // and prunes, so the direct run reports ZERO — while distinct-content
    // frequencies are <= 2 and the composed run still reports the full
    // logical multiset. The failure shape, unit-scale.
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "totally different words entirely here now"))
    val replicated = (0 until 6).flatMap(r =>
      base.map { case (id, t) => (id + r * 100L, t) }).toDF("doc_id", "text")
    val direct = Dedup.ngramJaccardPairs(replicated, "text", "doc_id",
      n = 2, threshold = 0.3, maxDocFreq = 100L).count()
    val composedBig = rows(Dedup.ngramJaccardPairsDeduped(replicated, "text", "doc_id",
      n = 2, threshold = 0.3, maxDocFreq = 100L).agg(sum(col("n_pairs"))))
      .head.getLong(0)
    direct should be > 0L
    composedBig shouldBe direct
    val directCapped = Dedup.ngramJaccardPairs(replicated, "text", "doc_id",
      n = 2, threshold = 0.3, maxDocFreq = 5L).count()
    val composedCapped = rows(Dedup.ngramJaccardPairsDeduped(replicated, "text", "doc_id",
      n = 2, threshold = 0.3, maxDocFreq = 5L).agg(sum(col("n_pairs"))))
      .head.getLong(0)
    directCapped shouldBe 0L
    composedCapped shouldBe composedBig
  }

  test("minhashPairsDeduped total weight == direct banded pair count under replication") {
    // no cap in this family, so direct and composed must agree EXACTLY on
    // the logical multiset at any replication — replicas collapse to
    // C(sz,2) intra arithmetic instead of physical band rows
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "totally different words entirely here now"))
    val replicated = (0 until 5).flatMap(r =>
      base.map { case (id, t) => (id + r * 100L, t) }).toDF("doc_id", "text")
    val direct = Dedup.minhashPairs(replicated, "text", "doc_id",
      shingleN = 2, k = 16, bands = 8, threshold = 0.3).count()
    val composed = rows(Dedup.minhashPairsDeduped(replicated, "text", "doc_id",
      shingleN = 2, k = 16, bands = 8, threshold = 0.3)
      .agg(sum(col("n_pairs")))).head.getLong(0)
    direct should be > 0L
    composed shouldBe direct
  }

  test("composedClusterIndex labels equal the direct clustering when the direct " +
      "index has full recall (1x binding agreement)") {
    // exact dups (1≡11), a near-dup chain (1~2), an unrelated pair (3≡13):
    // with no cap binding, the composed per-doc labels must equal CC over
    // the direct pair graph on all ids — the component min is always a
    // keeper, so replicas inherit exactly the label the direct run gives
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "totally different words entirely here now"),
      (13L, "totally different words entirely here now"),
      (4L, "a lonely singleton document")).toDF("doc_id", "text")
    val directPairs = Dedup.ngramJaccardPairs(df, "text", "doc_id",
      n = 2, threshold = 0.3, maxDocFreq = 100L)
    val direct = rows(Dedup.connectedComponents(
        df.select(col("doc_id").as("id")), directPairs).orderBy("id"))
      .map(r => (r.getLong(0), r.getLong(1)))
    val composedPairs = Dedup.ngramJaccardPairsDeduped(df, "text", "doc_id",
      n = 2, threshold = 0.3, maxDocFreq = 100L)
    val composed = rows(Dedup.composedClusterIndex(df, "text", "doc_id", composedPairs)
        .select("id", "cluster_id").orderBy("id"))
      .map(r => (r.getLong(0), r.getLong(1)))
    composed shouldBe direct
    composed.toMap.apply(11L) shouldBe 1L // replica inherits the keeper's cluster
    composed.toMap.apply(2L) shouldBe 1L  // near-dup joins through the keeper graph
    composed.toMap.apply(4L) shouldBe 4L  // singleton labels itself
  }

  test("composedClusterIndex makes the DECISIONS right under replication where the " +
      "direct index caps out: no leaked splits, penalized weights, exact-dup audit") {
    // 6x replication with cap 5: the direct posting index prunes EVERYTHING
    // (docFreq counts replicas) → every doc becomes its own cluster → split
    // hash keys on the doc id and replicas of one content scatter across
    // splits (evaluation leakage). The composed labeling keys every replica
    // to its keeper's cluster: zero leaked content groups by construction.
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "totally different words entirely here now"))
    val replicated = (0 until 6).flatMap(r =>
      base.map { case (id, t) => (id + r * 100L, t) }).toDF("doc_id", "text")
    val directPairs = Dedup.ngramJaccardPairs(replicated, "text", "doc_id",
      n = 2, threshold = 0.3, maxDocFreq = 5L)
    directPairs.count() shouldBe 0L // the failure shape: cap counts replicas
    def leakedGroups(labels: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Sampling.withSplit(labels, "cluster_id")
        .withColumn("grp", col("doc_id") % 100) // content group by construction
        .groupBy("grp").agg(countDistinct(col("split")).as("ns"))
        .filter(col("ns") > 1).count()
    val directLabels = Dedup.connectedComponents(
        replicated.select(col("doc_id").as("id")), directPairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
    leakedGroups(directLabels) should be > 0L // replicas scatter across splits
    val composedPairs = Dedup.ngramJaccardPairsDeduped(replicated, "text", "doc_id",
      n = 2, threshold = 0.3, maxDocFreq = 5L)
    val lbl = Dedup.composedClusterIndex(replicated, "text", "doc_id", composedPairs)
    leakedGroups(lbl.select(col("id").as("doc_id"), col("cluster_id"))) shouldBe 0L
    // D4 weighting sees the LOGICAL cluster size: contents 1 and 2 are
    // near-dups (one 12-member cluster), content 3 is its own 6-member one
    val sizes = rows(lbl.groupBy("cluster_id").count().orderBy("cluster_id"))
      .map(r => (r.getLong(0), r.getLong(1)))
    sizes shouldBe Seq((1L, 12L), (3L, 6L))
    // audit statuses: keepers 'kept'/'near_dup', every replica 'exact_dup'
    val statuses = rows(lbl.select(col("id"),
        when(col("id") =!= col("keeper_id"), lit("exact_dup"))
          .when(col("id") =!= col("cluster_id"), lit("near_dup"))
          .otherwise(lit("kept")).as("status")))
      .map(r => (r.getLong(0), r.getString(1))).toMap
    statuses(1L) shouldBe "kept"
    statuses(2L) shouldBe "near_dup"
    statuses(3L) shouldBe "kept"
    (statuses.count(_._2 == "exact_dup")) shouldBe 15 // 5 replicas x 3 contents
  }

  test("containmentPairsDeduped: intra rows carry containment k/sz and " +
      "fully-capped clusters emit nothing") {
    // two identical docs + one unrelated: intra row for the pair, none for
    // the singleton; with cap 0-equivalent semantics (cap below distinct
    // content count across shared shingles) nothing emits
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta"),
      (3L, "other text entirely different")).toDF("doc_id", "text")
    val out = rows(Dedup.containmentPairsDeduped(df, "text", "doc_id",
      n = 2, threshold = 0.8, maxDocFreq = 10L))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    out shouldBe Seq((1L, 1L, 1.0, 1L)) // keeper intra row, k == sz, C(2,2)=1
    // a cap of 0 kills every posting -> composed emits nothing, like direct
    Dedup.containmentPairsDeduped(df, "text", "doc_id",
      n = 2, threshold = 0.8, maxDocFreq = 0L).count() shouldBe 0L
  }

  test("embeddingPairs first-matching-band dedup equals the dropDuplicates formulation") {
    // property: the shuffle-free per-row dedup (keep a pair only in the first
    // band where the signature slices agree) emits exactly the candidate set
    // the straightforward band-join + dropDuplicates + verify pipeline does
    val rng = new scala.util.Random(7)
    val dim = 8; val planes = 8; val bands = 4; val threshold = 0.5
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(dim)(rng.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val fast = rows(Dedup.embeddingPairs(vecs, "embedding", "vec_id",
      threshold = threshold, dim = dim, planes = planes, bands = bands)
      .orderBy("id_a", "id_b"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // reference formulation: narrow banded frame, dropDuplicates candidates,
    // exact cosine on the deduped set
    val pvs = Dedup.hyperplanes(planes, dim)
    val bits = pvs.map(p =>
      when(graft.expressions.GraftFunctions.vectorDot(col("v"), typedLit(p)) >= 0, 1).otherwise(0))
    val rpb = planes / bands
    val bandCols = (0 until bands).map { b =>
      val bucket = (0 until rpb).map(j => bits(b * rpb + j) * lit(1 << j)).reduce(_ + _)
      struct(lit(b).as("band"), bucket.as("bucket"))
    }
    val banded = vecs.select(col("vec_id").as("id"), col("embedding").as("v"))
      .select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val vv = vecs.select(col("vec_id").as("id"), col("embedding").as("v"))
    val ref = rows(cand
      .join(vv.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vv.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.operators.Similarity.cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold).orderBy("id_a", "id_b"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    ref should not be empty // the seed must actually exercise collisions
    fast shouldBe ref
  }

  test("containmentPairs catches short-in-long embedding that jaccard misses") {
    val longTail = (1 to 60).map(i => s"filler$i").mkString(" ")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, s"alpha beta gamma delta epsilon zeta $longTail"), // contains doc 1
      (3L, "totally unrelated content words here")
    ).toDF("doc_id", "text")
    val cont = rows(Dedup.containmentPairs(corpus, "text", "doc_id", n = 3, threshold = 0.8))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    cont.map(p => (p._1, p._2)) shouldBe Seq((1L, 2L)) // short doc is the contained side
    cont.head._3 shouldBe 1.0 // every shingle of doc 1 appears in doc 2
    // the same pair is invisible to symmetric jaccard at any meaningful bar:
    // J = |short| / |long| ~ 4/62
    val jac = rows(Dedup.ngramJaccardPairs(corpus, "text", "doc_id", n = 3, threshold = 0.5))
    jac shouldBe empty
  }

  test("containmentPairs exact-dup tie keeps min id as container") {
    val corpus = Seq(
      (7L, "one two three four five six seven"),
      (9L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val cont = rows(Dedup.containmentPairs(corpus, "text", "doc_id", n = 3, threshold = 0.8))
      .map(r => (r.getLong(0), r.getLong(1)))
    cont shouldBe Seq((9L, 7L)) // ties: larger id is contained, min id survives
  }

  test("minhashPairs recall: every exact-duplicate pair is found, precision holds") {
    // Exact duplicates have identical signatures, hence identical band buckets
    // in every band — candidacy is guaranteed, so recall on exact dups must be
    // 1.0 regardless of banding parameters. Seeded generator: deterministic.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    val base = (0 until 40).map(i =>
      (i.toLong, Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val dups = (0 until 15).map(j => (100L + j, base(j)._2))
    val corpus = (base ++ dups).toDF("doc_id", "text")
    val found = rows(Dedup.minhashPairs(corpus, "text", "doc_id",
      shingleN = 3, k = 64, bands = 16, threshold = 0.7))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairSet = found.map(p => (p._1, p._2)).toSet
    (0 until 15).foreach { j => pairSet should contain((j.toLong, 100L + j)) }
    // precision: exact verification means every emitted pair clears threshold,
    // and exact-dup pairs score exactly 1.0
    found.foreach(_._3 should be >= 0.7)
    found.filter(p => p._2 == p._1 + 100L).foreach(_._3 shouldBe 1.0)
  }

  test("winnowing: the w+k-1 guarantee — a shared token run of that length " +
       "yields >= 1 shared fingerprint even with a disjoint prefix") {
    import spark.implicits._
    // k=4, w=5 -> guarantee threshold 8 tokens; doc 2 embeds doc 1's 8-token
    // run after an unrelated prefix (whole-doc fingerprints would differ)
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, run),
      (2L, s"completely different words over here then $run")
    ).toDF("doc_id", "text")
    val m = rows(Dedup.winnowMatches(docs, "text", "doc_id", k = 4, w = 5))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    m.map(p => (p._1, p._2)) shouldBe Seq((1L, 2L))
    m.head._3 should be >= 1L
  }

  test("winnowing: identical docs share the full fingerprint hash set; " +
       "selection density lands near 2/(w+1)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen",
      "ibis", "jay", "kit", "lark", "mole", "newt", "owl", "pig")
    val text = Seq.fill(300)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val fp = rows(Dedup.winnowFingerprints(docs, "text", "doc_id", k = 4, w = 5))
      .map(r => (r.getLong(0), r.getLong(2)))
    val h1 = fp.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._2).toSet
    h1 shouldBe h2
    // 297 grams, expected picks ~ 2/(w+1) = 1/3 of positions (pre-dedup);
    // allow wide slack — this guards against off-by-one frame bugs that
    // would select ~every position (w=1-like) or ~one per doc
    val picks = fp.count(_._1 == 1L)
    picks should be > 40
    picks should be < 160
  }

  test("winnowMatchesDeduped: expanded (keeper-pair, shared) multiset equals the direct run " +
       "when cap binding agrees") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t1 = s"$run one two three four five six"
    val t2 = s"prefix words over here then $run"
    val t3 = "totally unrelated content about columnar storage engines and formats"
    // clusters: {1,11,12} (keeper 1, size 3), {2} (size 1), {3,13} (keeper 3, size 2)
    val corpus = Seq((1L, t1), (2L, t2), (3L, t3), (11L, t1), (12L, t1), (13L, t3))
      .toDF("doc_id", "text")
    val keeper = Map(1L -> 1L, 11L -> 1L, 12L -> 1L, 2L -> 2L, 3L -> 3L, 13L -> 3L)
    val composed = rows(Dedup.winnowMatchesDeduped(corpus, "text", "doc_id",
        k = 4, w = 5, docFreqCap = 50))
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    // direct pairs, folded onto keeper pairs: multiplicity must equal n_pairs
    // and every member of a folded group must carry the same shared count
    val direct = rows(Dedup.winnowMatches(corpus, "text", "doc_id", k = 4, w = 5,
        docFreqCap = 50))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val folded = direct.groupBy { case (a, b, s) =>
      val (ka, kb) = (keeper(a), keeper(b))
      (math.min(ka, kb), math.max(ka, kb), s)
    }.map { case (k, v) => (k, v.size.toLong) }
    folded shouldBe composed
  }

  test("winnowMatchesDeduped: under heavy replication the direct run's docFreq cap zeroes " +
       "out while the composed run reports the true pairs") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t1 = s"$run one two three four five six"
    val t2 = s"prefix words over here then $run"
    // 5 replicas of each: every fingerprint's direct docFreq is >= 5 > cap 4
    val corpus = (0 until 5).flatMap(r =>
      Seq((1L + 10 * r, t1), (2L + 10 * r, t2))).toDF("doc_id", "text")
    val direct = rows(Dedup.winnowMatches(corpus, "text", "doc_id", k = 4, w = 5,
      docFreqCap = 4))
    direct shouldBe empty
    val composed = rows(Dedup.winnowMatchesDeduped(corpus, "text", "doc_id",
        k = 4, w = 5, docFreqCap = 4))
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    composed.keySet shouldBe Set((1L, 1L), (2L, 2L), (1L, 2L))
    composed((1L, 2L))._1 should be >= 1L // the shared run survives
    composed((1L, 2L))._2 shouldBe 25L    // 5 x 5 logical pairs
    composed((1L, 1L))._2 shouldBe 10L    // C(5,2)
    composed((2L, 2L))._2 shouldBe 10L
  }

  test("winnowMatchesDeduped: a cluster whose fingerprints are ALL capped out emits no " +
       "intra row (matches the direct pair-join's >=1-shared rule)") {
    import spark.implicits._
    // two DISTINCT boilerplate texts sharing every 4-gram window across 6
    // survivor docs... simplest construction: 6 distinct docs all containing
    // the same 8-token run and nothing else except a unique leading token —
    // with w=5, k=4 some fingerprints are shared by all 6 docs (> cap 5);
    // instead pin the rule directly: cap 0-like tight cap of 1 kills every
    // hash shared by >= 2 distinct contents, so a 2-cluster of a text whose
    // every hash is also in another doc emits nothing
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq((1L, run), (2L, run), (3L, run + " extra trailing words here"))
      .toDF("doc_id", "text")
    // doc 1's fingerprints all come from the shared run; with cap 1 every
    // hash shared with doc 3's survivor is dropped -> doc 1's kept set can
    // only be hashes doc 3 missed; verify that IF nothing is kept, no intra
    // row appears
    val composed = rows(Dedup.winnowMatchesDeduped(corpus, "text", "doc_id",
        k = 4, w = 5, docFreqCap = 1))
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val kept = rows(Dedup.winnowFingerprints(
        Seq((1L, run), (3L, run + " extra trailing words here")).toDF("doc_id", "text"),
        "text", "doc_id", k = 4, w = 5).select("doc_id", "h").distinct())
      .map(r => (r.getLong(0), r.getLong(1)))
    val h1 = kept.filter(_._1 == 1L).map(_._2).toSet
    val h3 = kept.filter(_._1 == 3L).map(_._2).toSet
    val keptOfDoc1 = (h1 -- h3).size.toLong
    if (keptOfDoc1 == 0L) composed.get((1L, 1L)) shouldBe None
    else composed((1L, 1L)) shouldBe ((keptOfDoc1, 1L))
    composed.get((1L, 3L)) shouldBe None // every shared hash is over cap 1
  }

  test("winnow gram cap: truncation is deterministic (kept-prefix fingerprints) and OBSERVABLE " +
       "via winnowTruncationReport") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc 1: 30 tokens -> 27 4-grams, exceeds cap 16 by 11; doc 2: 5 tokens -> 2 grams
    val big = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, big), (2L, "a b c d e")).toDF("doc_id", "text")
    val rep = rows(Dedup.winnowTruncationReport(docs, "text", k = 4, capGrams = 16L)).head
    rep.getAs[Long]("n_docs") shouldBe 2L
    rep.getAs[Long]("n_truncated") shouldBe 1L
    rep.getAs[Long]("max_grams") shouldBe 27L
    rep.getAs[Long]("grams_dropped") shouldBe 11L
    // capped fingerprints == fingerprints of the kept prefix (first
    // capGrams + k - 1 = 19 tokens): the documented same-guarantee-within-
    // the-kept-prefix contract, not garbage selection
    val capped = rows(Dedup.winnowFingerprints(docs.filter(col("doc_id") === 1L),
      "text", "doc_id", k = 4, w = 5, capGrams = 16L).orderBy("pos", "h"))
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("h")))
    val prefix = (1 to 19).map(i => s"w$i").mkString(" ")
    val prefixFp = rows(Dedup.winnowFingerprints(Seq((1L, prefix)).toDF("doc_id", "text"),
      "text", "doc_id", k = 4, w = 5).orderBy("pos", "h"))
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("h")))
    capped shouldBe prefixFp
    capped.foreach { case (pos, _) => pos should be < 16L }
  }

  test("erasure semantics: deleting docs can bring a shingle back under the docFreq cap — " +
       "the pruned postings index must REBUILD, not row-delete") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // shingle "hot one two" lives in 12 docs (df = 12 > cap 10 -> pruned);
    // each doc also carries a unique tail shingle that stays indexed
    val docs = (1L to 12L).map(i => (i, s"hot one two unique$i tail$i"))
      .toDF("doc_id", "text")
    val cap = 10L
    val before = Dedup.prunedPostings(docs, "text", "doc_id", n = 3, maxDocFreq = cap)
    // the hot shingle is absent from every doc's postings before erasure
    val hotHash = rows(Seq(("x", "hot one two")).toDF("k", "t")
      .select(Dedup.shingleHashSet(col("t"), 3).getItem(0).as("h"))).head.getLong(0)
    before.filter(col("sh") === hotHash).count() shouldBe 0L
    // erase 3 docs -> df drops to 9 <= cap: a rebuild indexes the hot
    // shingle for all 9 retained docs — rows a naive row-delete of the old
    // index could never produce
    val ret = docs.filter(col("doc_id") > 3)
    val after = Dedup.prunedPostings(ret, "text", "doc_id", n = 3, maxDocFreq = cap)
    after.filter(col("sh") === hotHash).count() shouldBe 9L
  }
}
