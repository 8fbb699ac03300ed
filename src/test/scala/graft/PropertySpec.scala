package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.operators.{Dedup, Transforms}

/** Property-based invariants (SURVEY.md §5.2.3) over scalacheck-generated tick
  * frames: algebraic laws the transforms must satisfy on ANY input, not just
  * the curated fixtures. Deterministic seeds keep the suite reproducible.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val tickGen: Gen[List[(String, Double, Double, Double, Double, Long)]] = {
    val day = Gen.chooseNum(1, 28)
    val month = Gen.chooseNum(1, 12)
    val tick = for {
      m <- month; d <- day
      h <- Gen.chooseNum(0, 23)
      mid <- Gen.chooseNum(1.0, 500.0)
      spread <- Gen.chooseNum(0.0, 10.0)
      vol <- Gen.chooseNum(0L, 1000000L)
    } yield (f"2024-$m%02d-$d%02d $h%02d:00:00", mid, mid + spread, mid - spread, mid + spread / 2, vol)
    Gen.nonEmptyListOf(tick)
  }

  private def sample(seedN: Long): DataFrame = {
    val data = tickGen(Gen.Parameters.default, rng.Seed(seedN)).get
    data.toDF("timestamp", "open", "high", "low", "close", "volume")
      .withColumn("timestamp", col("timestamp").cast("timestamp"))
  }

  private val seeds = 1L to 12L

  test("BoundedSetAgg law: any partition/merge order equals sorted-distinct-take(cap), " +
       "nulls ignored, state never exceeds cap") {
    // pure-JVM law over the aggregator the capped basket rollup runs per
    // fact row: random values (with duplicates and nulls), random partition
    // boundaries, random merge order — the result must be the first `cap`
    // of the sorted distinct value set, and no intermediate buffer may ever
    // hold more than cap entries.
    val rnd = new scala.util.Random(1815)
    (1 to 50).foreach { _ =>
      val cap = 1 + rnd.nextInt(12)
      val agg = new graft.operators.Queries.BoundedSetAgg(cap)
      val n = rnd.nextInt(200)
      val values: Seq[java.lang.Long] = Seq.fill(n) {
        if (rnd.nextInt(10) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(40).toLong - 20L)
      }
      // random partitioning into 1..6 slices, each reduced independently
      val slices = values.grouped(1 + rnd.nextInt(math.max(1, n / 3 + 1))).toSeq
      val buffers = slices.map(_.foldLeft(agg.zero)(agg.reduce))
      buffers.foreach(b => b.length should be <= cap)
      // fold the partials in a shuffled order (merge must be order-free)
      val merged = rnd.shuffle(buffers).foldLeft(agg.zero)(agg.merge)
      val expect = values.filter(_ != null).map(_.longValue()).distinct.sorted.take(cap)
      agg.finish(merged) shouldBe expect
    }
  }

  test("clean is idempotent: clean(clean(df)) == clean(df)") {
    seeds.foreach { s =>
      val once = Transforms.clean(sample(s))
      val twice = Transforms.clean(once)
      twice.count() shouldBe once.count()
      once.exceptAll(twice).count() shouldBe 0
    }
  }

  test("dedup never increases rows; cleaning never increases rows") {
    seeds.foreach { s =>
      val df = sample(s)
      val n = df.count()
      df.dropDuplicates().count() should be <= n
      Transforms.clean(df).count() should be <= n
    }
  }

  test("aggregate: sum(volume) is preserved across bucket granularities") {
    seeds.foreach { s =>
      val df = sample(s)
      val totals = Seq("D", "W", "M", "Q", "Y").map { f =>
        Transforms.aggregate(df, f, exactSums = true)
          .agg(sum(col("volume"))).head().getDouble(0)
      }
      totals.distinct.size shouldBe 1
    }
  }

  test("aggregate: per-candle low <= min(open, close) and high >= max(open, close)") {
    // input satisfies low <= {open, close} <= high by construction, so every
    // candle must too (min/max/min_by/max_by can't escape the envelope)
    seeds.foreach { s =>
      val candles = Transforms.aggregate(sample(s), "W")
      val bad = candles.filter(
        col("low") > least(col("open"), col("close")) ||
          col("high") < greatest(col("open"), col("close")))
      bad.count() shouldBe 0
    }
  }

  test("aggregate: bucket count never exceeds distinct input days") {
    seeds.foreach { s =>
      val df = sample(s)
      val days = df.select(to_date(col("timestamp"))).distinct().count()
      Seq("D", "W", "M", "Q", "Y").foreach { f =>
        Transforms.aggregate(df, f).count() should be <= days
      }
    }
  }

  test("IVM law: candle partials merged over ANY random slicing equal the direct aggregate") {
    seeds.take(6).foreach { s =>
      // distinct timestamps: arg-extrema over tied ordering keys are
      // implementation-defined, and this law compares exact rows
      val ticks = sample(s).dropDuplicates("timestamp")
      val full = rows(Transforms.aggregate(ticks, "D", exactSums = true).orderBy("timestamp"))
      // random 3-way slicing by a hash of the timestamp (seed-dependent)
      val sliced = ticks.withColumn("__slice", pmod(xxhash64(col("timestamp"), lit(s)), lit(3)))
      val parts = (0 until 3).map(i =>
        Transforms.candlePartials(sliced.filter(col("__slice") === i).drop("__slice"), "D"))
      // fold incrementally (combine is partial -> partial), then resolve
      val folded = parts.reduce((a, b) => Transforms.combineCandlePartials(a.unionByName(b)))
      rows(Transforms.mergeCandlePartials(folded).orderBy("timestamp")) shouldBe full
    }
  }

  test("normalize preserves row count and never drops columns") {
    seeds.foreach { s =>
      val df = sample(s)
      val out = Transforms.normalize(df, "forex")
      out.count() shouldBe df.count()
      df.columns.toSet.subsetOf(out.columns.toSet) shouldBe true
    }
  }

  test("packing invariants: offsets < budget, starts strictly increase by token count") {
    val idTok = for {
      id <- Gen.chooseNum(0L, 100000L)
      t <- Gen.chooseNum(1L, 500L)
    } yield (id, t)
    (1L to 8L).foreach { s =>
      val data = Gen.nonEmptyListOf(idTok)(Gen.Parameters.default, rng.Seed(s)).get
        .distinctBy(_._1)
      val df = data.toDF("doc_id", "n_tokens")
      val out = rows(graft.operators.Packing
        .packSequences(df, "n_tokens", "doc_id", budget = 777L, groupSize = 64L)
        .orderBy("doc_id").select("n_tokens", "seq_start", "seq_id", "seq_offset"))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // offsets within budget; seq_id consistent with start; starts telescope
      out.foreach { case (_, start, id, off) =>
        off should (be >= 0L and be < 777L)
        id shouldBe start / 777L
      }
      out.sliding(2).foreach {
        case Seq((tok, start, _, _), (_, start2, _, _)) => start2 shouldBe start + tok
        case _ => ()
      }
      out.head._2 shouldBe 0L
    }
  }

  test("deterministicShuffle is a permutation of 0 until n") {
    (1L to 6L).foreach { s =>
      val ids = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000L))(
        Gen.Parameters.default, rng.Seed(s)).get.distinct
      val df = ids.map(Tuple1(_)).toDF("doc_id")
      val pos = rows(graft.operators.Sampling.deterministicShuffle(df, "doc_id")
        .select("shuffle_pos")).map(_.getLong(0)).sorted
      pos shouldBe (0L until ids.length.toLong)
    }
  }

  test("quantizeInt8 bounds: |q| <= 127 and q/scale stays within half a step of x") {
    (1L to 4L).foreach { s =>
      val vecs = Gen.nonEmptyListOf(
        Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0).map(_.toFloat)).map(_.toArray))(
        Gen.Parameters.default, rng.Seed(s)).get
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val out = rows(graft.operators.Similarity.quantizeInt8(df, "embedding", "vec_id")
        .join(df.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .select(col("q"), col("scale"), expr("embedding[CAST(dim AS INT)]").cast("double").as("x")))
      out.foreach { r =>
        val (q, scale, x) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
        math.abs(q) should be <= 127L
        if (scale > 0) math.abs(q / scale - x) should be <= (0.5 / scale + 1e-9)
      }
    }
  }

  test("correlationMatrixWide equals the self-join form on random ragged frames") {
    val keys = Seq("k1", "k2", "k3", "k4")
    val cellGen = for {
      k <- Gen.oneOf(keys); t <- Gen.chooseNum(1, 15)
      v <- Gen.chooseNum(-100.0, 100.0)
    } yield (k, t, v)
    (1L to 6L).foreach { s =>
      // dedup (k, t) so the documented one-row-per-(key,time) precondition
      // holds; raggedness (keys missing at some times) stays random
      val tall = Gen.nonEmptyListOf(cellGen)(Gen.Parameters.default, rng.Seed(s)).get
        .groupBy(c => (c._1, c._2)).map(_._2.head).toSeq
        .toDF("series", "t", "v")
      val byJoin = rows(graft.operators.Queries
        .correlationMatrix(tall, "series", "t", "v").orderBy("a", "b"))
        .map(r => (r.getString(0), r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      val byPivot = rows(graft.operators.Queries
        .correlationMatrixWide(tall, "series", "t", "v", keys).orderBy("a", "b"))
        .map(r => (r.getString(0), r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      // same pair set; identical r (both compute from the same exact-decimal
      // power sums, so equality is exact, not approximate). Degenerate pairs
      // (zero variance / single aligned time → null/NaN r) are excluded from
      // the value compare because NaN != NaN, but the PAIR SETS must agree.
      byPivot.map(t => (t._1, t._2)) shouldBe byJoin.map(t => (t._1, t._2))
      def ok(t: (String, String, Option[Double])) = t._3.exists(d => !d.isNaN)
      byPivot.filter(ok) shouldBe byJoin.filter(ok)
    }
  }

  test("ngram jaccard values are within [threshold, 1]; pairs are ordered") {
    val docGen = Gen.nonEmptyListOf(Gen.oneOf(
      "alpha beta gamma delta epsilon zeta", "alpha beta gamma delta epsilon eta",
      "one two three four five six seven", "completely different words here now"))
    (1L to 6L).foreach { s =>
      val docs = docGen(Gen.Parameters.default, rng.Seed(s)).get
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = rows(Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 2, threshold = 0.3))
      pairs.foreach { r =>
        r.getDouble(2) should (be >= 0.3 and be <= 1.0)
        r.getLong(0) should be < r.getLong(1)
      }
    }
  }

  test("kmv estimate is exact below k and within the 4σ KMV envelope above") {
    (1L to 6L).foreach { s =>
      val n = 200 + (s * 997 % 3000).toInt
      val df = (1L to n.toLong).map(i => ("g", i * (s + 1))).toDF("g", "v")
      val k = 128
      val got = rows(graft.operators.Sketches.kmvDistinct(df, Seq("g"), "v", k)).head
      got.getLong(1) shouldBe n.toLong
      val est = got.getDouble(2)
      if (n < k) est shouldBe n.toDouble
      // RSE ≈ 1/sqrt(k−2): 4σ at k=128 ≈ 36%
      else est should (be > n * 0.64 and be < n * 1.36)
    }
  }

  test("neighborhoodJaccard equals a driver-side brute force on random graphs") {
    val r = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val nodes = 2 + r.nextInt(12)
      val raw = (1 to 30).map(_ => (r.nextInt(nodes).toLong, r.nextInt(nodes).toLong))
      val und = raw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      if (und.nonEmpty) {
        val adj = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val expect = und.map { case (a, b) =>
          val c = (adj(a) & adj(b)).size
          ((a, b), (adj(a).size.toLong, adj(b).size.toLong, c.toLong,
            c.toDouble / (adj(a).size + adj(b).size - c)))
        }.toMap
        val got = rows(graft.operators.Graph.neighborhoodJaccard(
            und.toDF("a", "b"), "a", "b"))
          .map(row => ((row.getLong(0), row.getLong(1)),
            (row.getLong(2), row.getLong(3), row.getLong(4), row.getDouble(5)))).toMap
        got shouldBe expect
      }
    }
  }

  test("seasonalDecompose reconstruction: value == trend + seasonal + residual where defined") {
    val r = new scala.util.Random(11)
    val days = (0 until 28).map { i =>
      ("A", java.sql.Timestamp.valueOf(f"2024-03-${i + 1}%02d 00:00:00"),
        math.rint(r.nextDouble() * 10000) / 100.0)
    }
    val got = rows(graft.operators.Queries.seasonalDecompose(
      days.toDF("k", "d", "x"), "k", "d", "x"))
    got.foreach { row =>
      if (!row.isNullAt(3)) {
        val recon = row.getDouble(3) + row.getDouble(4) + row.getDouble(5)
        recon shouldBe row.getDouble(2) +- 1e-9
      }
    }
  }
}
