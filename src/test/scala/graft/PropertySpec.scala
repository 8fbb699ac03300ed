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

  test("normalize preserves row count and never drops columns") {
    seeds.foreach { s =>
      val df = sample(s)
      val out = Transforms.normalize(df, "forex")
      out.count() shouldBe df.count()
      df.columns.toSet.subsetOf(out.columns.toSet) shouldBe true
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
}
