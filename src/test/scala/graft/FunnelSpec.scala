package graft

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {

  test("transitions: adjacent pairs per user in (time, tie) order; row-normalized probabilities") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      // user 1: a -> b -> a ; user 2: a -> b ; equal-ts pair ordered by id
      (1L, "a", "2024-01-01 00:00:01", 1L),
      (1L, "b", "2024-01-01 00:00:02", 2L),
      (1L, "a", "2024-01-01 00:00:03", 3L),
      (2L, "a", "2024-01-01 00:00:05", 4L),
      (2L, "b", "2024-01-01 00:00:05", 5L)
    ).toDF("u", "t", "ts", "id").withColumn("ts", col("ts").cast("timestamp"))
    val out = rows(graft.operators.Funnel.transitions(df, "u", "t", "ts", "id")
      .orderBy("src", "dst"))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // transitions: a->b ×2 (users 1, 2), b->a ×1
    out shouldBe Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0))
  }
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, ts) => (u, t, tsLit(ts)) }.toDF("user_id", "event_type", "ts")

  test("funnel: strictly-after chaining, counts non-increasing") {
    val df = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"), // full journey
      (2L, "view", "2024-01-01 11:00:00"),
      (2L, "click", "2024-01-01 10:59:00"),    // click BEFORE view: not after
      (3L, "click", "2024-01-02 09:00:00"),    // no view at all
      (3L, "purchase", "2024-01-02 09:30:00"),
      (4L, "view", "2024-01-03 08:00:00")      // view only
    )
    val out = rows(Funnel.funnel(df, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).orderBy("step"))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out shouldBe Seq((1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L))
  }

  test("funnel: equal timestamps do not chain (strict inequality)") {
    val df = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"))
    val out = rows(Funnel.funnel(df, "user_id", "event_type", "ts",
      Seq("view", "click")).orderBy("step")).map(_.getLong(2))
    out shouldBe Seq(1L, 0L)
  }

  test("retentionCohorts: offset 0 is cohort size; later offsets count returning users") {
    val df = ev(
      (1L, "view", "2024-01-01 09:00:00"),
      (1L, "click", "2024-01-02 09:00:00"), // returns day 1
      (1L, "view", "2024-01-02 10:00:00"),  // same day: counted once
      (2L, "view", "2024-01-01 12:00:00"),
      (3L, "view", "2024-01-02 12:00:00"),
      (3L, "view", "2024-01-04 12:00:00"))  // returns day 2
    val out = rows(Funnel.retentionCohorts(df, "user_id", "ts")
      .orderBy("cohort_day", "day_offset"))
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    out shouldBe Seq(
      ("2024-01-01", 0L, 2L), // users 1, 2
      ("2024-01-01", 1L, 1L), // user 1 returns
      ("2024-01-02", 0L, 1L), // user 3
      ("2024-01-02", 2L, 1L)) // user 3 returns
  }

  test("topPaths: adjacent 3-step paths counted across users, top-k ordered") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val evs = Seq(
      (1L, "A", "2024-01-01 10:00:00", 1L), (1L, "B", "2024-01-01 11:00:00", 2L),
      (1L, "C", "2024-01-01 12:00:00", 3L), (1L, "D", "2024-01-01 13:00:00", 4L),
      (2L, "A", "2024-01-02 10:00:00", 5L), (2L, "B", "2024-01-02 11:00:00", 6L),
      (2L, "C", "2024-01-02 12:00:00", 7L)
    ).toDF("u", "t", "ts", "id").withColumn("ts", col("ts").cast("timestamp"))
    val got = rows(Funnel.topPaths(evs, "u", "t", "ts", "id", k = 10))
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    got shouldBe Seq(("A", "B", "C", 2L), ("B", "C", "D", 1L))
  }

  test("stationary: 4 power iterations on a 2-state chain, exact dyadic values") {
    // A→A 0.5, A→B 0.5, B→A 1.0: π_{t+1} = (πA/2 + πB, πA/2) from (1/2, 1/2)
    // → (.75,.25) → (.625,.375) → (.6875,.3125) → (.65625,.34375)
    val trans = Seq(("A", "A", 1L, 0.5), ("A", "B", 1L, 0.5), ("B", "A", 2L, 1.0))
      .toDF("src", "dst", "n", "p")
    val got = rows(Funnel.stationary(trans, iterations = 4).orderBy("state"))
      .map(r => (r.getString(0), r.getDouble(1)))
    got shouldBe Seq(("A", 0.65625), ("B", 0.34375))
  }

  test("stationary: a sink state absorbs all mass (self-loop semantics)") {
    val trans = Seq(("A", "B", 1L, 1.0)).toDF("src", "dst", "n", "p")
    val got = rows(Funnel.stationary(trans, iterations = 3).orderBy("state"))
      .map(r => (r.getString(0), r.getDouble(1)))
    got shouldBe Seq(("A", 0.0), ("B", 1.0))
  }
}
