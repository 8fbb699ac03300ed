package graft

import java.sql.Timestamp

import graft.operators.BandJoin

class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("neighborCounts matches brute force, including cross-bucket pairs and zero rows") {
    // band 10s; ids 1/2 are 9s apart straddling a bucket boundary (t=10),
    // id 3 is 11s from id 2 (outside), id 4 is another key entirely
    val df = Seq(
      (1L, "a", ts(6L)), (2L, "a", ts(15L)), (3L, "a", ts(26L)),
      (4L, "b", ts(15L))
    ).toDF("id", "key", "t")
    val out = rows(BandJoin.neighborCounts(df, Seq("key"), "t", "id", 10L).orderBy("id"))
      .map(r => (r.getLong(0), r.getLong(2)))
    out shouldBe Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L))
  }

  test("a pair exactly at the band edge counts on both sides") {
    val df = Seq((1L, "a", ts(0L)), (2L, "a", ts(10L))).toDF("id", "key", "t")
    rows(BandJoin.neighborCounts(df, Seq("key"), "t", "id", 10L).orderBy("id"))
      .map(r => (r.getLong(0), r.getLong(2))) shouldBe Seq((1L, 1L), (2L, 1L))
  }

  test("neighborCounts equals the brute-force theta join on random data") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 300L).map(i =>
      (i, s"k${rnd.nextInt(3)}", ts(rnd.nextInt(5000).toLong)))
    val df = data.toDF("id", "key", "t")
    val got = rows(BandJoin.neighborCounts(df, Seq("key"), "t", "id", 60L).orderBy("id"))
      .map(r => (r.getLong(0), r.getLong(2)))
    val brute = data.map { case (i, k, t) =>
      (i, data.count { case (j, k2, t2) =>
        j != i && k2 == k && math.abs(t2.getTime - t.getTime) <= 60000L }.toLong)
    }.sortBy(_._1)
    got shouldBe brute
  }
}
