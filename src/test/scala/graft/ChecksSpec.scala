package graft

import graft.operators.Checks
import graft.operators.Checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(10.0), "a"),
    (Some(2L), Some(-5.0), "a"),   // range violation
    (Some(2L), None, "b"),         // dup id + null value
    (None, Some(3.0), "zz")        // null id + out-of-set
  ).toDF("id", "v", "cat")

  test("validate: one row per check, observed metrics and pass flags") {
    val out = rows(Checks.validate(df, Seq(
      RowCountMin(3L), NotNull("id"), NotNull("v"), Unique("id"),
      InRange("v", 0.0, 100.0), InSet("cat", Seq("a", "b"))))
      .orderBy("ord"))
      .map(r => (r.getString(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))
    out shouldBe Seq(
      ("row_count_min", "*", 4.0, true),
      ("not_null", "id", 1.0, false),
      ("not_null", "v", 1.0, false),
      ("unique", "id", 2.0, false), // 4 rows, 2 distinct non-null ids → surplus 2
      ("in_range", "v", 1.0, false),
      ("in_set", "cat", 1.0, false))
  }

  test("validate on a clean table passes everything") {
    val clean = Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "v", "cat")
    val out = rows(Checks.validate(clean, Seq(
      RowCountMin(2L), NotNull("id"), Unique("id"),
      InRange("v", 0.0, 10.0), InSet("cat", Seq("a", "b")))))
    out.foreach(_.getBoolean(4) shouldBe true)
  }
}
