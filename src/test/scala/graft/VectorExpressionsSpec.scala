package graft

import org.apache.spark.sql.functions._
import graft.expressions.{GraftFunctions, VectorDot, VectorMaxAbs}

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vector_dot: codegen'd kernel matches sequential double summation") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.5f), Array(2.0f, 2.0f))
    ).toDF("a", "b")
    val got = rows(df.select(GraftFunctions.vectorDot(col("a"), col("b")).as("d")))
      .map(_.getDouble(0))
    got shouldBe Seq(1.0 * 4 + 2.0 * 5 + 3.0 * 6, 0.5 * 2.0 + (-0.5) * 2.0)
  }

  test("vector_dot: null input -> null, mixed float/double arrays widen") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Array(3.0f, 4.0f)),
      (None, Array(1.0f, 1.0f))
    ).toDF("a", "b")
    val got = rows(df.select(GraftFunctions.vectorDot(col("a"), col("b")).as("d")))
    got.head.getDouble(0) shouldBe 11.0
    got(1).isNullAt(0) shouldBe true
  }

  test("vector_dot registered as a SQL function via GraftFunctions.register") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 1.0f), Array(2.0f, 3.0f))).toDF("a", "b").createOrReplaceTempView("v")
    rows(spark.sql("SELECT vector_dot(a, b) AS d FROM v")).head.getDouble(0) shouldBe 5.0
  }

  test("vector_max_abs: codegen and eval agree; zero vector gives 0") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val a = Literal.create(new GenericArrayData(Array(1.5f, -7.25f, 3.0f)), ArrayType(FloatType))
    VectorMaxAbs(a).eval(null) shouldBe 7.25
    val df = Seq((1L, Array(1.5f, -7.25f, 3.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("id", "v")
    val got = rows(df.select(GraftFunctions.vectorMaxAbs(col("v"))).orderBy(lit(1)))
      .map(_.getDouble(0)).sorted
    got shouldBe Seq(0.0, 7.25)
  }

  test("quantizeInt8: values land in [-127, 127], max-abs element hits 127, dequantizes") {
    import graft.operators.Similarity
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f)), (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = rows(Similarity.quantizeInt8(df, "embedding", "vec_id").orderBy("vec_id", "dim"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val v1 = out.filter(_._1 == 1L)
    v1.map(_._3) shouldBe Seq(64L, -127L, 32L) // floor(±x·127 + 0.5)
    v1.foreach { case (_, _, q, s) =>
      math.abs(q) should be <= 127L
      s shouldBe 127.0 +- 1e-12 // max|x| = 1.0
    }
    out.filter(_._1 == 2L).map(_._3) shouldBe Seq(0L, 0L, 0L) // zero vector
  }

  test("vector_dot interpreted path (eval) agrees with codegen") {
    // Force interpreted evaluation through a plain eval() call on the expression.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val a = Literal.create(new GenericArrayData(Array(1.0f, 2.0f)), ArrayType(FloatType))
    val b = Literal.create(new GenericArrayData(Array(3.0f, 4.0f)), ArrayType(FloatType))
    VectorDot(a, b).eval(null) shouldBe (1.0 * 3 + 2.0 * 4)
  }
}
