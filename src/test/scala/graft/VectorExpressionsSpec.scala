package graft

import org.apache.spark.sql.functions._
import graft.expressions.{GraftFunctions, VectorDot}

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
