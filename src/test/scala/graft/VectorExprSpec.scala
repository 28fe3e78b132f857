package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot/cosine match the interpreted HOF forms bitwise") {
    val rng = new scala.util.Random(7)
    val df = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rng.nextDouble() - 0.5),
        Array.fill(64)(rng.nextDouble() - 0.5))
    }.toDF("id", "a", "b")
    val diff = df.select(
      (Similarity.dot(col("a"), col("b")) -
        Similarity.dotHof(col("a"), col("b"))).as("dd"),
      (Similarity.cosine(col("a"), col("b")) -
        Similarity.cosineHof(col("a"), col("b"))).as("dc"))
      .agg(max(abs(col("dd"))), max(abs(col("dc"))))
      .as[(Double, Double)].collect().head
    assert(diff == ((0.0, 0.0)))
  }

  test("graft_dot / graft_cosine register via GraftExtensions SQL path") {
    // imperative registration equivalent for an existing session
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.plans.DotProduct].getName, "graft_dot"),
      (c: Seq[Expression]) => graft.plans.DotProduct(c(0), c(1)))
    val got = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].collect().head
    assert(got == 11.0)
  }

  test("type check rejects non-double arrays") {
    val err = intercept[Exception] {
      Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
        .select(Similarity.dot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<double>") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
