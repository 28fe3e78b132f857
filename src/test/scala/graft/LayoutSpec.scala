package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue2 interleaves bits (known vectors)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L),
      (5L, 3L), (255L, 255L))
      .toDF("a", "b")
      .select(Layout.zvalue2(col("a"), col("b"), 8).as("z"))
      .as[Long].collect()
    // a bits at even positions, b bits at odd
    assert(got.sameElements(Array(0L, 1L, 2L, 5L, 10L,
      // a=101 -> 010001, b=011 -> 001010 -> z=011011 = 27
      27L,
      65535L)))
  }

  test("z-order clustering bounds per-partition ranges on BOTH columns") {
    val df = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val parts = Layout.zorderBy(df, "x", "y", bits = 6, numPartitions = 16)
      .select(spark_partition_id().as("pid"), col("x"), col("y"))
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xspan"), (max("y") - min("y")).as("yspan"),
        count(lit(1)).as("n"))
      .collect()
    assert(parts.map(_.getLong(3)).sum == 64 * 64)
    // a lexicographic (x,y) sort would give most partitions a FULL
    // y-span of 63; z-order keeps the average span of both columns
    // well under that
    val avgX = parts.map(_.getLong(1)).sum.toDouble / parts.length
    val avgY = parts.map(_.getLong(2)).sum.toDouble / parts.length
    assert(avgX < 40 && avgY < 40, s"avg spans $avgX / $avgY")
  }

  test("withZValue matches hand normalization") {
    val df = Seq((10L, 100L), (19L, 109L), (15L, 105L)).toDF("a", "b")
    val z = Layout.withZValue(df, "a", "b", bits = 4).select("zval")
      .as[Long].collect().toSet
    // range 10..19 -> norm floor((v-10)*16/10); both columns identical shape
    def n(v: Long) = math.floor((v - 10) * 16.0 / 10.0).toLong
    def inter(a: Long, b: Long) = (0 until 4).map(i =>
      (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))).sum
    val expected = Seq((10L, 100L), (19L, 109L), (15L, 105L))
      .map { case (a, b) => inter(n(a), n(b - 90)) }.toSet
    assert(z == expected)
  }
}
