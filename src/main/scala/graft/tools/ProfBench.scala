package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch shoot-out for Profile.numeric median strategies (results
  * recorded in BASELINE.md; file kept for reproducibility). */
object ProfBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(name: String)(f: => Unit): Unit = { val t0=System.nanoTime(); f; println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s") }
    li.agg(count(lit(1))).collect()
    time("basic 2-col (count/min/max/avg)") {
      li.agg(count(col("l_quantity")),min(col("l_quantity")),max(col("l_quantity")),avg(col("l_quantity")),
             count(col("l_extendedprice")),min(col("l_extendedprice")),max(col("l_extendedprice")),avg(col("l_extendedprice"))).collect()
    }
    time("4x countDistinct") {
      li.agg(countDistinct(col("l_quantity")),countDistinct(col("l_extendedprice")),countDistinct(col("l_discount")),countDistinct(col("l_tax"))).collect()
    }
    time("percentile low-card (l_quantity)") { li.agg(expr("percentile(l_quantity, 0.5D)")).collect() }
    time("percentile high-card (l_extendedprice)") { li.agg(expr("percentile(l_extendedprice, 0.5D)")).collect() }
    time("approx_percentile high-card") { li.agg(expr("approx_percentile(l_extendedprice, 0.5D, 10000)")).collect() }
    time("sort-rank exact median high-card") {
      import org.apache.spark.sql.expressions.Window
      val n = li.count()
      li.select(col("l_extendedprice").as("v")).withColumn("rn", row_number().over(Window.orderBy("v")))
        .filter(col("rn").isin((n+1)/2, (n+2)/2)).agg(avg("v")).collect()
    }
    spark.stop()
  }
}
