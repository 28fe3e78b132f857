package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Storage

class StorageSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange on the bucket key") {
    val dir = Files.createTempDirectory("graft-buckets")
    val a = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong % 40, i.toLong)).toDF("k", "vb")
    Storage.writeBucketed(a, "bk_a", s"$dir/a", Seq("k"), buckets = 8,
      sortKeys = Seq("k"))
    Storage.writeBucketed(b, "bk_b", s"$dir/b", Seq("k"), buckets = 8,
      sortKeys = Seq("k"))
    // force a shuffle-or-bucketed join (tiny test tables would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_a").join(spark.table("bk_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle, got:\n$plan")
      val expect = a.join(b, Seq("k")).count()
      assert(joined.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned write: reads filtered on the partition key prune directories") {
    val df = (1L to 100L).toDF("id")
      .withColumn("shard", (col("id") % 4).cast("int"))
    val path = java.nio.file.Files.createTempDirectory("part").toString + "/t"
    graft.sources.Storage.writePartitioned(df, path, Seq("shard"))
    val read = spark.read.parquet(path).filter(col("shard") === 2)
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("shard"),
      s"no partition pruning:\n$scan")
    assert(read.count() == 25)
    // only the shard=2 directory is touched
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("shard="))
    assert(dirs.length == 4)
  }

  test("compact: fragmented input becomes a bounded file count") {
    val frag = (1L to 1000L).toDF("id").repartition(37)
    val path = java.nio.file.Files.createTempDirectory("cmp").toString + "/t"
    graft.sources.Storage.compact(frag, path, targetBytes = 1L << 20)
    val files = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files >= 1 && files < 37, s"still fragmented: $files files")
    assert(spark.read.parquet(path).count() == 1000)
  }
}
