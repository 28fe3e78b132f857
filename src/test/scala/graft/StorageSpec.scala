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
}
