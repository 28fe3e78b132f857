package graft

import java.nio.file.Files
import graft.sources.Readers

/** dumpStats must survive the input file being split across many
  * partitions (the 100 TB case): offsets from monotonically_increasing_id
  * must follow file order across splits. */
class DumpSplitSpec extends SparkSpec {
  import spark.implicits._

  test("dumpStats correct when the file is read as many small splits") {
    val dir = Files.createTempDirectory("graft-dump")
    val sb = new StringBuilder
    val expected = (1 to 20).map { t =>
      sb.append(s"CREATE TABLE `t$t` (\n")
      (1 to (t % 5) + 1).foreach(c => sb.append(s"  `c$c` int,\n"))
      sb.append(") ENGINE=InnoDB;\n")
      sb.append(s"INSERT INTO `t$t` VALUES\n")
      val rows = (t % 7) + 1
      (1 to rows).foreach(r => sb.append(s"($r,'x'),\n"))
      s"t$t" -> (((t % 5) + 1).toLong, rows.toLong)
    }.toMap
    val p = dir.resolve("big.sql")
    Files.writeString(p, sb.toString)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
      val df = Readers.dumpStats(spark, p.toString)
      val parts = spark.read.text(p.toString).rdd.getNumPartitions
      assert(parts > 3, s"expected many splits, got $parts")
      val got = df.as[(String, Long, Long)].collect()
        .map { case (k, c, r) => k -> ((c, r)) }.toMap
      assert(got == expected)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
