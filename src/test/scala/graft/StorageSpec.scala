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

  test("appendBucketed: folds a batch in under the catalog spec; bucketed join still exchange-free") {
    val dir = Files.createTempDirectory("graft-append")
    val gen0 = (1 to 500).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val gen1 = (501 to 800).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    Storage.writeBucketed(gen0, "ap_t", s"$dir/t", Seq("k"), buckets = 8)
    try {
      Storage.appendBucketed(spark, gen1, "ap_t")
      val t = spark.table("ap_t")
      assert(t.count() == 800)
      // both generations present
      assert(t.filter(col("v") > 500).count() == 300)
      // join on the bucket key stays exchange-free across generations
      val other = (1 to 100).map(i => (i.toLong % 50, i.toLong)).toDF("k", "w")
      Storage.writeBucketed(other, "ap_o", s"$dir/o", Seq("k"), buckets = 8)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.table("ap_t").join(spark.table("ap_o"), Seq("k"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"appended bucketed join should not shuffle:\n$plan")
        assert(joined.count() ==
          gen0.unionAll(gen1).join(other, Seq("k")).count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      // non-bucketed table refuses loudly
      (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v")
        .write.mode("overwrite").option("path", s"$dir/plain")
        .saveAsTable("ap_plain")
      intercept[IllegalArgumentException] {
        Storage.appendBucketed(spark, gen1, "ap_plain")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS ap_t")
      spark.sql("DROP TABLE IF EXISTS ap_o")
      spark.sql("DROP TABLE IF EXISTS ap_plain")
    }
  }

  test("compactBucketed: N appends collapse to one file per bucket; probe plan and rows invariant") {
    val dir = Files.createTempDirectory("graft-compact")
    val gen0 = (1 to 400).map(i => (i.toLong % 32, i.toLong)).toDF("k", "v")
    Storage.writeBucketed(gen0, "cp_t", s"$dir/t0", Seq("k"), buckets = 4)
    try {
      // three appended generations -> up to 4 files per bucket
      for (g <- 1 to 3) {
        val gen = (g * 1000 + 1 to g * 1000 + 100)
          .map(i => (i.toLong % 32, i.toLong)).toDF("k", "v")
        Storage.appendBucketed(spark, gen, "cp_t")
      }
      val before = spark.table("cp_t").orderBy("k", "v").collect()
      def parquetFiles(p: String) = new java.io.File(p).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(parquetFiles(s"$dir/t0") > 4,
        "appends should have accumulated files")
      val probe = (1 to 50).map(i => (i.toLong % 32, i.toLong)).toDF("k", "w")
      Storage.writeBucketed(probe, "cp_p", s"$dir/p", Seq("k"), buckets = 4)
      def probePlan(): String = {
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.table("cp_t").join(spark.table("cp_p"), Seq("k"))
            .queryExecution.executedPlan.toString
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
      val planBefore = probePlan()
      val oldPath = Storage.compactBucketed(spark, "cp_t", s"$dir/t1")
      assert(oldPath.contains("t0"), s"old generation path: $oldPath")
      // one file per bucket, same rows, probe plan shape invariant
      assert(parquetFiles(s"$dir/t1") == 4,
        s"expected 4 files, got ${parquetFiles(s"$dir/t1")}")
      val after = spark.table("cp_t").orderBy("k", "v").collect()
      assert(after.toSeq == before.toSeq)
      val planAfter = probePlan()
      assert(!planAfter.contains("Exchange hashpartitioning"), planAfter)
      assert(planBefore.contains("Bucketed: true") &&
        planAfter.contains("Bucketed: true"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cp_t")
      spark.sql("DROP TABLE IF EXISTS cp_p")
      spark.sql("DROP TABLE IF EXISTS cp_t_compacting")
    }
  }

  test("append + compactBucketed preserve PARTITION columns on a partitioned+bucketed table") {
    val dir = Files.createTempDirectory("graft-partbk")
    val gen0 = (1 to 200).map(i =>
      (i.toLong % 16, i.toLong, (i % 2).toString)).toDF("k", "v", "shard")
    Storage.writeBucketed(gen0, "pb_t", s"$dir/t0", Seq("k"), buckets = 4,
      partitionKeys = Seq("shard"))
    try {
      val gen1 = (201 to 300).map(i =>
        (i.toLong % 16, i.toLong, (i % 2).toString)).toDF("k", "v", "shard")
      Storage.appendBucketed(spark, gen1, "pb_t")
      assert(spark.table("pb_t").count() == 300)
      val oldPath = Storage.compactBucketed(spark, "pb_t", s"$dir/t1")
      assert(oldPath.contains("t0"))
      assert(spark.table("pb_t").count() == 300)
      // the new generation still has partition directories (pruning
      // survives compaction), and partition filters prune in the scan
      val dirs1 = new java.io.File(s"$dir/t1").listFiles()
        .map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(dirs1.toSeq == Seq("shard=0", "shard=1"), dirs1.toSeq.toString)
      val scan = spark.table("pb_t").filter(col("shard") === "1")
        .queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("shard"),
        scan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS pb_t")
      spark.sql("DROP TABLE IF EXISTS pb_t_compacting")
    }
  }

  test("compactBucketed swap: a frame planned BEFORE the swap still executes after it; old path survives until retire") {
    val dir = Files.createTempDirectory("graft-swap")
    val gen0 = (1 to 300).map(i => (i.toLong % 16, i.toLong)).toDF("k", "v")
    Storage.writeBucketed(gen0, "sw_t", s"$dir/t0", Seq("k"), buckets = 4)
    try {
      Storage.appendBucketed(spark,
        (301 to 400).map(i => (i.toLong % 16, i.toLong)).toDF("k", "v"), "sw_t")
      // plan (resolve + list files) against the OLD generation
      val preplanned = spark.table("sw_t").filter(col("v") <= 400)
      preplanned.queryExecution.executedPlan // force planning now
      val oldPath = Storage.compactBucketed(spark, "sw_t", s"$dir/t1")
      // the swap never deletes the old generation's files, so the
      // pre-planned frame still executes correctly after the swap
      assert(preplanned.count() == 400)
      assert(new java.io.File(oldPath.stripPrefix("file:")).exists())
      // retire deletes the returned old generation but REFUSES the live one
      val live = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("sw_t"))
        .location.toString
      intercept[IllegalArgumentException] {
        Storage.retire(spark, "sw_t", Seq(live))
      }
      // keepLast retains the newest entries of the retired list
      assert(Storage.retire(spark, "sw_t", Seq(oldPath), keepLast = 1).isEmpty)
      val deleted = Storage.retire(spark, "sw_t", Seq(oldPath))
      assert(deleted == Seq(oldPath))
      assert(!new java.io.File(oldPath.stripPrefix("file:")).exists())
      // idempotent: a second retire of a gone path is a no-op
      assert(Storage.retire(spark, "sw_t", Seq(oldPath)).isEmpty)
      assert(spark.table("sw_t").count() == 400)
    } finally {
      spark.sql("DROP TABLE IF EXISTS sw_t")
      spark.sql("DROP TABLE IF EXISTS sw_t_compacting")
      spark.sql("DROP TABLE IF EXISTS sw_t_precompact")
    }
  }

  test("append crash-safety: recoverToManifest deletes stray files a failed append left, keeps committed ones") {
    val dir = Files.createTempDirectory("graft-recover")
    val gen0 = (1 to 200).map(i => (i.toLong % 8, i.toLong)).toDF("k", "v")
    Storage.writeBucketed(gen0, "rc_t", s"$dir/t", Seq("k"), buckets = 4)
    try {
      // writeBucketed does not write a manifest; recovery refuses
      intercept[IllegalArgumentException] {
        Storage.recoverToManifest(spark, "rc_t")
      }
      Storage.appendBucketed(spark,
        (201 to 300).map(i => (i.toLong % 8, i.toLong)).toDF("k", "v"), "rc_t")
      val committedRows = spark.table("rc_t").count()
      assert(committedRows == 300)
      // simulate a crashed append: a partial generation's file becomes
      // visible with no manifest update (copy an existing data file
      // under a fresh part- name), plus _temporary litter
      val tblDir = new java.io.File(s"$dir/t")
      val aFile = tblDir.listFiles().filter(_.getName.endsWith(".parquet")).head
      // keep the _000NN bucket suffix — bucketed reads parse it from
      // the file name, exactly as a real interrupted append would
      val stray = new java.io.File(tblDir,
        aFile.getName.replaceFirst("^part-\\d+", "part-99999"))
      java.nio.file.Files.copy(aFile.toPath, stray.toPath)
      new java.io.File(tblDir, "_temporary/0").mkdirs()
      spark.catalog.refreshTable("rc_t")
      assert(spark.table("rc_t").count() > committedRows,
        "stray file should be visible before recovery")
      val deleted = Storage.recoverToManifest(spark, "rc_t")
      assert(deleted.exists(_.contains("part-99999")), deleted.toString)
      assert(deleted.exists(_.contains("_temporary")), deleted.toString)
      assert(!stray.exists())
      assert(spark.table("rc_t").count() == committedRows)
      // clean store: recovery is a no-op
      assert(Storage.recoverToManifest(spark, "rc_t").isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS rc_t")
  }

  test("qualified table names: append and compact work on db.tbl") {
    val dir = Files.createTempDirectory("graft-qual")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_qdb")
    val gen0 = (1 to 100).map(i => (i.toLong % 8, i.toLong)).toDF("k", "v")
    Storage.writeBucketed(gen0, "graft_qdb.q_t", s"$dir/t0", Seq("k"), buckets = 2)
    try {
      Storage.appendBucketed(spark,
        (101 to 150).map(i => (i.toLong % 8, i.toLong)).toDF("k", "v"),
        "graft_qdb.q_t")
      assert(spark.table("graft_qdb.q_t").count() == 150)
      val oldPath = Storage.compactBucketed(spark, "graft_qdb.q_t", s"$dir/t1")
      assert(oldPath.contains("t0"))
      assert(spark.table("graft_qdb.q_t").count() == 150)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_qdb.q_t")
      spark.sql("DROP TABLE IF EXISTS graft_qdb.q_t_compacting")
      spark.sql("DROP TABLE IF EXISTS graft_qdb.q_t_precompact")
      spark.sql("DROP DATABASE IF EXISTS graft_qdb")
    }
  }

  test("writer lease: mutual exclusion, loud holder-naming failure, TTL break, fenced release") {
    val dir = Files.createTempDirectory("graft-lease")
    val gen0 = (1L to 10L).map(i => (i % 4, i)).toDF("k", "v")
    Storage.writeBucketed(gen0, "ls_t", s"$dir/t", Seq("k"), buckets = 2)
    try {
      val a = Storage.acquireWriterLease(spark, "ls_t", "jobA")
      // a second writer fails LOUDLY, naming the holder — never a
      // silent interleave of two non-transactional appends
      val ex = intercept[IllegalStateException] {
        Storage.acquireWriterLease(spark, "ls_t", "jobB")
      }
      assert(ex.getMessage.contains("jobA") && ex.getMessage.contains("ls_t"))
      // release frees the table for the next writer
      assert(Storage.releaseWriterLease(spark, a))
      val b = Storage.acquireWriterLease(spark, "ls_t", "jobB")
      // a crashed holder's lease is broken once its TTL passes...
      Thread.sleep(20)
      val c = Storage.acquireWriterLease(spark, "ls_t", "jobC", ttlMs = 5)
      // ...and the dispossessed holder is FENCED: it cannot release the
      // successor's lease, and renewing its own aborts loudly (the
      // signal to abandon its in-flight append)
      assert(!Storage.releaseWriterLease(spark, b))
      val lost = intercept[IllegalStateException] {
        Storage.renewWriterLease(spark, b)
      }
      assert(lost.getMessage.contains("lost") &&
        lost.getMessage.contains("jobC"))
      // the successor's lease renews and releases normally
      Storage.renewWriterLease(spark, c)
      assert(Storage.releaseWriterLease(spark, c))
      // the bracket releases on failure too — no leaked lease
      intercept[RuntimeException] {
        Storage.withWriterLease(spark, "ls_t", "jobD") {
          throw new RuntimeException("append blew up")
        }
      }
      val d = Storage.acquireWriterLease(spark, "ls_t", "jobE")
      assert(Storage.releaseWriterLease(spark, d))
      // releasing an already-gone lease is a no-op, not an error
      assert(!Storage.releaseWriterLease(spark, d))
    } finally spark.sql("DROP TABLE IF EXISTS ls_t")
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
