package graft

import java.nio.file.Files
import graft.annotate.{Annotate, Annotator}
import graft.sources.{Readers, Writers}

class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("maf writer round-trips through the maf reader") {
    val dir = Files.createTempDirectory("graft-maf").resolve("out").toString
    val df = Seq(
      ("TP53", 7157L, "17", 7574003L, "b1"),
      ("KRAS", 3845L, "12", 25398284L, "b2"))
      .toDF("Hugo_Symbol", "Entrez_Gene_Id", "Chromosome",
        "Start_Position", "Tumor_Sample_Barcode")
    Writers.maf(df, dir)
    val back = Readers.maf(spark, dir)
    assert(back.count() == 2)
    assert(back.columns.toSeq == df.columns.toSeq)
    assert(back.select("Hugo_Symbol").as[String].collect().toSet ==
      Set("TP53", "KRAS"))
  }

  test("gzip maf/tsv sinks: .gz on disk, transparent read-back (S9)") {
    val base = Files.createTempDirectory("graft-maf-gz")
    val mafDir = base.resolve("maf").toString
    val df = Seq(
      ("TP53", 7157L, "17", 7574003L, "b1"),
      ("KRAS", 3845L, "12", 25398284L, "b2"))
      .toDF("Hugo_Symbol", "Entrez_Gene_Id", "Chromosome",
        "Start_Position", "Tumor_Sample_Barcode")
    Writers.maf(df, mafDir, compression = "gzip")
    // the product on disk is genuinely gzipped (ref vcf_anno.py:667-687)
    val gzFiles = new java.io.File(mafDir).listFiles()
      .filter(_.getName.endsWith(".txt.gz"))
    assert(gzFiles.length == 1)
    val magic = new Array[Byte](2)
    val in = new java.io.FileInputStream(gzFiles.head)
    try { assert(in.read(magic) == 2) } finally in.close()
    assert(magic(0) == 0x1f.toByte && magic(1) == 0x8b.toByte)
    // byte-identical content after decompression vs the plain product
    val plainDir = base.resolve("maf_plain").toString
    Writers.maf(df, plainDir)
    def slurpGz(f: java.io.File): String = {
      val s = new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(f))
      try new String(s.readAllBytes(), "UTF-8") finally s.close()
    }
    val plain = new java.io.File(plainDir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".txt")).head
    assert(slurpGz(gzFiles.head) ==
      new String(Files.readAllBytes(plain.toPath), "UTF-8"))
    // gzip-transparent scan (S9): the maf reader sees the same frame
    val back = Readers.maf(spark, mafDir)
    assert(back.count() == 2 &&
      back.columns.toSeq == df.columns.toSeq)
    // tsv sink: same knob
    val tsvDir = base.resolve("tsv").toString
    Writers.tsv(df, tsvDir, nullAs = "NA", single = true,
      compression = "gzip")
    assert(new java.io.File(tsvDir).listFiles()
      .exists(_.getName.endsWith(".csv.gz")))
    val backTsv = spark.read.option("sep", "\t").option("header", "true")
      .csv(tsvDir)
    assert(backTsv.count() == 2 &&
      backTsv.columns.toSeq == df.columns.toSeq)
  }

  test("vcf writer emits ## meta + #header and round-trips") {
    val dir = Files.createTempDirectory("graft-vcf").resolve("out").toString
    val df = Seq(
      ("chr1", 100L, "v1", "A", "T", "50", "PASS", "DP=9", "GT", "0/1"))
      .toDF(Readers.vcfFixedCols :+ "S1": _*)
    Writers.vcf(df, dir)
    val lines = spark.read.text(dir).as[String].collect()
    assert(lines.head == "##fileformat=VCFv4.2")
    assert(lines.exists(_.startsWith("#CHROM\tPOS")))
    val back = Readers.vcf(spark, dir, Seq("S1"))
    assert(back.count() == 1)
    assert(back.select("POS").as[Long].collect().head == 100L)
  }

  test("S15/S16 round trip: jdbc sink + sql dump -> DbCounter all match") {
    import graft.flows.DbCounter
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // uppercase names: Derby folds unquoted identifiers to upper case
    val patient = Seq((1L, "Alice O'Hara", 34), (2L, "Bob", 41),
      (3L, null.asInstanceOf[String], 9))
      .toDF("ID", "NAME", "AGE")
    val sample = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("SID", "PATIENT_ID")
    Writers.jdbc(patient, url, "PATIENT", props)
    Writers.jdbc(sample, url, "SAMPLE", props)

    val dumpDir = java.nio.file.Files
      .createTempDirectory("graft_dump").toString + "/dump.sql"
    Writers.sqlDump(Seq("PATIENT" -> patient, "SAMPLE" -> sample),
      "graftdb", dumpDir, orderBy = Seq("ID"))

    // quote-escaping survives: O'Hara -> 'Alice O''Hara'
    val text = spark.read.text(dumpDir).as[String].collect()
    assert(text.exists(_.contains("'Alice O''Hara'")))
    assert(text.count(_.startsWith("USE ")) == 1)

    // a newline inside a value would tear the one-statement-per-line
    // grammar — must abort loudly, never write a corrupt dump
    val torn = Seq((1L, "line1\nline2")).toDF("ID", "NAME")
    val err = intercept[Exception] {
      Writers.sqlDump(Seq("T" -> torn), "graftdb",
        java.nio.file.Files.createTempDirectory("graft_dump_bad")
          .toString + "/bad.sql")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("control character")),
      messages(err).mkString(" | "))

    val dump = DbCounter.dumpCounts(spark, dumpDir)
    val db = DbCounter.dbCounts(spark, url, props, Seq("PATIENT", "SAMPLE"))
    val recon = DbCounter.reconcile(dump, db)
      .select("table_name", "columns_match", "rows_match")
      .as[(String, Boolean, Boolean)].collect()
    assert(recon.length == 2 && recon.forall(r => r._2 && r._3),
      recon.mkString(", "))

    // S17 synergy: header strip removes exactly the USE/CREATE DATABASE lines
    val stripped = Readers.stripDumpHeaders(spark, dumpDir).count()
    assert(stripped == text.length - 2)
  }

  test("annotator close() fires when the iterator is abandoned mid-stream") {
    WritersSpec.probeOpens.set(0)
    WritersSpec.probeCloses.set(0)
    class Probe extends Annotator {
      def annotate(c: String, p: Long, r: String, a: String) =
        ("G", "Missense_Mutation", "SUCCESS")
      override def open(): Unit = { WritersSpec.probeOpens.incrementAndGet(); () }
      override def close(): Unit = { WritersSpec.probeCloses.incrementAndGet(); () }
    }
    val df = (1L to 200L).map(i => ("chr1", i, "A", "T"))
      .toDF("CHROM", "POS", "REF", "ALT").repartition(2)
    // limit(1) abandons the partition iterator after one row — the
    // old exhaustion-based close never fired here
    val one = Annotate.withAnnotations(df, new Probe).limit(1).collect()
    assert(one.length == 1)
    // task-completion listeners run at task end; poll briefly
    val deadline = System.nanoTime() + 5e9.toLong
    while (WritersSpec.probeCloses.get() < WritersSpec.probeOpens.get() &&
           System.nanoTime() < deadline) Thread.sleep(50)
    val (o, c) = (WritersSpec.probeOpens.get(), WritersSpec.probeCloses.get())
    assert(o >= 1 && c == o, s"opens=$o closes=$c")
  }

  test("annotator retry: transient failures retried, terminal gives FAILED") {
    // fails twice for chr1 then succeeds; always fails for chr9
    class Flaky extends Annotator {
      @transient private var counts = scala.collection.mutable.Map[String, Int]()
      override def open(): Unit = { counts = scala.collection.mutable.Map() }
      def annotate(c: String, p: Long, r: String, a: String) = {
        if (c == "chr9") throw new RuntimeException("always down")
        val n = counts.getOrElse(c, 0); counts(c) = n + 1
        if (n < 2) throw new RuntimeException("transient")
        ("GENE_OK", "Missense_Mutation", "SUCCESS")
      }
    }
    val df = Seq(
      ("chr1", 10L, "A", "T"), ("chr9", 20L, "G", "C"))
      .toDF("CHROM", "POS", "REF", "ALT").repartition(1)
    val got = Annotate.withAnnotations(df, new Flaky, maxRetries = 3,
      backoffMs = 1L)
      .select("CHROM", "Annotation_Status")
      .as[(String, String)].collect().toMap
    assert(got == Map("chr1" -> "SUCCESS", "chr9" -> "FAILED"))
  }
}

object WritersSpec {
  // static probes: local-mode executors share the JVM, so task-side
  // lifecycle hooks are observable here
  val probeOpens = new java.util.concurrent.atomic.AtomicInteger(0)
  val probeCloses = new java.util.concurrent.atomic.AtomicInteger(0)
}
