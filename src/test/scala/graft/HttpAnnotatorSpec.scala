package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.annotate.{Annotate, HttpAnnotator}
import graft.flows.ClinicalMergeFlow

/** In-JVM call counter (local-mode executors share the test JVM). */
object CountingAnnotator {
  val calls = new AtomicInteger(0)
}
final class CountingAnnotator extends graft.annotate.Annotator {
  def annotate(chrom: String, pos: Long, ref: String, alt: String)
  : (String, String, String) = {
    CountingAnnotator.calls.incrementAndGet()
    (s"G$chrom", "VC", "SUCCESS")
  }
}

/** §2.9: the HTTP-backed Annotator against an in-process server (the
  * JDK server stands in for Genome Nexus — no egress here), including
  * the retry taxonomy: 5xx retried with backoff, 4xx failed fast. */
class HttpAnnotatorSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(handler: HttpExchange => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try handler(ex) finally ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  private val summaryJson =
    """{"annotation_summary":{"transcriptConsequenceSummary":
      |{"hugoGeneSymbol":"TP53","variantClassification":"Missense_Mutation"}}}"""
      .stripMargin

  private val summariesOnlyJson =
    """{"annotation_summary":{"transcriptConsequenceSummaries":
      |[{"hugoGeneSymbol":"KRAS","variantClassification":"Nonsense_Mutation"},
      |{"hugoGeneSymbol":"WRONG","variantClassification":"x"}]}}""".stripMargin

  test("annotate parses the summary, falls back to summaries[0]") {
    withServer { ex =>
      val q = ex.getRequestURI.getPath // server-side path is decoded
      if (q.contains("17:")) respond(ex, 200, summaryJson)
      else respond(ex, 200, summariesOnlyJson)
    } { base =>
      val a = new HttpAnnotator(base)
      a.open()
      assert(a.annotate("17", 7577120L, "C", "T") ==
        (("TP53", "Missense_Mutation", "SUCCESS")))
      // no transcriptConsequenceSummary -> first of the summaries array
      assert(a.annotate("12", 25398284L, "C", "A") ==
        (("KRAS", "Nonsense_Mutation", "SUCCESS")))
      a.close()
    }
  }

  test("5xx is transient: withAnnotations retries with backoff until success") {
    val failures = new AtomicInteger(2)
    val hits = new AtomicInteger(0)
    withServer { ex =>
      hits.incrementAndGet()
      if (failures.getAndDecrement() > 0) respond(ex, 503, "")
      else respond(ex, 200, summaryJson)
    } { base =>
      val df = Seq(("17", 7577120L, "C", "T"))
        .toDF("CHROM", "POS", "REF", "ALT").repartition(1)
      val out = Annotate.withAnnotations(df, new HttpAnnotator(base),
        maxRetries = 3, backoffMs = 1L)
      val r = out.select("Hugo_Symbol", "Annotation_Status")
        .as[(String, String)].collect().head
      assert(r == (("TP53", "SUCCESS")))
      assert(hits.get() == 3) // 2 failures + 1 success
    }
  }

  test("4xx is a client error: fails fast, no retry burned") {
    val hits = new AtomicInteger(0)
    withServer { ex =>
      hits.incrementAndGet()
      respond(ex, 400, """{"error":"bad query"}""")
    } { base =>
      val df = Seq(("BAD", 1L, "N", "N"))
        .toDF("CHROM", "POS", "REF", "ALT").repartition(1)
      val out = Annotate.withAnnotations(df, new HttpAnnotator(base),
        maxRetries = 3, backoffMs = 1L)
      val r = out.select("Hugo_Symbol", "Annotation_Status")
        .as[(String, String)].collect().head
      assert(r == ((null, "FAILED")))
      assert(hits.get() == 1) // NOT 4: no retries for a client error
    }
  }

  test("withAnnotationsDistinct: API calls scale with variants, not rows") {
    CountingAnnotator.calls.set(0)
    // 120 rows over 6 distinct variants
    val df = (1 to 120).map { i =>
      val v = i % 6
      (s"S$i", v.toString, 1000L + v, "A", "T")
    }.toDF("sample", "CHROM", "POS", "REF", "ALT")
    val out = Annotate.withAnnotationsDistinct(df, new CountingAnnotator,
      maxRetries = 0, backoffMs = 1L)
    assert(out.columns.toSeq ==
      df.columns.toSeq ++ Annotate.annotationSchema.fieldNames)
    val rows = out.select("CHROM", "Hugo_Symbol").as[(String, String)]
      .collect()
    assert(rows.length == 120)
    assert(rows.forall { case (c, h) => h == s"G$c" })
    assert(CountingAnnotator.calls.get() == 6) // not 120
  }

  test("ClinicalMergeFlow end-to-end on the HTTP annotator") {
    withServer { ex => respond(ex, 200, summaryJson) } { base =>
      val clinical = Seq(
        ("Somatic", "Present", "panelA", "chr17", 7577120L, "C", "T",
          "S1", 7577120L, "Pathogenic"),
        ("Germline", "Present", "panelA", "chr1", 100L, "A", "G",
          "S1", 100L, "Benign"), // filtered: not Somatic
        ("Somatic", "Present", "panelB", "chr2", 200L, "G", "C",
          "S2", 200L, "VUS")
      ).toDF("genomic_source_category", "status", "test", "chromosome",
        "POS", "REF", "ALT",
        "Tumor_Sample_Barcode", "Start_Position",
        "reported_significance")
      val prepped = ClinicalMergeFlow.prepClinical(
        clinical, supportedTests = Seq("panelA", "panelB"))
      assert(prepped.count() == 2)
      assert(prepped.select("chromosome").as[String].collect().toSet ==
        Set("17", "2")) // chr prefix stripped
      // MAF-shape the prepped rows ("Chromosome" must replace, not
      // shadow, "chromosome" — Spark resolution is case-insensitive)
      val ready = prepped.withColumn("CHROM", col("chromosome"))
        .withColumnRenamed("chromosome", "Chromosome")
      val annotated = Annotate.withAnnotations(
        ready, new HttpAnnotator(base), maxRetries = 1, backoffMs = 1L)
      // existing megaMAF holds the same S1 variant with no significance:
      // the clinical (reported) row must win the dedup
      val existing = Seq(
        ("S1", "17", 7577120L, null: String, "OLD_GENE"))
        .toDF("Tumor_Sample_Barcode", "Chromosome", "Start_Position",
          "reported_significance", "Hugo_Symbol")
      val merged = ClinicalMergeFlow.mergeMegaMaf(existing, annotated,
        variantKey = Seq("Tumor_Sample_Barcode", "Chromosome",
          "Start_Position"))
      val rows = merged
        .select("Tumor_Sample_Barcode", "Hugo_Symbol", "reported_significance")
        .as[(String, String, String)].collect().toSet
      assert(rows == Set(
        ("S1", "TP53", "Pathogenic"), // clinical beat the existing row
        ("S2", "TP53", "VUS")))
    }
  }
}
