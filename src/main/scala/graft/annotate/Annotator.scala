package graft.annotate

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pluggable variant annotation (SURVEY.md §2.9): the reference calls
  * Genome Nexus per-row over HTTP (mci:51-160) or per-file via a jar
  * (vcf_anno.py:308-337). Here annotation is an effectful
  * `mapPartitions` stage behind a trait — one client per partition,
  * bounded parallelism = partition count, retry/throttle inside the
  * partition loop, never a Catalyst UDF (needs lifecycle + retry
  * semantics Catalyst can't see).
  */
trait Annotator extends Serializable {
  /** Annotate one variant; fields are HGVS-ish strings. Returns
    * (hugoSymbol, variantClassification, status). */
  def annotate(chrom: String, pos: Long, ref: String, alt: String)
  : (String, String, String)

  /** Client lifecycle hooks — called once per partition. */
  def open(): Unit = ()
  def close(): Unit = ()
}

/** Deterministic mock for tests/CI (the public API is unreachable in
  * this environment, and must be mockable regardless — §7.4 item 6). */
final class MockAnnotator extends Annotator {
  def annotate(chrom: String, pos: Long, ref: String, alt: String)
  : (String, String, String) = {
    val h = Math.floorMod((chrom + pos + ref + alt).hashCode, 1000)
    (s"GENE$h", if (ref.length == alt.length) "Missense_Mutation"
    else "Frame_Shift_Del", "SUCCESS")
  }
}

/** HTTP-backed annotator modeled on the reference's Genome Nexus
  * client (mci_clinical_variant_merge.py:51-160): one GET per variant
  * against `baseUrl/annotation/{chrom}:g.{pos}{ref}>{alt}`, JSON
  * response summarized to (hugoGeneSymbol, variantClassification)
  * from `annotation_summary.transcriptConsequenceSummary` with a
  * first-of-`transcriptConsequenceSummaries` fallback (the reference's
  * less-stringent second pass, mci:117-130).
  *
  * Retry taxonomy follows vcf_anno.py:92-108: connection/TLS/server
  * trouble (IOException incl. SSLException, HTTP 5xx, timeouts) is
  * TRANSIENT — thrown plain so `Annotate.withAnnotations` retries
  * with backoff; an HTTP 4xx is a CLIENT error — thrown as
  * `Annotate.NonRetryable` so the row fails fast without burning the
  * retry budget. One client per partition (`open`), reused across
  * rows; `close` drops it (idempotent — the lifecycle contract).
  */
final class HttpAnnotator(baseUrl: String,
                          timeoutMs: Long = 10000L) extends Annotator {
  @transient private var client: java.net.http.HttpClient = _
  @transient private var mapper: com.fasterxml.jackson.databind.ObjectMapper = _

  override def open(): Unit = {
    client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  }
  override def close(): Unit = { client = null; mapper = null }

  def annotate(chrom: String, pos: Long, ref: String, alt: String)
  : (String, String, String) = {
    if (client == null) open() // tolerate use outside mapPartitions
    val query = java.net.URLEncoder.encode(
      s"$chrom:g.$pos$ref>$alt", "UTF-8")
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(
        s"$baseUrl/annotation/$query?fields=annotation_summary"))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case ok if ok / 100 == 2 => parse(resp.body())
      case clientErr if clientErr / 100 == 4 =>
        throw new Annotate.NonRetryable(
          s"HTTP $clientErr for $chrom:$pos$ref>$alt")
      case other =>
        throw new java.io.IOException(
          s"HTTP $other for $chrom:$pos$ref>$alt")
    }
  }

  private def parse(body: String): (String, String, String) = {
    val ann = mapper.readTree(body).path("annotation_summary")
    val primary = ann.path("transcriptConsequenceSummary")
    val chosen =
      if (!primary.isMissingNode && !primary.isNull) primary
      else ann.path("transcriptConsequenceSummaries").path(0)
    (chosen.path("hugoGeneSymbol").asText(null),
      chosen.path("variantClassification").asText(null),
      "SUCCESS")
  }
}

object Annotate {

  /** A client-side error (HTTP 4xx): the request itself is wrong, so
    * retrying cannot help — the reference raises ClientError through
    * while retrying only connection/TLS trouble (vcf_anno.py:92-108). */
  final class NonRetryable(msg: String) extends RuntimeException(msg)

  val annotationSchema: StructType = StructType(Seq(
    StructField("Hugo_Symbol", StringType),
    StructField("Variant_Classification", StringType),
    StructField("Annotation_Status", StringType)))

  /** Annotate only the DISTINCT (CHROM, POS, REF, ALT) variants, then
    * join the results back onto every carrying row. At cohort scale
    * the same variant recurs across thousands of samples; the API
    * budget must scale with the VARIANT space, not the row count —
    * the reference pays one call per clinical row (mci:163-183), which
    * does not survive 100×. The distinct set is dimension-sized, so
    * the join back is broadcastable (Catalyst decides from stats; AQE
    * converts at runtime otherwise). Output column order matches
    * `withAnnotations`. */
  def withAnnotationsDistinct(df: DataFrame, annotator: Annotator,
                              maxRetries: Int = 3, throttleMs: Long = 0L,
                              backoffMs: Long = 1000L): DataFrame = {
    val keyCols = Seq("CHROM", "POS", "REF", "ALT")
    val annotated = withAnnotations(
      df.select(keyCols.map(df.apply): _*).distinct(),
      annotator, maxRetries, throttleMs, backoffMs)
    df.join(annotated, keyCols, "left")
      .select((df.columns ++ annotationSchema.fieldNames).map(col).toSeq: _*)
  }

  /** Effectful annotation stage: df must carry CHROM/POS/REF/ALT.
    * `maxRetries`/`throttleMs` reproduce the reference's client
    * discipline (X4/X5: retries w/ backoff, 1s throttle) inside each
    * partition — parallelism is bounded by partition count, so
    * repartition(n) IS the rate control. */
  def withAnnotations(df: DataFrame, annotator: Annotator,
                      maxRetries: Int = 3, throttleMs: Long = 0L,
                      backoffMs: Long = 1000L): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ annotationSchema.fields)
    val (iC, iP, iR, iA) = (df.schema.fieldIndex("CHROM"),
      df.schema.fieldIndex("POS"), df.schema.fieldIndex("REF"),
      df.schema.fieldIndex("ALT"))
    df.mapPartitions { rows =>
      annotator.open()
      // close() must fire even when the iterator is NOT drained (a
      // downstream limit() or a task kill abandons it mid-stream) —
      // tie the client lifecycle to the task, not the iterator
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx != null) ctx.addTaskCompletionListener[Unit](_ => annotator.close())
      val out = rows.map { r =>
        var attempt = 0
        var res: (String, String, String) = null
        while (res == null) {
          try {
            if (throttleMs > 0) Thread.sleep(throttleMs)
            res = annotator.annotate(r.getString(iC), r.getLong(iP),
              r.getString(iR), r.getString(iA))
          } catch {
            case _: NonRetryable => // client error: fail fast, no retry
              res = (null, null, "FAILED")
            case e: Exception if attempt < maxRetries =>
              attempt += 1
              Thread.sleep(math.min(backoffMs << attempt, backoffMs * 10))
            case _: Exception =>
              res = (null, null, "FAILED")
          }
        }
        Row.fromSeq(r.toSeq ++ Seq(res._1, res._2, res._3))
      }
      // also close on clean exhaustion (driver-side local iterators
      // have no TaskContext); double-close is the Annotator's contract
      // to tolerate (idempotent close)
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h && ctx == null) annotator.close()
          h
        }
        def next(): Row = out.next()
      }
    }(Encoders.row(outSchema))
  }
}
