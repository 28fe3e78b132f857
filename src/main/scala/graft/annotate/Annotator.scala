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

object Annotate {

  val annotationSchema: StructType = StructType(Seq(
    StructField("Hugo_Symbol", StringType),
    StructField("Variant_Classification", StringType),
    StructField("Annotation_Status", StringType)))

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
