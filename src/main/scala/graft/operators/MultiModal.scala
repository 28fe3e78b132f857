package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star op).
  *
  * Images/audio/video travel as opaque `binary` columns next to typed
  * metadata structs. The decode step itself is STUBBED (this container
  * has no image/audio libs — see the builder brief): `decodeStub`
  * derives deterministic fake dimensions from a content hash, while
  * `decodeBatch` shows the real partition-wise plumbing (one decoder
  * instance per partition, rows streamed through it) that a JNI/
  * library-backed decoder would drop into.
  *
  * At 100 TB the binary payloads dominate I/O: keep them in their own
  * parquet column (never in a struct with hot columns) so column
  * pruning skips them, and size partitions by bytes not rows
  * (`spark.sql.files.maxPartitionBytes`).
  */
object MultiModal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Pack a string column into the opaque binary payload column (the
    * test stand-in for reading real media bytes via
    * `spark.read.format("binaryFile")`). */
  def attachBinary(df: DataFrame, srcCol: String,
                   binCol: String = "content"): DataFrame =
    df.withColumn(binCol, col(srcCol).cast("binary"))

  /** Column-expression stub decode: metadata derived from the payload
    * hash — codegen'd, deterministic, oracle-checkable. */
  def decodeStub(df: DataFrame, binCol: String = "content"): DataFrame = {
    val h = graft.functions.ColumnFns.hash60(col(binCol).cast("string"))
    df.withColumn("meta", struct(
      length(col(binCol)).cast("long").as("n_bytes"),
      (h % 640).as("width"),
      (h % 480).as("height"),
      lit("stub").as("format")))
  }

  /** Feature extraction stub: a fixed-length feature vector from the
    * payload (here: byte histogram over 16 buckets, normalized —
    * deterministic and cheap; a real embedding model slots into the
    * same `binary → array<double>` signature via mapPartitions). */
  def featureExtractStub(df: DataFrame, binCol: String = "content",
                         dim: Int = 16): DataFrame =
    df.withColumn("features", {
      val bytes = col(binCol)
      // hex renders 2 chars per byte, so the histogram counts each
      // nibble (high AND low) — normalize by 2n so features sum to 1
      val nNibbles = greatest(length(bytes) * 2, lit(1)).cast("double")
      array((0 until dim).map { b =>
        (length(regexp_replace(hex(bytes), s"[^${b.toHexString.toUpperCase}]", ""))
          .cast("double") / nNibbles).as(s"f$b")
      }: _*)
    })

  /** Resize plumbing: metadata-only transform (the stub has no pixels)
    * — records the target geometry the real resizer would apply while
    * keeping aspect bookkeeping honest. */
  def resizeMeta(df: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("meta.width"),
      lit(maxH.toDouble) / col("meta.height"), lit(1.0))
    df.withColumn("resized", struct(
      floor(col("meta.width") * scale).cast("long").as("width"),
      floor(col("meta.height") * scale).cast("long").as("height"),
      round(scale, 6).as("scale")))
  }

  /** Frame-sampling plumbing for video-shaped payloads: deterministic
    * every-k offsets into the (stub) frame count; output is the
    * exploded (doc, frame_idx) long table a real frame decoder
    * would populate. */
  def frameSample(df: DataFrame, frameCountCol: String,
                  every: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(frameCountCol) - 1, lit(0)),
        lit(every))))

  /** Partition-wise decode: the real-media shape. One decoder per
    * partition, rows streamed through `mapPartitions` — this is where
    * an actual image library call would live (`???` branch marked). */
  def decodeBatch(df: DataFrame, binCol: String = "content",
                  realDecoder: Boolean = false): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("meta", imageMetaSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition decoder lifecycle: init once, stream rows through
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta: Row =
          if (realDecoder) ??? // real image/audio decode goes here
          else if (bytes == null) null
          else {
            val h = java.lang.Long.parseLong(
              org.apache.commons.codec.digest.DigestUtils
                .md5Hex(bytes).substring(0, 15), 16)
            Row(bytes.length.toLong, h % 640, h % 480, "stub")
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(Encoders.row(outSchema))
  }
}
