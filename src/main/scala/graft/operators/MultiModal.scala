package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star op).
  *
  * Images/audio/video travel as opaque `binary` columns next to typed
  * metadata structs. Image decode is REAL (`decodeBatch(realDecoder =
  * true)`: JDK `javax.imageio` header read — PNG/JPEG/GIF/BMP width,
  * height, format without decoding pixels); audio/video decode and
  * pixel-level ops remain stubbed (this container has no media libs):
  * `decodeStub` derives deterministic fake dimensions from a content
  * hash, and undecodable payloads fall back to the same stub metadata
  * so downstream geometry ops keep working.
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

  /** Stub metadata: deterministic fake dimensions from a content hash
    * (same formula as `decodeStub`'s Column form). */
  private def stubMeta(bytes: Array[Byte]): Row = {
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(bytes).substring(0, 15), 16)
    Row(bytes.length.toLong, h % 640, h % 480, "stub")
  }

  /** Real image header decode via JDK `javax.imageio` — width/height/
    * format WITHOUT decoding pixels (`ImageReader.getWidth(0)` reads
    * only the header), so the per-row cost is a few hundred bytes of
    * parsing no matter how large the payload. Returns null when no
    * registered reader recognizes the bytes. */
  private def imageHeaderMeta(bytes: Array[Byte]): Row = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    if (iis == null) return null // no SPI could wrap these bytes
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) null
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Row(bytes.length.toLong, r.getWidth(0).toLong,
            r.getHeight(0).toLong, r.getFormatName.toLowerCase)
        } finally r.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** Partition-wise decode: the real-media shape — rows streamed
    * through `mapPartitions`, decoder state per partition not per row.
    * `realDecoder = true` reads true image headers (PNG/JPEG/GIF/BMP,
    * javax.imageio ships with the JDK); bytes no reader recognizes
    * fall back to the deterministic stub metadata (format = "stub"),
    * the path non-image media keeps until a real audio/video library
    * is linked in. */
  def decodeBatch(df: DataFrame, binCol: String = "content",
                  realDecoder: Boolean = false): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("meta", imageMetaSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition decoder lifecycle: init once, stream rows through
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in tasks
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta: Row =
          if (bytes == null) null
          else if (realDecoder) {
            val real = imageHeaderMeta(bytes)
            if (real != null) real else stubMeta(bytes)
          } else stubMeta(bytes)
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(Encoders.row(outSchema))
  }
}
