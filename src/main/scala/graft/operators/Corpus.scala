package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** The composed corpus-cleaning pass — what a training-data pipeline
  * actually runs over 100 TB before tokenization: cheap per-document
  * screens first (length, language, quality, repetition — one
  * projection, no shuffle), then exact dedup (one hash aggregation),
  * then MinHash-LSH near-dedup (bucketed candidates → Jaccard confirm
  * → connected components) — most-selective-cheapest first, so the
  * expensive stages only see survivors.
  *
  * Every drop is attributed: each document lands in `dropReport` under
  * its FIRST failing stage (screen order is the documented order
  * below), and near-dup's oversize-bucket skew report rides along
  * untouched. Nothing vanishes silently — at corpus scale an
  * unexplained 3% volume loss is a debugging week.
  */
object Corpus {

  /** kept: surviving documents (all input columns).
    * drops: per-document attribution (id, stage) — stage ∈ length |
    *   language | quality | repetition | exact_dup | near_dup; the
    *   audit trail ("why did doc X disappear").
    * dropReport: `drops` aggregated to (stage, n).
    * droppedBuckets: the LSH skew report (band, bucket, size).
    * All four are lazy frames sharing one lineage (no count() action
    * hides inside), pinned on two shared persisted intermediates —
    * the screened frame and the exact-dedup survivors each feed
    * multiple consumers. Call `unpersist()` when done with ALL of
    * them; the frames recompute after that. */
  final case class CleanResult(kept: DataFrame, drops: DataFrame,
                               dropReport: DataFrame,
                               droppedBuckets: DataFrame,
                               private val pinned: Seq[DataFrame]) {
    /** Release the internal caches (pairs with Dedup.dupClusters'
      * persist/unpersist discipline — a long-lived session running
      * many cleans must not accumulate corpus-sized cached frames). */
    def unpersist(): Unit = pinned.foreach(_.unpersist())
  }

  def clean(docs: DataFrame, textCol: String, idCol: String,
            langs: Seq[String] = Seq("en"),
            minWords: Int = 3, maxWords: Int = 100000,
            minQuality: Double = 0.3,
            maxDupTokenFrac: Double = 0.5,
            numHashes: Int = 8, bands: Int = 4, shingleSize: Int = 3,
            minJaccard: Double = 0.5, maxBucket: Int = 1000): CleanResult = {
    val text = col(textCol)
    // one projection computes every screen; first failing stage wins.
    // The token statistics bind once (native kernel, own alias — the
    // length and repetition screens read fields, never re-tokenize).
    val ts = col("__ts")
    val nw = ts.getField("n")
    val stage = when(nw < minWords || nw > maxWords, "length")
      .when(!TextFns.langGuess(text).isin(langs: _*), "language")
      .when(TextFns.qualityScore(text) < minQuality, "quality")
      .when(TextFns.dupFracOf(ts) > maxDupTokenFrac, "repetition")
    // Persisted: the screens (the repetition and language kernels
    // dominate) feed THREE scans — the exact-dedup populate, the
    // exact-drop anti-join's left side, and the screen-drop
    // attribution — that would each re-run every text kernel over the
    // whole corpus otherwise (measured 3 screen passes inside the
    // attribution query at sf10). MEMORY_AND_DISK: spill, don't
    // recompute.
    val staged = docs.withColumn("__ts", TextFns.tokenStats(text))
      .withColumn("__stage", stage).drop("__ts")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val screened = staged.filter(col("__stage").isNull).drop("__stage")

    // exact dedup: keep the min-id representative per content hash.
    // Persisted separately: this frame feeds the near-dedup pipeline,
    // both dedup-drop anti-joins, AND the kept output — each would
    // re-run the dedup window over the cached screens otherwise.
    val exactKept = Dedup.keepFirst(
      screened.withColumn("__ch", md5(text)), Seq("__ch"),
      Seq(col(idCol).asc)).drop("__ch")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exactDrops = screened
      .join(exactKept.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), lit("exact_dup").as("stage"))

    // near-dedup on the exact-kept survivors
    val near = Dedup.dedupByLshChecked(exactKept, textCol, idCol,
      numHashes, bands, shingleSize, minJaccard, maxBucket)
    val nearDrops = exactKept
      .join(near.deduped.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), lit("near_dup").as("stage"))

    val drops = staged.filter(col("__stage").isNotNull)
      .select(col(idCol), col("__stage").as("stage"))
      .unionByName(exactDrops).unionByName(nearDrops)
    CleanResult(near.deduped, drops,
      drops.groupBy("stage").agg(count(lit(1)).as("n")),
      near.droppedBuckets, pinned = Seq(staged, exactKept))
  }

  /** Fixed-width overlapping character chunks — the RAG / context-
    * window segmentation pass. Chunk i of a document covers
    * [i·stride, i·stride + maxChars) with stride = maxChars − overlap;
    * the last chunk may be short, empty documents emit none. Pure
    * per-row generation (explode over a closed-form count): no
    * shuffle, no state — chunking 100 TB is a map-only job that
    * parallelizes with the scan. Emits (doc_id, chunk_id,
    * chunk_start, chunk). */
  def chunk(docs: DataFrame, textCol: String, idCol: String,
            maxChars: Int, overlap: Int = 0): DataFrame = {
    require(maxChars > 0 && overlap >= 0 && overlap < maxChars,
      s"need 0 <= overlap < maxChars, got overlap=$overlap maxChars=$maxChars")
    val stride = maxChars - overlap
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("__len", length(col("__t")).cast("long"))
      .filter(col("__len") > 0)
      // n = ceil((len − overlap)/stride), min 1: the last chunk must
      // contribute characters beyond the previous chunk's window (a
      // doc shorter than maxChars is exactly one chunk)
      .withColumn("chunk_id", explode(sequence(lit(0L),
        expr(s"greatest(1L, (__len - $overlap + ${stride - 1}) div $stride) - 1"))))
      .withColumn("chunk_start", col("chunk_id") * stride)
      .withColumn("chunk",
        expr(s"substring(__t, chunk_start + 1, $maxChars)"))
      .drop("__t", "__len")
  }
}
