package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Storage

/** Price the band-signature store layouts (r15 verdict #3): the
  * `withShingleSets` layout buys the exact/hybrid confirm at a storage
  * tax (the sorted shingle set duplicated per band row) that until now
  * was described only qualitatively. This tool measures, for the
  * signature-only vs shingle-set layouts at the same recipe
  * (k=16, bands=4, shingle 3) over the documents corpus:
  *   - initial store write seconds + on-disk bytes + bytes/band-row,
  *   - one batch append seconds + incremental bytes,
  *   - compaction seconds + post-compaction bytes,
  * emitting one JSON line per layout to stdout and STORE_PRICING.json.
  * Corpus = even doc_ids, appended batch = odd doc_ids (the ingest
  * split every oracle row uses). Usage: StorePricing [sfDir] */
object StorePricing {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft_pricing_wh")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFns

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .filter(size(TextFns.tokens(col("text"))) >= 3)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val nCorpus = corpus.count()
    val nBatch = batch.count()

    def dirBytes(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) 0L
      else fs.getContentSummary(p).getLength
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val out = new StringBuilder
    Seq("signature-only" -> false, "shingle-sets" -> true).foreach {
      case (label, withSets) =>
        val tag = s"pricing_${if (withSets) "sset" else "sig"}"
        val base = sys.props("java.io.tmpdir") + s"/graft_$tag"
        spark.sql(s"DROP TABLE IF EXISTS $tag")
        val (_, wSec) = timed {
          Dedup.writeBandSignatureStore(corpus, "text", "doc_id", tag,
            s"$base/g0", buckets = buckets, numHashes = 16, bands = 4,
            shingleSize = 3, withSignatures = !withSets,
            withShingleSets = withSets)
        }
        val wBytes = dirBytes(s"$base/g0")
        val storeRows = spark.table(tag).count()
        val (_, aSec) = timed {
          Dedup.appendBandSignatures(batch, "text", "doc_id", tag,
            numHashes = 16, bands = 4, shingleSize = 3)
        }
        val aBytes = dirBytes(s"$base/g0") - wBytes
        val totalRows = spark.table(tag).count()
        val (oldPath, cSec) = timed {
          Storage.compactBucketed(spark, tag, s"$base/g1")
        }
        val cBytes = dirBytes(s"$base/g1")
        Storage.retire(spark, tag, Seq(oldPath))
        val line =
          s"""{"layout":"$label","sf_dir":"$dir","buckets":$buckets,""" +
            s""""corpus_docs":$nCorpus,"batch_docs":$nBatch,""" +
            f""""write_sec":$wSec%.1f,"write_bytes":$wBytes,""" +
            s""""store_rows":$storeRows,""" +
            f""""bytes_per_row":${wBytes.toDouble / storeRows}%.1f,""" +
            f""""append_sec":$aSec%.1f,"append_bytes":$aBytes,""" +
            s""""total_rows":$totalRows,""" +
            f""""compact_sec":$cSec%.1f,"compacted_bytes":$cBytes}"""
        println(line)
        out.append(line).append('\n')
        spark.sql(s"DROP TABLE IF EXISTS $tag")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("STORE_PRICING.json"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
