package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed records for the stable row shapes (SURVEY.md §1.1: Dataset[T]
  * where compile-time safety pays — manifest rows, segments, MAF rows;
  * everything schema-dynamic stays DataFrame).
  */
final case class ManifestRow(sample_id: String, s3_url: String,
                             file_name: String, md5sum: String,
                             file_size: Long)

/** The 12-column segment record (cnv.py:16 SEGMENT_COLUMNS_COUNT). */
final case class Segment(participant: String, sample_id: String,
                         chrom: String, start: Long, end: Long,
                         length: Long, log2ratio: Double,
                         num_points: Long, num_reads: Long,
                         log2_p_value: Double, log2_ci_low: Double,
                         log2_ci_high: Double)

final case class MafRow(Hugo_Symbol: String, Entrez_Gene_Id: Option[Long],
                        Chromosome: String, Start_Position: Long,
                        End_Position: Long, Reference_Allele: String,
                        Tumor_Seq_Allele2: String,
                        Tumor_Sample_Barcode: String,
                        Variant_Classification: String,
                        Annotation_Status: String)

object Typed {
  /** Typed view over the CNV segment reader. */
  def cnvSegments(spark: SparkSession, path: String): Dataset[Segment] = {
    import spark.implicits._
    graft.sources.Readers.cnvSegments(spark, path).as[Segment]
  }

  def manifest(spark: SparkSession, path: String): Dataset[ManifestRow] = {
    import spark.implicits._
    graft.sources.Readers.tsv(spark, path,
      Some(implicitly[org.apache.spark.sql.Encoder[ManifestRow]].schema))
      .as[ManifestRow]
  }
}
