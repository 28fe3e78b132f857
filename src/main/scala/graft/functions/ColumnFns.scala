package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function layer — SURVEY.md §2.7 (F1–F16) re-expressed as pure
  * `Column` helpers so every use stays inside whole-stage codegen (no
  * Scala UDFs on the hot path).
  *
  * Reference citations are to CBIIT/ChildhoodCancerDataInitiative-
  * cBioPortal-Workflows at /root/reference (read-only).
  */
object ColumnFns {

  // ---- F1: literal strip/replace (cnv.py:282,448; mci:41,285-289) ----

  /** Strip a leading "chr" prefix: 'chr7' -> '7' (cnv.py:282). */
  def chrStrip(c: Column): Column = regexp_replace(c, "^chr", "")

  /** Strip a trailing ".0" left by float round-trips (mci:285-289).
    * With real int types this is a no-op, kept for format fidelity. */
  def dotZeroStrip(c: Column): Column = regexp_replace(c, "\\.0$", "")

  // ---- F2: prefix concat (cnv.py:404,690) ----
  def chrPrefix(c: Column): Column = concat(lit("chr"), c)

  // ---- F3: regex field extract from KEY=val;... INFO strings ----
  // (pedmatch-clinical-vcf-workflow.py:118-121,203-205)
  def infoField(info: Column, key: String): Column =
    regexp_extract(info, key + "=([^;]+)", 1)

  // ---- F12: null-safe variant — "NA" on null input (pedmatch:378-413) ----
  def infoFieldNa(info: Column, key: String): Column =
    when(info.isNull, lit("NA")).otherwise(infoField(info, key))

  // ---- F4: delimiter split + positional pick (pedmatch:378-413) ----
  /** ANSI-safe positional pick: null (not an error) past the end. */
  def splitIdx(c: Column, sep: String, i: Int): Column =
    get(split(c, java.util.regex.Pattern.quote(sep)), lit(i))

  /** Last `sep`-delimited token, e.g. FT = FORMAT-packed last field. */
  def splitLast(c: Column, sep: String): Column =
    element_at(split(c, java.util.regex.Pattern.quote(sep)), -1)

  /** FORMAT-packed genotype extracts (pedmatch:378-413): GT idx 0,
    * DP idx 2, FRO idx 5, FAO idx 7, AF idx 8, FT last. */
  def formatField(sampleCol: Column, idx: Int): Column =
    when(sampleCol.isNull, lit("NA"))
      .otherwise(coalesce(splitIdx(sampleCol, ":", idx), lit("NA")))

  // ---- F5: GTF attribute parse (cnv.py:360-368) ----
  /** From `key "value"; key2 "v2";...` pull every gene_name value,
    * quote-stripped, ";"-joined when multiple. Higher-order funcs only. */
  def gtfAttr(attrs: Column, key: String): Column =
    array_join(
      transform(
        filter(split(attrs, ";"), x => x.contains(key)),
        x => regexp_extract(x, "\"([^\"]+)\"", 1)),
      ";")

  // ---- F6: basename / URL parse (cnv.py:98-99; vcf_anno.py:83-84) ----
  def basename(c: Column): Column = element_at(split(c, "/"), -1)
  def s3Bucket(url: Column): Column = split(url, "/").getItem(2)
  def s3Key(url: Column): Column = regexp_replace(url, "^s3://[^/]+/", "")

  // ---- F7: filename rewriting (vcf_anno.py:425; pedmatch:495) ----
  def vcfToMafName(c: Column): Column =
    regexp_replace(c, "\\.vcf(\\.gz)?$", "_annotated.maf")

  // ---- F8: log2 copy ratio (pedmatch:73-87) ----
  /** round(log2(cn/2), 4); reference raises on cn<=0 — callers guard
    * with a filter or `raise_error` pre-check. */
  def log2Ratio(cn: Column): Column = round(log2(cn / lit(2.0)), 4)

  // ---- F9: GISTIC 5-way binning (cnv.py:465-481, eval order matters) ----
  def gisticBin(log2: Column): Column =
    when(log2 > 2.0, 2)
      .when(log2 > 0.3, 1)
      .when(log2 < -1.0, -2)
      .when(log2 < -0.3, -1)
      .otherwise(0)

  // ---- F10: interval arithmetic (cnv.py:375,382,697; vcf_anno.py:292) ----
  def intervalLength(start: Column, end: Column): Column = end - start
  def bedStart(oneBased: Column): Column = oneBased - 1
  /** End_Position = Start_Position + len(REF) - 1 (vcf_anno.py:292-303). */
  def endPosition(start: Column, ref: Column): Column =
    start + length(ref) - 1

  // ---- F11: comparison flag columns (cnv.py:700; restore_db.py:116) ----
  def mismatchFlag(a: Column, b: Column): Column = a =!= b

  // ---- F13: run-id timestamp string (src/utils.py:13-18) ----
  def runTimestamp(): Column =
    date_format(current_timestamp(), "yyyyMMdd'_T'HHmmss")

  // ---- F14: md5 digest (cnv.py:57-77) ----
  def md5Hex(c: Column): Column = md5(c.cast("string"))

  /** Portable 60-bit hash: first 15 hex digits of md5 as a long.
    * Chosen because the identical value is computable in ANSI-ish SQL
    * (DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT), making hash-based
    * operators (minhash/simhash/buckets) oracle-checkable. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  // ---- F15: JSON navigation (mci:86-97) ----
  def jsonStr(c: Column, path: String): Column = get_json_object(c, path)

  // ---- F16: HGVS match cascade (mci:99-142) ----

  /** First-marker del/dup/ins truncation (mci:131-137): text up to the
    * FIRST marker + the marker, priority del > dup > ins (the
    * reference's if/elif chain); null when no marker is present.
    * e.g. `c.123delinsAA` → `c.123del` (NOT `c.123delins`). */
  def hgvsFirstMarkerTruncate(hgvsC: Column): Column =
    when(hgvsC.contains("del"),
      concat(substring_index(hgvsC, "del", 1), lit("del")))
      .when(hgvsC.contains("dup"),
        concat(substring_index(hgvsC, "dup", 1), lit("dup")))
      .when(hgvsC.contains("ins"),
        concat(substring_index(hgvsC, "ins", 1), lit("ins")))

  /** Boolean cascade match against a flat transcript-string array:
    * CONTAINMENT semantics (mci:102,107 — `hgvs in transcript`), with
    * the first-marker truncation fallback. See `hgvsExtract` for the
    * full struct-array extraction the megaMAF merge consumes. */
  def hgvsMatches(transcripts: Column, hgvsP: Column, hgvsC: Column): Column = {
    val truncated = hgvsFirstMarkerTruncate(hgvsC)
    exists(transcripts, t => t.contains(hgvsP)) ||
      exists(transcripts, t => t.contains(hgvsC)) ||
      exists(transcripts, t => truncated.isNotNull && t.contains(truncated))
  }

  /** Full F16 extraction (mci:99-142): pull (hgvs_short,
    * variant_classification) out of the first matching consequence.
    *
    * `consequences` / `summaries` are `array<struct>` with fields
    * hgvsp, hgvsc, hgvspShort, variantClassification (the shape of
    * Genome Nexus `transcriptConsequences` /
    * `transcriptConsequenceSummaries`). The cascade, exactly as the
    * reference orders it:
    *   1. first consequence matching: protein reported → hgvsp truthy
    *      AND contains(hgvsp, protein) (mci:102; containment, not
    *      equality); protein 'Not Reported' → contains(hgvsc, coding)
    *      (mci:107)
    *   2. same predicate over the summaries array (mci:113-125)
    *   3. if coding has a del/dup/ins marker: first-marker truncation,
    *      then contains(hgvsc, truncated) over `consequences` only
    *      (mci:128-142) — this stage runs regardless of protein status
    * Returns struct(hgvs_short, variant_classification), fields null
    * when nothing matches. Pure codegen'd Column expression — runs
    * distributed over the annotation payloads, no driver loop. */
  def hgvsExtract(consequences: Column, summaries: Column,
                  hgvsP: Column, hgvsC: Column): Column = {
    def firstHit(arr: Column): Column =
      get(filter(arr, c =>
        when(hgvsP =!= lit("Not Reported"),
          c.getField("hgvsp").isNotNull && c.getField("hgvsp") =!= "" &&
            c.getField("hgvsp").contains(hgvsP))
          .otherwise(coalesce(c.getField("hgvsc"), lit("")).contains(hgvsC))),
        lit(0))
    val truncated = hgvsFirstMarkerTruncate(hgvsC)
    val truncHit = get(filter(consequences, c =>
      coalesce(c.getField("hgvsc"), lit("")).contains(truncated)), lit(0))
    val hit = coalesce(firstHit(consequences), firstHit(summaries), truncHit)
    struct(
      hit.getField("hgvspShort").as("hgvs_short"),
      hit.getField("variantClassification").as("variant_classification"))
  }
}
