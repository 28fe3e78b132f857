package graft

import org.apache.spark.sql.functions._
import graft.functions.{ColumnFns => CF, TextFns => TF}

class ColumnFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect().head.getAs[T]("r")

  test("gisticBin boundary values (cnv.py:472-481: strict > / <)") {
    val vals = Seq(2.1, 2.0, 0.31, 0.3, 0.0, -0.3, -0.31, -1.0, -1.01)
    val got = vals.toDF("v").select(CF.gisticBin(col("v")).as("g"))
      .as[Int].collect().toSeq
    assert(got == Seq(2, 1, 1, 0, 0, 0, -1, -1, -2))
  }

  test("log2Ratio: round(log2(cn/2), 4)") {
    val got = Seq(2.0, 4.0, 1.0, 3.0).toDF("cn")
      .select(CF.log2Ratio(col("cn")).as("r")).as[Double].collect().toSeq
    assert(got == Seq(0.0, 1.0, -1.0, 0.585))
  }

  test("formatField: FORMAT-packed extracts with NA on null/missing") {
    val df = Seq(Some("0/1:x:57:a:b:12:c:9:0.21:PASS"), None).toDF("s")
    val got = df.select(
      CF.formatField(col("s"), 0).as("gt"),
      CF.formatField(col("s"), 2).as("dp"),
      CF.formatField(col("s"), 99).as("oob"),
      CF.splitLast(col("s"), ":").as("ft"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got(0) == ("0/1", "57", "NA", "PASS"))
    assert(got(1) == ("NA", "NA", "NA", null))
  }

  test("gtfAttr: multi-value gene_name ;-joined, quotes stripped (cnv.py:360-368)") {
    val attrs = """gene_id "ENSG1"; gene_type "protein_coding"; gene_name "TP53"; gene_name "ALT1";"""
    val got = Seq(attrs).toDF("a")
      .select(CF.gtfAttr(col("a"), "gene_name").as("g")).as[String].collect().head
    assert(got == "TP53;ALT1")
  }

  test("chrStrip / chrPrefix / dotZeroStrip / endPosition") {
    val r = Seq(("chr17", "17", "42.0", "AT", 100L))
      .toDF("c", "p", "z", "ref", "pos")
      .select(CF.chrStrip(col("c")).as("a"), CF.chrPrefix(col("p")).as("b"),
        CF.dotZeroStrip(col("z")).as("d"),
        CF.endPosition(col("pos"), col("ref")).as("e"))
      .collect().head
    assert((r.getString(0), r.getString(1), r.getString(2), r.getLong(3)) ==
      ("17", "chr17", "42", 101L))
  }

  test("infoField / infoFieldNa") {
    val df = Seq(Some("SVTYPE=Fusion;GENE_NAME=EWSR1-FLI1;READ_COUNT=88"), None)
      .toDF("i")
    val got = df.select(CF.infoFieldNa(col("i"), "GENE_NAME").as("g"))
      .as[String].collect().toSeq
    assert(got == Seq("EWSR1-FLI1", "NA"))
  }

  test("hgvsMatches: exact protein, coding, and del/dup/ins truncation fallback") {
    val df = Seq(
      (Seq("p.V600E", "c.1799T>A"), "p.V600E", "c.1799T>A"),       // protein hit
      (Seq("c.1799T>A"), "p.XXX", "c.1799T>A"),                    // coding hit
      (Seq("c.123del"), "p.XXX", "c.123delAAG"),                   // truncation hit
      (Seq("c.999G>T"), "p.XXX", "c.111A>C"))                      // miss
      .toDF("transcripts", "hgvs_p", "hgvs_c")
    val got = df.select(CF.hgvsMatches(col("transcripts"),
      col("hgvs_p"), col("hgvs_c")).as("m")).as[Boolean].collect().toSeq
    assert(got == Seq(true, true, true, false))
  }

  test("s3 URL parse: bucket and key") {
    val r = Seq("s3://my-bucket/path/to/file.vcf.gz").toDF("u")
      .select(CF.s3Bucket(col("u")).as("b"), CF.s3Key(col("u")).as("k"))
      .as[(String, String)].collect().head
    assert(r == ("my-bucket", "path/to/file.vcf.gz"))
  }

  test("typed model: segments round-trip through Dataset[Segment]") {
    import graft.model.Segment
    val seg = Segment("PT1", "PT1-S1", "7", 100L, 300L, 200L,
      1.5, 12L, 40L, 0.01, 1.1, 1.9)
    val ds = spark.createDataset(Seq(seg))
    assert(ds.filter(_.log2ratio > 1.0).count() == 1)
    assert(ds.toDF().columns.length == 12)
  }

  test("wordShingles / minhash on short docs: empty -> null signature") {
    val df = Seq("one two", "one two three four").toDF("t")
    val got = df.select(TF.minhash(col("t"), 0, 3).as("m")).collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0))
  }

  test("fingerprint is order-sensitive") {
    val df = Seq("alpha beta gamma", "gamma beta alpha").toDF("t")
    val fps = df.select(TF.fingerprint(col("t")).as("f")).as[Long].collect()
    assert(fps(0) != fps(1))
  }

  test("hamming distance of simhash") {
    val df = Seq(("spark spark spark", "spark spark spark")).toDF("a", "b")
    val got = df.select(
      TF.hamming(TF.simhash(col("a"), 16), TF.simhash(col("b"), 16), 16).as("h"))
      .as[Long].collect().head
    assert(got == 0L)
  }

  test("repetition screens: dup/top/consec fractions with boundaries") {
    val df = Seq(
      ("a b c d", 0.0, 0.25, 0.0),          // all distinct
      ("x x x x", 0.75, 1.0, 1.0),          // one stuttered token
      ("a b a b", 0.5, 0.5, 0.0),           // repeats, never adjacent
      ("solo", 0.0, 1.0, 0.0),              // single token
      ("", 0.0, 0.0, 0.0)                   // empty doc: all guards
    ).toDF("t", "ed", "et", "ec")
    val got = df.select(
      TF.dupTokenFraction(col("t")).as("d"),
      TF.topTokenFraction(col("t")).as("tp"),
      TF.consecRepeatFraction(col("t")).as("c"),
      col("ed"), col("et"), col("ec"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(3), s"dup: $r")
      assert(r.getDouble(1) == r.getDouble(4), s"top: $r")
      assert(r.getDouble(2) == r.getDouble(5), s"consec: $r")
    }
  }

  test("normalizeText: case/punct/whitespace variants collapse") {
    val df = Seq(
      "Hello,   World!", "hello world", "  HELLO--world  ", "h e l l o",
      "").toDF("t")
    val got = df.select(TF.normalizeText(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(got(0) == "hello world" && got(1) == "hello world" &&
      got(2) == "hello world")
    assert(got(3) == "h e l l o")
    assert(got(4) == "")
  }

  test("charEntropy: hand-computed nats with integer-micro-nat rounding") {
    def expected(s: String): Double = {
      if (s.isEmpty) 0.0
      else {
        def lm(x: Long) = math.round(math.log(x.toDouble) * 1e6)
        val ks = s.groupBy(identity).values.map(_.length.toLong)
        val n = s.length.toLong
        val micro = (n * lm(n) - ks.map(k => k * lm(k)).sum).toDouble / (n * 1e6)
        BigDecimal(micro).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val inputs = Seq("aaaa", "abab", "abcd", "mississippi", "", "a")
    val got = inputs.toDF("t")
      .select(TF.charEntropy(col("t")).as("e")).as[Double].collect().toSeq
    inputs.zip(got).foreach { case (s, g) =>
      assert(g == expected(s), s"entropy('$s')")
    }
    // order sanity: uniform > skewed > constant
    assert(got(2) > got(1) || got(1) == got(2))
    assert(got(1) > got(0) && got(0) == 0.0)
  }

  test("langGuess picks the marker-heavy language") {
    val df = Seq(
      "the cat and the dog of the house is big",
      "el gato y la casa es los grande",
      "der hund und die katze ist der").toDF("t")
    val got = df.select(TF.langGuess(col("t")).as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "de"))
  }
}
