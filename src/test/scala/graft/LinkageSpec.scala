package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.Linkage
import graft.plans.StringDistanceKernels

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def u8(s: String) = UTF8String.fromString(s)

  // fixtures cross-checked against DuckDB's jaro_similarity /
  // jaro_winkler_similarity / damerau_levenshtein builtins
  private val jaroCases = Seq(
    ("MARTHA", "MARHTA", 0.9444444444444445),
    ("DWAYNE", "DUANE", 0.8222222222222223),
    ("DIXON", "DICKSONX", 0.7666666666666666),
    ("", "ABC", 0.0), ("", "", 0.0), ("A", "A", 1.0),
    ("AB", "BA", 0.0), ("CA", "ABC", 0.0),
    ("kitten", "sitting", 0.746031746031746),
    ("JON", "JOHN", 0.9166666666666666),
    ("aa", "aaa", 0.8888888888888888))

  private val jwCases = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    // below the 0.7 boost threshold: prefix 4 must NOT be applied
    ("abcdxxxx", "abcdyyyy", 0.6666666666666666),
    // prefix of 5 must cap at 4
    ("abcdex", "abcdey", 0.9333333333333333),
    ("thee", "the", 0.9416666666666667),
    ("ab", "abyyyy", 0.8222222222222222))

  private val dlCases = Seq(
    ("CA", "ABC", 2), // full DL, not OSA (OSA would say 3)
    ("AB", "BA", 1), ("a cat", "an abct", 3),
    ("abcde", "abced", 1), ("kitten", "sitting", 3),
    ("aab", "aba", 1), ("x", "", 1), ("", "", 0),
    ("MARTHA", "MARHTA", 1), ("DIXON", "DICKSONX", 4))

  test("jaro kernel matches the cross-engine fixtures") {
    for ((a, b, want) <- jaroCases) {
      val got = StringDistanceKernels.jaro(u8(a), u8(b))
      assert(math.abs(got - want) < 1e-12, s"jaro($a,$b)=$got want $want")
    }
  }

  test("jaro-winkler kernel: boost threshold and prefix cap") {
    for ((a, b, want) <- jwCases) {
      val got = StringDistanceKernels.jaroWinkler(u8(a), u8(b))
      assert(math.abs(got - want) < 1e-12, s"jw($a,$b)=$got want $want")
    }
  }

  test("damerau-levenshtein kernel is the FULL algorithm") {
    for ((a, b, want) <- dlCases) {
      val got = StringDistanceKernels.damerauLevenshtein(u8(a), u8(b))
      assert(got == want, s"dl($a,$b)=$got want $want")
    }
  }

  test("distance properties: symmetry, identity, lev upper bound") {
    val rng = new scala.util.Random(11)
    val alpha = "abcde"
    def rs() = (0 until rng.nextInt(9)).map(_ =>
      alpha(rng.nextInt(alpha.length))).mkString
    for (_ <- 1 to 300) {
      val (a, b) = (rs(), rs())
      val dab = StringDistanceKernels.damerauLevenshtein(u8(a), u8(b))
      val dba = StringDistanceKernels.damerauLevenshtein(u8(b), u8(a))
      assert(dab == dba)
      assert(StringDistanceKernels.damerauLevenshtein(u8(a), u8(a)) == 0)
      // DL is a relaxation of Levenshtein
      assert(dab <= u8(a).levenshteinDistance(u8(b)))
      assert(math.abs(StringDistanceKernels.jaro(u8(a), u8(b)) -
        StringDistanceKernels.jaro(u8(b), u8(a))) < 1e-15)
    }
  }

  test("codegen column path matches the kernel (and nulls stay null)") {
    val df = (jaroCases.map(c => (c._1, c._2)) ++ Seq((null, "x"), ("x", null)))
      .toDF("a", "b")
    val rows = df.select(col("a"), col("b"),
      Linkage.jaroSim(col("a"), col("b")).as("j"),
      Linkage.jaroWinklerSim(col("a"), col("b")).as("jw"),
      Linkage.damerauLev(col("a"), col("b")).as("dl"))
      .collect()
    for (r <- rows) {
      val (a, b) = (r.getString(0), r.getString(1))
      if (a == null || b == null) {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
      } else {
        assert(r.getDouble(2) == StringDistanceKernels.jaro(u8(a), u8(b)))
        assert(r.getDouble(3) == StringDistanceKernels.jaroWinkler(u8(a), u8(b)))
        assert(r.getInt(4) == StringDistanceKernels.damerauLevenshtein(u8(a), u8(b)))
      }
    }
  }

  test("neighborDistances: vocabulary-sized output, all measures present") {
    val df = Seq("delta", "del ta", "alpha", "alpah", "alpha").toDF("s")
    val out = Linkage.neighborDistances(df, "s").collect()
    assert(out.length == 3) // 4 distinct values -> 3 adjacent pairs
    val m = out.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))).toSeq
    // alpah->alpha is one transposition: dl 1, lev 2
    val p = m.find(_._1 == "alpah").get
    assert(p._2 == "alpha" && p._5 == 1 && p._6 == 2)
  }

  test("fellegiSunter: weights reward rare-field agreement, integer scores") {
    val df = Seq(
      // block 1: two near-duplicates (same phone+mail), one stranger
      (1L, 10, "AA", "555", "x@y"),
      (2L, 10, "AA", "555", "x@y"),
      (3L, 10, "AA", "999", "q@z"),
      // block 2: nothing agrees
      (4L, 20, "BB", "111", "a@a"),
      (5L, 20, "BB", "222", "b@b")
    ).toDF("id", "nation", "seg", "phone", "mail")
    val out = Linkage.fellegiSunter(df, "id", Seq("nation", "seg"),
      Seq("phone" -> "phone", "mail" -> "mail"), m = 0.95)
    val rows = out.collect().map(r => ((r.getLong(0), r.getLong(1)),
      (r.getInt(2), r.getLong(3)))).toMap
    assert(rows.size == 4) // 3 pairs in block 1, 1 in block 2
    val dup = rows((1L, 2L)); val odd = rows((1L, 3L)); val nb = rows((4L, 5L))
    assert(dup._1 == 2 && odd._1 == 0 && nb._1 == 0)
    // full agreement scores strictly above any disagreement score
    assert(dup._2 > odd._2 && dup._2 > nb._2)
    // disagreement weights are negative (m=0.95 vs u well below 1)
    assert(odd._2 < 0L)
  }

  test("fellegiSunterCapped: oversized blocks skipped and reported, " +
    "kept blocks score identically to the uncapped join") {
    val df = ((1L to 8L).map(i => (i, 10, "AA", s"p$i", s"m$i")) ++ // big block
      Seq((20L, 20, "BB", "555", "x@y"), (21L, 20, "BB", "555", "x@y"),
        (22L, 30, "CC", "111", "a@a"))) // small blocks
      .toDF("id", "nation", "seg", "phone", "mail")
    val fields = Seq("phone" -> "phone", "mail" -> "mail")
    val capped = Linkage.fellegiSunterCapped(df, "id",
      Seq("nation", "seg"), fields, m = 0.95, maxBlock = 4)
    // report: exactly the 8-record block, with its size
    val over = capped.oversized.collect()
    assert(over.length == 1)
    assert(over(0).getAs[Int]("nation") == 10 &&
      over(0).getAs[Long]("block_n") == 8L)
    // scores: only the small-block pair; weights are computed over
    // the FULL frame (u-probabilities are corpus statistics, not
    // block statistics), so the kept pair matches the uncapped run
    val full = Linkage.fellegiSunter(df, "id", Seq("nation", "seg"),
      fields, m = 0.95)
      .filter(col("id_a") === 20L && col("id_b") === 21L).collect()
    val kept = capped.scores.collect()
    assert(kept.length == 1)
    assert(kept(0).toSeq == full(0).toSeq)
    // maxBlock large enough: report empty, scores = uncapped
    val uncap = Linkage.fellegiSunterCapped(df, "id",
      Seq("nation", "seg"), fields, m = 0.95, maxBlock = 100)
    assert(uncap.oversized.isEmpty)
    assert(uncap.scores.count() ==
      Linkage.fellegiSunter(df, "id", Seq("nation", "seg"), fields).count())
  }
}
