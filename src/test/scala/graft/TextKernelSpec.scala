package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.functions.TextFns

/** Native text kernels (graft.plans.MinhashSignature / SimHash) must
  * be bitwise-identical to the interpreted HOF chains they replace —
  * the HOF forms are what the DuckDB oracle reproduces, so any drift
  * here is a silent correctness break at the oracle gate. */
class TextKernelSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox",
    "a b",                       // shorter than shingle size -> null sig
    "",                          // empty
    "   leading and   multiple   spaces here ok ",
    "MIXED Case TOKENS and Ünïcode tökens ärger",
    "repeat repeat repeat repeat repeat",
    "tab\tand\nnewline separated tokens",
    "punct, tokens! stay? as-is; here.",
    "42 7 42 7 42 numbers too"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("minhash signature: native kernel == HOF chain, all perms") {
    val k = 8
    val df = docs.toDF("id", "text")
    val hof = df
      .withColumn("__hs", TextFns.shingleHashes(col("text"), 3))
      .select(col("id") +: (0 until k).map(i =>
        TextFns.minhashPerm(col("__hs"), i).as(s"h_$i")): _*)
    val native = df
      .withColumn("__sig", TextFns.minhashSignatureNative(col("text"), k, 3))
      .select(col("id") +: (0 until k).map(i =>
        col("__sig").getItem(i).as(s"n_$i")): _*)
    val joined = hof.join(native, "id").collect()
    assert(joined.length == docs.length)
    joined.foreach { r =>
      (0 until k).foreach { i =>
        assert(r.getAs[Any](s"h_$i") == r.getAs[Any](s"n_$i"),
          s"perm $i mismatch for id ${r.getAs[Long]("id")}")
      }
    }
  }

  test("minhash signature: shingle size 1 and 5 agree with HOF") {
    for (n <- Seq(1, 5)) {
      val df = docs.toDF("id", "text")
      val cmp = df.select(col("id"),
        TextFns.minhashPerm(TextFns.shingleHashes(col("text"), n), 2).as("h"),
        TextFns.minhashSignatureNative(col("text"), 4, n).getItem(2).as("nv"))
        .collect()
      cmp.foreach(r => assert(r.getAs[Any]("h") == r.getAs[Any]("nv"),
        s"n=$n id=${r.getLong(0)}"))
    }
  }

  test("simhash: native kernel == HOF form at 8 and 16 bits") {
    val df = docs.toDF("id", "text")
    for (bits <- Seq(8, 16)) {
      val cmp = df.select(col("id"),
        TextFns.simhashHof(col("text"), bits).as("h"),
        TextFns.simhash(col("text"), bits).as("nv")).collect()
      cmp.foreach(r => assert(r.getAs[Any]("h") == r.getAs[Any]("nv"),
        s"bits=$bits id=${r.getLong(0)}"))
    }
  }

  test("property: native kernels == HOF chains on random strings") {
    import org.scalacheck.Gen
    val tokenGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("Ünï", "tök", "ärger", "ΔΘΩ", "дом", "空", "a-b.c", "..", "42"))
    val docGen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, tokenGen)
      seps <- Gen.listOfN(n, Gen.oneOf(" ", "  ", "\t", " \n"))
    } yield toks.zip(seps).map { case (t, s) => t + s }.mkString
    val samples = Gen.listOfN(120, docGen)
      .apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(42L)).get
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val cmp = df.select(col("id"),
      TextFns.minhashPerm(TextFns.shingleHashes(col("text"), 2), 1).as("mh_hof"),
      TextFns.minhashSignatureNative(col("text"), 4, 2).getItem(1).as("mh_nat"),
      TextFns.simhashHof(col("text"), 12).as("sh_hof"),
      TextFns.simhash(col("text"), 12).as("sh_nat")).collect()
    cmp.foreach { r =>
      assert(r.getAs[Any]("mh_hof") == r.getAs[Any]("mh_nat"), s"minhash id=${r.getLong(0)}")
      assert(r.getAs[Any]("sh_hof") == r.getAs[Any]("sh_nat"), s"simhash id=${r.getLong(0)}")
    }
  }

  test("charEntropy: native kernel == HOF chain, fixture + random strings") {
    val rnd = new scala.util.Random(7)
    val randoms = (0 until 60).map { i =>
      val len = rnd.nextInt(200)
      (100L + i, (0 until len).map(_ =>
        "abcdefgh XYZ.,!ü€\t\n".charAt(rnd.nextInt(19))).mkString)
    }
    val df = (docs ++ randoms).toDF("id", "text")
    val both = df.select(col("id"),
      TextFns.charEntropy(col("text")).as("native"),
      TextFns.charEntropyHof(col("text")).as("hof"))
      .as[(Long, Double, Double)].collect()
    both.foreach { case (id, n, h) =>
      assert(n == h, s"charEntropy drift at id=$id: native=$n hof=$h")
    }
  }

  test("charEntropy: supplementary characters are ONE code point (HOF parity)") {
    // Spark's split(c, "") keeps surrogate pairs intact, so the HOF
    // baseline counts code points; the native kernel must too — a
    // UTF-16 code-unit loop silently diverges on any non-BMP text.
    val rnd = new scala.util.Random(11)
    val toks = Array("a", "b", "😀", "🚀", "𝕏", "é", " ", "字")
    val fixtures = Seq((500L, "a😀b😀"), (501L, "😀"), (502L, "𝕏𝕏🚀"))
    val randoms = (0 until 40).map { i =>
      (510L + i, (0 until rnd.nextInt(60))
        .map(_ => toks(rnd.nextInt(toks.length))).mkString)
    }
    val df = (fixtures ++ randoms).toDF("id", "text")
    val both = df.select(col("id"),
      TextFns.charEntropy(col("text")).as("native"),
      TextFns.charEntropyHof(col("text")).as("hof"))
      .as[(Long, Double, Double)].collect()
    both.foreach { case (id, n, h) =>
      assert(n == h, s"charEntropy supplementary drift at id=$id: native=$n hof=$h")
    }
    // hand check: "a😀b😀" = 4 code points {a:1, b:1, 😀:2} →
    // H = 1.5·ln 2 = 1.039721 (NOT 1.329661, the 6-code-unit answer)
    val e = both.find(_._1 == 500L).get._2
    assert(math.abs(e - 1.039721) < 1e-9, s"a😀b😀 gave $e")
  }

  test("winnowPicks: native deque kernel == HOF window scan, all (n, w)") {
    val rnd = new scala.util.Random(13)
    val randoms = (0 until 40).map { i =>
      val len = rnd.nextInt(60)
      (200L + i, (0 until len).map(_ =>
        "abcdefg"(rnd.nextInt(7)).toString).mkString(" "))
    }
    val df = (docs ++ randoms).toDF("id", "text")
    for (n <- Seq(1, 3); w <- Seq(1, 2, 4, 9)) {
      val native = graft.operators.Dedup
        .winnowFingerprints(df, "text", "id", n, w)
        .as[(Long, Long, Long)].collect().toSet
      val hof = graft.operators.Dedup
        .winnowFingerprintsHof(df, "text", "id", n, w)
        .as[(Long, Long, Long)].collect().toSet
      assert(native == hof,
        s"winnow drift at n=$n w=$w: ${native.diff(hof)} / ${hof.diff(native)}")
    }
  }

  test("hashed shingle sets: two-stage tokenHashes64 path preserves set size") {
    // cardinality structure (not values) is the contract: distinct
    // shingle strings <-> distinct hash triples
    val df = docs.toDF("id", "text")
    val viaStrings = df.select(col("id"),
      size(array_distinct(TextFns.wordShingles(col("text"), 3))).as("n_str"))
    val viaHashes = df.select(col("id"),
      size(TextFns.shingleHashes64(col("text"), 3)).as("n_hash"))
    viaStrings.join(viaHashes, "id").collect().foreach { r =>
      val (a, b) = (r.getAs[Int]("n_str"), r.getAs[Int]("n_hash"))
      // empty-array vs null convention: both must agree on emptiness
      assert(a == b, s"id=${r.getLong(0)}: $a distinct strings vs $b hashes")
    }
  }

  test("ngram hashes: native kernel == hash60 over wordShingles, positions kept") {
    val df = docs.toDF("id", "text")
    for (n <- Seq(1, 3, 5)) {
      val hof = df.select(col("id"),
        transform(TextFns.wordShingles(col("text"), n),
          g => graft.functions.ColumnFns.hash60(g)).as("hs"))
        .as[(Long, Seq[Long])].collect().toMap
      val native = df.select(col("id"),
        TextFns.ngramHashesNative(col("text"), n).as("hs"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(native == hof, s"n=$n")
    }
  }

  test("tokenStats: native kernel == the three HOF repetition screens") {
    // the HOF forms are what the DuckDB oracle reproduces; the kernel
    // must match them bitwise on every fixture doc (unicode case
    // folding, tab/newline whitespace, repeats, empties) plus random
    // strings over a tiny alphabet (dense repeat/consec collisions)
    val rnd = new scala.util.Random(20260815)
    val fuzz = (1 to 200).map { i =>
      (1000L + i, (0 until rnd.nextInt(30)).map(_ =>
        Seq("a", "b", "ab", "A", "  ", "\t", "ü")(rnd.nextInt(7)))
        .mkString(" "))
    }
    val df = (docs ++ fuzz).toDF("id", "text")
    val got = df.select(col("id"), TextFns.tokenStats(col("text")).as("__ts"))
      .select(col("id"), TextFns.dupFracOf(col("__ts")).as("d"),
        TextFns.topFracOf(col("__ts")).as("t"),
        TextFns.consecFracOf(col("__ts")).as("c"))
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val want = df.select(col("id"), TextFns.tokens(col("text")).as("__tk"))
      .select(col("id"), TextFns.dupTokenFractionOnTokens(col("__tk")).as("d"),
        TextFns.topTokenFractionOnTokens(col("__tk")).as("t"),
        TextFns.consecRepeatFractionOnTokens(col("__tk")).as("c"))
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == want.keySet)
    got.keySet.foreach { id =>
      assert(got(id) == want(id), s"id=$id: ${got(id)} vs ${want(id)}") }
  }

}
