package graft

import graft.operators.Tfidf

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple apple banana common"),
    (2L, "banana cherry common"),
    (3L, "cherry cherry cherry common")
  ).toDF("doc_id", "text")

  test("docFreq: presence per doc, not occurrence count") {
    val df = Tfidf.docFreq(docs, "text").as[(String, Long)].collect().toMap
    assert(df == Map("apple" -> 1L, "banana" -> 2L,
      "cherry" -> 2L, "common" -> 3L))
  }

  test("topTerms: rare repeated terms outrank ubiquitous ones") {
    val top = Tfidf.topTerms(docs, "text", "doc_id", k = 1)
      .as[(Long, String, Double, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(top == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // 'common' (df = N) never wins despite appearing in every doc
  }

  test("topTerms: k bounds per-doc output, ranks dense from 1") {
    val got = Tfidf.topTerms(docs, "text", "doc_id", k = 2)
      .as[(Long, String, Double, Int)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc.values.forall(rows =>
      rows.length <= 2 && rows.map(_._4).sorted.sameElements(1 to rows.length)))
  }

  test("postings: sorted doc lists, hapax pruned") {
    val got = Tfidf.postings(docs, "text", "doc_id", minDf = 2L)
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "banana" -> ((2L, Seq(1L, 2L))),
      "cherry" -> ((2L, Seq(2L, 3L))),
      "common" -> ((3L, Seq(1L, 2L, 3L)))))
  }

  test("langmodel: Laplace log-probs, OOV smoothing, empty doc") {
    import graft.operators.LangModel
    val train = Seq((1L, "a a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a b c"), (11L, "")).toDF("doc_id", "text")
    val counts = LangModel.unigramCounts(train, "text")
    assert(counts.as[(String, Long)].collect().toSet ==
      Set(("a", 2L), ("b", 1L)))
    val got = LangModel.scoreDocs(score, "text", "doc_id", counts)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // N=3, V=2, denom=6: p(a)=3/6, p(b)=2/6, oov=1/6 — micro-nat ints
    val lpm = Seq(3.0 / 6, 2.0 / 6, 1.0 / 6)
      .map(p => Math.round(Math.log(p) * 1e6)).sum
    val avg = BigDecimal(lpm / 3.0 / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ppl = BigDecimal(Math.exp(-lpm / 3.0 / 1e6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == ((3L, Some(avg), Some(ppl))))
    assert(got(11L) == ((0L, None, None)))
  }

  test("langmodel: in-vocabulary docs score higher than OOV docs") {
    import graft.operators.LangModel
    val train = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val counts = LangModel.unigramCounts(train, "text")
    val got = LangModel.scoreDocs(
      Seq((1L, "the cat"), (2L, "zzz qqq")).toDF("doc_id", "text"),
      "text", "doc_id", counts)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r._3.get).toMap
    assert(got(1L) > got(2L))
  }

  test("distinctiveTerms: Scala-computed log-odds z, exclusive term ranks first") {
    val docs = Seq(
      (1L, "apple apple banana", "A"),
      (2L, "cherry banana banana", "B")
    ).toDF("doc_id", "text", "source")
    val a0 = 100.0
    // corpus: apple 2 (A only), banana 3 (1 A, 2 B), cherry 1 (B only); n=6
    def z(yg: Long, y: Long, ng: Long, n: Long): (Double, Double) = {
      val a = a0 * y / n
      val (yr, nr) = (y - yg, n - ng)
      val d = math.log((yg + a) / (ng + a0 - yg - a)) -
        math.log((yr + a) / (nr + a0 - yr - a))
      val zz = d / math.sqrt(1.0 / (yg + a) + 1.0 / (yr + a))
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r6(d), r6(zz))
    }
    val got = Tfidf.distinctiveTerms(docs, "text", "source", k = 5)
      .as[(String, String, Double, Double, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val (dA, zA) = z(2, 2, 3, 6)   // apple in A
    assert(got(("A", "apple")) == ((dA, zA, 1)))
    val (dC, zC) = z(1, 1, 3, 6)   // cherry in B
    assert(got(("B", "cherry"))._1 == dC && got(("B", "cherry"))._2 == zC)
    // exclusive terms outrank the shared one in both groups
    assert(got(("A", "apple"))._3 < got(("A", "banana"))._3)
    assert(got(("B", "cherry"))._3 < got(("B", "banana"))._3)
  }

  test("zipfSlope: skewed corpus slopes negative, uniform near zero") {
    val skew = Seq((1L, ("a " * 8 + "b " * 4 + "c " * 2 + "d").trim))
      .toDF("doc_id", "text")
    val flat = Seq((1L, "a b c d a b c d")).toDF("doc_id", "text")
    val s1 = Tfidf.zipfSlope(skew, "text", 10)
      .as[(Long, Double, Double)].collect().head
    val s2 = Tfidf.zipfSlope(flat, "text", 10)
      .as[(Long, Double, Double)].collect().head
    assert(s1._1 == 4L && s2._1 == 4L)
    assert(s1._2 < -0.9)          // ~ -1.5 for the 8/4/2/1 ladder
    assert(math.abs(s2._2) < 1e-6) // uniform: flat line
  }

  test("collocations: fixed phrase outranks incidental adjacency") {
    // "new york" always adjacent; "the" is everywhere (low PMI)
    val docs = Seq(
      (1L, "new york the best the worst"),
      (2L, "new york the city"),
      (3L, "new york the")).toDF("doc_id", "text")
    val got = Tfidf.collocations(docs, "text", minCount = 3L, k = 5)
      .as[(String, String, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ny = got(("new", "york"))
    assert(ny._3 == 3L && ny._5 == 1)
    // exact PMI: c12=3, N2 = 5+3+2 = 10 bigrams, c(new)=c(york)=3,
    // N1 = 6+4+3 = 13 tokens
    val exp = BigDecimal(math.log((3.0 / 10) / ((3.0 / 13) * (3.0 / 13))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ny._4 == exp)
    assert(!got.contains(("york", "the")) || got(("york", "the"))._4 < ny._4)
  }

  test("crossEntropyByGroup: atypical source scores higher") {
    import graft.operators.LangModel
    val docs = Seq(
      (1L, "the cat the dog", "A"),
      (2L, "the cat the cat", "A"),
      (3L, "zz qq ww rr", "B"))   // all OOV-ish rare terms
      .toDF("doc_id", "text", "source")
    val got = LangModel.crossEntropyByGroup(docs, "text", "source",
      LangModel.unigramCounts(docs, "text"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A")._2 == 8L && got("B")._2 == 4L)
    assert(got("B")._3 > got("A")._3)  // rare-term source: higher xent
    // exact value for B: N=12, V=7 (the,cat,dog,zz,qq,ww,rr), denom
    // 12+7+1 = 20; each B term has count 1 → p = 2/20
    val lpm = Math.round(math.log(2.0 / 20) * 1e6)
    val exp6 = BigDecimal(-(lpm * 4).toDouble / 4 / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("B")._3 == exp6)
  }

  test("bigram LM: hand-computed pair/context/oov fallback chain") {
    import graft.operators.LangModel
    val train = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(train, "text")
    val big = LangModel.bigramCounts(train, "text")
    assert(big.as[(String, String, Long)].collect().toSet ==
      Set(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)))
    val score = Seq(
      (10L, "a b c"),   // seen pairs: p(b|a)=3/6, p(c|b)=2/6
      (11L, "a c"),     // unseen pair, seen ctx a: 1/6
      (12L, "z z"),     // unseen ctx: 1/(V+1)=1/4
      (13L, "solo")     // < 2 tokens: no bigrams
    ).toDF("doc_id", "text")
    val got = LangModel.scoreDocsBigram(score, "text", "doc_id", uni, big)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def lpm(p: Double) = Math.round(Math.log(p) * 1e6)
    def avg(s: Long, n: Int) = BigDecimal(s.toDouble / n / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // V=3; denom(a)=2+4=6, denom(b)=6, denom(c)=5
    assert(got(10L) == ((2L, Some(avg(lpm(3.0 / 6) + lpm(2.0 / 6), 2)))))
    assert(got(11L) == ((1L, Some(avg(lpm(1.0 / 6), 1)))))
    assert(got(12L) == ((1L, Some(avg(lpm(1.0 / 4), 1)))))
    assert(got(13L) == ((0L, None)))
  }

  test("stupid backoff: seen ratio, alpha-discounted unigram, oov floor") {
    import graft.operators.LangModel
    val train = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(train, "text")
    val big = LangModel.bigramCounts(train, "text")
    val score = Seq(
      (10L, "a b"),   // seen pair: S(b|a) = c(a,b)/c(a) = 2/2
      (11L, "a c"),   // unseen pair -> 0.4 * c(c)/N = 0.4 * 1/5
      (12L, "z z")    // oov w2 -> 0.4/(N+1) = 0.4/6
    ).toDF("doc_id", "text")
    val got = LangModel.scoreDocsBackoff(score, "text", "doc_id", uni, big)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def lpm(p: Double) = Math.round(Math.log(p) * 1e6)
    def avg(s: Long, n: Int) = BigDecimal(s.toDouble / n / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == ((1L, Some(avg(lpm(1.0), 1)))))
    assert(got(11L) == ((1L, Some(avg(lpm(0.4 * 1 / 5), 1)))))
    assert(got(12L) == ((1L, Some(avg(lpm(0.4 / 6), 1)))))
  }

  test("bm25: hand-computed scores, non-matching docs absent") {
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "delta")
    ).toDF("doc_id", "text")
    val got = Tfidf.bm25(corpus, "text", "doc_id", Seq("apple", "banana"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // N=3, avglen=2, df(apple)=1, df(banana)=2
    val idfA = math.log(1.0 + (3 - 1 + 0.5) / 1.5)
    val idfB = math.log(1.0 + (3 - 2 + 0.5) / 2.5)
    def s(idf: Double, tf: Long, len: Long): Double =
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len / 2.0))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((2L, r6(s(idfA, 2, 3) + s(idfB, 1, 3)))))
    assert(got(2L) == ((1L, r6(s(idfB, 1, 2)))))
    assert(!got.contains(3L))
    assert(got(1L)._2 > got(2L)._2) // more matched terms ranks higher
  }

  test("cooccurrence: pair counts and PMI sign") {
    val got = Tfidf.cooccurrence(docs, "text", "doc_id", minPairs = 2L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // banana+common in docs 1,2; cherry+common in docs 2,3
    assert(got.keySet == Set(("banana", "common"), ("cherry", "common")))
    assert(got(("banana", "common"))._1 == 2L)
    // PMI of (2/3)/(2/3 * 1) = ln(1) = 0 exactly
    assert(got(("banana", "common"))._2 == 0.0)
  }

  test("vocabCoverage: hand-counted coverage at two cutoffs") {
    // stream: a a a b b c -> top-1 covers 3/6, top-2 covers 5/6
    val df = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Tfidf.vocabCoverage(df, "text", Seq(1, 2))
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1) == ((3L, 6L, 3L, 500000L)))
    assert(got(2) == ((3L, 6L, 5L, 833333L)))
  }

  test("hashVectorize: slot counts deterministic, bounded, collision-additive") {
    val df = Seq((1L, "a b a"), (2L, "b")).toDF("doc_id", "text")
    val got = Tfidf.hashVectorize(df, "text", "doc_id", k = 16)
      .as[(Long, Int, Long)].collect()
    assert(got.forall(r => r._2 >= 0 && r._2 < 16))
    // doc 1 has 3 tokens across its slots, doc 2 has 1
    assert(got.filter(_._1 == 1L).map(_._3).sum == 3L)
    assert(got.filter(_._1 == 2L).map(_._3).sum == 1L)
    // same token -> same slot in both docs (the whole point):
    // doc 2's only slot (slot of "b") is one of doc 1's slots
    val doc1Slots = got.filter(_._1 == 1L).map(_._2).toSet
    val doc2Slots = got.filter(_._1 == 2L).map(_._2).toSet
    assert(doc2Slots.size == 1 && doc2Slots.subsetOf(doc1Slots))
  }

  test("heapsCurve: monotone nested growth, exact endpoints") {
    // doc ids 0..9 across 10 buckets; shared word everywhere plus one
    // unique word per doc -> vocab grows by exactly 1 per subset
    val df = (0L to 9L).map(i => (i, s"common w$i")).toDF("doc_id", "text")
    val got = Tfidf.heapsCurve(df, "text", "doc_id", buckets = 10)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 10)
    assert(got.head == ((1, 2L, 2L)))    // doc 0: 2 tokens, 2 types
    assert(got.last == ((10, 20L, 11L))) // all: 20 tokens, 11 types
    // nested monotone growth in both coordinates
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._2 && a._3 < b._3)
    }
  }

  test("heapsCurve: empty corpus yields 0 (not NULL) per subset") {
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = Tfidf.heapsCurve(df, "text", "doc_id", buckets = 5)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == (1 to 5).map(d => (d, 0L, 0L)))
  }

  test("tokenFertility: chars per token by language bucket") {
    val df = Seq(("en", "ab cd"), ("en", "efg"), ("de", ""))
      .toDF("lang", "text")
    val got = Tfidf.tokenFertility(df, "text", "lang").collect()
      .map(r => r.getString(0) -> r).toMap
    val en = got("en")
    // 3 tokens (ab, cd, efg), 8 chars -> 8/3 chars per token
    assert(en.getAs[Long]("n_docs") == 2L)
    assert(en.getAs[Long]("n_tokens") == 3L)
    assert(en.getAs[Long]("n_chars") == 8L)
    assert(en.getAs[Long]("chars_per_token_micro") == 2666667L)
    // token-less bucket: null ratio, zero counts survive
    val de = got("de")
    assert(de.getAs[Long]("n_tokens") == 0L)
    assert(de.isNullAt(de.fieldIndex("chars_per_token_micro")))
  }
}
