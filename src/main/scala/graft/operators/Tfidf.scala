package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** TF-IDF term weighting — corpus keyword extraction / salient-term
  * surfacing (the analysis pass behind topic drift checks and
  * search-index weighting on a training corpus).
  *
  * Shapes: `docFreq` and the per-doc term counts are each ONE hash
  * aggregation; the idf join is term→term (the document-frequency
  * table is vocabulary-sized — broadcast when it fits, which for word
  * tokens it does). The corpus size joins in as a broadcast 1-row
  * frame, not a driver-side count() action. Terms stay strings here
  * (vocabulary-bounded); swap to hash60 terms at web scale.
  *
  * tfidf = tf · (ln((N+1)/(df+1)) + 1) — the smoothed form; ROUNDED
  * to 4 dp BEFORE ranking so rank ties break identically everywhere
  * (ln is not IEEE-correctly-rounded, so unrounded last-ulp noise
  * must not decide order). */
object Tfidf {

  /** (term, df): number of documents containing each term. */
  def docFreq(docs: DataFrame, textCol: String): DataFrame =
    Explodes.nonEmpty(docs,
        array_distinct(TextFns.tokens(col(textCol))), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** Inverted index: per term, document frequency and the SORTED
    * posting list of containing doc ids — the search-index build.
    * `minDf` prunes the hapax tail (the bulk of any vocabulary)
    * before lists materialize; a posting array is bounded by its
    * term's df, so skew is visible in the df column itself (stoplist
    * terms above a df ceiling before writing at web scale). */
  def postings(docs: DataFrame, textCol: String, idCol: String,
               minDf: Long = 2L): DataFrame =
    Explodes.nonEmpty(docs,
        array_distinct(TextFns.tokens(col(textCol))), "term",
        col(idCol).as("doc_id"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
      .filter(col("df") >= minDf)

  /** Term co-occurrence with PMI: document-level pairs (a<b) scored
    * ln(P(a,b)/(P(a)P(b))) — collocation mining over a corpus. The
    * pair space is bounded by `minPairs` AFTER one doc-keyed
    * self-join of the distinct (doc, term) frame; term frequencies
    * broadcast back onto the surviving pairs. PMI is rounded to 4 dp
    * (ln is not correctly-rounded IEEE — same convention as tfidf).
    * At web scale, pre-prune the vocabulary by df ceiling/floor
    * before the self-join (stopwords dominate the pair space). */
  def cooccurrence(docs: DataFrame, textCol: String, idCol: String,
                   minPairs: Long = 2L): DataFrame = {
    val td = Explodes.nonEmpty(docs,
      array_distinct(TextFns.tokens(col(textCol))), "term",
      col(idCol).as("doc_id"))
    val pairs = td.as("a").join(td.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    val tf = td.groupBy("term").agg(count(lit(1)).as("n_t"))
    val n = docs.agg(count(lit(1)).as("__n"))
    pairs
      .join(broadcast(tf.select(col("term").as("term_a"), col("n_t").as("__na"))), "term_a")
      .join(broadcast(tf.select(col("term").as("term_b"), col("n_t").as("__nb"))), "term_b")
      .crossJoin(broadcast(n))
      .select(col("term_a"), col("term_b"), col("n_ab"),
        // denominator multiplied in double: long·long would overflow
        // past ~3e9 docs (the numerator already promotes via n_ab)
        round(log(col("n_ab").cast("double") * col("__n") /
          (col("__na").cast("double") * col("__nb"))), 4).as("pmi"))
  }

  /** Top-k TF-IDF terms per document: (doc_id, term, tfidf, rank). */
  def topTerms(docs: DataFrame, textCol: String, idCol: String,
               k: Int): DataFrame = {
    require(k > 0)
    val tf = Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)),
        "term", col(idCol).as("doc_id"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("__n"))
    // df derived from tf (one row per (doc, term) already) — no second
    // tokenize/explode pass over the corpus; the shared tf subtree is
    // deduplicated by exchange reuse
    val termDf = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(termDf), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        (log((col("__n") + 1).cast("double") / (col("df") + 1)) + 1), 4))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tfidf", "rank")
  }

  /** Zipf fit over the top-`topN` terms: least-squares slope of
    * ln(freq) against ln(rank) — natural corpora sit near −1;
    * template spam flattens the head, noise steepens the tail. The
    * regression inputs are integer micro-nats (round(ln·1e6)) so the
    * moment sums are exact long arithmetic; the closed-form slope /
    * intercept are then identical IEEE doubles in both engines.
    * Ranking ties break by term. Output: one row (n_terms, slope,
    * intercept), 6 dp. */
  def zipfSlope(docs: DataFrame, textCol: String,
                topN: Int = 1000): DataFrame = {
    // top-N FIRST (TakeOrdered: per-partition heads merged, no
    // vocabulary-sized single-task window), THEN rank the ≤topN
    // survivors — identical rows and ranks, scale-safe head
    val ranked = Explodes
      .nonEmpty(docs, TextFns.tokens(col(textCol)), "term")
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("term"))))
      .select(round(log(col("rank").cast("double")) * 1e6)
          .cast("long").as("__x"),
        round(log(col("freq").cast("double")) * 1e6)
          .cast("long").as("__y"))
    ranked.agg(count(lit(1)).as("n_terms"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("n_terms"),
        round((col("n_terms").cast("double") * col("__sxy") -
          col("__sx").cast("double") * col("__sy")) /
          (col("n_terms").cast("double") * col("__sxx") -
            col("__sx").cast("double") * col("__sx")), 6).as("slope"),
        round((col("__sy").cast("double") -
          (col("n_terms").cast("double") * col("__sxy") -
            col("__sx").cast("double") * col("__sy")) /
          (col("n_terms").cast("double") * col("__sxx") -
            col("__sx").cast("double") * col("__sx")) * col("__sx")) /
          col("n_terms") / 1e6, 6).as("intercept"))
  }

  /** Lexical diversity per group — type-token ratio and hapax
    * fraction, the corpus-health numbers that catch template spam
    * (TTR collapses) and OCR noise (hapax explodes) per source.
    * One (group, term) aggregation feeds both statistics; integers
    * until the final divisions. */
  def lexicalDiversity(docs: DataFrame, textCol: String,
                       groupCol: String): DataFrame = {
    val tc = Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)),
        "term", col(groupCol).as("grp"))
      .groupBy("grp", "term").agg(count(lit(1)).as("__c"))
    tc.groupBy("grp").agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("grp"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types"), 6)
          .as("hapax_frac"))
  }

  /** Adjacent-bigram collocations by pointwise mutual information —
    * the multi-word-expression miner ("new york", "machine learning")
    * that document-level co-occurrence PMI (`cooccurrence`) washes
    * out: PMI = ln((c12/N2) / ((c1/N1)·(c2/N1))) over CONSECUTIVE
    * pairs only. `minCount` suppresses the rare-pair PMI explosion;
    * ties and float noise are handled the tfidf way — rounded to
    * 6 dp BEFORE the rank window. Marginals ride as broadcast
    * frames; output: (w1, w2, c12, pmi, rank) top `k`. */
  def collocations(docs: DataFrame, textCol: String,
                   minCount: Long = 5L, k: Int = 20): DataFrame = {
    val uni = LangModel.unigramCounts(docs, textCol)
    val big = LangModel.bigramCounts(docs, textCol)
    val n1 = uni.agg(sum(col("cnt")).as("__n1"))
    val n2 = big.agg(sum(col("cnt")).as("__n2"))
    val scored = big.filter(col("cnt") >= minCount)
      .join(broadcast(uni.select(col("term").as("w1"),
        col("cnt").as("__c1"))), Seq("w1"))
      .join(broadcast(uni.select(col("term").as("w2"),
        col("cnt").as("__c2"))), Seq("w2"))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .withColumn("pmi", round(log(
        (col("cnt").cast("double") / col("__n2")) /
          ((col("__c1").cast("double") / col("__n1")) *
            (col("__c2").cast("double") / col("__n1")))), 6))
      .select(col("w1"), col("w2"), col("cnt").as("c12"), col("pmi"))
    // top-k via TakeOrdered, then rank the k survivors — never a
    // bigram-type-sized single-task window
    scored.orderBy(col("pmi").desc, col("w1"), col("w2")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi").desc, col("w1"), col("w2"))))
  }

  /** Distinctive terms per group — Monroe/Colaresi/Quinn "Fightin'
    * Words" log-odds with an informative Dirichlet prior drawn from
    * the whole corpus (prior mass `a0`, spread across terms in
    * proportion to corpus frequency). For each group g and term
    * present in g:
    *
    *   δ = ln((y_g+a)/(n_g+a0−y_g−a)) − ln((y_r+a)/(n_r+a0−y_r−a))
    *   z = δ / sqrt(1/(y_g+a) + 1/(y_r+a)),  a = a0·y/n
    *
    * where r is the rest of the corpus. The corpus prior shrinks
    * rare-term noise that raw log-odds or tf-idf over-rank.
    *
    * Shapes: one tokenize+explode pass feeds every count; the term
    * and group marginals are vocabulary-/group-sized broadcast
    * frames; the only wide shuffle is the (group, term) count. δ and
    * z are ROUNDED to 6 dp before the per-group rank window so tie
    * order is engine-identical. Output: (grp, term, delta, z, rank),
    * top `k` by z per group. */
  def distinctiveTerms(docs: DataFrame, textCol: String, groupCol: String,
                       k: Int = 5, a0: Double = 100.0): DataFrame = {
    val tok = Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)),
      "term", col(groupCol).as("grp"))
    val yst = tok.groupBy("grp", "term").agg(count(lit(1)).as("y_g"))
    val yt = yst.groupBy("term").agg(sum(col("y_g")).as("y"))
    val ns = yst.groupBy("grp").agg(sum(col("y_g")).as("n_g"))
    val tot = yst.agg(sum(col("y_g")).as("n"))
    val scored = yst
      .join(broadcast(yt), Seq("term"))
      .join(broadcast(ns), Seq("grp"))
      .crossJoin(broadcast(tot))
      .withColumn("__a", lit(a0) * col("y") / col("n"))
      .withColumn("__yr", col("y") - col("y_g"))
      .withColumn("__nr", col("n") - col("n_g"))
      .withColumn("__d",
        log((col("y_g") + col("__a")) /
          (col("n_g") + a0 - col("y_g") - col("__a"))) -
        log((col("__yr") + col("__a")) /
          (col("__nr") + a0 - col("__yr") - col("__a"))))
      .withColumn("__z", col("__d") /
        sqrt(lit(1.0) / (col("y_g") + col("__a")) +
          lit(1.0) / (col("__yr") + col("__a"))))
      .select(col("grp"), col("term"),
        round(col("__d"), 6).as("delta"), round(col("__z"), 6).as("z"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("grp"))
          .orderBy(col("z").desc, col("term"))))
      .filter(col("rank") <= k)
  }

  /** BM25 relevance of every document for a fixed query-term set —
    * the ranking function behind the `postings` index (Robertson
    * idf with the Lucene +1 inside the log, so idf stays positive for
    * terms in over half the corpus).
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))
    * with idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Shapes: ONE tokenize pass; per-doc term frequencies only for the
    * |query|-sized term set (the isin filter drops everything else
    * before the aggregation); df/avglen/N ride as broadcast frames.
    * Only matching documents return (score > 0): (idCol, n_matched,
    * score). */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFns.tokens(col(textCol)).as("__tk"))
    val lens = toks.select(col("doc_id"), size(col("__tk")).as("__len"))
    val stats = lens.agg(count(lit(1)).as("__n"),
      (sum(col("__len")) * lit(1.0) / count(lit(1))).as("__avglen"))
    val tf = Explodes.nonEmpty(toks, col("__tk"), "term",
        col("doc_id"), size(col("__tk")).as("__len"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "__len", "term").agg(count(lit(1)).as("tf"))
    val termDf = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = termDf.crossJoin(broadcast(stats))
      .select(col("term"),
        log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5))
          .as("__idf"),
        col("__avglen"))
    tf.join(broadcast(idf), Seq("term"))
      .withColumn("__s", col("__idf") * col("tf") * (k1 + 1) /
        (col("tf") + lit(k1) *
          (lit(1 - b) + lit(b) * col("__len") / col("__avglen"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"),
        round(sum(col("__s")), 6).as("score"))
  }

  /** Vocabulary coverage curve: for each cutoff N in `ns`, what
    * fraction of all token OCCURRENCES the N most frequent terms
    * cover — the number that sizes a tokenizer vocabulary ("32k types
    * cover 99.2% of the stream"). Frequency ranking breaks ties on
    * the term so the curve is engine-stable.
    *
    * Scale shape: one token-count aggregation over the corpus, then
    * the global frequency rank uses the `partitionOffsets` skeleton
    * (range-repartition on (cnt desc, term) + per-partition offsets —
    * metadata collect), NOT a single-task window: a 100 M-type web
    * vocabulary still ranks across the cluster. All cutoffs share the
    * ranked frame via conditional sums in ONE pass. Output per
    * cutoff: (top_n, n_terms, total_tokens, covered_tokens,
    * coverage_micro). */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty, "vocabCoverage: no cutoffs")
    val counts = Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)),
        "term")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val (withPid, offsets, _) = Batching.partitionOffsets(counts,
      Seq(col("cnt").desc, col("term")), count(lit(1)), 0)
    val w = Window.partitionBy("__pid")
      .orderBy(col("cnt").desc, col("term"))
    val ranked = withPid.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__rank", col("__offset") + row_number().over(w))
    val covAggs = ns.map(n =>
      sum(when(col("__rank") <= n, col("cnt")).otherwise(0L))
        .as(s"__cov$n"))
    val aggs = Seq(count(lit(1)).as("n_terms"),
      sum(col("cnt")).as("total_tokens")) ++ covAggs
    val wide = ranked.agg(aggs.head, aggs.tail: _*)
    val rows = ns.map(n => struct(lit(n).as("top_n"),
      col("n_terms"), col("total_tokens"),
      col(s"__cov$n").as("covered_tokens")))
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
      // empty corpus: the global agg still returns its one row with a
      // null total — drop it so the result is 0 rows (the SQL shape)
      .filter(col("total_tokens").isNotNull)
      .withColumn("coverage_micro",
        round(col("covered_tokens").cast("double") /
          col("total_tokens") * 1e6).cast("long"))
  }

  /** Feature hashing (the hashing-trick vectorizer): every token maps
    * to one of `k` slots via the portable 60-bit hash, per-document
    * slot counts are the fixed-width sparse feature vector — the
    * vocabulary-free text representation that needs NO fitted state
    * and therefore no model broadcast at 100 TB (collisions are the
    * documented price; pick k accordingly). One explode + one hash
    * aggregation, long format. Output: (idCol, slot, cnt). */
  def hashVectorize(docs: DataFrame, textCol: String, idCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)), "term",
        col(idCol))
      .withColumn("slot",
        (graft.functions.ColumnFns.hash60(col("term")) % k).cast("int"))
      .groupBy(col(idCol), col("slot")).agg(count(lit(1)).as("cnt"))
  }

  /** Heaps-law vocabulary growth curve: distinct-type count vs token
    * count over a NESTED chain of corpus subsets (doc_id mod
    * `buckets` < d) — the curve whose log-log slope says how fast new
    * vocabulary keeps arriving as the corpus grows (tokenizer sizing,
    * dedup saturation checks). The trick that makes it one pass: a
    * term is in subset d iff its MINIMUM doc bucket < d, so one
    * per-term min + conditional counts replay every subset without
    * rescanning — growing the curve to 100 subsets costs 100 counters,
    * not 100 corpus scans. Output: (subset, n_tokens, vocab). */
  def heapsCurve(docs: DataFrame, textCol: String, idCol: String,
                 buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val toks = Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)),
        "term", col(idCol))
      .withColumn("__m", pmod(col(idCol), lit(buckets)))
    val termFirst = toks.groupBy("term").agg(min(col("__m")).as("__fm"))
    // coalesce: a zero-document corpus makes the grand aggregation
    // emit NULL sums; the curve's contract (and the count(*) oracle
    // semantics) is 0 tokens / 0 vocab per subset, not NULL.
    val vocabAggs = (1 to buckets).map(d =>
      coalesce(sum(when(col("__fm") < d, 1L).otherwise(0L)), lit(0L))
        .as(s"__v$d"))
    val vocabWide = termFirst.agg(vocabAggs.head, vocabAggs.tail: _*)
    val tokAggs = (1 to buckets).map(d =>
      coalesce(sum(when(col("__m") < d, 1L).otherwise(0L)), lit(0L))
        .as(s"__t$d"))
    val tokWide = toks.agg(tokAggs.head, tokAggs.tail: _*)
    val rows = (1 to buckets).map(d => struct(lit(d).as("subset"),
      col(s"__t$d").as("n_tokens"), col(s"__v$d").as("vocab")))
    tokWide.crossJoin(broadcast(vocabWide))
      .select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Token fertility by language: characters per token — the
    * tokenizer-equity number ("this vocab spends 3× the tokens per
    * character on Thai"). Exact long sums of token and character
    * counts per language bucket; one narrow aggregation. Output:
    * (lang, n_docs, n_tokens, n_chars, chars_per_token_micro) —
    * null ratio for token-less buckets. */
  def tokenFertility(docs: DataFrame, textCol: String,
                     langCol: String): DataFrame =
    docs.select(col(langCol).as("lang"),
        size(TextFns.tokens(col(textCol))).cast("long").as("__nt"),
        length(col(textCol)).cast("long").as("__nc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"),
        sum(col("__nc")).as("n_chars"))
      .withColumn("chars_per_token_micro",
        when(col("n_tokens") > 0,
          round(col("n_chars").cast("double") / col("n_tokens") * 1e6)
            .cast("long")))
}
