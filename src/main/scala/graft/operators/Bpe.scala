package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.TextFns
import graft.plans.{BpeEncodePieces, BpeTable}

/** BPE merge induction — the tokenizer-vocabulary learning pass of an
  * LLM data pipeline (Sennrich et al. 2016), run corpus-scale: count
  * adjacent symbol pairs weighted by word frequency, merge the most
  * frequent pair everywhere (greedy left-to-right, the reference BPE
  * semantics), repeat.
  *
  * Scale shape: the corpus is tokenized ONCE into a vocabulary-sized
  * (word, freq, symbols) frame — every subsequent step runs on that
  * vocabulary frame, never the corpus. The merge loop itself is
  * ADAPTIVE (the same license as `Dedup.dupClusters`' local
  * union-find): when the vocabulary fits under `localSymbolCap` total
  * symbols it is collected ONCE and the k merges run driver-side with
  * incrementally-maintained pair counts — O(total merges · affected
  * words), no per-step Spark job, so a 32k-merge vocabulary costs two
  * Spark actions total instead of 64k. Above the cap it falls back to
  * the distributed loop: one pair-count aggregation + a one-row argmax
  * + a map-only merge fold per step, with each step's frame persisted
  * and its predecessor released so lineage stays flat. Both paths are
  * bit-identical (BpeSpec parity test).
  *
  * Determinism: ties in the argmax break lexicographically on
  * (left, right) in both paths; the merge fold is a pure function of
  * the symbol array. Both are replayed exactly by the SQL oracle
  * (greedy merge = mark positions, split runs of consecutive marks,
  * merge the odd run-positions — equivalent to the left-to-right
  * fold).
  */
object Bpe {

  /** Greedy left-to-right single-pair merge over a symbol array:
    * fold with (out, pending) accumulator — pending symbol `l`
    * followed by `r` emits the merged symbol, anything else flushes
    * pending. */
  private[graft] def mergeOnce(syms: Column, l: String,
                               r: String): Column = {
    val acc0 = struct(array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    aggregate(syms, acc0,
      (acc, s) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend.isNull, struct(out.as("out"), s.as("pend")))
          .when(pend === lit(l) && s === lit(r),
            struct(concat(out, array(lit(l + r))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"),
            s.as("pend")))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("pend")))))
  }

  /** The local mirror of [[mergeOnce]] — same fold, same output. */
  private[graft] def mergeOnceLocal(syms: Array[String], l: String,
                                    r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var pend: String = null
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      if (pend == null) pend = s
      else if (pend == l && s == r) { out += (l + r); pend = null }
      else { out += pend; pend = s }
      i += 1
    }
    if (pend != null) out += pend
    out.toArray
  }

  /** The vocabulary frame BPE iterates on: one corpus pass. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        filter(split(col("w"), ""), ch => ch =!= "").as("ss"))

  /** Learn `k` merges. Output: (step, left, right, cnt) — the ordered
    * merge table a tokenizer ships.
    *
    * `localSymbolCap`: vocabularies whose TOTAL symbol count (sum of
    * word lengths) fits under the cap are collected and merged
    * driver-side (see object doc); the default 32M symbols is a few
    * hundred MB of driver heap. Set it to 0 to force the distributed
    * path.
    *
    * `batch` (distributed path only): merges up to `batch`
    * symbol-disjoint top pairs per driver round-trip, cutting the
    * per-step job latency that dominates real vocab sizes (k in the
    * tens of thousands = tens of thousands of Spark jobs at
    * batch = 1). At `batch = 1` (the default and every oracle row)
    * the table is EXACTLY the sequential BPE table. At `batch > 1`
    * the table is a documented approximation: every merge in a round
    * had a pre-round count ≥ every pair left out of the round and the
    * round's merges share no symbol, but a merge can CREATE pairs
    * (x, l+r) / (l+r, y) that sequential BPE would have ranked before
    * the round's later picks — after the first such round the tables
    * can diverge (the standard batched-BPE trade; parity at batch = 1
    * is pinned in BpeSpec). */
  def learnMerges(docs: DataFrame, textCol: String, k: Int,
                  localSymbolCap: Long = 32L * 1024 * 1024,
                  batch: Int = 1): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(batch >= 1, s"batch must be positive, got $batch")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordFreqs(docs, textCol).persist()
    val totalSymbols = words
      .agg(coalesce(sum(size(col("ss"))), lit(0L))).as[Long].head()
    val merges =
      if (totalSymbols <= localSymbolCap) {
        val vocab = words.select(col("freq"), col("ss"))
          .as[(Long, Array[String])].collect()
        words.unpersist()
        learnMergesLocal(vocab, k)
      } else learnMergesDistributed(words, k, batch)
    merges.toDF("step", "left", "right", "cnt")
  }

  /** Driver-side merge loop with incrementally-maintained pair counts
    * and a (count desc, left, right)-ordered candidate set: each step
    * touches only the words that contain the chosen pair. Exactly the
    * distributed semantics — the candidate ordering IS the distributed
    * `orderBy(cnt desc, l, r).limit(1)`, and per-word merging is the
    * same greedy fold. */
  private[graft] def learnMergesLocal(
      vocab: Array[(Long, Array[String])],
      k: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val syms = vocab.map(_._2.clone())
    val freqs = vocab.map(_._1)
    val counts = mutable.HashMap.empty[(String, String), Long]
    // pair -> (word index -> occurrences in that word)
    val occ = mutable.HashMap.empty[(String, String), mutable.HashMap[Int, Int]]
    // candidates ordered best-first: count DESC, then (l, r) ASC
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String, Ordering.String)
    val tree = mutable.TreeSet.empty[(Long, String, String)]

    def addWord(wi: Int, sign: Int): Unit = {
      val s = syms(wi)
      val f = freqs(wi) * sign
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val old = counts.getOrElse(p, 0L)
        if (old != 0L) tree.remove((old, p._1, p._2))
        val next = old + f
        if (next == 0L) counts.remove(p)
        else { counts(p) = next; tree.add((next, p._1, p._2)) }
        val m = occ.getOrElseUpdate(p, mutable.HashMap.empty)
        val oc = m.getOrElse(wi, 0) + sign
        if (oc == 0) { m.remove(wi); if (m.isEmpty) occ.remove(p) }
        else m(wi) = oc
        i += 1
      }
    }

    var wi = 0
    while (wi < syms.length) { addWord(wi, +1); wi += 1 }

    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    while (step <= k && tree.nonEmpty) {
      val (cnt, l, r) = tree.head
      merges += ((step, l, r, cnt))
      val affected = occ.get((l, r)).map(_.keysIterator.toArray)
        .getOrElse(Array.emptyIntArray)
      var j = 0
      while (j < affected.length) {
        val w = affected(j)
        addWord(w, -1)
        syms(w) = mergeOnceLocal(syms(w), l, r)
        addWord(w, +1)
        j += 1
      }
      step += 1
    }
    merges.toSeq
  }

  /** The distributed fallback for vocabularies above the local cap:
    * one pair-count aggregation + a top-`batch` collect + a map-only
    * merge fold per ROUND. Each round applies the highest-count pairs
    * that are pairwise symbol-disjoint (greedy scan of the sorted
    * top-`batch` rows, skipping any pair touching a symbol an earlier
    * pick used or produced) — at batch = 1 this is exactly the
    * one-merge-per-job sequential loop; see [[learnMerges]] for the
    * batch > 1 semantics. */
  private def learnMergesDistributed(
      words0: DataFrame, k: Int,
      batch: Int = 1): Seq[(Int, String, String, Long)] = {
    var words = words0
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    var done = false
    while (step <= k && !done) {
      val ss = col("ss")
      val pairs = words.select(col("freq"), explode(arrays_zip(
          slice(ss, lit(1), greatest(size(ss) - 1, lit(0))),
          slice(ss, lit(2), greatest(size(ss) - 1, lit(0))))).as("__p"))
        .select(col("freq"), col("__p.0").as("l"), col("__p.1").as("r"))
        .groupBy("l", "r").agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(batch).collect()
      if (best.isEmpty) done = true
      else {
        // greedy disjoint selection in sorted order; the merged token
        // joins the used set so a later pick can never reference a
        // symbol this round just created (its pre-round count is for
        // a symbol that no longer exists unmerged)
        val used = scala.collection.mutable.HashSet.empty[String]
        val chosen = scala.collection.mutable
          .ArrayBuffer.empty[(String, String, Long)]
        var bi = 0
        while (bi < best.length && step + chosen.length <= k) {
          val (l, r, c) = (best(bi).getString(0), best(bi).getString(1),
            best(bi).getLong(2))
          if (!used(l) && !used(r)) {
            chosen += ((l, r, c))
            used += l; used += r; used += (l + r)
          }
          bi += 1
        }
        var merged = col("ss")
        chosen.foreach { case (l, r, c) =>
          merges += ((step, l, r, c))
          merged = mergeOnce(merged, l, r)
          step += 1
        }
        // localCheckpoint (eager) TRUNCATES lineage — a persist chain
        // keeps every predecessor's cached plan nested inside the
        // current one, and those plan strings grow super-linearly in
        // step count (OOMs the driver before the data ever would)
        val next = words.withColumn("ss", merged).localCheckpoint()
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Apply a learned merge table to new text: the ENCODE side of the
    * tokenizer. Merges apply in step order (the BPE contract). The
    * segmentation runs as ONE compiled kernel call per DISTINCT word
    * (graft.plans.BpeEncodePieces — the MinhashSignature pattern), not
    * a k-deep fold of Column expressions, so a 32k-merge vocabulary
    * costs the same plan as k=5 and per-word work scales with merges
    * actually applied. Token occurrences join back against the
    * vocabulary-sized frame (AQE broadcasts it), so encode cost scales
    * with the vocabulary, not the token count. Output: (idCol, w,
    * pieces). `merges` must be small (it is collected into the plan,
    * like the learn loop). */
  def encode(docs: DataFrame, textCol: String, idCol: String,
             merges: DataFrame): DataFrame = {
    val ordered = merges.select("step", "left", "right")
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    val table = new BpeTable(ordered)
    val toks = docs.select(col(idCol),
      explode(TextFns.tokens(col(textCol))).as("w"))
    val sym = ColumnBridge.column(
      BpeEncodePieces(ColumnBridge.expression(col("w")), table))
    val vocab = toks.select("w").distinct()
      .withColumn("pieces", sym)
    toks.join(vocab, Seq("w")).select(col(idCol), col("w"), col("pieces"))
  }

  /** The pre-kernel encode path — a `mergeOnce` fold per merge step —
    * kept as the parity baseline for BpeSpec (it IS the declared
    * semantics; the kernel must match it bit-for-bit). */
  private[graft] def encodeFoldChain(docs: DataFrame, textCol: String,
                                     idCol: String,
                                     merges: DataFrame): DataFrame = {
    val ordered = merges.select("step", "left", "right")
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    val toks = docs.select(col(idCol),
      explode(TextFns.tokens(col(textCol))).as("w"))
    val init = filter(split(col("w"), ""), ch => ch =!= "")
    val sym = ordered.foldLeft(init) { case (c, (l, r)) => mergeOnce(c, l, r) }
    val vocab = toks.select("w").distinct()
      .withColumn("pieces", sym)
    toks.join(vocab, Seq("w")).select(col(idCol), col("w"), col("pieces"))
  }
}
