package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / fingerprinting function layer (north-star ops for
  * training-data pipelines; SURVEY.md §7.2 step 8).
  *
  * Everything here is built from codegen'd built-ins (split/transform/
  * aggregate/regexp) — no UDFs — and sticks to arithmetic that is
  * reproducible in portable SQL so the DuckDB oracle can verify it:
  * the base hash is the first 15 hex digits of md5 (ColumnFns.hash60),
  * and all modular math stays below 2^62 (no silent overflow on the
  * Spark side, no BIGINT overflow errors on the oracle side).
  */
object TextFns {
  /** Modulus for all rolling/minhash arithmetic (fits products in 2^60). */
  val P: Long = 1000000007L

  import ColumnFns.hash60

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  /** n-word shingles joined by single spaces; empty array when the
    * document has fewer than n tokens (guards Spark's descending
    * `sequence` when start > stop). */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Distinct word-shingles hashed to [0, P) — the md5 work dominates
    * minhash cost, so this is computed ONCE per doc and fed to every
    * permutation (materialize it in its own projection; Catalyst's
    * CollapseProject keeps non-cheap multi-referenced aliases apart). */
  def shingleHashes(c: Column, shingleSize: Int): Column =
    transform(array_distinct(wordShingles(c, shingleSize)),
      s => hash60(s) % P)

  /** Per-token xxhash64 values — the cheap building block for hashed
    * shingles: one hash per token, no shingle STRINGS ever built. */
  def tokenHashes64(c: Column): Column =
    transform(tokens(c), t => xxhash64(t))

  /** Distinct n-token shingle hashes from a precomputed token-hash
    * array (`tokenHashes64`): shingle hash = xxhash64 of the n
    * consecutive token hashes. Distinctness structure matches string
    * shingles (tokens contain no separators; 64-bit collisions are
    * negligible), so |A∩B|/|A∪B| over these equals the string-set
    * Jaccard — at a fraction of the cost (no per-shingle string
    * concat, no md5). `th` should be a plain column reference (bind it
    * in its own projection) so the n `element_at` reads don't
    * duplicate the tokenize work. */
  def shinglesFromTokenHashes64(th: Column, n: Int): Column =
    array_distinct(
      when(size(th) < n, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(1), size(th) - (n - 1)),
          i => xxhash64((0 until n).map(j => element_at(th, i + j)): _*))))

  /** Distinct shingles as fast 64-bit hashes — for set-cardinality ops
    * (Jaccard) where the hash never has to be reproduced by an external
    * oracle. Column-expression form; batch callers should bind
    * `tokenHashes64` in its own projection and use
    * `shinglesFromTokenHashes64` so tokenization runs once. */
  def shingleHashes64(c: Column, n: Int): Column =
    shinglesFromTokenHashes64(tokenHashes64(c), n)

  /** Per-slot minhash coefficients — INDEPENDENT per slot via a
    * splitmix64 finalizer. The original family
    * `a_i = c1·(i+1) mod P, b_i = c2·(i+1) mod P` is RANK-1: slot i's
    * value collapses to `(i+1)·(c1·h + c2) mod P`, every "permutation"
    * a multiple of the same mixed value g — so a shingle with small g
    * (probability ~1/k of escaping wraparound across k slots at
    * P ≈ 2^30) is the argmin of MOST slots in every doc containing it,
    * and two docs sharing one such boilerplate shingle agree on 60–95
    * of 128 slots at true Jaccard 0.01. Measured by the round-15
    * confirm census (CONFIRM_CENSUS.json: 69 FPs at J<0.3, k=128,
    * >10σ under slot independence) and eliminated by this family
    * (post-fix census: the J<0.3 tail is zero). `a` is nonzero mod P,
    * so each slot is a proper affine permutation of Z_P. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def minhashA(i: Int): Long = 1L + Math.floorMod(mix64(2L * i), P - 1)
  def minhashB(i: Int): Long = Math.floorMod(mix64(2L * i + 1), P)

  /** Version tag of the minhash coefficient family above. Persisted
    * into every band-signature store's table properties
    * (`graft.lsh.hashFamily`) and REQUIRED to match on append/ingest:
    * signatures from different families are schema-identical longs
    * that silently never agree, so a store written under the retired
    * rank-1 family (or any future family change) must fail loudly
    * instead of never confirming a near-dup again. Bump this string
    * whenever minhashA/minhashB (or the slot mixing) changes. */
  val hashFamily: String = "splitmix64-v1"

  /** MinHash permutation i over pre-hashed shingles:
    * min of (a_i * h + b_i) mod P. Null for short docs. */
  def minhashPerm(hs: Column, i: Int): Column = {
    val a = minhashA(i)
    val b = minhashB(i)
    array_min(transform(hs, h => (lit(a) * h + lit(b)) % P))
  }

  /** MinHash permutation i over word-shingle hashes:
    * min over shingles of (a_i * (h mod P) + b_i) mod P.
    * Null when the document is shorter than the shingle size.
    * (Single-permutation form; batch callers should share
    * `shingleHashes` across permutations.) */
  def minhash(c: Column, i: Int, shingleSize: Int): Column =
    minhashPerm(shingleHashes(c, shingleSize), i)

  /** Whole k-permutation signature as ONE native codegen'd kernel call
    * (graft.plans.MinhashSignature) — bitwise-identical to
    * `minhashPerm(shingleHashes(...), i)` for i < k (TextKernelSpec),
    * ~10× cheaper: no interpreted HOFs, no shingle strings, no boxed
    * hashes. Null for docs shorter than the shingle size. */
  def minhashSignatureNative(c: Column, k: Int, shingleSize: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.MinhashSignature(
      ColumnBridge.expression(c), k, shingleSize))
  }

  /** Compiled n-gram hash60 array (plans.NgramHashes): every word
    * n-gram's 60-bit md5 hash, duplicates AND positions preserved
    * (index i = n-gram starting at token i; empty array below n
    * tokens). Bitwise-identical to `transform(wordShingles(c, n),
    * hash60)` (TextKernelSpec) with no n-gram strings materialized —
    * the hot-path form of the duplicated-span census. */
  def ngramHashesNative(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.NgramHashes(
      ColumnBridge.expression(c), n))
  }

  /** SimHash over `bits` low bits of the token hashes: bit j of the
    * signature is set when the sum of (+1/-1) votes at position j is
    * positive. Native kernel (graft.plans.SimHash) — one compiled
    * pass; `simhashHof` below is the reference implementation it is
    * property-tested against. */
  def simhash(c: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.SimHash(ColumnBridge.expression(c), bits))
  }

  /** Interpreted HOF simhash (semantics baseline for TextKernelSpec —
    * also the form the DuckDB oracle reproduces). */
  def simhashHof(c: Column, bits: Int = 16): Column = {
    val hs = transform(tokens(c), t => hash60(t))
    (0 until bits).map { j =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(1L) * 2L - 1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash signatures: one
    * `bit_count(xor)` intrinsic (Long.bitCount in codegen) instead of
    * a per-bit shift chain; masked to the low `bits` bits. */
  def hamming(a: Column, b: Column, bits: Int = 16): Column = {
    val x = a.bitwiseXOR(b)
    val masked = if (bits >= 64) x else x.bitwiseAND((1L << bits) - 1)
    bit_count(masked).cast("long")
  }

  /** Rolling polynomial fingerprint over tokens:
    * fold (acc*31 + h mod P) mod P — order-sensitive, so distinct
    * word orders give distinct fingerprints (unlike set hashes). */
  def fingerprint(c: Column): Column =
    aggregate(transform(tokens(c), t => hash60(t) % P),
      lit(0L), (acc, h) => (acc * 31L + h) % P)

  /** All ordered pairs (x_i, x_j), i<j, from a (pre-sorted) array —
    * used to emit candidate pairs inside an LSH bucket without a
    * self-join. */
  def pairs(ids: Column): Column =
    flatten(transform(sequence(lit(1), size(ids) - 1), i =>
      transform(slice(ids, i + 1, size(ids) - i),
        x => struct(element_at(ids, i).as("_1"), x.as("_2")))))

  // ---- quality / language heuristics --------------------------------

  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Count of tokens found in `words` (multiset semantics). */
  def tokenHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(words.map(lit): _*)))

  def wordCount(c: Column): Column = size(tokens(c))

  // ---- PII screens (corpus hygiene: find-then-redact before any
  // text ships to training). Patterns stay inside the regex subset
  // Java and RE2 agree on (char classes, bounded quantifiers) so the
  // SQL oracle replays counts and redactions byte-for-byte. These are
  // pattern screens, not NER — they catch the formats, not free-text
  // names; compose with a model-based pass when that matters. ----

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^ \\t\\n]+"
  val phonePattern = "\\+[0-9][0-9()\\-. ]{7,}[0-9]"

  /** Per-doc PII format counts: struct(n_emails, n_urls, n_phones). */
  def piiCounts(c: Column): Column = struct(
    size(regexp_extract_all(c, lit(emailPattern), lit(0))).as("n_emails"),
    size(regexp_extract_all(c, lit(urlPattern), lit(0))).as("n_urls"),
    size(regexp_extract_all(c, lit(phonePattern), lit(0))).as("n_phones"))

  /** Redact in a fixed order (emails, then URLs, then phones) — order
    * is part of the contract since patterns can overlap. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        urlPattern, "<URL>"),
      phonePattern, "<PHONE>")

  /** Canonical text form for normalization-aware exact dedup (the C4
    * convention: case, punctuation, and whitespace variants of the
    * same content are duplicates): lowercase, every non-alphanumeric
    * run becomes one space, trimmed. Pure codegen'd expression; stays
    * in the Java∩RE2 regex subset so oracles replay it. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Shannon entropy (nats, 6 dp) of the CHARACTER distribution — the
    * gibberish / keyboard-mash / base64-blob screen that complements
    * the word-level repetition filters (low entropy = one repeated
    * glyph, high = uniform noise; prose sits in a stable band).
    *
    * Engine-exact via the LangModel integer trick: entropy
    * = (n·ln n − Σ_c k_c·ln k_c)/n, with each ln rounded to integer
    * micro-nats FIRST so the sum is exact long arithmetic and the
    * only float op is the final division. Native kernel
    * (graft.plans.CharEntropy) — one compiled pass with an
    * alphabet-bounded count table; `charEntropyHof` below is the
    * reference implementation it is parity-tested against.
    * 0.0 for empty documents. */
  def charEntropy(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.CharEntropy(ColumnBridge.expression(c)))
  }

  /** Interpreted HOF char entropy (semantics baseline for
    * TextKernelSpec — also the form the DuckDB oracle reproduces). */
  def charEntropyHof(c: Column): Column = {
    val chs = filter(split(c, ""), ch => ch =!= "")
    val n = size(chs).cast("long")
    def lmicro(x: Column) =
      round(log(x.cast("double")) * 1e6).cast("long")
    // Σ k·L(k) over per-char counts == the same sum over RUN lengths
    // of the sorted char array — one O(len) aggregate pass after the
    // sort, instead of a per-distinct-char rescan (O(len·distinct)
    // made this the slowest query in the bench suite at 4.5 s; the
    // run-length form is ~7× cheaper). Accumulator: (prev char, run
    // length, flushed sum); r=0 guards keep ln(0) out.
    def flush(acc: Column) = {
      val (r, s) = (acc.getField("r"), acc.getField("s"))
      when(r === 0, s).otherwise(s + r * lmicro(r))
    }
    val s = aggregate(
      array_sort(chs),
      struct(lit("").as("p"), lit(0L).as("r"), lit(0L).as("s")),
      (acc, ch) => {
        val same = acc.getField("p") === ch
        struct(ch.as("p"),
          when(same, acc.getField("r") + 1L).otherwise(lit(1L)).as("r"),
          when(same, acc.getField("s")).otherwise(flush(acc)).as("s"))
      },
      flush)
    when(n === 0, 0.0).otherwise(
      round((n * lmicro(n) - s).cast("double") / (n.cast("double") * 1e6), 6))
  }

  // ---- repetition screens (Gopher-style, Rae et al. 2021 §A1.1) ----
  // Training corpora drop boilerplate/repetitive docs before anything
  // else touches them; at word level these are pure Column HOFs — no
  // UDF, no shuffle, they fuse into the scan projection.

  /** One-pass repetition statistics: struct<n, n_distinct, top_count,
    * n_consec> from the native kernel (graft.plans.TokenStats) — bind
    * it once in its own projection and derive every repetition screen
    * from the fields (the `...OnTokens` HOF forms below are the
    * semantics baselines TextKernelSpec pins it against). */
  def tokenStats(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.TokenStats(ColumnBridge.expression(c)))
  }

  /** Fraction of tokens that are repeats of an earlier token:
    * 1 - distinct/total. 0 for empty docs. Native kernel pass. */
  def dupTokenFraction(c: Column): Column =
    dupFracOf(tokenStats(c))

  /** `dup_frac` from a bound `tokenStats` struct column. */
  def dupFracOf(ts: Column): Column = {
    val n = ts.getField("n")
    when(n === 0, lit(0.0)).otherwise(
      (n - ts.getField("n_distinct")).cast("double") / n)
  }

  /** `top_frac` from a bound `tokenStats` struct column. */
  def topFracOf(ts: Column): Column = {
    val n = ts.getField("n")
    when(n === 0, lit(0.0)).otherwise(
      ts.getField("top_count").cast("double") / n)
  }

  /** `consec_frac` from a bound `tokenStats` struct column. */
  def consecFracOf(ts: Column): Column = {
    val n = ts.getField("n")
    when(n < 2, lit(0.0)).otherwise(
      ts.getField("n_consec").cast("double") / (n - 1))
  }

  /** `dupTokenFraction` over a pre-tokenized array column — the
    * interpreted HOF semantics baseline (bind the `tokens(...)` array
    * once in its own projection; CollapseProject leaves the non-cheap
    * split alias alone, so it is evaluated once, not once per screen). */
  def dupTokenFractionOnTokens(t: Column): Column =
    when(size(t) === 0, lit(0.0)).otherwise(
      (size(t) - size(array_distinct(t))).cast("double") / size(t))

  /** Fraction of tokens covered by the single most frequent token —
    * the word-level analog of Gopher's top-n-gram screen. Top-token
    * count = longest equal run of the SORTED token array, folded in
    * one `aggregate` pass with (prev, run, best) state — O(n log n)
    * per row, not the O(n · distinct) of counting each distinct token
    * against the full array. */
  def topTokenFraction(c: Column): Column =
    topFracOf(tokenStats(c))

  def topTokenFractionOnTokens(t: Column): Column = {
    val best = aggregate(array_sort(t),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(t) === 0, lit(0.0))
      .otherwise(best.cast("double") / size(t))
  }

  /** Fraction of adjacent token positions that repeat (stutter runs:
    * "batch batch batch"). */
  def consecRepeatFraction(c: Column): Column =
    consecFracOf(tokenStats(c))

  def consecRepeatFractionOnTokens(t: Column): Column =
    when(size(t) < 2, lit(0.0)).otherwise(
      size(filter(zip_with(slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1), (a, b) => a === b), x => x))
        .cast("double") / (size(t) - 1))

  /** Marker-word lists for the n-gram/stopword language-ID heuristic.
    * Declaration order is the tie-break precedence. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "es"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "les", "est", "et"))

  /** Language-ID heuristic: argmax of marker-word hits, ties broken by
    * `langMarkers` order. Pure Column expr — one pass over tokens. */
  def langGuess(c: Column): Column = {
    val counts = langMarkers.map { case (l, ws) => (l, tokenHits(c, ws)) }
    def best(rest: List[(String, Column)]): Column = rest match {
      case (l, _) :: Nil => lit(l)
      case (l, cnt) :: tail =>
        when(tail.map(cnt >= _._2).reduce(_ && _), lit(l))
          .otherwise(best(tail))
      case Nil => lit(null)
    }
    best(counts.toList)
  }

  /** Punctuation chars / total chars (0 for empty docs). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(
      length(regexp_replace(c, "[^.,!?;:]", "")).cast("double") / length(c))

  /** Heuristic quality score in [0,1]: blends length, mean word
    * length sanity, stopword presence and punctuation balance —
    * the usual pretraining-filter features, all codegen'd. */
  def qualityScore(c: Column): Column = {
    val nw = wordCount(c).cast("double")
    val lenScore = least(nw / 100.0, lit(1.0))
    val stopScore = least(tokenHits(c, stopwordsEn).cast("double") /
      greatest(nw, lit(1.0)) * 5.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))
    round((lenScore + stopScore + punctScore) / 3.0, 6)
  }
}
