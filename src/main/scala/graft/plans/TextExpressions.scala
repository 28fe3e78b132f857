package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing kernels for the dedup operators.
  *
  * The composable form (TextFns.shingleHashes + minhashPerm — split /
  * transform / aggregate HOFs) runs interpreted and allocates a shingle
  * STRING plus a boxed hash per element per row; at corpus scale the
  * minhash build dominates LSH cost. The kernel below computes the
  * whole k-permutation signature in one compiled pass with zero
  * intermediate arrays: tokens stream through an incrementally-updated
  * md5 (no shingle string is ever materialized) and every permutation's
  * running minimum updates in place.
  *
  * Bitwise-identical to the HOF chain (property-tested in
  * TextKernelSpec):
  *   - tokens = lower(text) split on \s+, empties dropped
  *   - shingle hash = first 15 md5 hex digits as long (hash60), mod P
  *   - perm_i = min over shingles of (a_i*h + b_i) mod P
  * `array_distinct` in the HOF chain is correctness-neutral here: a
  * duplicate shingle can never change a minimum, so the kernel skips
  * the dedup pass entirely.
  */
object TextKernels {
  val P: Long = 1000000007L

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val SPACE = Array[Byte](' ')

  /** First 60 bits of md5 as a non-negative long (= first 15 hex
    * digits parsed base-16, exactly TextFns/ColumnFns hash60). */
  private def digest60(md: MessageDigest): Long = {
    val d = md.digest()
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
    l >>> 4
  }

  /** Lowercased whitespace tokens as UTF-8 byte arrays (empties
    * dropped) — exactly TextFns.tokens. */
  private def tokenBytes(text: UTF8String): Array[Array[Byte]] = {
    val toks0 = text.toLowerCase.toString.split("\\s+")
    val toks = new Array[Array[Byte]](toks0.length)
    var nt = 0
    var i = 0
    while (i < toks0.length) {
      if (!toks0(i).isEmpty) {
        toks(nt) = toks0(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        nt += 1
      }
      i += 1
    }
    if (nt == toks.length) toks else java.util.Arrays.copyOf(toks, nt)
  }

  /** SimHash over `bits` low bits of per-token hash60 values — exactly
    * TextFns.simhashHof (0L for token-less docs). */
  def simhash(text: UTF8String, bits: Int): Long = {
    if (text == null) return 0L
    val toks = tokenBytes(text)
    val votes = new Array[Int](bits)
    val md = md5Local.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      md.update(toks(i))
      val h = digest60(md)
      var j = 0
      while (j < bits) {
        votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Character-distribution entropy in exact integer micro-nats —
    * bitwise TextFns.charEntropyHof: counts are per Unicode CODE
    * POINT (the unit Spark's `split(c, "")` yields — it keeps
    * surrogate pairs intact, so '😀' is ONE symbol, not two UTF-16
    * units), L(x) = round(ln(x)·1e6) as a long (non-negative domain,
    * so Math.round == HALF_UP), and entropy =
    * round((n·L(n) − Σ_c k_c·L(k_c)) / (n·1e6), 6) with the same
    * BigDecimal HALF_UP final rounding Spark's `round` applies.
    * One compiled pass + an alphabet-bounded count table instead of
    * the interpreted split → array_sort → aggregate HOF chain (which
    * allocates one UTF8String per character per row). 0.0 for empty. */
  def charEntropy(text: UTF8String): Double = {
    if (text == null) return 0.0
    val s = text.toString
    val len = s.length
    if (len == 0) return 0.0
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L // code-point count, not UTF-16 length
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val box = other.get(cp)
        if (box == null) other.put(cp, Array(1L)) else box(0) += 1L
      }
      n += 1L
      i += Character.charCount(cp)
    }
    def lmicro(x: Long): Long = Math.round(Math.log(x.toDouble) * 1e6)
    var sum = 0L
    var ci = 0
    while (ci < 128) {
      val k = ascii(ci)
      if (k > 0) sum += k * lmicro(k)
      ci += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val k = it.next()(0); sum += k * lmicro(k) }
    }
    val raw = (n * lmicro(n) - sum).toDouble / (n.toDouble * 1e6)
    java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** MOSS winnowing picks over an n-gram hash array: for every
    * length-`w` window, the minimum hash with RIGHTMOST tie-break,
    * deduplicated to (pos, fp) — bitwise the HOF form in
    * Dedup.winnowFingerprintsHof (slice → array_min → rightmost
    * array_max scan per window, then array_distinct), but one O(len)
    * pass with a monotone deque instead of O(len·w) interpreted with
    * a fresh window array per start. `>=` back-pops make the deque
    * front the LATEST index among equal minima (the rightmost-tie
    * rule); a picked pos repeats only in consecutive windows, so
    * last-pos dedup equals array_distinct. Docs shorter than one
    * window emit their single best pick; empty arrays emit none. */
  def winnowPicks(hashes: ArrayData, w: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val hs = hashes.toLongArray()
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    def pick(pos: Int): Any =
      new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](pos.toLong, hs(pos)))
    if (m < w) {
      var best = 0
      var i = 1
      while (i < m) { if (hs(i) <= hs(best)) best = i; i += 1 }
      out += pick(best)
    } else {
      val dq = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      var lastPos = -1
      var i = 0
      while (i < m) {
        while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) {
          val p = dq(head)
          if (p != lastPos) { out += pick(p); lastPos = p }
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** All pairs within `maxHamming` popcount distance from a
    * (doc_id, sig) member array — compiled nested loop, survivors
    * only. */
  def hammingPairs(members: ArrayData, maxHamming: Int): ArrayData = {
    val n = members.numElements()
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      ids(i) = row.getLong(0)
      sigs(i) = row.getLong(1)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if (h <= maxHamming)
          out += new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](ids(i), ids(j), h.toLong))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** All n-gram hash60 values of the whitespace tokens, duplicates
    * AND order preserved (index i = the n-gram starting at token i) —
    * the building block of the duplicated-span census. Incremental
    * md5 over token bytes: no n-gram string is ever materialized.
    * Empty array (not null) below n tokens, so downstream explodes
    * drop the doc without a null-handling branch. */
  def ngramHashes(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val toks = tokenBytes(text)
    val nt = toks.length
    if (nt < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nt - n + 1)
    val md = md5Local.get()
    var s = 0
    while (s <= nt - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(SPACE)
        md.update(toks(s + j))
        j += 1
      }
      out(s) = digest60(md)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** k-permutation minhash signature over n-token shingles; null when
    * the document has fewer than n tokens. */
  def minhashSignature(text: UTF8String, k: Int, n: Int): ArrayData = {
    if (text == null) return null
    val toks = tokenBytes(text)
    val nt = toks.length
    if (nt < n) return null
    var i = 0
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // coefficients a_i, b_i exactly as TextFns.minhashPerm
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    i = 0
    while (i < k) {
      as(i) = graft.functions.TextFns.minhashA(i)
      bs(i) = graft.functions.TextFns.minhashB(i)
      i += 1
    }
    val md = md5Local.get()
    var s = 0
    while (s <= nt - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(SPACE)
        md.update(toks(s + j))
        j += 1
      }
      val h = digest60(md) % P
      i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  /** Count-min bucket row for every hash j: first 60 bits of
    * md5(prefix_j || keyBytes) mod width, prefixes precomputed by the
    * caller ([[CmsBuckets]]). */
  def cmsBuckets(key: UTF8String, prefixes: Array[Array[Byte]],
                 width: Int): ArrayData = {
    if (key == null) return null
    val kb = key.getBytes
    val out = new Array[Long](prefixes.length)
    val md = md5Local.get()
    var j = 0
    while (j < prefixes.length) {
      md.reset()
      md.update(prefixes(j))
      md.update(kb)
      out(j) = digest60(md) % width
      j += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass token repetition statistics over the standard tokenizer
    * (lowercase, split \s+, empties dropped): (n, n_distinct,
    * top_count, n_consec) — token total, distinct tokens, the highest
    * single-token frequency, and adjacent-equal-pair count. The three
    * Gopher-style repetition screens all derive from this row. */
  def tokenStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toLowerCase.toString.split("\\s+")
    val counts = new java.util.HashMap[String, Integer]()
    var n = 0
    var top = 0
    var consec = 0
    var prev: String = null
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.isEmpty) {
        n += 1
        val c = counts.merge(t, 1, IntSum)
        if (c > top) top = c
        if (prev != null && prev == t) consec += 1
        prev = t
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size, top, consec))
  }

  private val IntSum =
    new java.util.function.BiFunction[Integer, Integer, Integer] {
      override def apply(a: Integer, b: Integer): Integer = a + b
    }
}

/** `graft_hamming_pairs(members, maxHamming)` over an
  * array<struct<doc_id:long, sig:long>>: all (i, j) pairs with
  * popcount(sig_i ^ sig_j) <= maxHamming, as
  * array<struct<id_a, id_b, hamming>>. Compiled double loop + one
  * Long.bitCount per candidate — the interpreted HOF equivalent
  * (filter(pairs(...), hamming <= k)) allocates a lambda frame and a
  * struct per candidate; this emits only survivors. Input order is
  * preserved (callers pass a sorted member list so id_a < id_b). */
case class HammingPairs(child: Expression, maxHamming: Int)
  extends UnaryExpression {

  private val elemType = new org.apache.spark.sql.types.StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)
    .add("hamming", LongType, nullable = false)
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def prettyName: String = "graft_hamming_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _)
      if s.length == 2 && s.fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<long,long>>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.hammingPairs(input.asInstanceOf[ArrayData], maxHamming)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.hammingPairs($c, $maxHamming)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash(text, bits)` → long: bit j of the signature is set
  * when the sum of (+1/-1) votes from bit j of each token's hash60 is
  * positive. Bitwise-identical to TextFns.simhashHof; one compiled
  * pass, no interpreted aggregate per bit. */
/** Compiled winnowing pick kernel — TextKernels.winnowPicks;
  * parity-tested against the HOF window scan (TextKernelSpec). */
case class WinnowPicks(child: Expression, w: Int) extends UnaryExpression {

  private val elemType = new org.apache.spark.sql.types.StructType()
    .add("pos", LongType, nullable = false)
    .add("fp", LongType, nullable = false)
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def prettyName: String = "graft_winnow_picks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.winnowPicks(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.winnowPicks($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compiled character-entropy screen — TextKernels.charEntropy;
  * bitwise-parity-tested against the HOF chain (TextKernelSpec). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_char_entropy"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.charEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_token_stats(text)` → struct<n, n_distinct, top_count,
  * n_consec> — the one-pass repetition-screen row ([[TextKernels
  * .tokenStats]]). The HOF forms it replaces (array_distinct +
  * array_sort + two interpreted `aggregate` folds over a split array)
  * tokenize and scan the document four times, all interpreted; this
  * is one compiled pass and one hash map. */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStats.outType
  override def prettyName: String = "graft_token_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokenStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.tokenStats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  private[plans] val outType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_distinct",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("top_count",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_consec",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
}

case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_ngram_hashes(text, n)` → array<long> of hash60 values for
  * every word n-gram, duplicates and positions preserved (empty below
  * n tokens). Same md5-derived 60-bit hash as ColumnFns.hash60, so a
  * SQL oracle reproduces each value from the joined n-gram string. */
case class NgramHashes(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.ngramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.ngramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sig(text)` → array<long> of `numHashes` permutation minima
  * (null for docs shorter than `shingleSize` tokens). Codegen emits a
  * single static kernel call — the row stays inside whole-stage
  * codegen, the loop runs compiled. */
case class MinhashSignature(child: Expression, numHashes: Int,
                            shingleSize: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashSignature(input.asInstanceOf[UTF8String],
      numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val kernel = "graft.plans.TextKernels"
    ev.copy(code = childGen.code +
      code"""
        |boolean ${ev.isNull} = true;
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${childGen.isNull}) {
        |  ${ev.value} = $kernel.minhashSignature(
        |    ${childGen.value}, $numHashes, $shingleSize);
        |  ${ev.isNull} = (${ev.value} == null);
        |}
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_cms_buckets(key)` → array<long> of one bucket per hash row:
  * element j = first 60 bits of md5(salt || j || ":" || key) mod
  * width — bit-identical to the composable
  * `conv(substring(md5(concat(...)), 1, 15), 16, 10) % width` chain,
  * which pays a string concat, a full hex render, and a base-16
  * re-parse PER ROW PER HASH. Here the salt+j prefixes are built once
  * at plan time and each row runs `depth` incremental md5 updates in
  * one compiled call. Null keys return null (the composable chain
  * kept a null-bucket row; a null bucket can never serve an estimate,
  * so dropping it changes no query result). */
case class CmsBuckets(child: Expression, depth: Int, width: Int,
                      salt: String)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms_buckets"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until depth).map(j =>
      (salt + j.toString + ":")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.cmsBuckets(input.asInstanceOf[UTF8String], prefixes, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsPrefixes", prefixes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.cmsBuckets($c, $ref, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
