package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Early-abort sorted-set intersection — the verification kernel of
  * the PPJoin-style similarity join (`Dedup.prefixFilterPairs`).
  *
  * Given two SORTED `array<bigint>` shingle sets and a per-pair
  * required-overlap bound, runs a merge intersection that maintains
  * the running upper bound `count_so_far + min(remaining_a,
  * remaining_b)` and returns −1 the moment that bound proves the
  * intersection cannot reach `required` — the dynamic equivalent of
  * PPJoin+ suffix filtering: instead of a separate probe over suffix
  * contents, the verify scan itself abandons a false candidate after
  * touching only the elements needed to disprove it. A candidate that
  * is never disproven gets its EXACT intersection size, so exactness
  * is preserved end-to-end (−1 rows fail every `jaccard >= t` filter
  * for t > 0).
  *
  * vs `size(array_intersect(a, b))`: no per-row hash-set build, no
  * output array allocation, early exit — a single branchy merge loop
  * inside whole-stage codegen. Reference workload: the exact-recall
  * dedup pass (ref `scripts/` dedup semantics); the kernel itself is
  * the standard ppjoin verify loop (Xiao et al., WWW'08).
  */
case class SortedOverlapAtLeast(first: Expression, second: Expression,
                                third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_overlap_at_least"

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (arraysOk && third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, int), got " +
        s"${first.dataType.simpleString} / ${second.dataType.simpleString} / " +
        s"${third.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any, r: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val req = r.asInstanceOf[Int]
    val (na, nb) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val rem = math.min(na - i, nb - j)
      if (c + rem < req) return -1
      val va = x.getLong(i); val vb = y.getLong(j)
      if (va == vb) { c += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    if (c < req) -1 else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) => {
      // freshName for every local: two kernel instances (or a kernel
      // pair) can land in ONE codegen scope when Catalyst collapses
      // projections — fixed names then fail janino compilation and
      // silently demote the whole stage to interpreted eval
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val rem = ctx.freshName("rem")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val pruned = ctx.freshName("pruned")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |boolean $pruned = false;
         |while ($i < $na && $j < $nb) {
         |  int $rem = ($na - $i < $nb - $j) ? ($na - $i) : ($nb - $j);
         |  if ($c + $rem < $r) { $pruned = true; break; }
         |  long $va = $a.getLong($i);
         |  long $vb = $b.getLong($j);
         |  if ($va == $vb) { $c++; $i++; $j++; }
         |  else if ($va < $vb) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = ($pruned || $c < $r) ? -1 : $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Static PPJoin+ suffix-filter sketch: 2^bits saturating byte
  * counters of a set's elements by hash bucket, plus a 4-byte
  * big-endian overflow total (Σ per-bucket excess over 127) appended —
  * one BinaryType value of 2^bits + 4 bytes.
  *
  * Buckets come from the top `bits` of a Fibonacci mix of the 64-bit
  * element hash (`h * 0x9E3779B97F4A7C15 >>> (64-bits)`) — uniform
  * even if the input hashes carry structure in their high or low bits.
  *
  * Soundness of the paired bound (see [[BucketBound]]): every common
  * element of two sets lands in the SAME bucket of both sketches, so
  * |A∩B| ≤ Σ_b min(cntA_b, cntB_b); with saturation at 127,
  * min(satA, satB) + min(excA_b, excB_b) ≥ min(cntA_b, cntB_b)
  * per bucket, and Σ_b min(excA_b, excB_b) ≤ min(ovfA, ovfB), so
  * Σ_b min(satA_b, satB_b) + min(ovfA, ovfB) is still an UPPER bound
  * — a candidate pair whose bound falls below the required overlap is
  * provably below the Jaccard threshold and is dropped without ever
  * shipping or scanning the full sorted sets. */
case class BucketCountSketch(child: Expression, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bits >= 1 && bits <= 12, s"bits must be in [1,12], got $bits")

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_bucket_count_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  private val nBuckets = 1 << bits

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val out = new Array[Byte](nBuckets + 4)
    var ovf = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val b = ((arr.getLong(i) * 0x9E3779B97F4A7C15L) >>> (64 - bits)).toInt
      if (out(b) == 127) ovf += 1 else out(b) = (out(b) + 1).toByte
      i += 1
    }
    out(nBuckets) = (ovf >>> 24).toByte
    out(nBuckets + 1) = (ovf >>> 16).toByte
    out(nBuckets + 2) = (ovf >>> 8).toByte
    out(nBuckets + 3) = ovf.toByte
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName everywhere — see SortedOverlapAtLeast.doGenCode
      val out = ctx.freshName("out"); val ovf = ctx.freshName("ovf")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |byte[] $out = new byte[$nBuckets + 4];
         |int $ovf = 0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  int $b = (int) (($a.getLong($i) * 0x9E3779B97F4A7C15L) >>> ${64 - bits});
         |  if ($out[$b] == 127) $ovf++; else $out[$b]++;
         |}
         |$out[$nBuckets] = (byte) ($ovf >>> 24);
         |$out[$nBuckets + 1] = (byte) ($ovf >>> 16);
         |$out[$nBuckets + 2] = (byte) ($ovf >>> 8);
         |$out[$nBuckets + 3] = (byte) $ovf;
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection upper bound from two [[BucketCountSketch]] values:
  * Σ_b min(cntA_b, cntB_b) + min(ovfA, ovfB). Sketches of different
  * lengths (different `bits`) are a caller bug → -1 (which fails any
  * `bound >= required` filter, the safe direction). */
case class BucketBound(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bucket_bound"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.BinaryType &&
        right.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, binary), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length || x.length < 5) return -1
    val nb = x.length - 4
    var s = 0
    var i = 0
    while (i < nb) {
      s += math.min(x(i).toInt, y(i).toInt)
      i += 1
    }
    val ovfA = ((x(nb) & 0xff) << 24) | ((x(nb + 1) & 0xff) << 16) |
      ((x(nb + 2) & 0xff) << 8) | (x(nb + 3) & 0xff)
    val ovfB = ((y(nb) & 0xff) << 24) | ((y(nb + 1) & 0xff) << 16) |
      ((y(nb + 2) & 0xff) << 8) | (y(nb + 3) & 0xff)
    s + math.min(ovfA, ovfB)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName everywhere — see SortedOverlapAtLeast.doGenCode
      val nb = ctx.freshName("nb"); val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val ovfA = ctx.freshName("ovfA"); val ovfB = ctx.freshName("ovfB")
      s"""
         |if ($a.length != $b.length || $a.length < 5) {
         |  ${ev.value} = -1;
         |} else {
         |  int $nb = $a.length - 4;
         |  int $s = 0;
         |  for (int $i = 0; $i < $nb; $i++) {
         |    $s += Math.min((int) $a[$i], (int) $b[$i]);
         |  }
         |  int $ovfA = (($a[$nb] & 0xff) << 24) | (($a[$nb + 1] & 0xff) << 16) |
         |    (($a[$nb + 2] & 0xff) << 8) | ($a[$nb + 3] & 0xff);
         |  int $ovfB = (($b[$nb] & 0xff) << 24) | (($b[$nb + 1] & 0xff) << 16) |
         |    (($b[$nb + 2] & 0xff) << 8) | ($b[$nb + 3] & 0xff);
         |  ${ev.value} = $s + Math.min($ovfA, $ovfB);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
