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
      s"""
         |int na = $a.numElements();
         |int nb = $b.numElements();
         |int i = 0, j = 0, c = 0;
         |boolean pruned = false;
         |while (i < na && j < nb) {
         |  int rem = (na - i < nb - j) ? (na - i) : (nb - j);
         |  if (c + rem < $r) { pruned = true; break; }
         |  long va = $a.getLong(i);
         |  long vb = $b.getLong(j);
         |  if (va == vb) { c++; i++; j++; }
         |  else if (va < vb) { i++; }
         |  else { j++; }
         |}
         |${ev.value} = (pruned || c < $r) ? -1 : c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
