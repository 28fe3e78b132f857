package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd vector kernels for the similarity operators.
  *
  * The composable form (`aggregate(zip_with(...))`) runs interpreted —
  * higher-order functions sit outside whole-stage codegen and allocate
  * a zipped array per row. These expressions generate a tight primitive
  * loop instead (one pass, no allocation), which is what the 100 TB
  * ANN path needs. Array elements are assumed non-null (embedding
  * vectors); lengths are defensively min()'d.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local: two instances in one collapsed
      // codegen scope would otherwise fail janino and demote the
      // stage to interpreted eval
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection bucket: `planes` deterministic pseudo-random
  * hyperplanes, bucket = bit-packed projection signs. Bitwise-identical
  * to the HOF form `Similarity.srpBucketHof` (same hash-derived
  * coefficients `(((p*dim+j) * 2654435761) mod 1009) - 504`, same
  * j-ascending accumulation order — float sums match exactly), which
  * is also what the DuckDB oracle reproduces. The HOF runs `planes`
  * interpreted aggregate(zip_with(sequence...)) passes allocating
  * three arrays per row each; this is one compiled two-level loop,
  * zero allocation — the same gap MinhashSignature closed for text.
  */
case class SrpBucket(child: Expression, planes: Int, dim: Int)
  extends UnaryExpression {

  require(planes >= 1 && planes <= 62, s"planes must be in [1,62], got $planes")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var j = 0
      while (j < n) {
        s += x.getDouble(j) * (((p * dim + j) * 2654435761L) % 1009L - 504L)
        j += 1
      }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName everywhere — see DotProduct.doGenCode
      val n = ctx.freshName("n"); val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p"); val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long $bucket = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $s += $a.getDouble($j) *
         |      (((long)($p * $dim + $j) * 2654435761L) % 1009L - 504L);
         |  }
         |  if ($s > 0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity in ONE pass (dot, |a|², |b|² in the same loop) —
  * numerically identical to dot/(sqrt(dot aa)*sqrt(dot bb)) because
  * each accumulator adds in the same element order. */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName everywhere — see DotProduct.doGenCode
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Order-preserving bit transform of a double: the signed-long image
  * under which `long` comparison agrees with `java.lang.Double.compare`
  * (negatives flip their magnitude bits, NaNs canonicalize via
  * `doubleToLongBits`, −0.0 < +0.0, NaN above +Inf). This is the
  * radix the exact-quantile engine (`operators.Quantiles`) buckets on:
  * any 16-bit prefix range of this image is a contiguous value range,
  * so histogram refinement narrows order statistics without sorting.
  */
/** Inverse of the IEEE-754 bit layer under [[DoubleOrderBits]]:
  * reinterprets a raw `doubleToLongBits` long as its double. The
  * order-image unflip (`s ^ ((s >> 63) & Long.MaxValue)`, self-inverse)
  * is plain long arithmetic the caller composes relationally; this
  * expression supplies the one step SQL lacks — `longBitsToDouble` —
  * so the grouped radix quantile engine can turn a located 64-bit
  * prefix back into its value without a driver round-trip. */
case class DoubleFromBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_double_from_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long, got ${t.simpleString}")
  }

  override protected def nullSafeEval(x: Any): Any =
    java.lang.Double.longBitsToDouble(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = java.lang.Double.longBitsToDouble($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_double_order_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${t.simpleString}")
  }

  override protected def nullSafeEval(x: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(x.asInstanceOf[Double])
    b ^ ((b >> 63) & Long.MaxValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("b")
      s"""
         |long $b = java.lang.Double.doubleToLongBits($x);
         |${ev.value} = $b ^ (($b >> 63) & java.lang.Long.MAX_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
