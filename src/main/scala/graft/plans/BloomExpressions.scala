package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter kernels for `operators.BloomJoin`.
  *
  * Both sides of the filter (the build-side bit positions and the
  * probe-side membership test) share ONE static hash — the Murmur3
  * 64-bit finalizer with Kirsch–Mitzenmacher double hashing — so the
  * aggregation that builds the bitset and the codegen'd probe can
  * never drift apart. Wrapping long arithmetic is deliberate (and why
  * this is an Expression, not Column math: ANSI mode would throw on
  * the intentional overflow).
  */
object BloomKernels {

  @inline def mix(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 33); z *= 0xff51afd7ed558ccdL
    z ^= (z >>> 33); z *= 0xc4ceb9fe1a85ec53L
    z ^= (z >>> 33); z
  }

  /** The i-th bit position for `key` in a `numBits`-bit filter. */
  @inline def position(h1: Long, h2: Long, i: Int, numBits: Int): Int =
    (((h1 + i.toLong * h2) % numBits + numBits) % numBits).toInt

  def bitPositions(key: Long, k: Int, numBits: Int): GenericArrayData = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x9e3779b97f4a7c15L) | 1L
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = position(h1, h2, i, numBits).toLong; i += 1 }
    new GenericArrayData(out)
  }

  def mightContain(key: Long, bits: Array[Long], k: Int, numBits: Int): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val pos = position(h1, h2, i, numBits)
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_positions(key)` → array<long> of the k bit indexes the key
  * sets — the build side's explode/bit_or input. */
case class BloomBitPositions(child: Expression, k: Int, numBits: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_positions"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    BloomKernels.bitPositions(input.asInstanceOf[Long], k, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BloomKernels.bitPositions($c, $k, $numBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_might_contain(key)` against a driver-assembled bitset. The
  * bitset rides in the expression (plan-embedded; numBits/8 bytes —
  * size it like any broadcast build side) and is referenced once per
  * generated class, so the probe is a branchy integer loop inside
  * whole-stage codegen: no join, no shuffle, no per-row allocation. */
case class BloomMightContain(child: Expression, bits: Array[Long],
                             k: Int, numBits: Int)
  extends UnaryExpression {

  require(bits.length == (numBits + 63) / 64,
    s"bitset length ${bits.length} != ceil($numBits/64)")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    BloomKernels.mightContain(input.asInstanceOf[Long], bits, k, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BloomKernels.mightContain($c, $bitsRef, $k, $numBits);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
