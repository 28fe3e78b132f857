package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable buffer for [[TriProductSum]]: the full second-moment state
  * of a vector column in three primitive long arrays, grown to the
  * largest dimensionality seen.
  *
  *   - `products(j*(j+1)/2 + i)` = Σ y(i)·y(j) over rows where both
  *     elements are present (i ≤ j; the column-major triangle index is
  *     stable under growth, so variable-length vectors just extend the
  *     arrays)
  *   - `counts(d)` = number of rows of exact dimension d (so the pair
  *     count n(i,j) = Σ_{d>j} counts(d) — a row contributes pair (i,j)
  *     iff its dimension exceeds j, exactly the explode semantics)
  *   - `sums(i)` = Σ y(i) over rows with dimension > i and y(i)
  *     non-null
  */
private[plans] final class TriBuf {
  var dim: Int = 0
  var products: Array[Long] = Array.emptyLongArray
  var counts: Array[Long] = Array.emptyLongArray
  var sums: Array[Long] = Array.emptyLongArray

  def growTo(d: Int): Unit = if (d > dim) {
    products = java.util.Arrays.copyOf(products, d * (d + 1) / 2)
    counts = java.util.Arrays.copyOf(counts, d + 1)
    sums = java.util.Arrays.copyOf(sums, d)
    dim = d
  }
}

/** One-pass covariance-state aggregate: consumes an `array<long>`
  * column (the micro-scaled embedding) and maintains every upper-
  * triangle product sum, per-dimension sum, and dimension histogram in
  * a single primitive buffer — the treeAggregate shape of a covariance
  * matrix.
  *
  * The composable form (explode d(d+1)/2 (i,j,p) structs per row
  * through a hash aggregation) materializes n·d²/2 rows via
  * interpreted higher-order functions; this buffer does the identical
  * long arithmetic (associative + commutative, so bit-equal under any
  * partitioning) in a tight loop and ships ONE ~d²-long state per
  * partition instead — at 1000 executors the shuffle is 1000 small
  * arrays, not n·d²/2 rows. Null elements contribute to n (the pair
  * row exists) but not to the product/dimension sums — exactly
  * `count(lit(1))` + null-skipping `sum` over the exploded form.
  *
  * Output: array<struct<i,j,n,p,si,sj>> for i ≤ j < maxDim — the
  * per-pair state the covariance formula needs, with the per-dimension
  * sums already attached (no broadcast join back).
  */
case class TriProductSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TriBuf] with UnaryLike[Expression] {

  override def prettyName: String = "graft_tri_product_sum"
  override def nullable: Boolean = false
  override def dataType: DataType = TriProductSum.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): TriBuf = new TriBuf

  override def update(buf: TriBuf, input: InternalRow): TriBuf = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    val d = a.numElements()
    if (d == 0) return buf // empty vectors generate no pairs (explode parity)
    buf.growTo(d)
    buf.counts(d) += 1L
    val y = new Array[Long](d)
    val present = new Array[Boolean](d)
    var k = 0
    while (k < d) {
      if (!a.isNullAt(k)) { present(k) = true; y(k) = a.getLong(k) }
      k += 1
    }
    val products = buf.products
    val sums = buf.sums
    var j = 0
    while (j < d) {
      if (present(j)) {
        val yj = y(j)
        sums(j) += yj
        val base = j * (j + 1) / 2
        var i = 0
        while (i <= j) {
          if (present(i)) products(base + i) += y(i) * yj
          i += 1
        }
      }
      j += 1
    }
    buf
  }

  override def merge(buf: TriBuf, other: TriBuf): TriBuf = {
    if (other.dim == 0) return buf
    buf.growTo(other.dim)
    var k = 0
    while (k < other.products.length) { buf.products(k) += other.products(k); k += 1 }
    k = 0
    while (k < other.counts.length) { buf.counts(k) += other.counts(k); k += 1 }
    k = 0
    while (k < other.sums.length) { buf.sums(k) += other.sums(k); k += 1 }
    buf
  }

  override def eval(buf: TriBuf): Any = {
    val dim = buf.dim
    if (dim == 0) return new GenericArrayData(Array.empty[Any])
    // n for pairs anchored at column j: rows with dimension > j
    val nAt = new Array[Long](dim)
    var j = dim - 1
    var acc = 0L
    while (j >= 0) { acc += buf.counts(j + 1); nAt(j) = acc; j -= 1 }
    val out = new Array[Any](dim * (dim + 1) / 2)
    var k = 0
    var i = 0
    while (i < dim) {
      var jj = i
      while (jj < dim) {
        out(k) = new GenericInternalRow(Array[Any](
          i, jj, nAt(jj), buf.products(jj * (jj + 1) / 2 + i),
          buf.sums(i), buf.sums(jj)))
        k += 1
        jj += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TriBuf): Array[Byte] = {
    val d = buf.dim
    val bb = java.nio.ByteBuffer.allocate(
      4 + 8 * (buf.products.length + buf.counts.length + buf.sums.length))
    bb.putInt(d)
    var k = 0
    while (k < buf.products.length) { bb.putLong(buf.products(k)); k += 1 }
    k = 0
    while (k < buf.counts.length) { bb.putLong(buf.counts(k)); k += 1 }
    k = 0
    while (k < buf.sums.length) { bb.putLong(buf.sums(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TriBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TriBuf
    val d = bb.getInt()
    if (d > 0) {
      buf.growTo(d)
      var k = 0
      while (k < buf.products.length) { buf.products(k) = bb.getLong(); k += 1 }
      k = 0
      while (k < buf.counts.length) { buf.counts(k) = bb.getLong(); k += 1 }
      k = 0
      while (k < buf.sums.length) { buf.sums(k) = bb.getLong(); k += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TriProductSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TriProductSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TriProductSum =
    copy(child = newChild)
}

object TriProductSum {
  private[plans] val outType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("p", LongType, nullable = false),
    StructField("si", LongType, nullable = false),
    StructField("sj", LongType, nullable = false))), containsNull = false)
}
