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
  var pcnt: Array[Long] = Array.emptyLongArray // co-present rows per pair
  var counts: Array[Long] = Array.emptyLongArray
  var sums: Array[Long] = Array.emptyLongArray
  var scnt: Array[Long] = Array.emptyLongArray // non-null rows per dim

  def growTo(d: Int): Unit = if (d > dim) {
    products = java.util.Arrays.copyOf(products, d * (d + 1) / 2)
    pcnt = java.util.Arrays.copyOf(pcnt, d * (d + 1) / 2)
    counts = java.util.Arrays.copyOf(counts, d + 1)
    sums = java.util.Arrays.copyOf(sums, d)
    scnt = java.util.Arrays.copyOf(scnt, d)
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
  * arrays, not n·d²/2 rows. Null handling replicates the exploded
  * form EXACTLY: null elements contribute to n (the pair row exists)
  * but not to the sums; a pair with ZERO co-present elements reports
  * p = null (SQL's empty `sum`, so the covariance null-propagates);
  * pairs touching an all-null dimension are OMITTED (the exploded
  * form's inner join against the per-dimension sums dropped them).
  * All accumulation is `Math.addExact`/`multiplyExact` — overflow
  * fails loudly like the ANSI-mode Column arithmetic it replaced,
  * instead of wrapping (micro-unit products overflow a long around
  * Σ|y_i·y_j| ≈ 9.2e18; re-scale the input below ~1e6 rows·1e12
  * products if that trips).
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
    val pcnt = buf.pcnt
    val sums = buf.sums
    var j = 0
    while (j < d) {
      if (present(j)) {
        val yj = y(j)
        sums(j) = Math.addExact(sums(j), yj)
        buf.scnt(j) += 1L
        val base = j * (j + 1) / 2
        var i = 0
        while (i <= j) {
          if (present(i)) {
            products(base + i) = Math.addExact(
              products(base + i), Math.multiplyExact(y(i), yj))
            pcnt(base + i) += 1L
          }
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
    while (k < other.products.length) {
      buf.products(k) = Math.addExact(buf.products(k), other.products(k))
      buf.pcnt(k) += other.pcnt(k)
      k += 1
    }
    k = 0
    while (k < other.counts.length) { buf.counts(k) += other.counts(k); k += 1 }
    k = 0
    while (k < other.sums.length) {
      buf.sums(k) = Math.addExact(buf.sums(k), other.sums(k))
      buf.scnt(k) += other.scnt(k)
      k += 1
    }
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
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      dim * (dim + 1) / 2)
    var i = 0
    while (i < dim) {
      if (buf.scnt(i) > 0) {
        var jj = i
        while (jj < dim) {
          // all-null dimension: the exploded form's inner join against
          // the per-dimension sums dropped these pairs entirely
          if (buf.scnt(jj) > 0) {
            val t = jj * (jj + 1) / 2 + i
            // zero co-present elements: SQL sum over no rows is null
            val p: Any =
              if (buf.pcnt(t) == 0L) null else java.lang.Long.valueOf(buf.products(t))
            out += new GenericInternalRow(Array[Any](
              i, jj, nAt(jj), p, buf.sums(i), buf.sums(jj)))
          }
          jj += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: TriBuf): Array[Byte] = {
    val d = buf.dim
    val bb = java.nio.ByteBuffer.allocate(
      4 + 8 * (2 * buf.products.length + buf.counts.length +
        2 * buf.sums.length))
    bb.putInt(d)
    var k = 0
    while (k < buf.products.length) { bb.putLong(buf.products(k)); k += 1 }
    k = 0
    while (k < buf.pcnt.length) { bb.putLong(buf.pcnt(k)); k += 1 }
    k = 0
    while (k < buf.counts.length) { bb.putLong(buf.counts(k)); k += 1 }
    k = 0
    while (k < buf.sums.length) { bb.putLong(buf.sums(k)); k += 1 }
    k = 0
    while (k < buf.scnt.length) { bb.putLong(buf.scnt(k)); k += 1 }
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
      while (k < buf.pcnt.length) { buf.pcnt(k) = bb.getLong(); k += 1 }
      k = 0
      while (k < buf.counts.length) { buf.counts(k) = bb.getLong(); k += 1 }
      k = 0
      while (k < buf.sums.length) { buf.sums(k) = bb.getLong(); k += 1 }
      k = 0
      while (k < buf.scnt.length) { buf.scnt(k) = bb.getLong(); k += 1 }
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
    StructField("p", LongType, nullable = true),
    StructField("si", LongType, nullable = false),
    StructField("sj", LongType, nullable = false))), containsNull = false)
}
