package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `gram_matrix(q: array<bigint>, d)` — exact integer Gram (scatter)
  * matrix accumulator for distributed PCA: aggregates Σ_rows q·qᵀ over
  * integer-quantized vectors into the packed upper triangle (row-major,
  * length d(d+1)/2).
  *
  * This is the scale-correct shape for covariance/PCA over a 100 TB
  * embedding column: per-partition state is ONE d(d+1)/2 long array
  * (~16 KB at d=64) updated in a tight loop, merges are elementwise
  * adds, and only those fixed-size buffers cross the wire — never a
  * per-row explode of d² pair terms (which would put n·d²/2 rows
  * through the shuffle). Integer inputs keep the sums exact and
  * engine-independent: with |q| ≤ 10⁴ the entries stay below 2^53 up
  * to ~10¹⁰ rows, so they remain exactly representable as doubles for
  * the driver-side eigen step downstream.
  *
  * Standard construction (covariance/Gram accumulation; see e.g. the
  * classic one-pass scatter-matrix formulation in Golub & Van Loan).
  */
case class GramMatrixAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val len = d * (d + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_matrix"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == d,
        s"gram_matrix: expected $d elements, got ${arr.numElements()}")
      var i = 0
      var k = 0
      while (i < d) {
        val qi = arr.getLong(i)
        var j = i
        while (j < d) {
          buffer(k) += qi * arr.getLong(j)
          k += 1
          j += 1
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < len) { buffer(k) += other(k); k += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 * len)
    var k = 0
    while (k < len) { buf.putLong(buffer(k)); k += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = new Array[Long](len)
    var k = 0
    while (k < len) { out(k) = buf.getLong(); k += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

object GramMatrix {
  /** Column API: packed upper-triangle integer Gram matrix aggregate. */
  def gramMatrix(q: Column, d: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      GramMatrixAgg(org.apache.spark.sql.graft.Bridge.expression(q), d)
        .toAggregateExpression(isDistinct = false))

  /** Top TWO principal directions via deflation: after the first
    * power-iteration pass, G₂ = G − λ₁·(v vᵀ)/(vᵀv) removes the top
    * component and a second identical pass extracts the runner-up.
    * Every arithmetic step (deflation entries g[i][j] − λ·x[i]·x[j]/den,
    * the same ascending-j folds, max-abs normalization) is reproduced
    * verbatim by the oracle — both eigenpairs are bit-identical
    * cross-engine. Returns ((v1, λ1), (v2, λ2)). */
  def top2(packed: Array[Long], d: Int, iters: Int)
      : ((Array[Double], Double), (Array[Double], Double)) = {
    val (v1, lam1) = powerIteration(packed, d, iters)
    var den = 0.0
    var i = 0
    while (i < d) { den += v1(i) * v1(i); i += 1 }
    def at(i: Int, j: Int): Double = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      packed(a * d - a * (a - 1) / 2 + (b - a)).toDouble
    }
    val g2 = Array.tabulate(d, d)((i, j) => at(i, j) - lam1 * v1(i) * v1(j) / den)
    var x = Array.fill(d)(1.0)
    var it = 0
    while (it < iters) {
      val y = new Array[Double](d)
      i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += g2(i)(j) * x(j); j += 1 }
        y(i) = s
        i += 1
      }
      var m = 0.0
      i = 0
      while (i < d) { val a = math.abs(y(i)); if (a > m) m = a; i += 1 }
      if (m == 0.0) return ((v1, lam1), (y, 0.0))
      i = 0
      while (i < d) { y(i) = y(i) / m; i += 1 }
      x = y
      it += 1
    }
    var num2 = 0.0
    var den2 = 0.0
    i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += g2(i)(j) * x(j); j += 1 }
      num2 += x(i) * s
      den2 += x(i) * x(i)
      i += 1
    }
    ((v1, lam1), (x, num2 / den2))
  }

  /** Driver-side power iteration on the packed triangle — the d×d eigen
    * step of the distributed PCA: G is metadata-sized (d(d+1)/2 longs),
    * so this is index-build-style driver work, not a data scan. The
    * fold order (j ascending) and max-abs normalization are part of the
    * cross-engine contract: every arithmetic step is reproduced
    * verbatim by the DuckDB oracle, so the iterates are bit-identical.
    * Returns (eigenvector, Rayleigh quotient) after `iters` rounds from
    * the all-ones start. */
  def powerIteration(packed: Array[Long], d: Int, iters: Int)
      : (Array[Double], Double) = {
    def at(i: Int, j: Int): Double = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      // packed row-major upper triangle: offset(a) = a*d - a(a-1)/2
      packed(a * d - a * (a - 1) / 2 + (b - a)).toDouble
    }
    var x = Array.fill(d)(1.0)
    var it = 0
    while (it < iters) {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += at(i, j) * x(j); j += 1 }
        y(i) = s
        i += 1
      }
      var m = 0.0
      i = 0
      while (i < d) { val a = math.abs(y(i)); if (a > m) m = a; i += 1 }
      if (m == 0.0) return (y, 0.0)
      i = 0
      while (i < d) { y(i) = y(i) / m; i += 1 }
      x = y
      it += 1
    }
    // Rayleigh quotient λ = xᵀGx / xᵀx, same canonical fold order
    var num = 0.0
    var den = 0.0
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += at(i, j) * x(j); j += 1 }
      num += x(i) * s
      den += x(i) * x(i)
      i += 1
    }
    (x, num / den)
  }
}
