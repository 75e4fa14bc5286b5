package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch — the theta-sketch
  * family's deterministic core (Bar-Yossef et al. 2002; Beyer et al.
  * SIGMOD'07; the public DataSketches theta construction). Keep the k
  * smallest DISTINCT hash values of the keys; if fewer than k distinct
  * hashes were seen the sketch IS the exact distinct set, otherwise the
  * k-th smallest hash h_(k) estimates the density: n̂ = (k−1)·2⁶⁴/h_(k).
  *
  * Why it completes the sketch family: Misra–Gries answers "which keys
  * are heavy", GK answers rank queries, Bloom answers membership, CMS
  * answers point frequency — KMV answers DISTINCT COUNT, and unlike a
  * plain HLL register bank it supports SET ALGEBRA after the pass:
  * union(A, B) = the k smallest of (sketch_A ∪ sketch_B) (closed under
  * the same estimator), and intersection follows by inclusion–exclusion
  * — the cross-snapshot overlap questions a corpus audit asks.
  *
  * Determinism contract (the reason this is KMV and not HLL): the hash
  * is the engine's splitmix64 chain (`HashOps.mix64`), the buffer is a
  * sorted distinct set, and merges are set unions — the sketch is a pure
  * function of the input SET, independent of row order and partitioning,
  * so a DuckDB oracle rebuilds the identical sketch in HUGEINT SQL.
  *
  * Representation: hashes are stored SIGN-FLIPPED (`h ^ Long.MinValue`)
  * so signed ordering equals unsigned hash ordering — `array_sort`,
  * `array_union` + slice, and BIGINT comparisons in both engines then
  * operate in the correct order with no unsigned machinery. State is
  * k longs (2 KB at k=256) per group regardless of input size; merges
  * move only sketch bytes across the wire.
  */
final class KmvBuffer(val k: Int) {
  /** Sorted distinct flipped hashes, capped at the k smallest. */
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(key: Long): Unit = {
    val flipped = HashOps.mix64(key) ^ Long.MinValue
    if (set.size < k) { set.add(flipped); () }
    else if (flipped < set.last) {
      if (set.add(flipped)) { set.pollLast(); () }
    }
  }

  def mergeFrom(o: KmvBuffer): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) {
      val v = it.next()
      if (set.size < k) { set.add(v); () }
      else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
    }
  }

  def toArray: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** `kmv_sketch(longCol, k)` — aggregates a LONG key column into the
  * sorted array of its k smallest (sign-flipped) distinct hashes.
  * Null inputs are skipped. */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {
  require(k >= 8 && k <= (1 << 20), "kmv k out of range")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = new GenericArrayData(buffer.toArray)

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val arr = buffer.toArray
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * arr.length)
    bb.putInt(arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new KmvBuffer(k)
    val n = bb.getInt()
    var i = 0
    while (i < n) { b.set.add(bb.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KmvFunctions {

  def kmvSketch(c: Column, k: Int = 256): Column =
    Bridge.column(KmvSketchAgg(Bridge.expression(c), k)
      .toAggregateExpression(isDistinct = false))

  /** Distinct-count estimate from a sketch array: exact size when the
    * sketch never filled, else (k−1)·2⁶⁴/h_(k). The unsigned k-th hash
    * is recovered via exact DECIMAL arithmetic then ONE double rounding
    * — bit-identical to an engine casting the unsigned value directly
    * (a double-rounding through an intermediate `(double) flipped`
    * would not be). */
  def kmvEstimate(sk: Column, k: Int = 256): Column = {
    val uh = (element_at(sk, k).cast(DecimalType(38, 0)) +
      lit(new java.math.BigDecimal("9223372036854775808"))).cast("double")
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1.8446744073709552E19) / uh)
  }

  /** Union of two sketches: the k smallest of the merged distinct sets
    * (flipped representation ⇒ plain ascending array_sort). */
  def kmvUnion(a: Column, b: Column, k: Int = 256): Column =
    slice(array_sort(array_union(a, b)), 1, k)
}
