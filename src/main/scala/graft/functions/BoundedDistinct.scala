package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hybrid distinct-count sketch: an exact hash set of 64-bit value hashes
  * until `threshold` distinct values, then an irreversible switch to a
  * HyperLogLog estimate (2^p registers).
  *
  * This is the SURVEY.md §7.3 design for streaming COUNT_DISTINCT at
  * 100 TB: the reference's ksqlDB keeps an exact per-key set (fine at
  * ~2.5k hotels/category, fatal at billions); `approx_count_distinct`
  * is approximate even for tiny groups. The hybrid is exact exactly when
  * exactness is cheap, and bounded-state when it isn't — per GROUP, not
  * per query.
  *
  * HLL per Flajolet et al. 2007 (public algorithm): register j = leading-
  * zero rank of the hash suffix; estimate = alpha·m²/Σ2^(−M[j]) with
  * linear-counting small-range correction.
  */
final class DistinctSketch(val threshold: Int, val p: Int) {
  var exact: java.util.HashSet[Long] = new java.util.HashSet[Long]()
  var registers: Array[Byte] = _ // null while exact

  def isExact: Boolean = registers == null
  private def m: Int = 1 << p

  def add(hash: Long): Unit =
    if (isExact) {
      exact.add(hash)
      if (exact.size > threshold) degrade()
    } else addToHll(hash)

  private def addToHll(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val rank = (java.lang.Long.numberOfLeadingZeros((hash << p) | (1L << (p - 1))) + 1).toByte
    if (rank > registers(idx)) registers(idx) = rank
  }

  private def degrade(): Unit = {
    registers = new Array[Byte](m)
    val it = exact.iterator()
    while (it.hasNext) addToHll(it.next())
    exact = null
  }

  def merge(other: DistinctSketch): Unit =
    if (other.isExact) {
      val it = other.exact.iterator()
      while (it.hasNext) add(it.next())
    } else {
      if (isExact) degrade()
      var i = 0
      while (i < m) {
        if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
        i += 1
      }
    }

  def estimate(): Long =
    if (isExact) exact.size.toLong
    else {
      val md = m.toDouble
      val alpha = md match {
        case _ if p == 4 => 0.673
        case _ if p == 5 => 0.697
        case _ if p == 6 => 0.709
        case _ => 0.7213 / (1.0 + 1.079 / md)
      }
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        sum += math.pow(2.0, -registers(i).toDouble)
        if (registers(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * md * md / sum
      val corrected =
        if (raw <= 2.5 * md && zeros > 0) md * math.log(md / zeros.toDouble) // linear counting
        else raw
      math.round(corrected)
    }

  def serialize(): Array[Byte] =
    if (isExact) {
      val buf = ByteBuffer.allocate(1 + 4 + 4 + 4 + 8 * exact.size)
      buf.put(0.toByte).putInt(threshold).putInt(p).putInt(exact.size)
      val it = exact.iterator()
      while (it.hasNext) buf.putLong(it.next())
      buf.array()
    } else {
      val buf = ByteBuffer.allocate(1 + 4 + 4 + m)
      buf.put(1.toByte).putInt(threshold).putInt(p)
      buf.put(registers)
      buf.array()
    }
}

object DistinctSketch {
  def deserialize(bytes: Array[Byte]): DistinctSketch = {
    val buf = ByteBuffer.wrap(bytes)
    val mode = buf.get()
    val sk = new DistinctSketch(buf.getInt(), buf.getInt())
    if (mode == 0) {
      val n = buf.getInt()
      var i = 0
      while (i < n) { sk.exact.add(buf.getLong()); i += 1 }
    } else {
      sk.registers = new Array[Byte](1 << sk.p)
      buf.get(sk.registers)
      sk.exact = null
    }
    sk
  }
}

/** `bounded_count_distinct(col, threshold, p)` — usable in batch AND in
  * update-mode streaming aggregations (where Spark rejects the built-in
  * countDistinct); buffer state is at most max(threshold·8, 2^p) bytes
  * per group. */
case class BoundedCountDistinct(
    child: Expression,
    threshold: Int = 100000,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DistinctSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bounded_count_distinct"

  private lazy val hasher: Any => Long = child.dataType match {
    case StringType => v => HashOps.mix64(HashOps.fnv64(v.asInstanceOf[UTF8String]))
    case LongType => v => HashOps.mix64(v.asInstanceOf[Long])
    case IntegerType => v => HashOps.mix64(v.asInstanceOf[Int].toLong)
    case ShortType => v => HashOps.mix64(v.asInstanceOf[Short].toLong)
    case DoubleType => v =>
      HashOps.mix64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case FloatType => v =>
      HashOps.mix64(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong)
    case other => throw new IllegalArgumentException(
      s"bounded_count_distinct: unsupported input type $other")
  }

  override def createAggregationBuffer(): DistinctSketch =
    new DistinctSketch(threshold, p)

  override def update(buffer: DistinctSketch, input: InternalRow): DistinctSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(hasher(v))
    buffer
  }

  override def merge(buffer: DistinctSketch, other: DistinctSketch): DistinctSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: DistinctSketch): Any = buffer.estimate()

  override def serialize(buffer: DistinctSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): DistinctSketch =
    DistinctSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BoundedCountDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedCountDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object BoundedDistinct {
  import org.apache.spark.sql.graft.Bridge

  /** Column API: exact distinct count until `threshold`, HLL(2^p) after. */
  def boundedCountDistinct(c: Column, threshold: Int = 100000, p: Int = 12): Column =
    Bridge.column(
      BoundedCountDistinct(Bridge.expression(c), threshold, p)
        .toAggregateExpression(isDistinct = false))
}
